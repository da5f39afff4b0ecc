"""Delta + varbyte posting-list codec, numpy-vectorized (C1/C2 rebuilt).

The reference entropy-codes the *decimal digits* of its CSV posting
lines with a hardcoded 12-symbol Huffman code
(``/root/reference/searchengine/IndexCreator.py:400-410``,
``Huffman.py:70-88``).  Per the north_rule, the rebuild replaces that
with the standard IR codec: doc-gap delta encoding + varbyte
(7-bit groups, little-endian, continuation bit on all but the last
byte).  Encode and decode are fully vectorized numpy — no per-value
Python loops over postings — so they are cheap inside Arrow-batched
pandas UDFs.

Frame format (one term's postings = one or more concatenated frames;
frames arise from doc-range slices/salts and concatenate WITHOUT
re-encoding because every frame's first doc_id is absolute):

    varbyte(n)                       # number of docs in this frame
    varbyte(doc_0, gap_1 .. gap_{n-1})   # ascending doc_ids, delta'd
    varbyte(tf_0 .. tf_{n-1})
    varbyte(pos gaps, doc-major)     # per doc: pos_0, gap_1.. (tf_i values)

Positions are stored (the reference stores them, IndexCreator.py:95-99)
even though phrase verification falls back to substring matching
(SearchEngine.py:201-207) — they future-proof true positional queries.
"""

from __future__ import annotations

import numpy as np


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a 1-D array of non-negative ints."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    # Number of 7-bit groups per value (at least 1).
    nbytes = np.ones(vals.shape, dtype=np.int64)
    rem = vals >> np.uint64(7)
    while rem.any():
        nbytes += (rem != 0).astype(np.int64)
        rem >>= np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    rem = vals.copy()
    g = 0
    active = np.arange(vals.size)
    while active.size:
        idx = starts[active] + g
        is_last = nbytes[active] == g + 1
        byte = (rem[active] & np.uint64(0x7F)).astype(np.uint8)
        out[idx] = np.where(is_last, byte, byte | np.uint8(0x80))
        rem[active] >>= np.uint64(7)
        active = active[~is_last]
        g += 1
    return out.tobytes()


def vb_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a varbyte stream to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # Position of each byte within its value's group sequence.
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    shifted = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(shifted, starts)


def encode_frame(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: np.ndarray | None = None,
) -> bytes:
    """Encode one ascending-doc_id posting frame.

    ``positions`` is the doc-major concatenation of per-doc position
    lists (``tfs.sum()`` values); pass None to store empty positions
    (tf-only index).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    n = doc_ids.size
    if n == 0:
        return b""
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    if positions is None or len(positions) == 0:
        pos_bytes = b""
        pos_flag = 0
    else:
        positions = np.asarray(positions, dtype=np.uint64)
        # delta within each doc's position run
        pgaps = positions.copy()
        run_starts = np.cumsum(tfs)[:-1].astype(np.int64)
        pgaps[1:] = positions[1:] - positions[:-1]
        pgaps[0] = positions[0]
        if run_starts.size:
            pgaps[run_starts] = positions[run_starts]
        pos_bytes = vb_encode(pgaps)
        pos_flag = 1
    header = vb_encode(np.array([n, pos_flag], dtype=np.uint64))
    return header + vb_encode(gaps) + vb_encode(tfs) + pos_bytes


def decode_frames(buf: bytes, want_positions: bool = True):
    """Decode a concatenation of frames.

    Returns ``(doc_ids, tfs, positions)`` as uint64 arrays; positions is
    empty when frames were encoded tf-only. doc_ids ascend globally when
    frames were produced from disjoint ascending doc ranges (the build
    invariant).

    ``want_positions=False`` SKIPS the position payload (the frame
    header makes its byte length computable from Σtf without decoding):
    on a positional index, non-positional plans — keyword, boolean,
    BM25 — pay only the byte scan, not the (≈Σdoclen-sized)
    position-list materialization.  Positions come back empty.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    all_docs, all_tfs, all_pos = [], [], []
    off = 0
    is_last = (b & 0x80) == 0
    val_ends = np.nonzero(is_last)[0]
    while off < b.size:
        # decode header: two varbyte values starting at off
        e0 = val_ends[np.searchsorted(val_ends, off)]
        n = int(vb_decode(b[off : e0 + 1])[0])
        off2 = e0 + 1
        e1 = val_ends[np.searchsorted(val_ends, off2)]
        pos_flag = int(vb_decode(b[off2 : e1 + 1])[0])
        off = e1 + 1
        # doc gaps: n values
        i = np.searchsorted(val_ends, off)
        doc_end = val_ends[i + n - 1]
        gaps = vb_decode(b[off : doc_end + 1])
        off = doc_end + 1
        # tfs: n values
        i = np.searchsorted(val_ends, off)
        tf_end = val_ends[i + n - 1]
        tfs = vb_decode(b[off : tf_end + 1])
        off = tf_end + 1
        docs = np.cumsum(gaps, dtype=np.uint64)
        all_docs.append(docs)
        all_tfs.append(tfs)
        if pos_flag:
            npos = int(tfs.sum())
            i = np.searchsorted(val_ends, off)
            p_end = val_ends[i + npos - 1]
            if not want_positions:  # skip the payload, keep the offset
                off = p_end + 1
                continue
            pgaps = vb_decode(b[off : p_end + 1])
            off = p_end + 1
            # undo doc-major delta: cumsum within each doc run
            pos = np.cumsum(pgaps, dtype=np.uint64)
            run_starts = np.cumsum(tfs)[:-1].astype(np.int64)
            if run_starts.size:
                # subtract the carried-over cumsum at each run start
                carry = np.zeros(npos, dtype=np.uint64)
                carry_vals = pos[run_starts - 1]
                carry[run_starts] = carry_vals
                # propagate carry within runs via cumsum of a reset trick
                reset = np.zeros(npos, dtype=np.uint64)
                reset[run_starts] = carry_vals
                # positions within run r must subtract pos[run_start-1]
                seg_id = np.zeros(npos, dtype=np.int64)
                seg_id[run_starts] = 1
                seg_id = np.cumsum(seg_id)
                sub = np.concatenate(([np.uint64(0)], carry_vals))[seg_id]
                pos = pos - sub
            all_pos.append(pos)
    docs = np.concatenate(all_docs) if all_docs else np.empty(0, np.uint64)
    tfs = np.concatenate(all_tfs) if all_tfs else np.empty(0, np.uint64)
    pos = np.concatenate(all_pos) if all_pos else np.empty(0, np.uint64)
    return docs, tfs, pos
