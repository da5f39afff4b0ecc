import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from informationretrieval_en_people_cn_spark.functions.codec import (
    decode_frames,
    encode_frame,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


@given(
    st.lists(
        st.tuples(st.integers(0, 10**12), st.integers(1, 50)),
        min_size=1,
        max_size=120,
        unique_by=lambda x: x[0],
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=100, deadline=None)
def test_frame_roundtrip(doc_tfs, rnd):
    doc_tfs.sort()
    docs = np.array([d for d, _ in doc_tfs], dtype=np.uint64)
    tfs = np.array([t for _, t in doc_tfs], dtype=np.uint64)
    pos = np.concatenate(
        [
            np.sort(
                np.array(
                    rnd.sample(range(10000), int(t)), dtype=np.uint64
                )
            )
            for t in tfs
        ]
    )
    d, t, p = decode_frames(encode_frame(docs, tfs, pos))
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(p, pos)


def test_frame_concat_is_valid_stream():
    b1 = encode_frame(
        np.array([1, 5, 9]), np.array([1, 2, 1]), np.array([0, 3, 7, 2])
    )
    b2 = encode_frame(np.array([100, 200]), np.array([1, 1]), np.array([5, 9]))
    d, t, p = decode_frames(b1 + b2)
    assert d.tolist() == [1, 5, 9, 100, 200]
    assert t.tolist() == [1, 2, 1, 1, 1]
    assert p.tolist() == [0, 3, 7, 2, 5, 9]


def test_tf_only_frame():
    d, t, p = decode_frames(encode_frame(np.array([3, 4]), np.array([2, 2])))
    assert d.tolist() == [3, 4] and t.tolist() == [2, 2] and p.size == 0


def test_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0
    assert encode_frame(np.array([]), np.array([])) == b""
