"""Per-partition build manifests: lineage, metrics, resume.

Reference analogue: each worker writes ``{end_offset}_{i}_index.csv``
runs plus a ``{end_offset}_file_number.pickle`` manifest that the
driver uses to discover completed runs
(``/root/reference/searchengine/IndexCreator.py:75-84,183-191``).  The
rebuild's manifest is a JSON-lines file of committed work units —
driver-side metadata, exactly like Iceberg's manifest files: tiny,
atomic-appended, never a Spark job (a 1-row Spark write costs a whole
job's scheduling overhead and would dominate small builds).

On restart, slices whose ``(stage, partition_id, fingerprint)`` already
have a ``committed`` row are skipped without re-tokenizing (north_rule
resume clause).  Fingerprints are input-derived (doc counts + id bounds
+ build config), never task ids, so resume is correct across different
parallelism levels.
"""

from __future__ import annotations

import json
import os
import time
import uuid

MANIFEST_FIELDS = [
    "partition_id", "stage", "fingerprint", "path",
    "n_docs", "n_terms", "n_postings", "wall_ms", "status", "run_id", "ts",
]


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_manifest(out_dir: str) -> list[dict]:
    p = manifest_path(out_dir)
    if not os.path.exists(p):
        return []
    rows = []
    with open(p, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                # torn line from a crash mid-append: skip it — the unit
                # it described simply re-runs (this is the crash-resume
                # guarantee commit() promises)
                continue
    return rows


def committed(out_dir: str) -> dict[tuple[str, int], str]:
    """Map (stage, partition_id) -> fingerprint for committed units."""
    return {
        (r["stage"], r["partition_id"]): r["fingerprint"]
        for r in read_manifest(out_dir)
        if r["status"] == "committed"
    }


def commit(
    out_dir: str,
    *,
    partition_id: int,
    stage: str,
    fingerprint: str,
    path: str,
    n_docs: int = 0,
    n_terms: int = 0,
    n_postings: int = 0,
    wall_ms: int = 0,
) -> None:
    """Atomic append of one committed-unit row (write + flush; a torn
    final line is ignored by the reader, so a crash mid-commit is safe
    — the unit simply re-runs)."""
    os.makedirs(out_dir, exist_ok=True)
    row = {
        "partition_id": partition_id,
        "stage": stage,
        "fingerprint": fingerprint,
        "path": path,
        "n_docs": n_docs,
        "n_terms": n_terms,
        "n_postings": n_postings,
        "wall_ms": wall_ms,
        "status": "committed",
        "run_id": uuid.uuid4().hex,
        "ts": time.time(),
    }
    with open(manifest_path(out_dir), "a", encoding="utf-8") as f:
        f.write(json.dumps(row) + "\n")
        f.flush()
        os.fsync(f.fileno())


def fingerprint_of(**kwargs) -> str:
    import hashlib

    return hashlib.sha256(
        json.dumps(kwargs, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]
