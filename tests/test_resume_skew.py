"""Resume semantics + hot-term sharding (skew defense) + WAND path."""

import json
import os

import pytest
from pyspark.sql import functions as F


def test_hot_term_is_sharded(spark, index_dir):
    """Zipf-head terms ('return' dominates the synthetic corpus) must
    span multiple doc-range-disjoint index rows — the skew defense."""
    idx = spark.read.parquet(f"{index_dir}/index")
    hot = idx.filter(F.col("term") == "return").collect()
    assert len(hot) > 1  # sharded
    hot.sort(key=lambda r: r.first_doc)
    # range-disjoint: each shard's block range ends before the next starts
    for a, b in zip(hot, hot[1:]):
        assert a.blocks[-1].last_doc < b.first_doc


def test_resume_skips_tokenize(spark, corpus, tmp_path):
    """After a 'crash' between stage A and the merge, resume must redo
    ONLY the merge: committed run files are not rewritten."""
    from informationretrieval_en_people_cn_spark.operators.build import build_index

    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, slices=2, salt=2)

    # simulate a crash after stage A: drop the merge commit + artifacts
    manifest = os.path.join(out, "manifest.jsonl")
    rows = [json.loads(l) for l in open(manifest)]
    with open(manifest, "w") as f:
        for r in rows:
            if r["stage"] != "merge":
                f.write(json.dumps(r) + "\n")
    import shutil

    shutil.rmtree(os.path.join(out, "index"))

    run_files = []
    for root, _, files in os.walk(os.path.join(out, "runs")):
        for fn in files:
            p = os.path.join(root, fn)
            run_files.append((p, os.path.getmtime(p)))
    assert run_files

    build_index(spark, corpus, out, slices=2, salt=2, resume=True)

    # runs untouched (no re-tokenization), index rebuilt
    for p, mtime in run_files:
        assert os.path.getmtime(p) == mtime, p
    assert os.path.exists(os.path.join(out, "index"))
    assert spark.read.parquet(f"{out}/index").count() > 0


def test_wand_search_equals_distributed(engine):
    for q in ["merge window", "return value index", "compression buffer"]:
        got = engine.wand_search(q, k=10)
        want = [(r.doc_id, r.score) for r in engine.search(q, 10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_salt_config_invariance(spark, corpus, tmp_path):
    """Different slice/salt configs must produce identical decoded
    postings (sharding changes, content doesn't)."""
    import numpy as np

    from informationretrieval_en_people_cn_spark.functions.codec import decode_frames
    from informationretrieval_en_people_cn_spark.operators.build import build_index

    def postings_map(path):
        acc = {}
        for r in spark.read.parquet(f"{path}/index").collect():
            acc.setdefault(r.term, []).append(r)
        out = {}
        for term, rs in acc.items():
            rs.sort(key=lambda r: r.first_doc)
            d = np.concatenate(
                [decode_frames(bytes(r.postings))[0] for r in rs]
            ).tolist()
            t = np.concatenate(
                [decode_frames(bytes(r.postings))[1] for r in rs]
            ).tolist()
            out[term] = (d, t)
        return out

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(spark, corpus, a, slices=1, salt=1)
    build_index(spark, corpus, b, slices=3, salt=4)
    pa, pb = postings_map(a), postings_map(b)
    assert set(pa) == set(pb)
    for term in pa:
        assert pa[term] == pb[term], term
