"""VERDICT r2 #8: the pluggable Pandas-UDF embedding producer feeds the
existing ANN stack end-to-end (swap-in contract of operators.embed)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def produced(spark):
    """10 topics x 30 docs from disjoint vocabularies -> producer
    embeddings cluster by topic (the geometry ANN exploits)."""
    import random

    from informationretrieval_en_people_cn_spark.operators.embed import (
        produce_embeddings,
    )

    rng = random.Random(11)
    rows = []
    for topic in range(10):
        vocab = [f"w{topic}_{j}" for j in range(30)]
        for d in range(30):
            words = [rng.choice(vocab) for _ in range(40)]
            rows.append((topic * 30 + d, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    w = np.random.RandomState(7).normal(size=(32, 256))  # frozen "model"
    emb = produce_embeddings(docs, w).cache()
    emb.count()
    return emb


def test_producer_contract_and_determinism(produced):
    rows = produced.collect()
    assert len(rows) == 300
    for r in rows[:5]:
        v = np.asarray(r.embedding)
        assert v.shape == (32,)
        assert np.linalg.norm(v) == pytest.approx(1.0)
    # deterministic: re-collect equals first collect
    again = {r.doc_id: tuple(r.embedding) for r in produced.collect()}
    assert {r.doc_id: tuple(r.embedding) for r in rows} == again


def test_ann_stack_over_producer_vectors(spark, produced):
    """Multi-table LSH and IVF over producer-generated vectors hit
    >=0.8 recall@10 vs brute force on a sub-0.5 measured scan fraction
    — the full ANN stack runs unchanged on swapped-in embeddings."""
    from informationretrieval_en_people_cn_spark.operators import similarity as sim

    qrow = produced.filter("doc_id = 0").collect()[0]
    qvec = [float(x) for x in qrow.embedding]
    pool = produced.filter("doc_id <> 0").cache()
    n_pool = pool.count()
    exact = {
        r.vec_id
        for r in sim.cosine_topk(pool, qvec, 10, id_col="doc_id").collect()
    }

    lsh = {
        r.vec_id
        for r in sim.lsh_multitable_topk(
            pool, qvec, 10, id_col="doc_id", bits=6, tables=12
        ).collect()
    }
    assert len(lsh & exact) / 10 >= 0.8

    cents = sim.train_centroids(pool, ncells=12, id_col="doc_id", iters=3)
    assigned = sim.ivf_assign(pool, cents).cache()
    ivf = {
        r.vec_id
        for r in sim.ivf_topk(
            assigned, cents, qvec, 10, id_col="doc_id", nprobe=3
        ).collect()
    }
    assert len(ivf & exact) / 10 >= 0.8
    # the probe actually pruned: candidates are a strict minority
    q = np.asarray(qvec)
    d = ((cents - q[None, :]) ** 2).sum(axis=1)
    cells = [int(c) for c in np.argsort(d)[:3]]
    scan = assigned.filter(F.col("cell").isin(cells)).count() / n_pool
    assert scan <= 0.5
