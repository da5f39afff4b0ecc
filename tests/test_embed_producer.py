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


@pytest.fixture(scope="module")
def topic_docs(spark):
    """10 topics × 30 docs from disjoint vocabularies (same geometry as
    the producer fixture, reused for the TRAINED model)."""
    import random

    rng = random.Random(23)
    rows = []
    for topic in range(10):
        vocab = [f"w{topic}_{j}" for j in range(30)]
        for d in range(30):
            words = [rng.choice(vocab) for _ in range(40)]
            rows.append((topic * 30 + d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_lsa_trained_embeddings_cluster_by_topic(spark, topic_docs):
    from informationretrieval_en_people_cn_spark.operators.embed import (
        lsa_embeddings,
        train_lsa_model,
    )

    model = train_lsa_model(topic_docs, dim=16, vocab_size=400, sample_docs=300)
    assert len(model["terms"]) == 300  # 10 topics × 30 disjoint words
    emb = {r.doc_id: np.asarray(r.embedding) for r in
           lsa_embeddings(topic_docs, model).collect()}
    assert len(emb) == 300
    for v in list(emb.values())[:5]:
        assert np.linalg.norm(v) == pytest.approx(1.0)
    # top-1 neighbor shares the query's topic for every probe doc
    ids = sorted(emb)
    mat = np.stack([emb[i] for i in ids])
    for probe in (0, 31, 155, 299):
        sims = mat @ emb[probe]
        sims[ids.index(probe)] = -2.0
        assert ids[int(np.argmax(sims))] // 30 == probe // 30


def test_lsa_model_fit_is_deterministic(spark, topic_docs):
    from informationretrieval_en_people_cn_spark.operators.embed import (
        train_lsa_model,
    )

    m1 = train_lsa_model(topic_docs, dim=8, vocab_size=100, sample_docs=120)
    m2 = train_lsa_model(
        topic_docs.repartition(7), dim=8, vocab_size=100, sample_docs=120
    )
    assert m1["terms"] == m2["terms"]
    assert np.array_equal(m1["vectors"], m2["vectors"])
    assert np.array_equal(m1["idf"], m2["idf"])


def test_embed_tfidf_weighting_downweights_common_terms(spark):
    from informationretrieval_en_people_cn_spark.operators.embed import (
        embed_documents,
    )

    # 'common' is in every doc (idf floor), 'rare*' in one each: under
    # tf-idf the rare-term distinction must dominate the shared term
    rows = [(i, f"common common common rare{i} rare{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = {r.doc_id: np.asarray(r.embedding) for r in
           embed_documents(docs, dim=32, weighting="tfidf").collect()}
    assert len(emb) == 20

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    sims = [cos(emb[0], emb[j]) for j in range(1, 20)]
    # under count weighting the shared 3×'common' mass dominates (cos
    # ~0.69); fitted idf must push cross-doc similarity well below that
    assert max(sims) < 0.5
