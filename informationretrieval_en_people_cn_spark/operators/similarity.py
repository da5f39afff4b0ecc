"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one codegen'd scan, a
TakeOrderedAndProject, zero Python.  Scale paths:

* :func:`lsh_bucket_topk` — random-hyperplane LSH: probe only the
  query's bucket(s); recall < 1, cost ~ 1/2^bits of the scan.
* :func:`ivf_topk` — IVF: k-means-lite coarse quantizer (deterministic
  seeded init, few Lloyd rounds, all DataFrame ops), probe ``nprobe``
  nearest cells.  At 100 TB the centroid table is tiny (broadcast) and
  the cell assignment is a partition key, so a query touches
  nprobe/ncells of the data.

Reference analogue: the Doc2Vec side pipeline's brute-force cosine
argmin (``/root/reference/searchengine/Doc2VecMostSimilar.py:22-33``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine_expr(vec_col, query: list[float]):
    """cosine(vec, query) as a pure-Catalyst double expression.

    Deliberately the compact higher-order-function form: an unrolled
    per-element chain (dot+norm = 2·dim expression nodes) was measured
    3-4× SLOWER per query at dim 64 / small row counts — the plan's
    analysis+codegen cost dwarfs the interpreted element loop it
    removes (guide §1.2: per-task work only after the job shape is
    right).  Large scans that are genuinely compute-bound use the
    Arrow/numpy kernels (lsh_multitable_topk) instead of wider
    expression trees."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(vec_col, lambda x: x.cast("double"))
    qn = float(np.sqrt(np.dot(query, query))) or 1.0
    return _dot(v, q) / (_norm(v) * F.lit(qn))


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: exact baseline, fully distributed.

    orderBy+limit plans as TakeOrderedAndProject (per-partition heaps +
    driver merge) — the same bounded-top-k shape as the BM25 ranker.
    """
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_expr(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def lsh_signature_expr(vec_col, planes: np.ndarray):
    """Pack sign(v·h_i) into an integer bucket id — pure Catalyst
    (compact HOF dots; see the cosine_expr note on why unrolled chains
    lose here)."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for i, h in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in h])
        bit = F.when(_dot(v, plane) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_bucket_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k probing the query's LSH bucket ± ``multiprobe_hamming``.

    The bucket id is a materializable partition key: at scale, write the
    table partitioned by bucket and this query prunes to a handful of
    files before any compute (partition pruning does the work).
    """
    from itertools import combinations

    planes = hyperplanes(len(query), bits, seed)
    qsig = 0
    for i, h in enumerate(planes):
        if float(np.dot(query, h)) > 0:
            qsig |= 1 << i
    probe = {qsig}
    for r in range(1, multiprobe_hamming + 1):
        for flip in combinations(range(bits), r):
            sig = qsig
            for i in flip:
                sig ^= 1 << i
            probe.add(sig)
    bucketed = df.withColumn("bucket", lsh_signature_expr(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("bucket").isin(list(probe)))
    return cosine_topk(cand, query, k, vec_col=vec_col, id_col=id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantizer
# ---------------------------------------------------------------------------

def train_centroids(
    df: DataFrame,
    ncells: int = 16,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 3,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """k-means-lite: deterministic init (smallest xxhash64 of id picks
    the seeds), ``iters`` Lloyd rounds as DataFrame aggregations.
    Training may subsample (``sample_fraction``) — at 100 TB you train
    the quantizer on a sample, never the full table.
    """
    base = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    if sample_fraction:
        base = base.sample(sample_fraction, seed=seed)
    seeds = (
        base.withColumn("h", F.xxhash64(F.col("vid") + F.lit(seed)))
        .orderBy("h")
        .limit(ncells)
        .select("v")
        .collect()
    )
    cents = np.array([r.v for r in seeds], dtype=np.float64)

    pdf_schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType(), False),
            T.StructField("vsum", T.ArrayType(T.DoubleType()), False),
            T.StructField("n", T.LongType(), False),
        ]
    )
    for _ in range(iters):
        bc = base.sparkSession.sparkContext.broadcast(cents)

        def assign(batches):
            import pandas as pd

            c = bc.value
            for pdf in batches:
                vs = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
                d = ((vs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                cell = d.argmin(axis=1)
                rows = []
                for ci in np.unique(cell):
                    m = cell == ci
                    rows.append((int(ci), vs[m].sum(axis=0).tolist(), int(m.sum())))
                yield pd.DataFrame(rows, columns=["cell", "vsum", "n"])

        parts = base.select("v").mapInPandas(assign, pdf_schema)
        agg = (
            parts.groupBy("cell")
            .agg(
                F.aggregate(
                    F.collect_list("vsum"),
                    F.array(*[F.lit(0.0)] * cents.shape[1]),
                    lambda acc, x: F.zip_with(acc, x, lambda p, q: p + q),
                ).alias("vsum"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new = cents.copy()
        for r in agg:
            new[r.cell] = np.asarray(r.vsum) / max(r.n, 1)
        cents = new
        bc.unpersist()
    return cents


def sample_quantizer(
    df: DataFrame,
    ncells: int = 8,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic random-sample coarse quantizer: the ``ncells``
    vectors with the smallest md5(id) are the centroids — a seeded
    "random" sample that ANSI SQL can reproduce exactly (unlike k-means,
    whose centroid floats depend on aggregation order).  Random-sample
    quantizers are a standard IVF baseline; swap in
    :func:`train_centroids` when recall/cell-balance matters more than
    reproducibility."""
    rows = (
        df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
        .withColumn("h", F.md5(F.col("vid").cast("string")))
        .orderBy("h", "vid")
        .limit(ncells)
        .collect()
    )
    return np.array([[float(x) for x in r.v] for r in rows], dtype=np.float64)


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, *, vec_col: str = "embedding"
) -> DataFrame:
    """Attach the nearest-centroid cell id (Arrow-batched numpy)."""
    bc = df.sparkSession.sparkContext.broadcast(centroids)
    schema = T.StructType(df.schema.fields + [T.StructField("cell", T.IntegerType(), False)])

    def gen(batches):
        c = bc.value
        for pdf in batches:
            vs = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            d = ((vs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            pdf = pdf.copy()
            pdf["cell"] = d.argmin(axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(gen, schema)


def lsh_multitable_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k with L independent LSH tables (union of candidates).

    The production LSH design: a single table's recall/scan trade-off
    is poor (one unlucky hyperplane near the query loses the whole
    cluster); with L tables a near neighbor only needs to collide in
    ONE of them — recall 1-(1-p^bits)^L.  At scale each table is a
    partition-key column (probe = L partition lookups); here the
    candidate filter is ONE Arrow-batched numpy pass computing every
    table's signature (L×bits interpreted higher-order dot expressions
    were the measured cost — guide §4.2), bit-identical to
    :func:`lsh_signature_expr`: the per-bit dot replays the same
    sequential left-fold float64 order as the Catalyst ``aggregate``.
    """
    all_planes = [
        hyperplanes(len(query), bits, seed + 1000 * t) for t in range(tables)
    ]
    qsigs = []
    for planes in all_planes:
        qsig = 0
        for i, h in enumerate(planes):
            if float(np.dot(query, h)) > 0:
                qsig |= 1 << i
        qsigs.append(qsig)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vs = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            keep = np.zeros(len(pdf), dtype=bool)
            for planes, qsig in zip(all_planes, qsigs):
                sig = np.zeros(len(pdf), dtype=np.int64)
                for i, h in enumerate(planes):
                    # sequential fold, same float64 sequence as _dot
                    acc = np.zeros(len(pdf), dtype=np.float64)
                    for j in range(vs.shape[1]):
                        acc = acc + vs[:, j] * float(h[j])
                    sig |= (acc > 0).astype(np.int64) << np.int64(i)
                keep |= sig == qsig
            if keep.any():
                yield pdf[keep]

    cand = df.mapInPandas(gen, df.schema)
    return cosine_topk(cand, query, k, vec_col=vec_col, id_col=id_col)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "lsh",
    bits: int = 6,
    tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and cosine >= threshold — the embedding-space member of
    the dedup family (exact, MinHash-LSH, SimHash, n-gram Jaccard, and
    this).

    ``method="exact"``: all-pairs — complete, quadratic; the oracle /
    test-scale reference.  ``method="lsh"``: candidates share >= 1 of
    ``tables`` random-hyperplane buckets (the multi-table blocking from
    :func:`lsh_multitable_topk`), then exact cosine verification — at
    scale each table's bucket id is a join/partition key, so candidate
    generation is linear in practice; recall is probabilistic
    (1-(1-p^bits)^tables), asserted >= 0.9 on the clustered fixture.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("_id"), v.alias("_v"))
    if method == "exact":
        a = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
        b = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        dim = len(df.select(vec_col).first()[0])
        sigs = base
        for t in range(tables):
            planes = hyperplanes(dim, bits, seed + 1000 * t)
            sigs = sigs.withColumn(
                f"_b{t}", lsh_signature_expr(F.col("_v"), planes)
            )
        cand = None
        for t in range(tables):
            a = sigs.select(
                F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                F.col(f"_b{t}").alias("_bk"),
            )
            b = sigs.select(
                F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                F.col(f"_b{t}").alias("_bk"),
            )
            p = a.join(b, "_bk").filter(F.col("id_a") < F.col("id_b")).drop("_bk")
            cand = p if cand is None else cand.unionByName(p)
        cand = cand.dropDuplicates(["id_a", "id_b"])
    else:
        raise ValueError(f"unknown method {method!r}")
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        cand.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def synth_clustered_embeddings(
    spark,
    n: int = 2000,
    dim: int = 32,
    n_clusters: int = 20,
    spread: float = 0.08,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Gaussian-cluster embedding fixture.

    The driver's ``embeddings.parquet`` is uniform random, where ANY
    sublinear-scan method's recall is capped at ~the scan fraction —
    real embeddings cluster, so recall there is uninformative.  This
    fixture has the geometry ANN methods exploit: ``n_clusters``
    well-separated unit-ish centers with ``spread``-scaled noise.
    Columns: (vec_id, label, embedding array<float>).
    """
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, size=n)
    pts = centers[labels] + spread * rng.standard_normal((n, dim))
    rows = [
        (int(i), int(labels[i]), [float(x) for x in pts[i]]) for i in range(n)
    ]
    # one Arrow batch instead of a defaultParallelism-slice parallelize
    # (pickled rows with array cells cost ~1 s to materialize on
    # local[32]; see session.local_rows_df)
    from ..session import local_rows_df

    return local_rows_df(
        spark, rows, "vec_id long, label int, embedding array<float>"
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
) -> DataFrame:
    """Probe the ``nprobe`` nearest cells, exact cosine within them.

    ``assigned`` should be written partitioned by ``cell`` at scale so
    the `cell IN (...)` filter is partition pruning, not a scan.
    """
    q = np.asarray(query, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    cells = [int(c) for c in np.argsort(d)[:nprobe]]
    cand = assigned.filter(F.col("cell").isin(cells))
    return cosine_topk(cand, query, k, vec_col=vec_col, id_col=id_col)
