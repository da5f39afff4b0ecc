"""Deterministic document embeddings: hashed token projection.

Closes the reference's Doc2Vec loop (`/root/reference/searchengine/
Doc2Vec.py:41-49` trains gensim Doc2Vec; `Doc2VecMostSimilar.py:22-33`
does brute-force cosine) with a training-free, fully deterministic
analogue: the classic hashing-trick ("feature hashing") projection —
each indexed token hashes to one of ``dim`` buckets with a ±1 sign, the
document vector is the signed bucket-count histogram.  Same downstream
contract as Doc2Vec (an ``array`` embedding column feeding the ANN
stack in :mod:`similarity`), but reproducible in ANSI SQL, so the
driver's DuckDB oracle can value-check cosine top-k end-to-end.

Scale shape: explode tokens -> md5 bucket/sign (all JVM expressions,
codegen'd) -> one (doc_id, bucket) partial-agg shuffle (map-side
combine; at most ``dim`` rows survive per doc) -> dense array via a
``sequence`` transform over a bucket map.  No Python in the plan.

A real model (sentence-transformers etc.) swaps in as a Pandas-UDF
producer of the same (id, embedding) schema — the ANN stack and all
plans downstream are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyze import indexed_tokens_expr


def _hash64(col):
    """First 15 hex digits of md5 as a non-negative int64 — chosen over
    xxhash64 because DuckDB can replicate it exactly
    (``('0x' || substr(md5(t), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def embed_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """(doc_id, embedding: array<double>) hashed-projection embeddings.

    ``embedding[b] = Σ_tokens sign(t) · [bucket(t) = b]`` with
    ``bucket = h(t) mod dim`` and ``sign = ±1`` from the next hash bit.
    Un-normalized (cosine normalizes downstream); docs with zero
    indexed tokens are excluded (their vector is 0 — cosine undefined).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(indexed_tokens_expr(F.col(text_col))).alias("t"),
    )
    h = _hash64(F.col("t"))
    # sign bit = (h div dim) mod 2, computed as h mod 2*dim < dim so the
    # whole thing stays in exact int64 arithmetic (h / dim in Spark is
    # DOUBLE division — above 2^53 its floor diverges from integer div)
    comp = toks.select(
        "doc_id",
        (h % dim).alias("bucket"),
        F.when((h % (2 * dim)) < dim, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .alias("sgn"),
    )
    sparse = comp.groupBy("doc_id", "bucket").agg(F.sum("sgn").alias("v"))
    dense = sparse.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "v"))).alias("m")
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.coalesce(F.element_at(F.col("m"), b.cast("long")), F.lit(0.0)),
    )
    return dense.select(
        "doc_id", emb.alias("embedding")
    ).filter(F.aggregate("embedding", F.lit(0.0), lambda s, x: s + x * x) > 0)
