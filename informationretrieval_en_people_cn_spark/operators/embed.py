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


def produce_embeddings(
    df: DataFrame,
    weights,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Pandas-UDF embedding PRODUCER — the documented swap-in slot for a
    real model (sentence-transformers & co.): Arrow batches of text in,
    ``(doc_id, embedding: array<double>)`` rows out, feeding the same
    ANN stack (:mod:`similarity`) as :func:`embed_documents`.

    The frozen reference "model" here is a linear map: token-hash
    counts (``dim_in`` buckets, blake2b) through a fixed weight matrix
    ``weights`` of shape ``(dim_out, dim_in)``, L2-normalized.  Real
    weights, real batching — everything a torch/ONNX producer needs
    except the tensor library.  ``weights`` ships inside the UDF
    closure; for models beyond a few MB use
    ``sparkSession.sparkContext.broadcast`` and read ``bc.value`` in
    the generator instead.
    """
    import numpy as np

    w = np.asarray(weights, dtype=np.float64)
    dim_out, dim_in = w.shape
    schema = "doc_id long, embedding array<double>"

    def gen(batches):
        import hashlib

        import pandas as pd

        memo: dict[str, int] = {}

        def bucket(tok: str) -> int:
            b = memo.get(tok)
            if b is None:
                b = memo[tok] = (
                    int.from_bytes(
                        hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
                    )
                    % dim_in
                )
            return b

        for pdf in batches:
            out_ids, out_embs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                counts = np.zeros(dim_in)
                for tok in (text or "").lower().split():
                    counts[bucket(tok)] += 1.0
                v = w @ counts
                n = float(np.linalg.norm(v))
                if n == 0.0:
                    continue  # no signal: excluded (cosine undefined)
                if normalize:
                    v = v / n
                out_ids.append(int(doc_id))
                out_embs.append(v.tolist())
            yield pd.DataFrame({"doc_id": out_ids, "embedding": out_embs})

    return df.select(id_col, text_col).mapInPandas(gen, schema)
