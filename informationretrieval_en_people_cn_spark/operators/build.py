"""Distributed inverted-index build (rebuilds IndexCreator.create_index).

Reference pipeline (`/root/reference/searchengine/IndexCreator.py`):
byte-split the CSV (py:159-168) → ≤2 worker processes tokenize+stem and
write sorted partial-index runs of 200k comments (py:23-133) → the
driver k-way-merges all runs single-threaded (py:259-348) → Huffman
compression pass (py:364-440).

Spark-first rebuild:

1. **Slices** = contiguous doc_id ranges (the analogue of the
   reference's byte-range splits).  Each slice tokenizes once via
   `mapInPandas`, pre-aggregates per (doc, term) inside the batch (no
   per-token shuffle rows), and writes an encoded *run* — checkpointed
   with a manifest row so a killed build resumes without re-tokenizing
   committed slices (north_rule; reference analogue:
   `{end_offset}_file_number.pickle`, IndexCreator.py:75-84,183-191).
2. **Salted repartition-by-term** inside each slice: group key is
   (term, salt) where salt is the doc-range bucket, so a Zipf-head term
   ("return" in code) splits across `salt` tasks instead of melting one
   reducer — AQE does not split groupBy skew, so this is explicit.
   Sub-lists are doc-range-disjoint by construction, so the second
   level concatenates already-encoded frames (cheap bytes concat), it
   never re-merges postings.
3. **Merge** replaces the reference's single-threaded k-way merge with
   one `groupBy(term)` over encoded runs: frames ordered by
   (slice, salt) = ascending doc ranges → byte concat.  Output index is
   range-partitioned + sorted by term so point/prefix lookups prune to
   one file via parquet min/max stats (the Spark-native seek list; the
   reference uses a DAWG, IndexCreator.py:340).
4. Postings are delta+varbyte `BinaryType` (north_rule; replaces the
   reference's digit-level Huffman, IndexCreator.py:400-410) with
   block-max metadata every `block_size` docs for WAND pruning.
"""

from __future__ import annotations

import os
import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import checkpoint as ckpt
from ..functions.analyze import analyze_batch
from ..functions.codec import encode_frame

POSTING_ROW_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
    ]
)

RUN_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
        T.StructField(
            "blocks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("last_doc", T.LongType(), False),
                        T.StructField("max_tf", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("postings", T.BinaryType(), False),
        T.StructField("blocks", RUN_SCHEMA["blocks"].dataType, False),
    ]
)


def tokenize_to_postings(
    corpus: DataFrame, *, use_stemmer: bool = True, store_positions: bool = True
) -> DataFrame:
    """corpus(doc_id, content) -> one row per (doc, term): tf + positions.

    T1-T4 in one Arrow-batched pass: the per-doc position grouping
    (reference IndexCreator.py:92-99) happens inside the batch, so the
    shuffle sees |doc×distinct-term| rows, not |tokens| rows.
    """

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            terms_lists = analyze_batch(pdf["content"], use_stemmer=use_stemmer)
            out_term, out_doc, out_tf, out_pos = [], [], [], []
            for doc_id, terms in zip(pdf["doc_id"], terms_lists):
                groups: dict[str, list[int]] = {}
                for p, t in enumerate(terms):
                    groups.setdefault(t, []).append(p)
                for t, plist in groups.items():
                    out_term.append(t)
                    out_doc.append(doc_id)
                    out_tf.append(len(plist))
                    out_pos.append(plist if store_positions else [])
            yield pd.DataFrame(
                {
                    "term": out_term,
                    "doc_id": out_doc,
                    "tf": out_tf,
                    "positions": out_pos,
                }
            )

    return corpus.select("doc_id", "content").mapInPandas(gen, POSTING_ROW_SCHEMA)


def _encode_run_group(block_size: int):
    """applyInPandas fn: one (term[, salt]) group -> one encoded frame row."""

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        docs = pdf["doc_id"].to_numpy(np.uint64)
        tfs = pdf["tf"].to_numpy(np.uint64)
        pos_lists = pdf["positions"].tolist()
        has_pos = any(len(p) for p in pos_lists)
        pos = (
            np.concatenate([np.asarray(p, dtype=np.uint64) for p in pos_lists])
            if has_pos
            else None
        )
        frame = encode_frame(docs, tfs, pos)
        blocks = [
            {
                "last_doc": int(docs[min(i + block_size, len(docs)) - 1]),
                "max_tf": int(tfs[i : i + block_size].max()),
            }
            for i in range(0, len(docs), block_size)
        ]
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "first_doc": [int(docs[0])],
                "df": [len(docs)],
                "cf": [int(tfs.sum())],
                "frame": [frame],
                "blocks": [blocks],
            }
        )

    return fn


def _merge_term_group():
    """applyInPandas fn: concat a term's doc-range-disjoint frames."""

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values("first_doc")
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "df": [int(pdf["df"].sum())],
                "cf": [int(pdf["cf"].sum())],
                "postings": [b"".join(pdf["frame"])],
                "blocks": [[b for bl in pdf["blocks"] for b in bl]],
            }
        )

    return fn


def _range_bucket(col: str, lo: int, span: int, n: int):
    """Monotone doc-range bucket in [0, n) — double math (no int64
    overflow for hash-sized ids); monotone in doc_id, so every bucket is
    a contiguous, disjoint doc range (the concat-merge invariant)."""
    frac = (F.col(col) - F.lit(lo)).cast("double") / F.lit(float(span))
    return F.least(F.lit(n - 1), F.floor(F.lit(float(n)) * frac).cast("int"))


def _doclens_from_runs(runs: DataFrame) -> DataFrame:
    """Explode encoded run frames back to (doc_id, tf) rows (numpy decode)."""
    from ..functions.codec import decode_frames

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("tf", T.LongType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            docs_out, tfs_out = [], []
            for frame in pdf["frame"]:
                d, t, _ = decode_frames(frame)
                docs_out.append(d.astype(np.int64))
                tfs_out.append(t.astype(np.int64))
            if docs_out:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(docs_out),
                        "tf": np.concatenate(tfs_out),
                    }
                )

    return runs.select("frame").mapInPandas(gen, schema)


class IndexPaths:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.docs = os.path.join(out_dir, "docs")
        self.index = os.path.join(out_dir, "index")
        self.stats = os.path.join(out_dir, "stats")
        self.runs = os.path.join(out_dir, "runs")


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    *,
    use_stemmer: bool = True,
    store_positions: bool = True,
    slices: int = 4,
    salt: int = 4,
    block_size: int = 128,
    index_files: int = 8,
    resume: bool = False,
) -> IndexPaths:
    """Build the full index at ``out_dir``.

    ``corpus`` must carry (doc_id, content, sha256, repo, path, commit,
    lang) — see sources.corpus.  Deterministic: same corpus + config →
    byte-identical postings regardless of parallelism or resume.
    """
    paths = IndexPaths(out_dir)
    done = ckpt.committed(spark, out_dir) if resume else {}

    bounds = corpus.agg(
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n_docs = bounds.lo, bounds.hi, bounds.n
    if n_docs == 0:  # empty corpus: write empty artifacts, stay loadable
        spark.createDataFrame([], INDEX_SCHEMA).write.mode("overwrite").parquet(
            paths.index
        )
        corpus.withColumn("doclen", F.lit(0).cast("long")).write.mode(
            "overwrite"
        ).parquet(paths.docs)
        spark.createDataFrame(
            [(0, 0, 0.0)], "n_docs long, collection_term_count long, avg_doclen double"
        ).write.mode("overwrite").parquet(paths.stats)
        return paths
    span = max(hi - lo + 1, 1)
    cfg_fp = ckpt.fingerprint_of(
        use_stemmer=use_stemmer,
        store_positions=store_positions,
        slices=slices,
        salt=salt,
        block_size=block_size,
        lo=lo,
        hi=hi,
        n=n_docs,
    )

    corpus_s = corpus.withColumn("slice", _range_bucket("doc_id", lo, span, slices))

    # -- Stage A: per-slice tokenization + salted run encoding (resumable)
    for s in range(slices):
        fp = ckpt.fingerprint_of(cfg=cfg_fp, slice=s)
        run_path = os.path.join(paths.runs, f"slice={s}")
        if done.get(("runs", s)) == fp:
            continue
        t0 = time.time()
        part = corpus_s.filter(F.col("slice") == s)
        postings = tokenize_to_postings(
            part, use_stemmer=use_stemmer, store_positions=store_positions
        )
        # Salt = doc-range bucket within the slice → sub-lists are
        # range-disjoint, merge is pure concat. Explicit skew defense:
        # groupBy skew is NOT split by AQE.
        salt_col = _range_bucket("doc_id", lo, span, slices * salt)
        runs = (
            postings.withColumn("salt", salt_col)
            .groupBy("term", "salt")
            .applyInPandas(_encode_run_group(block_size), RUN_SCHEMA)
        )
        runs.write.mode("overwrite").parquet(run_path)
        stats = spark.read.parquet(run_path).agg(
            F.count("*").alias("groups"),
            F.sum("df").alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
        ).collect()[0]
        ckpt.commit(
            spark,
            out_dir,
            partition_id=s,
            stage="runs",
            fingerprint=fp,
            path=run_path,
            n_docs=part.count(),
            n_terms=stats.n_terms or 0,
            n_postings=stats.n_postings or 0,
            wall_ms=int((time.time() - t0) * 1000),
        )

    # -- Stage B: distributed merge (replaces the single-threaded k-way
    # merge, IndexCreator.py:259-348). Frames per term are doc-range
    # disjoint across (slice, salt) → concat in first_doc order.
    fp_merge = ckpt.fingerprint_of(cfg=cfg_fp, stage="merge")
    if not (resume and done.get(("merge", -1)) == fp_merge):
        t0 = time.time()
        all_runs = spark.read.parquet(paths.runs)
        merged = all_runs.groupBy("term").applyInPandas(
            _merge_term_group(), INDEX_SCHEMA
        )
        (
            merged.repartitionByRange(index_files, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(paths.index)
        )

        # docs table: doclen = Σtf of indexed terms per doc (post-filter
        # length, consistent with BM25's |d|); zero-term docs kept.
        # Derived by DECODING the committed runs, never by re-tokenizing
        # (tokenize+stem is the expensive Python stage; resume must not
        # repeat it — north_rule).
        dl = _doclens_from_runs(all_runs).groupBy("doc_id").agg(
            F.sum("tf").alias("doclen")
        )
        # content kept in the docs table: it is the document store that
        # phrase verification re-reads (reference re-reads comments.csv
        # by offset, SearchEngine.py:131-147). At petabyte scale this
        # column stays in the source Iceberg table and the join targets
        # that table instead — same plan shape.
        docs = (
            corpus.select(
                "doc_id", "repo", "path", "commit", "lang", "content", "sha256"
            )
            .join(dl, "doc_id", "left")
            .withColumn("doclen", F.coalesce("doclen", F.lit(0)))
        )
        docs.repartitionByRange(index_files, "doc_id").sortWithinPartitions(
            "doc_id"
        ).write.mode("overwrite").parquet(paths.docs)

        stats_row = spark.read.parquet(paths.docs).agg(
            F.count("*").alias("n_docs"),
            F.sum("doclen").alias("collection_term_count"),
            F.avg("doclen").alias("avg_doclen"),
        )
        stats_row.write.mode("overwrite").parquet(paths.stats)
        ckpt.commit(
            spark,
            out_dir,
            partition_id=-1,
            stage="merge",
            fingerprint=fp_merge,
            path=paths.index,
            n_docs=n_docs,
            wall_ms=int((time.time() - t0) * 1000),
        )
    return paths
