"""Incremental index maintenance via Structured Streaming.

The reference is batch-only (no watermarks/windows/state anywhere in
its 20 source files), but its run-file design maps directly onto
micro-batch maintenance: each micro-batch of new documents becomes one
more set of encoded posting runs appended to the runs directory, and
the merge is re-run over all runs (cheap: it only moves compressed
frames).  This is the Spark-native analogue of Lucene's
segment-append + merge.

Usage (batch-incremental, ``Trigger.AvailableNow``):

    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(in_dir)
    q = incremental_index(stream, out_dir, lo=..., span=..., buckets=...)
    q.awaitTermination()
    refresh_index(spark, out_dir)     # re-merge runs -> index table

Checkpointing: Structured Streaming's own checkpoint directory gives
exactly-once per micro-batch on top of our per-batch manifest rows —
a killed stream resumes from the last committed micro-batch without
re-tokenizing (the streaming face of the north_rule resume clause).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import checkpoint as ckpt
from ..operators.build import (
    INDEX_SCHEMA,
    IndexPaths,
    _merge_bucket,
    partition_runs,
)

CORPUS_SCHEMA = (
    "doc_id long, repo string, path string, commit string, "
    "lang string, content string, sha256 string"
)


def incremental_index(
    stream: DataFrame,
    out_dir: str,
    *,
    lo: int,
    span: int,
    buckets: int = 16,
    use_stemmer: bool = True,
    store_positions: bool = True,
    available_now: bool = True,
):
    """Start a stream appending encoded posting runs per micro-batch.

    ``lo``/``span`` fix the global doc-range bucketing up front (they
    must cover the id space of all future documents — e.g. 0 .. 2^63
    for hashed ids) so every micro-batch salts identically.
    """
    paths = IndexPaths(out_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        import time

        t0 = time.time()
        runs = partition_runs(
            batch_df,
            lo=lo,
            span=span,
            buckets=buckets,
            use_stemmer=use_stemmer,
            store_positions=store_positions,
        )
        run_path = os.path.join(paths.runs, f"stream_batch={batch_id}")
        runs.write.mode("overwrite").parquet(run_path)
        ckpt.commit(
            out_dir,
            partition_id=int(batch_id),
            stage="stream_runs",
            fingerprint=ckpt.fingerprint_of(batch_id=batch_id, buckets=buckets),
            path=run_path,
            n_docs=batch_df.count(),
            wall_ms=int((time.time() - t0) * 1000),
        )

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", os.path.join(out_dir, "stream_ckpt"))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _swap_in(path: str) -> None:
    """Promote ``path + '_new'`` over ``path`` via rename — readers see
    old or new, never a mix.  NOTE: rename-as-swap assumes a local /
    HDFS-like filesystem; on object stores use a metastore pointer (or
    Iceberg snapshot commit) instead."""
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path + "_old", ignore_errors=True)
        os.rename(path, path + "_old")
    os.rename(path + "_new", path)
    shutil.rmtree(path + "_old", ignore_errors=True)


def refresh_index(
    spark: SparkSession,
    out_dir: str,
    *,
    corpus: DataFrame | None = None,
    block_size: int = 128,
    index_files: int = 8,
) -> None:
    """Re-merge ALL runs (batch + streamed) into the index table AND
    rebuild the docs/stats tables, so the refreshed dir is fully
    loadable by SearchEngine and ranked queries see streamed docs.

    Only compressed frames move; tokenization never re-runs (doc
    lengths are decoded from the committed runs).  ``corpus`` — the
    source table covering every indexed doc — enriches the docs table
    with the corpus columns (content for phrase verification, repo /
    path / lang).  Without it the docs table carries (doc_id, doclen)
    only, which serves ranked + boolean lookups; docs that index zero
    terms are then absent, so n_docs counts indexed docs only.
    """
    from pyspark.sql import functions as F

    from ..operators.build import _doclens_from_runs

    paths = IndexPaths(out_dir)
    all_runs = spark.read.option("recursiveFileLookup", "true").parquet(paths.runs)
    merged = (
        all_runs.groupBy("salt")
        .applyInPandas(_merge_bucket(block_size), INDEX_SCHEMA)
        .persist()
    )
    (
        merged.repartitionByRange(index_files, "term")
        .sortWithinPartitions("term", "first_doc")
        .write.mode("overwrite")
        .parquet(paths.index + "_new")
    )
    merged.unpersist()

    # docs + stats from committed runs (round-1 advice: a stream-only
    # out_dir was unloadable, and a refreshed batch dir served stale
    # n_docs/avgdl while score_terms' docs join dropped streamed docs)
    dl = _doclens_from_runs(all_runs).groupBy("doc_id").agg(
        F.sum("tf").alias("doclen")
    )
    if corpus is not None:
        doc_cols = [
            c
            for c in ("doc_id", "repo", "path", "commit", "lang", "content", "sha256")
            if c in corpus.columns
        ]
        docs = (
            corpus.select(*doc_cols)
            .join(dl, "doc_id", "left")
            .withColumn("doclen", F.coalesce("doclen", F.lit(0)))
        )
    else:
        docs = dl
    docs.repartitionByRange(index_files, "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.mode("overwrite").parquet(paths.docs + "_new")
    stats = spark.read.parquet(paths.docs + "_new").agg(
        F.count("*").alias("n_docs"),
        F.sum("doclen").alias("collection_term_count"),
        F.avg("doclen").alias("avg_doclen"),
    )
    stats.write.mode("overwrite").parquet(paths.stats + "_new")

    _swap_in(paths.index)
    _swap_in(paths.docs)
    _swap_in(paths.stats)
