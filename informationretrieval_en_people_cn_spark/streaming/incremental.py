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
    POINTER_NAME,
    SNAPLOG_NAME,
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
    import json

    paths = IndexPaths(out_dir)
    # pin the bucket grid in the manifest before any run lands: refresh
    # propagates it into the stats table so query-time bucket assignment
    # is arithmetic (same row build_index commits)
    ckpt.commit(
        out_dir,
        partition_id=-4,
        stage="grid",
        fingerprint=ckpt.fingerprint_of(lo=lo, span=span, buckets=buckets),
        path=json.dumps({"lo": int(lo), "span": int(span), "buckets": int(buckets)}),
    )

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


def _run_input_paths(out_dir: str) -> list[str]:
    """The run paths a refresh may merge, derived from the MANIFEST —
    never from a directory listing (ADVICE r2: stale run artifacts a
    config change left on disk — root-level files after fresh→resume,
    slice=N dirs from an older slice count — would duplicate postings).

    = the batch run set the last committed merge actually consumed
    (the ``run_inputs`` manifest row) + the latest committed
    ``stream_runs`` path per micro-batch id.
    """
    import json

    batch_inputs: list[str] = []
    best_ts = -1.0
    stream: dict[int, tuple[float, str]] = {}
    slices: dict[int, tuple[float, str]] = {}
    runs_all: tuple[float, str] | None = None
    for r in ckpt.read_manifest(out_dir):
        if r.get("status") != "committed":
            continue
        ts = float(r.get("ts", 0.0))
        if r["stage"] == "run_inputs" and ts > best_ts:
            best_ts, batch_inputs = ts, json.loads(r["path"])
        elif r["stage"] == "stream_runs":
            cur = stream.get(r["partition_id"])
            if cur is None or ts > cur[0]:
                stream[r["partition_id"]] = (ts, r["path"])
        elif r["stage"] == "runs":
            cur = slices.get(r["partition_id"])
            if cur is None or ts > cur[0]:
                slices[r["partition_id"]] = (ts, r["path"])
        elif r["stage"] == "runs_all" and (runs_all is None or ts > runs_all[0]):
            runs_all = (ts, r["path"])
    if not batch_inputs:  # manifest predates run_inputs rows: reconstruct
        if slices:
            batch_inputs = [p for _, p in sorted(slices.values(), key=lambda x: x[1])]
        elif runs_all is not None:
            batch_inputs = [runs_all[1]]
    return batch_inputs + [p for _, p in sorted(stream.values(), key=lambda x: x[1])]


def _commit_snapshot(out_dir: str, names: dict[str, str], version: int) -> None:
    """Atomic table-pointer commit (Iceberg-snapshot style): write the
    new pointer to a temp file, fsync, ``os.replace`` over the live
    pointer.  Readers resolve the pointer at open time and keep reading
    their resolved paths — the previous version's directories are kept
    for them (one-version GC happens on the NEXT refresh), so a swap
    never yanks files out from under a concurrent query.  Unlike
    rename-as-swap this also maps onto object stores (the pointer is a
    metastore row / small object; table data is immutable)."""
    import json
    import uuid

    ptr = os.path.join(out_dir, POINTER_NAME)
    tmp = os.path.join(out_dir, f".{POINTER_NAME}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"version": version, **names}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ptr)
    # append-only snapshot log (the Iceberg `snapshots` metadata table):
    # time-travel opens (IndexPaths(version=N)) resolve names here.
    # Appended AFTER the pointer swap so the log never lists an
    # uncommitted snapshot; a crash in between loses only the history
    # row, which IndexPaths reconstructs from the deterministic naming.
    import time as _time

    with open(os.path.join(out_dir, SNAPLOG_NAME), "a", encoding="utf-8") as f:
        f.write(json.dumps({"version": version, "ts": _time.time(), **names}) + "\n")
        f.flush()
        os.fsync(f.fileno())
    # fsync the directory so the rename itself survives a crash (readers
    # can never see a torn pointer either way, only a stale one — this
    # closes that stale-after-crash window on POSIX filesystems)
    try:
        dfd = os.open(out_dir, os.O_RDONLY | getattr(os, "O_DIRECTORY", 0))
    except OSError:
        return
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def refresh_index(
    spark: SparkSession,
    out_dir: str,
    *,
    corpus: DataFrame | None = None,
    block_size: int = 128,
    index_files: int = 8,
    retain_versions: int = 2,
) -> None:
    """Re-merge the committed runs (batch + streamed) into a NEW index
    snapshot AND rebuild the docs/stats tables, then atomically commit
    the snapshot pointer — so a SearchEngine opened afterwards sees
    streamed docs, while engines opened before keep their old version.

    Only compressed frames move; tokenization never re-runs (doc
    lengths are decoded from the committed runs).  Run inputs come from
    the manifest (see :func:`_run_input_paths`), so stale artifacts on
    disk are never merged.

    **Long-lived engines must reload():** a ``SearchEngine`` resolves
    the pointer once at open; after this commit it keeps serving the
    previous version, whose directories the NEXT refresh garbage-
    collects (one-version GC window).  Call ``engine.reload()`` after
    each refresh — an engine left un-reloaded across TWO refreshes is
    reading deleted paths.

    ``corpus`` — the source table covering
    every indexed doc — enriches the docs table with the corpus columns
    (content for phrase verification, repo / path / lang).  Without it
    the docs table carries (doc_id, doclen) only, which serves ranked +
    boolean lookups; docs that index zero terms are then absent, so
    n_docs counts indexed docs only.
    """
    import json
    import shutil

    from pyspark.sql import functions as F

    from ..operators.build import _doclens_from_runs

    old = IndexPaths(out_dir)  # current snapshot (pointer-resolved)
    run_inputs = _run_input_paths(out_dir)
    if not run_inputs:
        # dir predates run_inputs manifests (or is stream-only): every
        # committed stream batch appears as stream_runs rows; a missing
        # batch merge row means the runs dir holds exactly one build's
        # artifacts — the recursive read is then safe and kept as the
        # compatibility fallback
        run_inputs = [old.runs]
        all_runs = spark.read.option("recursiveFileLookup", "true").parquet(
            *run_inputs
        )
    else:
        all_runs = spark.read.parquet(*run_inputs)
    version = old.version + 1
    names = {
        "index": f"index_v{version}",
        "docs": f"docs_v{version}",
        "stats": f"stats_v{version}",
    }
    new_index = os.path.join(out_dir, names["index"])
    new_docs = os.path.join(out_dir, names["docs"])
    new_stats = os.path.join(out_dir, names["stats"])

    merged = (
        all_runs.groupBy("salt")
        .applyInPandas(_merge_bucket(block_size), INDEX_SCHEMA)
        .persist()
    )
    (
        merged.repartitionByRange(index_files, "term")
        .sortWithinPartitions("term", "first_doc")
        .write.mode("overwrite")
        .parquet(new_index)
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
    ).write.mode("overwrite").parquet(new_docs)
    stats = spark.read.parquet(new_docs).agg(
        F.count("*").alias("n_docs"),
        F.sum("doclen").alias("collection_term_count"),
        F.avg("doclen").alias("avg_doclen"),
    )
    grid = None  # latest committed bucket grid (build_index / stream start)
    for r in ckpt.read_manifest(out_dir):
        if r.get("status") == "committed" and r["stage"] == "grid":
            ts = float(r.get("ts", 0.0))
            if grid is None or ts >= grid[0]:
                grid = (ts, json.loads(r["path"]))
    if grid is not None:
        g = grid[1]
        stats = (
            stats.withColumn("bucket_lo", F.lit(int(g["lo"])).cast("long"))
            .withColumn("bucket_span", F.lit(int(g["span"])).cast("long"))
            .withColumn("bucket_count", F.lit(int(g["buckets"])).cast("int"))
        )
    stats.write.mode("overwrite").parquet(new_stats)

    _commit_snapshot(out_dir, names, version)

    # GC: keep the newest `retain_versions` snapshots (default 2 = the
    # new one + the immediately-previous, which stays on disk for
    # readers that resolved the pointer before this commit).  Deeper
    # retention (retain_versions > 2) keeps older snapshots openable
    # via time travel (SearchEngine(at_version=N) / IndexPaths).
    keep = {new_index, new_docs, new_stats, old.index, old.docs, old.stats}
    for v in range(version - max(2, int(retain_versions)) + 1):
        for kind in ("index", "docs", "stats"):
            p = os.path.join(out_dir, f"{kind}_v{v}" if v else kind)
            if p not in keep and os.path.exists(p):
                shutil.rmtree(p, ignore_errors=True)
