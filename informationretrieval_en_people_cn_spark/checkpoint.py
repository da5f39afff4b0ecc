"""Per-partition build manifests: lineage, metrics, resume.

Reference analogue: each worker writes ``{end_offset}_{i}_index.csv``
runs plus a ``{end_offset}_file_number.pickle`` manifest that the
driver uses to discover completed runs
(``/root/reference/searchengine/IndexCreator.py:75-84,183-191``).  The
rebuild's manifest is a small parquet table of committed work units;
on restart, slices whose ``(partition_id, fingerprint)`` already have a
``committed`` row are skipped without re-tokenizing (north_rule resume
clause).  Fingerprints are input-derived (doc counts + id bounds +
build config), never task ids, so resume is correct across different
parallelism levels.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import Row, SparkSession
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), True),
        T.StructField("n_terms", T.LongType(), True),
        T.StructField("n_postings", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
    ]
)


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def read_manifest(spark: SparkSession, out_dir: str):
    p = manifest_path(out_dir)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(p)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def committed(spark: SparkSession, out_dir: str) -> dict[tuple[str, int], str]:
    """Map (stage, partition_id) -> fingerprint for committed units."""
    rows = read_manifest(spark, out_dir).filter("status = 'committed'").collect()
    return {(r.stage, r.partition_id): r.fingerprint for r in rows}


def commit(
    spark: SparkSession,
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
    row = Row(
        partition_id=partition_id,
        stage=stage,
        fingerprint=fingerprint,
        path=path,
        n_docs=n_docs,
        n_terms=n_terms,
        n_postings=n_postings,
        wall_ms=wall_ms,
        status="committed",
        run_id=uuid.uuid4().hex,
    )
    spark.createDataFrame([row], MANIFEST_SCHEMA).write.mode("append").parquet(
        manifest_path(out_dir)
    )


def fingerprint_of(**kwargs) -> str:
    import hashlib

    return hashlib.sha256(
        json.dumps(kwargs, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]
