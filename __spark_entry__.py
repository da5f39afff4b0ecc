"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``informationretrieval_en_people_cn_spark.api``;
this file stays a thin re-export so the driver import is cheap.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: build the real inverted index (tokenize+stem →
    salted posting merge → delta+varbyte) over the sf0.001 documents
    table and run a ranked multi-term BM25 top-10 through the full
    parser/scorer path."""
    import tempfile

    from informationretrieval_en_people_cn_spark.operators.build import build_index
    from informationretrieval_en_people_cn_spark.plans.engine import SearchEngine
    from informationretrieval_en_people_cn_spark.sources.corpus import (
        documents_as_corpus,
    )

    sf_dir = "/root/testdata/sf0.001"
    corpus = documents_as_corpus(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="ir_flagship_")
    build_index(spark, corpus, out, slices=2, salt=2)
    return SearchEngine(spark, out).search("merge window spark", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from informationretrieval_en_people_cn_spark.api import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from informationretrieval_en_people_cn_spark.api import ORACLES, dynamic_oracles

    out = {k: v for k, v in ORACLES.items() if v}
    # data-dependent oracles (e.g. the stemmed flagship's inlined
    # (raw token -> stems) mapping) are generated lazily here
    out.update(dynamic_oracles())
    return out
