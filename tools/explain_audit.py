"""Plan-quality audit: verifies the physical plans the engine relies on.

Checks (hard assertions, exit 1 on regression):
  * term / prefix / doc_id predicates push into the parquet FileScan
  * ranked top-k plans as TakeOrderedAndProject (bounded heap)
  * the query path uses broadcast joins, not sort-merge
  * term point lookups prune to a small fraction of index files

Run: python tools/explain_audit.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import input_file_name

    from informationretrieval_en_people_cn_spark.operators.build import build_index
    from informationretrieval_en_people_cn_spark.plans.engine import SearchEngine
    from informationretrieval_en_people_cn_spark.session import get_spark
    from informationretrieval_en_people_cn_spark.sources.corpus import (
        documents_as_corpus,
    )

    spark = get_spark(app_name="explain-audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = documents_as_corpus(spark, "/root/testdata/sf0.01")
    out = tempfile.mkdtemp(prefix="audit_")
    build_index(spark, corpus, out, slices=2, salt=4)
    eng = SearchEngine(spark, out)
    failures = []

    def check(name, ok, detail=""):
        print(f"{'ok  ' if ok else 'FAIL'} {name} {detail}")
        if not ok:
            failures.append(name)

    def qe(df):
        return df._jdf.queryExecution().toString()

    check(
        "term filter pushdown",
        "EqualTo(term,merg)" in qe(eng.index.filter(F.col("term") == "merg")),
    )
    check(
        "prefix pushdown",
        "StringStartsWith(term,par)"
        in qe(eng.index.filter(F.col("term").startswith("par"))),
    )
    check(
        "doc_id pushdown",
        "EqualTo(doc_id,42)" in qe(eng.docs.filter(F.col("doc_id") == 42)),
    )
    plan = (
        eng.search("merge window spark", k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check("top-k is TakeOrderedAndProject", "TakeOrderedAndProject" in plan)
    check("no SortMergeJoin in query path", "SortMergeJoin" not in plan)
    check("broadcast join present", "BroadcastHashJoin" in plan)

    nf_all = (
        spark.read.parquet(f"{out}/index")
        .select(input_file_name())
        .distinct()
        .count()
    )
    nf_hit = (
        eng.index.filter(F.col("term") == "merg")
        .select(input_file_name())
        .distinct()
        .count()
    )
    check("file pruning", nf_hit < nf_all, f"({nf_hit} of {nf_all} files)")
    spark.stop()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
