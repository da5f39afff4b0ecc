"""CLI — the spark-submit surface (north_rule: runs via
``spark-submit --py-files engine.zip -m`` on a real cluster; plain
``python -m informationretrieval_en_people_cn_spark`` locally).

Reference analogue: ``SearchEngine.py:298-313`` (``Index:comments.csv``
verb + queries-from-file loop).

    python -m informationretrieval_en_people_cn_spark build  --corpus DIR --out DIR [--resume]
    python -m informationretrieval_en_people_cn_spark search --index DIR "merge window" [-k 10] [--wand]
    python -m informationretrieval_en_people_cn_spark queries --index DIR --file queries.txt
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="informationretrieval_en_people_cn_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--corpus", required=True, help="parquet dir of the input_hint table")
    b.add_argument("--out", required=True)
    b.add_argument("--slices", type=int, default=4)
    b.add_argument("--salt", type=int, default=4)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--no-content", action="store_true")
    b.add_argument("--sorted-input", action="store_true")
    b.add_argument("--resume", action="store_true")

    s = sub.add_parser("search", help="run one query")
    s.add_argument("--index", required=True)
    s.add_argument("query")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--wand", action="store_true", help="driver-side block-max WAND path")

    q = sub.add_parser("queries", help="run a query file (one per line)")
    q.add_argument("--index", required=True)
    q.add_argument("--file", required=True)
    q.add_argument("-k", type=int, default=10)
    for sp in (s, q):
        sp.add_argument(
            "--edges",
            help="parquet of (src_doc_id, dst_doc_id) for ReplyTo queries",
        )
        sp.add_argument(
            "--fast",
            action="store_true",
            help="low-latency driver-side path (caches term stats + "
            "doclens; falls back to the distributed plan over budget)",
        )
        sp.add_argument(
            "--blockmax",
            action="store_true",
            help="distributed block-max pruning for ranked top-k "
            "(bucket-grid upper bounds; identical results)",
        )

    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark(app_name=f"ir-{args.cmd}")
    spark.sparkContext.setLogLevel("WARN")
    try:
        if args.cmd == "build":
            from .operators.build import build_index
            from .sources.corpus import with_doc_ids

            corpus = spark.read.parquet(args.corpus)
            if "doc_id" not in corpus.columns:
                corpus = with_doc_ids(corpus)
            paths = build_index(
                spark,
                corpus,
                args.out,
                slices=args.slices,
                salt=args.salt,
                store_positions=not args.no_positions,
                store_content=not args.no_content,
                sorted_input=args.sorted_input,
                resume=args.resume,
            )
            print(f"index written to {paths.out_dir}")
        else:
            from .plans.engine import SearchEngine

            edges = spark.read.parquet(args.edges) if args.edges else None
            eng = SearchEngine(
                spark,
                args.index,
                edges=edges,
                cache_term_stats=args.fast,
                cache_doclens=args.fast,
                use_blockmax=args.blockmax,
            )
            queries = (
                [args.query]
                if args.cmd == "search"
                else [
                    l.strip()
                    for l in open(args.file, encoding="utf-8")
                    if l.strip()
                ]
            )
            for query in queries:
                print(f"# {query}")
                try:
                    if args.cmd == "search" and args.wand:
                        for doc_id, score in eng.wand_search(query, k=args.k):
                            print(f"{doc_id}\t{score:.6f}")
                    else:
                        for r in eng.search(query, k=args.k).collect():
                            if hasattr(r, "score"):
                                print(f"{r.doc_id}\t{r.score:.6f}")
                            else:
                                print(r.doc_id)
                except Exception as e:  # one bad query must not kill the file
                    print(f"error: {type(e).__name__}: {e}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
