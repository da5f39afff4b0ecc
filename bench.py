"""Benchmark harness: index-build throughput + query latencies.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "build": {...}}

The build is the full engine path (code-aware tokenize+stem pandas UDF,
salted posting merge, delta+varbyte, block-max metadata); queries run
through the parser + BM25 scorer against the built index.  Set
``SPARK_GRAFT_CPUS=8`` vs ``32`` on identical input for the two-
parallelism scaling evidence (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# the reference query-set shapes (queries.txt:1-14) ported to the
# documents-table vocabulary
QUERY_SET = {
    "q_keyword": "spark",
    "q_ranked_2term": "merge window",
    "q_ranked_3term": "merge window spark",
    "q_phrase": "'value table'",
    "q_bool_and": "spark AND merge",
    "q_bool_and4": "spark AND merge AND window AND join",
    "q_bool_not": "spark NOT window",
    "q_bool_or": "spark OR 'value table'",
    "q_prefix": "par*",
    "q_phrase_prefix": "'value ta'*",
    "q_ranked_mixed": "merge window 'value table'",
}


def main() -> None:
    from informationretrieval_en_people_cn_spark.operators.build import build_index
    from informationretrieval_en_people_cn_spark.plans.engine import SearchEngine
    from informationretrieval_en_people_cn_spark.session import get_spark
    from informationretrieval_en_people_cn_spark.sources.corpus import (
        documents_as_corpus,
    )

    spark = get_spark(app_name="bench", cores=CPUS, shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("ERROR")
    t_all = time.time()

    corpus = documents_as_corpus(spark, SF_DIR)
    n_docs = corpus.count()
    out = tempfile.mkdtemp(prefix="ir_bench_")
    # per-stage build timings (the reference's Report.py analogue)
    stage_log = os.path.join(out, "stages.log")
    os.environ["IR_BUILD_DEBUG"] = stage_log
    t0 = time.time()
    build_index(spark, corpus, out, slices=4, salt=4, store_positions=False)
    build_sec = time.time() - t0
    os.environ.pop("IR_BUILD_DEBUG", None)
    stages = {}
    if os.path.exists(stage_log):
        for line in open(stage_log):
            # "[build] <label>: <sec>s"
            body = line.strip().removeprefix("[build] ")
            label, _, val = body.rpartition(": ")
            if label and val.endswith("s"):
                stages[label] = float(val[:-1])

    # cached term stats + doclens enable the driver-side fast path for
    # budget-fitting queries (identical results; the distributed plan is
    # the fallback and stays the scale path — tested equal per shape).
    # cache_content (byte-budget-guarded) additionally answers phrase
    # verification driver-side, removing the verify-scan job from
    # phrase / phrase-prefix / OR-with-phrase-leaf shapes.
    # Both strategies are timed: q_* = fast path (the serving numbers),
    # q_*_dist = the distributed plan (the 100 TB plan shape).
    engine = SearchEngine(
        spark, out, cache_term_stats=True, cache_doclens=True, cache_content=True
    )
    engine_dist = SearchEngine(spark, out, cache_term_stats=True, fast_path=False)
    timings: dict[str, float] = {}
    for name, q in QUERY_SET.items():
        # fast path: median-of-3.  Distributed plan: min-of-2 — the keys
        # were single-shot through round 3 and the first shot pays ~3x
        # cold-start (JVM/codegen warmup), which round 3 misread as a
        # regression (q_phrase_dist 2.4x).  min-of-N is the steady-state
        # plan cost, the number the 100 TB shape comparison needs.
        for suffix, eng, reps, pick in (
            ("", engine, 3, lambda r: sorted(r)[len(r) // 2]),
            ("_dist", engine_dist, 2, min),
        ):
            runs = []
            for _ in range(reps):
                t0 = time.time()
                eng.search(q, k=10).collect()
                runs.append(time.time() - t0)
            timings[name + suffix] = round(pick(runs), 4)

    # serving mode (round 4): bucket-local DAAT / set-algebra plans —
    # per-bucket cluster-cached doclen arrays, only compressed frames
    # shuffle (the two-cluster-size throughput protocol's engine; see
    # BENCH/BASELINE.md §query-path scaling).  Timed per shape so the
    # plan's per-round drift stays visible at sf0.1 too.
    engine_serving = SearchEngine(
        spark, out, cache_term_stats=True, fast_path=False, persist_doclens=True
    )
    # round 5: phrase / phrase-prefix / OR-with-phrase / mixed-ranked
    # shapes are serving-covered too (bucket-local candidates + routed
    # verify; results bit-identical to the _dist twins — tested)
    for name in (
        "q_ranked_3term", "q_bool_and4", "q_bool_not",
        "q_phrase", "q_phrase_prefix", "q_bool_or", "q_ranked_mixed",
    ):
        q = QUERY_SET[name]
        runs = []
        for _ in range(2):
            t0 = time.time()
            engine_serving.search(q, k=10).collect()
            runs.append(time.time() - t0)
        timings[name + "_serving"] = round(min(runs), 4)

    # round 5: keyset pagination (frontier-bucket-pruned page) and
    # dictionary spell correction, timed on the serving engine
    runs = []
    for _ in range(2):
        t0 = time.time()
        engine_serving.search_page(
            QUERY_SET["q_bool_and4"], page_size=100,
            after_doc_id=engine_serving.n_docs // 2,
        ).collect()
        runs.append(time.time() - t0)
    timings["q_page_serving"] = round(min(runs), 4)
    runs = []
    for _ in range(2):
        t0 = time.time()
        engine_serving.correct_terms(
            ["sparc", "mergee", "windoq"], max_dist=2
        ).collect()
        runs.append(time.time() - t0)
    timings["fuzzy_correct"] = round(min(runs), 4)

    # round 5: executor-local decoded-frame cache (frame_cache=True).
    # min-of-2 means the second rep reads hot Zipf-head frames from the
    # worker-side LRU — the steady-state of a real serving tier, where
    # head terms recur across queries.  Compare vs q_ranked_3term_serving
    # (same plan, cache off) to read the decode share of serving cost.
    engine_cached = SearchEngine(
        spark, out, cache_term_stats=True, fast_path=False,
        persist_doclens=True, frame_cache=True,
    )
    runs = []
    for _ in range(3):
        t0 = time.time()
        engine_cached.search(QUERY_SET["q_ranked_3term"], k=10).collect()
        runs.append(time.time() - t0)
    timings["q_ranked_3term_cached"] = round(min(runs), 4)
    engine_cached._doclens_cluster.unpersist()
    engine_cached._bucket_doclens.unpersist()

    # round 5: batched multi-query serving — 4 ranked keyword queries
    # through ONE shared-kernel job (union of terms shuffles once, each
    # bucket decodes each term once).  Compare against the sum of the
    # three q_*_serving ranked keys to read the amortization.
    batch_qs = [
        QUERY_SET["q_ranked_3term"], QUERY_SET["q_ranked_2term"],
        QUERY_SET["q_keyword"], "merge compression posting buffer",
    ]
    runs = []
    for _ in range(2):
        t0 = time.time()
        engine_serving.search_batch(batch_qs, k=10).collect()
        runs.append(time.time() - t0)
    timings["q_batch4_serving"] = round(min(runs), 4)

    # pipeline headliners at the same SF
    from informationretrieval_en_people_cn_spark import api

    for name in ["minhash_pairs", "ann_cosine_topk", "term_stats"]:
        t0 = time.time()
        api.QUERIES[name](spark, SF_DIR).collect()
        timings[name] = round(time.time() - t0, 4)
    # n-gram jaccard with the at-scale config (hot-shingle cap bounds the
    # candidate join; the uncapped exact variant is the sf0.01 oracle check)
    from informationretrieval_en_people_cn_spark.operators import pipeline as pl
    from informationretrieval_en_people_cn_spark.session import scaled

    t0 = time.time()
    docs = scaled(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    pl.ngram_jaccard_pairs(docs, n=2, threshold=0.05, max_shingle_df=200).collect()
    timings["ngram_jaccard_capped"] = round(time.time() - t0, 4)
    # the fully-exact config (no stop-shingle cap) — the oracle-check
    # configuration, timed so capped-vs-exact stays visible per round
    t0 = time.time()
    pl.ngram_jaccard_pairs(docs, n=2, threshold=0.05, max_shingle_df=None).collect()
    timings["ngram_jaccard_exact"] = round(time.time() - t0, 4)
    # MinHash production config: fast hash family, hashed band buckets,
    # max_bucket cap — the at-scale path (the `minhash_pairs` key above
    # times the md5/exact-bands ORACLE config)
    t0 = time.time()
    pl.minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, shingle_n=2, threshold=0.3,
        hash_fn="blake2b", exact_bands=False, max_bucket=1000,
    ).collect()
    timings["minhash_pairs_banded"] = round(time.time() - t0, 4)
    # eval-set decontamination sweep (every 29th doc = the benchmark;
    # broadcast n-gram probe) and the deterministic stratified sample
    # (production xxhash64 family) at the same SF
    from pyspark.sql import functions as PF

    t0 = time.time()
    pl.decontaminate(docs, docs.filter(PF.col("doc_id") % 29 == 0), n=5).collect()
    timings["decontaminate"] = round(time.time() - t0, 4)
    t0 = time.time()
    pl.stratified_sample(
        docs, {"en": 0.5, "zh": 0.25, "fr": 0.1}, strata_col="lang"
    ).collect()
    timings["stratified_sample"] = round(time.time() - t0, 4)

    # ANN quality: recall@10 vs brute force on a CLUSTERED fixture (the
    # driver's embeddings.parquet is uniform random, where any sublinear
    # method's recall is capped at ~the scan fraction — meaningless; the
    # clustered fixture has the geometry ANN exploits).  Scan fractions
    # are MEASURED (candidates / pool), not nominal bucket counts.
    import numpy as np
    from pyspark.sql import functions as SF

    from informationretrieval_en_people_cn_spark.operators import similarity as sim

    emb = sim.synth_clustered_embeddings(spark, n=4000, dim=32, n_clusters=20).cache()
    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0].embedding]
    pool = emb.filter("vec_id <> 0").cache()
    n_pool = pool.count()
    exact = {r.vec_id for r in sim.cosine_topk(pool, qvec, 10).collect()}

    bits, tables = 6, 12
    lsh = {
        r.vec_id
        for r in sim.lsh_multitable_topk(pool, qvec, 10, bits=bits, tables=tables).collect()
    }
    bucketed, matches = pool, None
    for ti in range(tables):
        planes = sim.hyperplanes(32, bits, 42 + 1000 * ti)
        qsig = 0
        for i, h in enumerate(planes):
            if float(np.dot(qvec, h)) > 0:
                qsig |= 1 << i
        col = f"_t{ti}"
        bucketed = bucketed.withColumn(col, sim.lsh_signature_expr(SF.col("embedding"), planes))
        c = SF.col(col) == qsig
        matches = c if matches is None else (matches | c)
    lsh_scan = bucketed.filter(matches).count() / n_pool

    cents = sim.train_centroids(pool, ncells=16, iters=3)
    assigned = sim.ivf_assign(pool, cents).cache()
    d = ((cents - np.asarray(qvec)[None, :]) ** 2).sum(axis=1)
    cells = [int(c) for c in np.argsort(d)[:2]]
    ivf_scan = assigned.filter(SF.col("cell").isin(cells)).count() / n_pool
    ivf = {r.vec_id for r in sim.ivf_topk(assigned, cents, qvec, 10, nprobe=2).collect()}

    extras = {
        "ann_fixture": "gaussian-clustered n=4000 dim=32 k_clusters=20",
        "ann_lsh_multitable_recall_at_10": round(len(lsh & exact) / 10, 2),
        "ann_lsh_multitable_scan_fraction": round(lsh_scan, 3),
        "ann_ivf_recall_at_10": round(len(ivf & exact) / 10, 2),
        "ann_ivf_scan_fraction": round(ivf_scan, 3),
    }

    # distributed block-max pruning on a SKEWED corpus (VERDICT r2 #5):
    # one rare high-idf term confined to the top 2% of the doc-id range
    # + four ubiquitous filler terms across 300k docs.  The auto-selected
    # bucket-grid plan must prune the filler-only buckets AND beat the
    # exhaustive plan's wall time; results are identical (also asserted
    # in pytest).
    n_skew = 300_000
    hot_lo = int(n_skew * 0.98)
    skew = spark.range(n_skew).select(
        SF.col("id").alias("doc_id"),
        SF.lit("bench").alias("repo"),
        SF.concat(SF.lit("f"), SF.col("id")).alias("path"),
        SF.lit("0").alias("commit"),
        SF.lit("py").alias("lang"),
        SF.concat(
            SF.lit("hay straw grass field " * 3),
            SF.when(SF.col("id") >= hot_lo, SF.lit("needle " * 5)).otherwise(
                SF.lit("")
            ),
        ).alias("content"),
    ).withColumn("sha256", SF.sha2("content", 256))
    skew_dir = tempfile.mkdtemp(prefix="ir_skew_")
    t0 = time.time()
    build_index(
        spark, skew, skew_dir, slices=4, salt=8, use_stemmer=False,
        store_positions=False, store_content=False, sorted_input=True,
    )
    skew_build = time.time() - t0
    q_skew = "needle hay straw grass field"
    eng_bm = SearchEngine(
        spark, skew_dir, use_stemmer=False, cache_term_stats=True,
        fast_path=False,
        blockmax_min_sumdf=1_000_000,  # auto mode; Σdf here ≈ 1.2M
    )
    eng_ex = SearchEngine(
        spark, skew_dir, use_stemmer=False, cache_term_stats=True,
        fast_path=False, use_blockmax=False,
    )
    bm_runs, ex_runs = [], []
    bm_res = ex_res = None
    for _ in range(2):
        t0 = time.time()
        bm_res = eng_bm.search(q_skew, k=10).collect()
        bm_runs.append(time.time() - t0)
        t0 = time.time()
        ex_res = eng_ex.search(q_skew, k=10).collect()
        ex_runs.append(time.time() - t0)
    extras.update(
        {
            "blockmax_skew_docs": n_skew,
            "blockmax_buckets_scored": eng_bm.last_blockmax["buckets_scored"],
            "blockmax_buckets_total": eng_bm.last_blockmax["buckets_total"],
            "blockmax_sec": round(min(bm_runs), 4),
            "blockmax_exhaustive_sec": round(min(ex_runs), 4),
            "blockmax_skew_build_sec": round(skew_build, 3),
            "blockmax_equal": [
                (r.doc_id, round(r.score, 9)) for r in bm_res
            ] == [(r.doc_id, round(r.score, 9)) for r in ex_res],
        }
    )
    shutil.rmtree(skew_dir, ignore_errors=True)

    # serving-throughput protocol summary (VERDICT r4 #5): the 19.2M-doc
    # two-parallelism closed-loop suite takes hours, so it runs out of
    # band (python BENCH/scaling.py query — writes
    # BENCH/serving_scaling.json); its qps + window verdicts are
    # re-emitted here so every BENCH_r{N}.json carries them and a
    # regression is mechanical to spot against the recorded run.
    scaling_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "serving_scaling.json"
    )
    if os.path.exists(scaling_file):
        with open(scaling_file) as fh:
            by_mode = json.load(fh)
        for mode, prefix in (
            ("query", "serving"),
            ("query-phrase", "serving_phrase"),
            ("query-batch", "serving_batch"),
        ):
            ss = by_mode.get(mode)
            if not ss:
                continue
            extras.update(
                {
                    f"{prefix}_qps_8": ss.get("qps_8"),
                    f"{prefix}_qps_32": ss.get("qps_32"),
                    f"{prefix}_windows_passing": ss.get("windows_passing"),
                    f"{prefix}_windows_total": len(ss.get("windows", [])),
                    f"{prefix}_scaling_pass": ss.get("pass"),
                    f"{prefix}_median_eff_vs_ceiling": ss.get(
                        "median_eff_vs_ceiling"
                    ),
                    f"{prefix}_scaling_docs": ss.get("docs"),
                    f"{prefix}_scaling_recorded": ss.get("recorded"),
                }
            )

    total = round(time.time() - t_all, 3)
    print(
        json.dumps(
            {
                "metric": "index_build_plus_query_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "build": {
                    "build_sec": round(build_sec, 3),
                    "docs": n_docs,
                    "docs_per_sec": round(n_docs / build_sec, 1),
                    "cpus": CPUS,
                    "stages": stages,
                },
                "extras": extras,
            }
        )
    )
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
