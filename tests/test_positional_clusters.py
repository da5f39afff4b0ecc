"""Positional phrase matching + dedup connected components."""

import pytest


def test_positional_phrase_matches_token_oracle(engine, corpus_pdf):
    from informationretrieval_en_people_cn_spark.functions.analyze import analyze_text

    for phrase in ["posting merge", "return value", "token stream"]:
        seq = analyze_text(phrase)

        def contains_seq(terms):
            k = len(seq)
            return any(terms[i : i + k] == seq for i in range(len(terms) - k + 1))

        gold = {
            r.doc_id
            for r in corpus_pdf.itertuples()
            if contains_seq(analyze_text(r.content))
        }
        got = {
            r.doc_id for r in engine.phrase_docids_positional(phrase).collect()
        }
        assert got == gold, phrase


def test_positional_phrase_prefix_matches_token_oracle(engine, corpus_pdf):
    from informationretrieval_en_people_cn_spark.functions.analyze import analyze_text

    for phrase, sfx in [("posting", "me"), ("return", "va"), ("token", "st")]:
        seq = analyze_text(phrase)
        k = len(seq)

        def matches(terms):
            return any(
                terms[i : i + k] == seq and terms[i + k].startswith(sfx)
                for i in range(len(terms) - k)
            )

        gold = {
            r.doc_id
            for r in corpus_pdf.itertuples()
            if matches(analyze_text(r.content))
        }
        got = {
            r.doc_id
            for r in engine.phrase_prefix_docids_positional(phrase, sfx).collect()
        }
        assert got == gold, (phrase, sfx)
        assert gold, (phrase, sfx)  # fixture corpus must exercise the op


def test_positional_phrase_prefix_empty_expansion(engine):
    assert engine.phrase_prefix_docids_positional("posting", "zzqx").count() == 0


def test_positional_errors_without_positions(spark, corpus, tmp_path):
    from informationretrieval_en_people_cn_spark.operators.build import build_index
    from informationretrieval_en_people_cn_spark.plans.engine import SearchEngine

    out = str(tmp_path / "nopos")
    build_index(spark, corpus, out, slices=1, salt=2, store_positions=False)
    eng = SearchEngine(spark, out)
    with pytest.raises(Exception, match="store_positions"):
        eng.phrase_docids_positional("posting merge").collect()


def test_dedup_clusters(spark):
    from informationretrieval_en_people_cn_spark.operators.pipeline import (
        dedup_clusters,
    )

    # two components: {1,2,3,4} (chain) and {10,11}; 20-21-22 triangle
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["doc_a", "doc_b"],
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_clusters_end_to_end(spark):
    """Real near-dups through minhash -> clusters keep min doc_id."""
    from informationretrieval_en_people_cn_spark.operators.pipeline import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base + " extra"),          # near-dup of 1
        (3, base.replace("quick", "fast")),  # near-dup of 1
        (4, "completely different text about spark shuffle partitions and joins here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, num_hashes=64, bands=32, shingle_n=2, threshold=0.3)
    clusters = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert clusters.get(2) == 1 and clusters.get(3) == 1
    assert 4 not in clusters  # no near-dup pair involves doc 4
