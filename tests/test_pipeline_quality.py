"""Round-4 training-data-pipeline operators: repetition filters + PII
scrub (Gopher/C4 and CCNet/FineWeb analogues)."""

import pytest
from pyspark.sql import functions as F


def _doc(spark, text, doc_id=0):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_repetition_dup_line_frac(spark):
    from informationretrieval_en_people_cn_spark.operators.pipeline import (
        repetition_features,
    )

    # 4 non-empty lines, 2 distinct -> dup fraction 0.5; blank line ignored
    r = repetition_features(_doc(spark, "aa bb\ncc dd\n\naa bb\ncc dd")).first()
    assert r.n_lines == 4
    assert r.dup_line_frac == pytest.approx(0.5)


def test_repetition_top_bigram_frac(spark):
    from informationretrieval_en_people_cn_spark.operators.pipeline import (
        repetition_features,
    )

    # bigrams: (aa bb) x2, (bb aa), (bb cc) -> top = 2/4
    r = repetition_features(_doc(spark, "aa bb aa bb cc")).first()
    assert r.top_bigram_frac == pytest.approx(0.5)
    # degenerate repetition maxes out: every bigram identical
    r = repetition_features(_doc(spark, "aa aa aa aa aa")).first()
    assert r.top_bigram_frac == pytest.approx(1.0)


def test_repetition_short_doc_zero(spark):
    from informationretrieval_en_people_cn_spark.operators.pipeline import (
        repetition_features,
    )

    r = repetition_features(_doc(spark, "single")).first()
    assert r.top_bigram_frac == 0.0 and r.dup_line_frac == 0.0


def test_scrub_pii_redacts_and_counts(spark):
    from informationretrieval_en_people_cn_spark.operators.pipeline import scrub_pii

    r = scrub_pii(
        _doc(spark, "mail a.b+c@ex-1.org or x@y.io, host 192.168.0.1, id 1234567890")
    ).first()
    assert r.n_email == 2 and r.n_ip == 1 and r.n_num == 1
    assert r.scrubbed == "mail <EMAIL> or <EMAIL>, host <IP>, id <NUM>"


def test_scrub_pii_stage_order(spark):
    from informationretrieval_en_people_cn_spark.operators.pipeline import scrub_pii

    # the email's 9+-digit local part must be consumed by the EMAIL
    # pass, never double-counted by the later NUM pass; short digit
    # runs and bare words survive untouched
    r = scrub_pii(_doc(spark, "123456789012@example.com port 8080")).first()
    assert (r.n_email, r.n_ip, r.n_num) == (1, 0, 0)
    assert r.scrubbed == "<EMAIL> port 8080"


def test_scrub_pii_no_pii_is_identity(spark):
    from informationretrieval_en_people_cn_spark.operators.pipeline import scrub_pii

    text = "def main(): return value # v1.2.3"
    r = scrub_pii(_doc(spark, text)).first()
    assert r.scrubbed == text and (r.n_email, r.n_ip, r.n_num) == (0, 0, 0)
