import pandas as pd

from informationretrieval_en_people_cn_spark.functions.analyze import (
    analyze_batch,
    analyze_query_term,
    analyze_text,
)
from informationretrieval_en_people_cn_spark.functions.porter import stem


def test_porter_golden():
    golden = {
        "caresses": "caress",
        "ponies": "poni",
        "relational": "relat",
        "conditional": "condit",
        "characters": "charact",  # matches the reference golden index
        "merging": "merg",
        "compression": "compress",
        "queries": "queri",
        "happy": "happi",
        "electrical": "electr",
        "adjustment": "adjust",
    }
    for w, want in golden.items():
        assert stem(w) == want, w


def test_identifier_splitting():
    assert analyze_text("parseHttpRequest", use_stemmer=False) == [
        "parse",
        "http",
        "request",
    ]
    assert analyze_text("token_stream", use_stemmer=False) == ["token", "stream"]
    assert analyze_text("parseHTTPRequest", use_stemmer=False) == [
        "parse",
        "http",
        "request",
    ]


def test_case_folding_merges_tokens():
    a = analyze_text("Characters characters", use_stemmer=True)
    assert a == ["charact", "charact"]


def test_term_length_filter():
    # single-char terms dropped (reference: 1 < len <= 128)
    assert analyze_text("a bb x", use_stemmer=False) == ["bb"]
    long = "z" * 200
    assert analyze_text(long, use_stemmer=False) == []


def test_non_ascii_passthrough():
    # reference golden row 3 edge case: non-ASCII must not crash
    out = analyze_text("some special §¸…· characters")
    assert "charact" in out


def test_batch_equals_rowwise():
    texts = pd.Series(
        ["return IF Else", "parseHttpRequest merging", "", "a §¸ b characters"]
    )
    batch = analyze_batch(texts).tolist()
    row = [analyze_text(t) for t in texts]
    assert batch == row


def test_query_analysis_matches_build():
    # the rank-identity linchpin: build and query analyzers are identical
    assert analyze_query_term("Merging") == analyze_text("Merging")[0]
    assert analyze_query_term("x") is None


def test_normalize_expr(spark):
    from informationretrieval_en_people_cn_spark.functions.analyze import (
        normalize_expr,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a\nb\r\nc，d！（e）。",), ("plain text",)], ["text"]
    )
    got = [r.n for r in df.select(normalize_expr("text").alias("n")).collect()]
    assert got == ["a b c,d!(e).", "plain text"]
