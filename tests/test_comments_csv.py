"""Ingesting the reference's actual dataset shape (comments.csv) and
materializing results with dimension decode."""

import os

import pytest

GOLDEN = "/root/reference/searchengine/data/test/comments.csv"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference not mounted")
def test_golden_three_row_csv_end_to_end(spark, tmp_path):
    """The reference's golden 3-row file (raw crawl layout): ingest ->
    build -> stemmed keyword search -> materialize."""
    from informationretrieval_en_people_cn_spark.operators.build import build_index
    from informationretrieval_en_people_cn_spark.plans.engine import SearchEngine
    from informationretrieval_en_people_cn_spark.sources.comments_csv import (
        comments_as_corpus,
        materialize,
        read_raw_crawl_csv,
    )

    comments = read_raw_crawl_csv(spark, GOLDEN)
    rows = {r.cid: r for r in comments.collect()}
    assert set(rows) == {1767167970, 1766936418, 1766866409}
    assert all(r.parent_cid == -1 for r in rows.values())  # 'None' sentinel
    assert rows[1766866409].text == "some special §¸…· characters"

    corpus = comments_as_corpus(comments)
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, slices=1, salt=1)
    eng = SearchEngine(spark, out)

    # stemmed retrieval: 'characters' -> 'charact' (the golden
    # expected_index.csv stems it the same way)
    got = {r.doc_id for r in eng.search("characters", k=10).collect()}
    assert got == {1766866409}
    got = {r.doc_id for r in eng.search("tragic", k=10).collect()}
    assert got == {1767167970}

    res = eng.search("tragic", k=10).select("doc_id")
    mat = materialize(res, comments).collect()
    assert len(mat) == 1
    assert mat[0].author == "klive"
    assert mat[0].url.startswith("http://en.people.cn/")


def test_standardized_csv_sentinels_votes_and_replyto(spark, tmp_path):
    """Standardized 8-column layout: '' parent -> -1, 6-field rows get 0
    votes, reply edges feed the Q5 ReplyTo relation, dim decode joins."""
    from informationretrieval_en_people_cn_spark.operators.build import build_index
    from informationretrieval_en_people_cn_spark.plans.engine import SearchEngine
    from informationretrieval_en_people_cn_spark.sources.comments_csv import (
        comment_edges,
        comments_as_corpus,
        materialize,
        read_comments_csv,
        read_dim_csv,
    )

    csv_path = str(tmp_path / "comments.csv")
    with open(csv_path, "w", encoding="utf-8") as f:
        f.write('"10","0","0","the merge window is open","2015-01-01T00:00:00","","3","1"\n')
        f.write('"11","0","1","reply about the merge","2015-01-01T00:01:00","10"\n')
        f.write('"12","1","0","unrelated text entirely","2015-01-01T00:02:00","","0","0"\n')
    for name, vals in [("articles.csv", ["http://a/0", "http://a/1"]),
                       ("authors.csv", ["alice", "bob"])]:
        with open(str(tmp_path / name), "w", encoding="utf-8") as f:
            for i, v in enumerate(vals):
                f.write(f"{i},{v}\n")

    comments = read_comments_csv(spark, csv_path)
    rows = {r.cid: r for r in comments.collect()}
    assert rows[10].parent_cid == -1 and rows[10].upvotes == 3
    assert rows[11].parent_cid == 10
    assert rows[11].upvotes == 0 and rows[11].downvotes == 0  # 6-field row

    corpus = comments_as_corpus(comments)
    assert {r.doc_id for r in corpus.select("doc_id").collect()} == {10, 11, 12}
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, slices=1, salt=1)
    eng = SearchEngine(spark, out, edges=comment_edges(comments))

    got = {r.doc_id for r in eng.search("merge", k=10).collect()}
    assert got == {10, 11}
    # ReplyTo: children of cid 10 (reference Q5, rebuilt as an edge join)
    got = {r.doc_id for r in eng.search("ReplyTo:10", k=10).collect()}
    assert got == {11}

    articles = read_dim_csv(spark, str(tmp_path / "articles.csv"), "article_url")
    authors = read_dim_csv(spark, str(tmp_path / "authors.csv"), "author_name")
    res = eng.search("merge", k=10).select("doc_id")
    mat = {r.doc_id: r for r in materialize(
        res, comments, articles=articles, authors=authors
    ).collect()}
    assert mat[10].author_name == "alice" and mat[10].article_url == "http://a/0"
    assert mat[11].author_name == "bob"
