"""The reference's actual dataset: ``comments.csv`` (+ dim tables).

Lets a user of the reference replay their real data through this
engine.  Two on-disk layouts exist in the reference:

* **standardized** 8-column order — cid, article_id, author_id, text,
  timestamp, parent_cid, upvotes, downvotes (``format_mail.txt``,
  ``standardize_format.py:29-30``; rows may carry 6-8 fields,
  ``IndexCreator.py:41-43``; ``''`` parent → -1, ``IndexCreator.py:55``)
* **raw crawl** order — cid, url, author, time, parent, likes,
  dislikes, text (``people_spider.py:43``; this is the layout of the
  golden ``searchengine/data/test/comments.csv``, parent ``'None'``)

Dimension tables ``articles.csv`` / ``authors.csv`` dictionary-encode
URLs/names; the reference loads them as line-number-indexed lists
(``IndexCreator.py:136-143``) — here they are plain (id, value) tables
decoded by a broadcast join at result-materialization time
(``SearchEngine.py:131-147`` re-parses the CSV line per result; the
rebuild's doc store is the docs/corpus table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMMENTS_SCHEMA = (
    "cid long, article_id int, author_id int, text string, "
    "ts string, parent_raw string, upvotes int, downvotes int"
)

RAW_CRAWL_SCHEMA = (
    "cid long, url string, author string, ts string, "
    "parent_raw string, upvotes int, downvotes int, text string"
)


def _parent(col):
    """'' / 'None' / NULL → -1 (P8 null sentinel, IndexCreator.py:55)."""
    return (
        F.when(
            F.col(col).isNull() | F.col(col).isin("", "None"), F.lit(-1)
        )
        .otherwise(F.col(col).cast("long"))
        .alias("parent_cid")
    )


def read_comments_csv(spark: SparkSession, path: str) -> DataFrame:
    """Standardized-format comments.csv -> typed comments table.

    Trailing optional fields (rows with 6-7 columns) arrive as NULL and
    default to 0 votes, matching ``SearchEngine.py:142-145``.
    """
    raw = spark.read.csv(path, schema=COMMENTS_SCHEMA, quote='"', escape='"')
    return raw.select(
        "cid",
        "article_id",
        "author_id",
        "text",
        "ts",
        _parent("parent_raw"),
        F.coalesce("upvotes", F.lit(0)).alias("upvotes"),
        F.coalesce("downvotes", F.lit(0)).alias("downvotes"),
    )


def read_raw_crawl_csv(spark: SparkSession, path: str) -> DataFrame:
    """Raw crawl-order comments.csv (the golden test file's layout)."""
    raw = spark.read.csv(path, schema=RAW_CRAWL_SCHEMA, quote='"', escape='"')
    return raw.select(
        "cid",
        "url",
        "author",
        "text",
        "ts",
        _parent("parent_raw"),
        F.coalesce("upvotes", F.lit(0)).alias("upvotes"),
        F.coalesce("downvotes", F.lit(0)).alias("downvotes"),
    )


def read_dim_csv(spark: SparkSession, path: str, value_name: str) -> DataFrame:
    """articles.csv / authors.csv -> (id, value) dimension table.

    The reference asserts id == line number and indexes a Python list
    (IndexCreator.py:136-143); as a table the id column itself is the
    join key, so density is not required.
    """
    raw = spark.read.csv(path, schema=f"id int, {value_name} string", quote='"')
    return raw


def comments_as_corpus(comments: DataFrame) -> DataFrame:
    """Comments table -> the engine's corpus shape (input_hint columns).

    doc_id = cid (already unique + deterministic; posting lists sort by
    it exactly as the reference's offsets sort by file order).
    """
    has_url = "url" in comments.columns
    return comments.select(
        F.col("cid").alias("doc_id"),
        (F.col("url") if has_url else F.lit("en.people.cn")).alias("repo"),
        F.concat(F.lit("comment/"), F.col("cid").cast("string")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("en").alias("lang"),
        F.col("text").alias("content"),
        F.sha2("text", 256).alias("sha256"),
    )


def comment_edges(comments: DataFrame) -> DataFrame:
    """(src_doc_id=cid, dst_doc_id=parent_cid) reply edges — the Q5
    ReplyTo relation (replaces the reference's reply_to_index dict,
    IndexCreator.py:56-60)."""
    return comments.filter(F.col("parent_cid") != -1).select(
        F.col("cid").alias("src_doc_id"),
        F.col("parent_cid").alias("dst_doc_id"),
    )


def materialize(
    results: DataFrame,
    comments: DataFrame,
    *,
    articles: DataFrame | None = None,
    authors: DataFrame | None = None,
) -> DataFrame:
    """Decode result doc_ids into display rows (J5 dimension joins).

    The reference seeks into comments.csv per result and list-indexes
    the dim arrays (SearchEngine.py:131-159); here it is one equi-join
    on the doc store plus broadcast joins on the tiny dim tables.
    Passing no dims yields the raw comment columns.
    """
    out = results.join(comments, results.doc_id == comments.cid, "left")
    if articles is not None:
        out = out.join(
            F.broadcast(articles.withColumnRenamed("id", "article_id")),
            "article_id",
            "left",
        )
    if authors is not None:
        out = out.join(
            F.broadcast(authors.withColumnRenamed("id", "author_id")),
            "author_id",
            "left",
        )
    keep = [c for c in out.columns if c not in ("cid", "parent_raw")]
    return out.select(*keep)
