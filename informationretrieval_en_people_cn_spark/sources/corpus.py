"""Corpus sources: the input_hint table and mappings onto it.

BASELINE input_hint: an Iceberg-shaped table
``(repo:string, path:string, commit:string, lang:string,
content:string)`` — the rebuild's analogue of the reference's
``comments.csv`` (``/root/reference/searchengine/format_mail.txt``,
``Common.py:6-20``).  Two providers:

* :func:`synth_corpus` — deterministic seeded generator of source-code
  files (for unit tests and the resume/skew fixtures; reference
  analogue: the 3-row golden ``data/test/comments.csv``).
* :func:`documents_as_corpus` — maps the driver's read-only
  ``documents.parquet`` (doc_id, text, lang, source, n_chars) onto the
  input_hint shape (FIXTURES.md §1 mapping).

Both attach the driver-checked ingest invariant ``sha256(content)``
and a deterministic ``doc_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

_LANGS = ["py", "java", "c", "go", "md"]

# Deterministic vocabulary for synthetic source files. Includes a Zipf
# head ("return") for hot-term skew tests, stemmable English words,
# camelCase/snake_case identifiers, and tokens differing only by case
# (FIXTURES.md §1 content requirements).
_WORDS = [
    "return", "return", "return", "return", "return", "return",
    "if", "if", "if", "else", "for", "while", "def", "class",
    "import", "self", "value", "values", "index", "indexes",
    "parseHttpRequest", "parse_http_request", "TokenStream",
    "token_stream", "merge", "merged", "merging", "compression",
    "compressed", "posting", "postings", "query", "queries",
    "characters", "Characters", "relational", "optimization",
    "buffer", "offset", "partition", "shuffle",
]


def synth_corpus(
    spark: SparkSession, n_docs: int = 200, seed: int = 42, n_repos: int = 8
) -> DataFrame:
    """Deterministic synthetic input_hint table (pure function of args).

    Generation is driver-side for test scales; at real scale the corpus
    is a pre-existing Iceberg table — this generator only feeds tests.
    """
    import hashlib
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        repo = f"org/repo{i % n_repos}"
        lang = _LANGS[i % len(_LANGS)]
        path = f"src/module_{i // n_repos}/file_{i}.{lang}"
        n_lines = rng.randint(3, 20)
        lines = []
        for _ in range(n_lines):
            k = rng.randint(3, 9)
            lines.append(" ".join(rng.choice(_WORDS) for _ in range(k)))
        if i % 37 == 0:  # non-ASCII edge case (reference golden row 3)
            lines.append("some special §¸…· characters")
        content = "\n".join(lines)
        commit = hashlib.sha1(f"{repo}/{path}@{seed}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))
    return spark.createDataFrame(rows, schema=CORPUS_COLUMNS)


def with_doc_ids(corpus: DataFrame) -> DataFrame:
    """Attach deterministic doc_id + sha256 ingest invariant.

    The reference's docID is the byte offset into comments.csv
    (``IndexCreator.py:46-48,62``) — file order, hence deterministic.
    Our analogue must be deterministic *and* distributed: a global
    row_number would serialize on one partition, so doc_id is a
    content-independent 63-bit hash of the unique key (repo, path,
    commit).  Posting lists stay sorted by doc_id; density is not
    required, only stable total order.
    """
    key = F.concat_ws("\x01", "repo", "path", "commit")
    return corpus.select(
        (F.abs(F.xxhash64(key))).alias("doc_id"),
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.sha2("content", 256).alias("sha256"),
    )


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver testdata ``documents`` table -> input_hint shape.

    Mapping per FIXTURES.md §1: doc_id→path, text→content, source→repo,
    constant commit. Keeps the original integer doc_id (already dense
    and deterministic).

    No repartition here (guide §2.4 — remove shuffles outright): every
    expensive consumer goes through ``build_index``, whose stage A
    range-partitions by doc_id itself, so a round-robin ``scaled()``
    exchange upstream (plus its sort-before-repartition) was a second
    full shuffle of the corpus that bought nothing.  At real scale the
    parquet input carries its own splits.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("sha256"),
    )
