"""Analyzer: tokenize + normalize + stem — the rebuild's T1-T3.

The reference tokenizes with nltk sent/Toktok tokenizers and stems with
Snowball (``/root/reference/searchengine/IndexCreator.py:49-52``; the
query side re-uses the identical objects, ``SearchEngine.py:35-36,
178-180``).  For a source-code corpus (BASELINE input_hint) the
analogue is a code-aware tokenizer: extract identifier/word runs,
split snake_case and camelCase, lowercase, Porter-stem, and keep terms
with ``1 < len(term) <= 128`` (the reference's bound,
``IndexCreator.py:112,300``).

Two surfaces:

* :func:`tokens_expr` — a pure-Catalyst (JVM, codegen'd) tokenizer used
  where stemming is not required; stays entirely out of Python.
* :func:`analyze_batch` / :func:`analyze_text` — the full pipeline for
  the inverted index, applied batch-wise inside pandas UDFs
  (`mapInPandas`), never per-row Python in a Spark ``udf()``.

Build path and query path MUST call the same functions here — the
reference's hard-won invariant (shared tokenizer/stemmer objects).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .porter import stem as porter_stem

# Word/identifier runs. Matches the DuckDB-oracle regex exactly (see
# __spark_entry__.py oracle_sql) so the SQL oracle and the engine agree.
TOKEN_PATTERN = r"[a-z0-9_]+"

# Code-aware raw-token pattern (applied before case folding): grabs
# identifier-ish runs incl. camelCase humps handled by _split_ident.
_RAW_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
_CAMEL_RE = re.compile(
    r"[A-Z]+(?=[A-Z][a-z0-9])|[A-Z]?[a-z0-9]+|[A-Z]+|[0-9]+"
)

MIN_TERM_LEN = 2    # reference: 1 < len  (IndexCreator.py:112)
MAX_TERM_LEN = 128  # reference: len <= 128


def tokens_expr(col: str | Column) -> Column:
    """JVM-side tokenizer: lowercase word runs, no stemming.

    Reference analogue: T1+T2 without T3. Whole-stage-codegen friendly;
    used by the oracle-checked queries and doc-length stats.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


# P3 (reference tools.py:22-39): CJK fullwidth punctuation -> ASCII.
# Kept as parallel from/to strings for translate().
CJK_FROM = "，！？；：（）［］【】。"
CJK_TO = ",!?;:()[][]."


def normalize_expr(col: str | Column) -> Column:
    """Ingest normalization P2+P3 (reference ``tools.py:9-19,22-39``):
    newlines -> single spaces, CJK fullwidth punctuation -> ASCII.
    Pure Catalyst (regexp_replace + translate), codegen'd.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.regexp_replace(c, r"[\r\n]+", " "), CJK_FROM, CJK_TO)


def indexed_tokens_expr(col: str | Column) -> Column:
    """JVM tokenizer + the reference's indexable-length bound
    (1 < len <= 128, IndexCreator.py:112) — the token stream the index,
    shingles, and oracle-checked queries all share."""
    return F.filter(
        tokens_expr(col),
        lambda t: F.length(t).between(MIN_TERM_LEN, MAX_TERM_LEN),
    )


def _split_ident(token: str) -> list[str]:
    """Split snake_case/camelCase identifiers into subtokens.

    ``parseHTTPRequest`` -> [parse, HTTP, Request]; ``foo_bar`` ->
    [foo, bar]. Pure function — identical on build and query paths.
    """
    parts: list[str] = []
    for piece in token.split("_"):
        if not piece:
            continue
        parts.extend(_CAMEL_RE.findall(piece))
    return parts


def analyze_text(text: str, *, use_stemmer: bool = True) -> list[str]:
    """Full analyzer for ONE document: returns the ordered term list.

    Order matters: positions in the posting lists are indexes into this
    list (reference stores per-term position lists,
    ``IndexCreator.py:95-99``).
    """
    out: list[str] = []
    for raw in _RAW_TOKEN_RE.findall(text):
        for sub in _split_ident(raw):
            term = sub.lower()
            if use_stemmer:
                term = porter_stem(term)
            if MIN_TERM_LEN <= len(term) <= MAX_TERM_LEN:
                out.append(term)
    return out


# Worker-process-level raw-token → term-list memo (one dict per
# stemmer mode).  Module globals survive across tasks in a reused
# Python worker (spark.python.worker.reuse, the default), so the
# Zipf-head vocabulary is analyzed once per worker, not once per task
# or batch (optimization guide §4.5).  The mapping is a pure function
# of (raw token, use_stemmer) — caching it is semantics-free.  Bounded:
# cleared when it outgrows _TERMS_CACHE_MAX entries.
_TERMS_CACHE: dict[bool, dict[str, list[str]]] = {}
_TERMS_CACHE_MAX = 1_000_000


def analyze_batch(texts, *, use_stemmer: bool = True):
    """Analyze a pandas Series of documents -> Series of term lists.

    The whole per-token pipeline (ident-split → lowercase → stem →
    length filter) is memoized per distinct RAW token across batches
    AND tasks (worker-level ``_TERMS_CACHE``) — Zipf-distributed text
    repeats tokens heavily, so each worker does the expensive work once
    per vocabulary word, not once per occurrence (the worker-wide
    generalization of the reference's ``lru_cache`` stemmer memo,
    ``IndexCreator.py:38``).
    """
    cache = _TERMS_CACHE.setdefault(use_stemmer, {})
    if len(cache) > _TERMS_CACHE_MAX:
        cache.clear()
    findall = _RAW_TOKEN_RE.findall

    def terms_of(raw: str) -> list[str]:
        out = []
        for sub in _split_ident(raw):
            term = sub.lower()
            if use_stemmer:
                term = porter_stem(term)
            if MIN_TERM_LEN <= len(term) <= MAX_TERM_LEN:
                out.append(term)
        return out

    def analyze_one(text: str) -> list[str]:
        out: list[str] = []
        for raw in findall(text or ""):
            hit = cache.get(raw)
            if hit is None:
                hit = cache[raw] = terms_of(raw)
            out += hit
        return out

    # batch-local WHOLE-TEXT memo on top of the token memo: exact-dup
    # texts (deduplicated web corpora, synthetic fixtures) re-analyze
    # as one dict hit instead of a re-tokenize.  Batch-local (not
    # worker-level) because values hold full term lists — the token
    # memo above is the one worth keeping resident.
    tmemo: dict[str, list[str]] = {}

    def analyze_memo(text: str) -> list[str]:
        hit = tmemo.get(text)
        if hit is None:
            hit = tmemo[text] = analyze_one(text)
        return hit

    return texts.map(analyze_memo)


def analyze_query_term(term: str, *, use_stemmer: bool = True) -> str | None:
    """Analyze a single query keyword exactly like the build path."""
    terms = analyze_text(term, use_stemmer=use_stemmer)
    return terms[0] if terms else None
