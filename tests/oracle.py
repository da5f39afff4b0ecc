"""Pure-pandas oracle for the IR engine (the regenerated golden source).

The reference's goldens (`data/test/expected_index.csv`) are stale
(separator drift, SURVEY §4.4) — we regenerate goldens from this
independent, single-threaded implementation that shares ONLY the
analyzer with the engine under test.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from informationretrieval_en_people_cn_spark.functions.analyze import analyze_text


def build_oracle_index(corpus_pdf, use_stemmer: bool = True):
    """-> (postings: term -> [(doc_id, tf, positions)], doclen, stats)."""
    postings: dict[str, list] = defaultdict(list)
    doclen: dict[int, int] = {}
    for row in corpus_pdf.sort_values("doc_id").itertuples():
        terms = analyze_text(row.content, use_stemmer=use_stemmer)
        doclen[row.doc_id] = len(terms)
        pos: dict[str, list[int]] = defaultdict(list)
        for p, t in enumerate(terms):
            pos[t].append(p)
        for t, plist in pos.items():
            postings[t].append((row.doc_id, len(plist), plist))
    n_docs = len(doclen)
    total = sum(doclen.values())
    avgdl = total / n_docs if n_docs else 1.0
    return postings, doclen, {"n_docs": n_docs, "avgdl": avgdl, "total": total}


def bm25_scores(postings, doclen, stats, terms, k1=1.2, b=0.75):
    """doc_id -> BM25 score over the disjunction of ``terms`` (canonical
    term-sorted summation order, matching the engine)."""
    scores: dict[int, float] = defaultdict(float)
    n = stats["n_docs"]
    avgdl = stats["avgdl"] or 1.0
    for t in sorted(set(terms)):
        plist = postings.get(t, [])
        if not plist:
            continue
        idf = math.log(1.0 + (n - len(plist) + 0.5) / (len(plist) + 0.5))
        for doc_id, tf, _ in plist:
            dl = doclen[doc_id]
            scores[doc_id] += (
                idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
            )
    return dict(scores)


def topk(scores: dict[int, float], k: int):
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
