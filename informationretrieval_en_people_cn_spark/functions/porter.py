"""Porter stemmer (Porter, 1980) — pure-Python, dependency-free.

The reference engine stems with PyStemmer's Snowball English stemmer
(``/root/reference/searchengine/IndexCreator.py:37-38`` and
``SearchEngine.py:35``); that C extension is not available here, so we
implement the classic public-domain Porter algorithm instead.  What
matters for rank-identity is NOT which stemmer is used but that the
*same* stemmer runs on the build path and the query path (the
reference shares one stemmer object for this reason,
``SearchEngine.py:35-36``); this module is that single shared
implementation.

The hot path is :func:`stem_series`, which exploits batch-level token
repetition (the reference memoizes with ``functools.lru_cache(100)``,
``IndexCreator.py:38``) by stemming only the unique tokens of a batch
— a vectorized analogue of the reference's cache.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences ([C](VC)^m[V] form of the Porter paper)."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """Ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, m_min: int) -> str | None:
    """If word ends with suffix and measure(stem) > m_min, replace."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > m_min:
        return stem + repl
    return word  # suffix matched but condition failed: stop rule group


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

# The two documented DEPARTUREs of Porter's reference implementation
# (tartarus.org porter.c / the Snowball "porter" stemmer) from the 1980
# paper, applied in step 2 when ``departures=True``:
#   (m>0) ABLI -> ABLE   becomes   (m>0) BLI -> BLE
#   (m>0) LOGI -> LOG    is added
# e.g. possibly: paper "possibli" vs departures "possibl";
#      analogy:  paper "analogi"  vs departures "analog".
_STEP2_DEPARTURES = [("logi", "log")] + [
    ("bli", "ble") if s == "abli" else (s, r) for s, r in _STEP2
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def stem(word: str, departures: bool = False) -> str:
    """Stem one lowercase token. Non-alphabetic tokens pass through.

    ``departures=True`` applies the two step-2 DEPARTUREs of Porter's
    own reference implementation (see _STEP2_DEPARTURES); the engine
    keeps the 1980-paper rules (departures=False) on both the build and
    query paths — rank identity needs build≡query stemming, not any
    particular stemmer family (the reference binary uses PyStemmer
    Snowball english, a third family again — IndexCreator.py:37-38).
    """
    if len(word) <= 2:
        return word

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]

    # Step 1b
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    else:
        flag = False
        if word.endswith("ed") and _has_vowel(word[:-2]):
            word = word[:-2]
            flag = True
        elif word.endswith("ing") and _has_vowel(word[:-3]):
            word = word[:-3]
            flag = True
        if flag:
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif _ends_double_cons(word) and word[-1] not in "lsz":
                word = word[:-1]
            elif _measure(word) == 1 and _cvc(word):
                word += "e"

    # Step 1c
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    # Step 2
    for suffix, repl in (_STEP2_DEPARTURES if departures else _STEP2):
        if word.endswith(suffix):
            word = _replace(word, suffix, repl, 0) or word
            break

    # Step 3
    for suffix, repl in _STEP3:
        if word.endswith(suffix):
            word = _replace(word, suffix, repl, 0) or word
            break

    # Step 4
    for suffix in _STEP4:
        if word.endswith(suffix):
            stem_part = word[: len(word) - len(suffix)]
            if suffix == "ion" and (not stem_part or stem_part[-1] not in "st"):
                break
            if _measure(stem_part) > 1:
                word = stem_part
            break

    # Step 5a
    if word.endswith("e"):
        stem_part = word[:-1]
        m = _measure(stem_part)
        if m > 1 or (m == 1 and not _cvc(stem_part)):
            word = stem_part

    # Step 5b
    if _measure(word) > 1 and _ends_double_cons(word) and word.endswith("l"):
        word = word[:-1]

    return word


def stem_series(tokens, departures: bool = False):
    """Stem a pandas Series of tokens via unique()+map (batch memoization)."""
    import pandas as pd

    uniq = pd.Series(tokens.unique())
    mapping = dict(zip(uniq, uniq.map(lambda w: stem(w, departures))))
    return tokens.map(mapping)
