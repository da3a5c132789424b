"""Char n-gram generation equivalent to sklearn's ``analyzer='char_wb'``.

The reference scores entity-linking candidates with
``TfidfVectorizer(analyzer="char_wb", ngram_range=(3, 5))`` + cosine
(app.py:3046-3067). To reproduce those scores exactly — while replacing the
O(N²) dense matrix with a distributed inverted-index join — both the Spark
stage and the pandas oracle share this generator and the same TF-IDF
formula (smooth idf: ln((1+N)/(1+df)) + 1, raw tf, L2 normalization).

The vectorizer's default preprocessing (``lowercase=True``) applies here
too: case variants of a term (PCE / pce) must share n-grams exactly as the
reference's TfidfVectorizer makes them.
"""

from __future__ import annotations

import re
from typing import Dict, List

_WS = re.compile(r"\s\s+")

MIN_N = 3
MAX_N = 5


def char_wb_ngrams(text: str, min_n: int = MIN_N, max_n: int = MAX_N) -> List[str]:
    """sklearn ``_char_wb_ngrams``: pad each whitespace-token with one space
    per side, emit all char n-grams inside the padded token; a token shorter
    than ``min_n`` (padded) is emitted once, truncated."""
    if not text:
        return []
    text = _WS.sub(" ", text.lower())
    ngrams: List[str] = []
    for w in text.split():
        w = " " + w + " "
        w_len = len(w)
        for n in range(min_n, max_n + 1):
            offset = 0
            ngrams.append(w[offset : offset + n])
            while offset + n < w_len:
                offset += 1
                ngrams.append(w[offset : offset + n])
            if offset == 0:  # token shorter than n: count once, stop
                break
    return ngrams


def char_wb_ngrams_col(col, min_n: int = MIN_N, max_n: int = MAX_N):
    """Column form of :func:`char_wb_ngrams` — pure JVM higher-order
    functions, no Python boundary (guide §4.1: the pandas-UDF version made
    every consuming task block on a Python worker round-trip, and the
    non-canonicalizable PythonUDF expression defeated exchange reuse, so
    the TF-IDF explode stage executed once per DAG branch).

    Exact semantic mapping, pinned by test_char_wb_ngrams_col_parity:
    * collapse 2+ whitespace to one space, lowercase ((?U) makes Java's
      \\s match the same Unicode whitespace Python's str-regex \\s does);
    * whitespace-split, dropping empties (== str.split());
    * per padded token " w " of length L: emit all n-grams for each
      n in [min_n, max_n] with n <= L — for n == L that is the single
      truncated emission, and sklearn's break-on-short-token rule is
      exactly the n <= L filter (every n' > L >= min_n is skipped).
    NULL input yields NULL (explode drops it, same as the UDF's [])."""
    import pyspark.sql.functions as F

    cleaned = F.lower(F.regexp_replace(col, "(?U)\\s\\s+", " "))
    words = F.filter(F.split(cleaned, "(?U)\\s+"), lambda w: w != "")

    def word_grams(w):
        padded = F.concat(F.lit(" "), w, F.lit(" "))
        length = F.length(padded)
        return F.flatten(
            F.transform(
                F.filter(
                    F.array(*[F.lit(n) for n in range(min_n, max_n + 1)]),
                    lambda n: n <= length,
                ),
                lambda n: F.transform(
                    F.sequence(F.lit(1), length - n + F.lit(1)),
                    lambda i: padded.substr(i, n),
                ),
            )
        )

    return F.flatten(F.transform(words, word_grams))


def tf_counts(text: str, min_n: int = MIN_N, max_n: int = MAX_N) -> Dict[str, int]:
    counts: Dict[str, int] = {}
    for gram in char_wb_ngrams(text, min_n, max_n):
        counts[gram] = counts.get(gram, 0) + 1
    return counts
