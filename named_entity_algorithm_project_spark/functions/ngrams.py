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


def tf_counts(text: str, min_n: int = MIN_N, max_n: int = MAX_N) -> Dict[str, int]:
    counts: Dict[str, int] = {}
    for gram in char_wb_ngrams(text, min_n, max_n):
        counts[gram] = counts.get(gram, 0) + 1
    return counts
