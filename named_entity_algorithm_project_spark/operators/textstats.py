"""Text-analysis operators for training-data pipelines: language-ID,
quality scoring, token counting, fingerprinting. All pure Column
expressions — whole-stage-codegen friendly, no Python anywhere."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker-word tables for the n-gram/stopword language heuristic; counts of
# bounded stopwords beat char n-grams at SQL-expression cost
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "una", "por"],
}


def _marker_hits(text: Column, words: list[str]) -> Column:
    hits = F.lit(0)
    for w in words:
        pat = rf"(?i)(^|\s){w}(\s|$)"
        hits = hits + F.when(text.rlike(pat), 1).otherwise(0)
    return hits


def lang_id(text: Column) -> Column:
    """Best marker-language or 'und' when nothing scores >= 2."""
    scores = [
        (lang, _marker_hits(text, words)) for lang, words in _LANG_MARKERS.items()
    ]
    best = F.lit("und")
    best_score = F.lit(1)  # require >= 2 hits to claim a language
    # deterministic order: iterate sorted langs; strict > keeps first winner
    for lang, score in sorted(scores):
        is_better = score > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best


def token_count(text: Column) -> Column:
    """Whitespace tokens."""
    return F.when(F.trim(text) == "", 0).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavored proxy: word-piece-ish segments (letter runs, digit
    runs, single punctuation) — the regex split both engines agree on."""
    return F.size(
        F.filter(
            F.split(text, r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
            lambda s: F.trim(s) != "",
        )
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / uppercase ratios (the reference's
    quality heuristics generalized; each in [0, 1])."""
    n = F.greatest(F.length(text), F.lit(1))
    non_alnum = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    stop_hits = _marker_hits(text, _LANG_MARKERS["en"])
    ntok = token_count(text)
    return {
        "n_chars": F.length(text),
        "n_tokens": ntok,
        "punct_ratio": non_alnum / n,
        "upper_ratio": upper / n,
        "stopword_score": stop_hits / F.greatest(ntok, F.lit(1)),
        "mean_token_len": F.length(F.regexp_replace(text, r"\s", ""))
        / F.greatest(ntok, F.lit(1)),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] keep-score: long enough, not punctuation soup, not
    shouting. Thresholds follow common web-corpus filters (C4-style)."""
    f = quality_features(text)
    length_ok = F.when(f["n_tokens"].between(5, 100000), 1.0).otherwise(0.2)
    punct_ok = F.when(f["punct_ratio"] < 0.3, 1.0).otherwise(0.3)
    upper_ok = F.when(f["upper_ratio"] < 0.3, 1.0).otherwise(0.5)
    token_len_ok = F.when(f["mean_token_len"].between(2.0, 12.0), 1.0).otherwise(0.4)
    return (length_ok * punct_ok * upper_ok * token_len_ok).alias("quality")


def fingerprint(text: Column) -> Column:
    """Normalized content hash (lower, collapse whitespace, strip)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def profile_documents(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One wide row per doc with every text statistic — the projection a
    corpus-curation pipeline runs first (single scan, pure codegen)."""
    text = F.col(text_col)
    feats = quality_features(text)
    return docs.select(
        "*",
        *[v.alias(k) for k, v in feats.items()],
        lang_id(text).alias("lang_pred"),
        quality_score(text),
        fingerprint(text).alias("fingerprint"),
        bpe_ish_token_count(text).alias("n_subtokens"),
    )
