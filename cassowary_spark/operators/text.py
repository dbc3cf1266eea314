"""Text-analysis operators for training-data pipelines (SURVEY.md §2 C4).

Everything is built-in-function expressions (whole-stage codegen);
formulas are deliberately SQL-expressible so each has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker tokens per language for the n-gram/stopword language-ID
# heuristic. Deterministic, data-independent constants.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a"),
    "de": ("der", "und", "die", "das"),
    "es": ("el", "los", "que", "y"),
    "fr": ("le", "les", "et", "une"),
    "zh": ("的", "是", "了", "在"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(text, " "))


def regex_token_count(text: Column) -> Column:
    """BPE-ish subword count: runs of letters, digits, or single
    non-space symbols (a cheap proxy for a BPE pre-tokenizer)."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), F.lit(0)))


def _count_token(toks: Column, marker: str) -> Column:
    # Single-arg lambda only: a default-arg trick (lambda t, m=m: ...)
    # changes the detected arity and Spark passes the element INDEX as m.
    return F.size(F.filter(toks, lambda t: t == F.lit(marker)))


def marker_score(text: Column, lang: str) -> Column:
    """How many marker tokens of `lang` occur in the text (multiset)."""
    toks = F.split(text, " ")
    score = F.lit(0)
    for m in LANG_MARKERS[lang]:
        score = score + _count_token(toks, m)
    return score


def lang_id(text: Column) -> Column:
    """Argmax marker language as an ordered when-chain: the first
    language in LANG_ORDER whose score is positive and >= all others
    wins (deterministic tiebreak); 'und' when every score is zero.
    The DuckDB oracle mirrors this as a CASE with the same ordering.
    """
    scores = {lang: marker_score(text, lang) for lang in LANG_ORDER}
    chain = None
    for lang in LANG_ORDER:
        cond = scores[lang] > 0
        for other in LANG_ORDER:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        chain = F.when(cond, lang) if chain is None else chain.when(cond, lang)
    return chain.otherwise("und")


def quality_score(text: Column, n_chars: Column) -> Column:
    """Deterministic quality score in [0, 1]:
    0.4·length-band + 0.3·(1 − punct ratio) + 0.3·stopword presence."""
    n_tok = token_count(text).cast("double")
    length_band = F.when((n_tok >= 20) & (n_tok <= 80), 1.0).when(n_tok >= 10, 0.5).otherwise(0.0)
    punct = (
        F.length(text)
        - F.length(F.regexp_replace(text, "[\\.,;:!\\?]", ""))
    ).cast("double")
    punct_ratio = punct / F.greatest(n_chars.cast("double"), F.lit(1.0))
    stop = F.when(marker_score(text, "en") > 0, 1.0).otherwise(0.0)
    return F.round(0.4 * length_band + 0.3 * (1.0 - punct_ratio) + 0.3 * stop, 4)
