"""Text column expressions — all JVM-side built-ins (no Python UDFs).

Tokenization is whitespace-split; shingles are word n-grams built with
``transform``/``slice`` over the token array, keeping everything inside
whole-stage codegen.  These are the shared building blocks for the text
analysis and dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array: slice a sliding window and
    join with a single space.  Documents shorter than n words yield the
    whole document as one shingle."""
    short = F.array(F.concat_ws(" ", tok))
    slid = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
    )
    return F.when(F.size(tok) <= n, short).otherwise(slid)


def punct_count(col: Column | str) -> Column:
    """Number of ASCII punctuation characters (regex-replace differencing —
    no per-char explode)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))


#: Tiny per-language marker-word profiles for the heuristic language
#: identifier.  Public-knowledge stopword shortlists.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"],
}


def marker_overlap(tok: Column, lang: str) -> Column:
    """Distinct-overlap count between the token set and a language profile."""
    markers = F.lit(list(LANG_MARKERS[lang]))
    return F.size(F.array_intersect(tok, markers))
