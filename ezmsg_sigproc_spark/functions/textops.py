"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

No reference counterpart (task brief). All pure Column expressions — regex
and string ops stay JVM-side; every function has an exact DuckDB-SQL twin
(regex classes restricted to the portable subset both engines share).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword markers per language (tiny deterministic n-gram heuristic — a word
# list, not a model, so the oracle SQL reproduces it exactly)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "una"],
    "it": ["il", "che", "della", "per", "con"],
}


def _marker_count(text: Column, words: list[str]) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    total = F.lit(0)
    for wrd in words:
        # occurrences of " word " via length difference (portable across engines)
        occ = (
            F.length(padded) - F.length(F.replace(padded, F.lit(f" {wrd} "), F.lit("")))
        ) / (len(wrd) + 2)
        total = total + occ.cast("int")
    return total


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: _marker_count(text, words) for lang, words in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """Predicted language = argmax marker count (ties: first in dict order,
    'und' when no marker hits)."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, s in scores.items():
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def whitespace_token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def word_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count of word/number/punct runs ([A-Za-z]+,
    [0-9]+, or single non-space non-alnum)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^A-Za-z0-9\s]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return _marker_count(text, LANG_MARKERS[lang]) / F.greatest(
        whitespace_token_count(text), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct + stopword
    presence (weights fixed; deterministic)."""
    n = F.length(text)
    len_score = F.when((n >= 200) & (n <= 20000), F.lit(1.0)).when(n >= 50, F.lit(0.5)).otherwise(F.lit(0.0))
    p = punct_ratio(text)
    punct_score = F.when(p <= 0.1, F.lit(1.0)).when(p <= 0.25, F.lit(0.5)).otherwise(F.lit(0.0))
    s = stopword_ratio(text)
    stop_score = F.when(s >= 0.05, F.lit(1.0)).when(s > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    return (len_score * 0.4 + punct_score * 0.3 + stop_score * 0.3).cast("double")


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 fingerprint (near-dup detection at the
    formatting level)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


def extract_body_text(html_binary: Column) -> Column:
    """Extract the body text from an html payload (binary → utf-8 → regex).

    The training-pipeline extraction step for the `pages` table; paired with
    the input_hint invariant that the extracted text is byte-identical per
    url (tested end-to-end in tests/test_rollup_pipeline.py).
    """
    s = F.decode(html_binary, "utf-8")
    return F.regexp_extract(s, r"(?s)<body>(.*)</body>", 1)
