"""Text-analysis operators for training-data pipelines (all columnar).

Beyond-the-reference ops the brief requires as first-class components:
language-ID (stopword heuristic), quality scoring, token counting, document
fingerprinting. Every op is a pure Catalyst expression (JVM codegen) and has
an ANSI-SQL equivalent used by the DuckDB oracle — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, fixed English stopword set — shared with the SQL oracles verbatim
EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]
PUNCT_CLASS = "[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-string-safe)."""
    return F.filter(F.split(F.trim(text), "\\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count(text: Column) -> Column:
    return F.size(
        F.filter(tokens(F.lower(text)), lambda t: t.isin(*EN_STOPWORDS))
    )


def punct_ratio(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_CLASS)) / F.greatest(
        F.length(text), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length + stopword presence −
    punctuation noise. Deterministic, SQL-portable."""
    n_tok = token_count(text)
    sw_ratio = stopword_count(text) / F.greatest(n_tok, F.lit(1))
    length_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_score
        + F.lit(0.4) * F.least(sw_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * (1 - F.least(punct_ratio(text) * 10, F.lit(1.0))),
        4,
    )


def lang_id(text: Column) -> Column:
    """n-gram/stopword language heuristic: 'en' when ≥12% of tokens are
    English stopwords, else 'other'."""
    n_tok = token_count(text)
    sw_ratio = stopword_count(text) / F.greatest(n_tok, F.lit(1))
    return F.when(sw_ratio >= 0.12, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercase, whitespace-collapsed,
    punctuation-stripped text — the exact-dup key."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), PUNCT_CLASS, ""), "\\s+", " "
        )
    )
    return F.md5(norm)


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return docs.select(
        "*",
        token_count(c).alias("n_tokens"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fp"),
    )
