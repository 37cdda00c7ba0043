"""Text analysis over a documents table — all JVM-side expressions.

Every function here is a pure column expression (no UDFs): token counting,
quality scoring, language id, and fingerprinting run inside whole-stage
codegen, so a 100 TB documents scan is one projection-pruned pass. The
formulas are deliberately expressible in ANSI SQL so DuckDB oracles can
verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[A-Za-z0-9_]+"

# small per-language stopword seeds for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que"],
    "es": ["el", "la", "que", "los", "una", "por", "con", "para", "del", "es"],
}


def _word_count_expr(col: str, words: list[str]):
    # double the backslashes: inside a Spark SQL string literal '\b' is a
    # backspace character, the regex engine must receive '\\b'
    pat = r"\\b(" + "|".join(words) + r")\\b"
    return F.expr(f"size(regexp_extract_all(lower({col}), '{pat}', 0))")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(id-cols..., n_tokens) — regex word tokens, whitespace-insensitive."""
    return df.withColumn(
        "n_tokens", F.expr(f"size(regexp_extract_all({text_col}, '{TOKEN_RE}', 0))")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality in [0,1]: length band + alpha ratio + stopword hit.

    score = 0.4*min(n_tokens/100, 1) + 0.4*alpha_ratio + 0.2*min(stop/10, 1)
    """
    n_tok = F.expr(f"size(regexp_extract_all({text_col}, '{TOKEN_RE}', 0))")
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    stop = _word_count_expr(text_col, LANG_STOPWORDS["en"])
    score = (
        0.4 * F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
        + 0.4 * (n_alpha.cast("double") / n_chars.cast("double"))
        + 0.2 * F.least(stop.cast("double") / 10.0, F.lit(1.0))
    )
    return df.withColumn("quality", F.round(score, 6))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language id: argmax of per-language stopword counts,
    ties broken alphabetically; 'und' when no stopword hits at all."""
    langs = sorted(LANG_STOPWORDS)
    counts = [_word_count_expr(text_col, LANG_STOPWORDS[l]).alias(f"c_{l}") for l in langs]
    tmp = df.select("*", *counts)
    best = F.greatest(*[F.col(f"c_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when(F.col(f"c_{l}") == best, F.lit(l)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return tmp.withColumn("lang_pred", pred).drop(*[f"c_{l}" for l in langs])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set (the DataFrame stand-in for a rolling-hash shingle sketch —
    deterministic and cross-engine checkable)."""
    toks = F.expr(
        f"array_distinct(regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0))"
    )
    return df.withColumn(
        "fingerprint", F.md5(F.concat_ws(" ", F.sort_array(toks)))
    )
