"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All single-projection Catalyst expressions."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

# tiny per-language stopword lists for the n-gram/stopword-hit heuristic
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "los", "y", "en", "que"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein"),
}


def token_stats(text: Column | str) -> dict[str, Column]:
    """Whitespace token count, distinct count, char count, avg token len."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    n = F.size(toks)
    return {
        "n_chars": F.length(c),
        "n_tokens": n,
        "n_uniq_tokens": F.size(F.array_distinct(toks)),
        "avg_token_len": F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
            )
            / n.cast("double"),
            6,
        ),
    }


def quality_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality signals: length/uniqueness/stopword ratios and a
    composite score — the pre-training filter shape (length + lexical
    diversity + stopword density)."""
    stats = token_stats(text_col)
    en_hits = stopword_hits(text_col, STOPWORDS["en"])
    n = stats["n_tokens"]
    uniq_ratio = F.round(stats["n_uniq_tokens"] / n.cast("double"), 6)
    stop_ratio = F.round(en_hits / n.cast("double"), 6)
    return df.select(
        F.col(id_col),
        stats["n_chars"].alias("n_chars"),
        n.alias("n_tokens"),
        stats["n_uniq_tokens"].alias("n_uniq_tokens"),
        stats["avg_token_len"].alias("avg_token_len"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stopword_ratio"),
        # composite: in-range length + diversity + some stopwords
        F.round(
            F.when((n >= 10) & (n <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
            + uniq_ratio * 0.3
            + F.least(stop_ratio * 3, F.lit(1.0)) * 0.3,
            6,
        ).alias("quality_score"),
    )


def stopword_hits(text: Column | str, words: tuple[str, ...]) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def langid_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-hit language ID: count hits per language wordlist, predict
    the argmax (ties broken by language-code order, deterministically)."""
    hits = {lang: stopword_hits(text_col, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):  # earlier lang wins ties
        pred = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col),
        *[hits[lang].alias(f"{lang}_hits") for lang in STOPWORDS],
        pred.alias("predicted_lang"),
    )


def rolling_fingerprint(
    df: DataFrame, text_col: str, id_col: str, prefix_len: int = 64
) -> DataFrame:
    """Content-defined fingerprint: md5 of the normalized prefix plus a
    length bucket — cheap near-identity grouping for shard-level dedup."""
    norm = F.lower(F.trim(F.col(text_col)))
    return df.select(
        F.col(id_col),
        F.md5(F.substring(norm, 1, prefix_len)).alias("prefix_fp"),
        (F.floor(F.length(norm) / 64)).cast("long").alias("len_bucket"),
    )
