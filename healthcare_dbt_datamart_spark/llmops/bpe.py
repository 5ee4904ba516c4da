"""BPE tokenizer-merge training (Sennrich et al. 2016, arXiv:1508.07909)
— tokenizer induction as a corpus operator.

Scale shape: BPE trains on the WORD-FREQUENCY table, not the corpus —
one groupBy(word) collapses 100 TB of text to a vocabulary-sized
relation, and every merge round runs over that small table (the classic
algorithm's word-dict representation, distributed). Each round is ONE
pair-count shuffle + a 1-row argmax of driver model state (the chosen
pair), then a lazy per-word string rewrite; the per-round word table is
localCheckpoint'd so round k does not recompute rounds 1..k-1
(the Lloyd-fit persistence discipline, llmops/similarity.py).

Symbol representation: a word's symbols are space-joined with sentinel
spaces (``' h e l l o '``). Applying merge (a, b) is three PLAIN string
replaces: double every space, replace ``' a  b '`` with ``' ab '``,
collapse doubles — the doubling gives every occurrence its own bounding
spaces (a naive single-space replace misses back-to-back occurrences
because adjacent matches SHARE a space), and position-scanning replace
then yields exactly the standard left-to-right non-overlapping merge
(property-checked against a reference implementation in tests). Plain
``replace()`` exists identically in every engine — no regex, no
lookbehind — so the DuckDB oracle uses the same three replaces.

Determinism: the argmax pair breaks frequency ties lexicographically
(left ASC, right ASC), so the merge sequence is reproducible and
cross-engine exact — integer frequencies only, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """(symbols, freq): the word-frequency dict with each word exploded
    to sentinel-spaced characters. One corpus shuffle, ever."""
    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i, 1),
    )
    return wf.select(
        F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")).alias("syms"),
        "freq",
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, freq): adjacent-symbol pair frequencies, weighted by
    word frequency. Pairs are built as array expressions in the row and
    exploded once; one groupBy shuffle on the pair."""
    toks = F.split(F.trim(F.col("syms")), " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("l"),
                F.element_at(toks, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        words.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("freq"))
    )


def _apply_merge(col, left: str, right: str):
    """The three-replace merge rewrite (see module docstring)."""
    doubled = F.replace(col, F.lit(" "), F.lit("  "))
    merged = F.replace(
        doubled, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
    )
    return F.replace(merged, F.lit("  "), F.lit(" "))


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 8
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns the ordered
    merge list ``[(left, right, pair_freq), ...]`` — the tokenizer
    artifact a training pipeline ships. Iterative: each round's argmax
    pair is bounded driver model state feeding the next round's rewrite
    (the kmeans/connected-components carve-out class)."""
    words = _word_symbols(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("freq").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, freq = top[0]["left"], top[0]["right"], int(top[0]["freq"])
        merges.append((left, right, freq))
        words = words.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment_report(
    df: DataFrame, text_col: str, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Apply a learned merge list and report the resulting subword
    vocabulary: for every token, ``n_occurrences`` (appearances across
    distinct word types) and ``total_freq`` (corpus-weighted
    appearances) — the vocab audit run after training. Map-only over the
    word-frequency table (the merges chain as nested string replaces;
    Catalyst folds the constants)."""
    words = _word_symbols(df, text_col)
    syms = F.col("syms")
    for left, right, _ in merges:
        syms = _apply_merge(syms, left, right)
    segmented = words.select(syms.alias("syms"), "freq")
    return (
        segmented.select(
            F.explode(F.split(F.trim(F.col("syms")), " ")).alias("token"), "freq"
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.sum("freq").alias("total_freq"),
        )
    )
