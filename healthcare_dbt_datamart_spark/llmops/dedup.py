"""Deduplication operators for training-data pipelines.

Four families, all designed for 100 TB:

- **exact**: md5-fingerprint group-by — one shuffle on the hash, partial
  aggregation does the heavy lifting map-side.
- **MinHash + LSH**: per-doc signature is computed inside a single
  projection (higher-order array expressions, no shuffle, no Python);
  banding turns near-dup search into an equi-join on band keys, so the
  only shuffle is on (band_idx, band_key) — the classic
  shingle→minhash→band→bucket-join pipeline. Candidate pairs are verified
  with exact Jaccard, bounding false positives; bucket sizes bound the
  quadratic blowup.
- **SimHash**: 16-bit signature from per-token md5 digests, again one
  projection; Hamming-neighbor buckets give near-dup candidates.
- **n-gram Jaccard**: exact verification metric over distinct token (or
  shingle) sets.

MinHash variant note: we hash *tokens* (word 1-grams) by default and
word-``n`` shingles optionally; min over ``md5(seed ‖ '|' ‖ token)`` per
seed is a valid MinHash family (md5 is uniform), and — deliberately —
expressible identically in any engine with md5, so every operator here is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import union_all

HEX = "0123456789abcdef"


def tokens_col(text: Column | str, n_shingle: int = 1) -> Column:
    """Distinct token (or word-n-shingle) set of lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    if n_shingle > 1:
        # word n-grams: positions 0 .. size-n, joined with single spaces
        toks = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n_shingle, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n_shingle), " "),
        )
    return F.array_distinct(toks)


def exact_dedup_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: md5 fingerprint → representative (min id) + copy count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_expr(toks: Column, seed: int) -> Column:
    """One MinHash value: min over md5(seed ‖ '|' ‖ token)."""
    return F.array_min(
        F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{seed}|"), t)))
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 8, n_shingle: int = 1
) -> DataFrame:
    """Per-doc MinHash signature, one column per hash — a single
    projection over the scan (whole-stage codegen, zero shuffle)."""
    toks = tokens_col(text_col, n_shingle)
    return df.select(
        F.col(id_col),
        *[minhash_expr(toks, s).alias(f"mh{s}") for s in range(num_hashes)],
    )


def lsh_band_buckets(
    sigs: DataFrame, id_col: str, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Band the signature: band key = md5 of the concatenated minhashes in
    the band. Output: (band_idx, band_key, id) — docs sharing a
    (band_idx, band_key) are near-dup candidates."""
    bands = []
    for b in range(num_hashes // band_size):
        cols = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        bands.append(
            sigs.select(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
                F.col(id_col),
            )
        )
    return union_all(bands)


def candidate_pairs(buckets: DataFrame, id_col: str) -> DataFrame:
    """Self-join each bucket: distinct (id_a < id_b) candidate pairs.
    The join key (band_idx, band_key) is the only shuffle; bucket size
    bounds the per-key work (AQE splits skewed buckets)."""
    a = buckets.select("band_idx", "band_key", F.col(id_col).alias("id_a"))
    b = buckets.select("band_idx", "band_key", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    n_shingle: int = 1,
) -> DataFrame:
    """Verify candidate pairs with exact Jaccard over distinct token sets:
    |A∩B| / |A∪B|. Token sets are joined in (broadcast if small); the
    set arithmetic is a pure projection."""
    toks = df.select(F.col(id_col), tokens_col(text_col, n_shingle).alias("toks"))
    out = (
        pairs.join(toks.withColumnsRenamed({id_col: "id_a", "toks": "toks_a"}), "id_a")
        .join(toks.withColumnsRenamed({id_col: "id_b", "toks": "toks_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("toks_a", "toks_b"))
                / F.size(F.array_union("toks_a", "toks_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash as a '0'/'1' string.

    Per token, hash = md5(token); hex position i (1..16) contributes +1 if
    the digit is in [8..f] else -1; bit_i = 1 iff the positional sum is
    >= 0 (ties to 1, deterministically). Near-dup docs (high token
    overlap) agree on most bits. One projection, no shuffle, and exactly
    reproducible in any md5-capable engine.
    """
    toks = tokens_col(text_col)
    hashes = F.transform(toks, lambda t: F.md5(t))
    n = F.size(hashes)
    bits = []
    for i in range(1, 17):
        high = F.size(
            F.filter(
                hashes,
                lambda h: F.substring(h, i, 1).isin(*list("89abcdef")),
            )
        )
        # sum = high - (n - high) >= 0  <=>  2*high >= n
        bits.append(F.when(high * 2 >= n, F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col), F.concat(*bits).alias("simhash"))
