"""Hypothesis property batteries for the round-10 operator wave
(levenshtein_pairs / chrf_report / min_k_prob / mad_scores) — each
operator checked against an independent pure-Python reference over
randomized inputs, the convention the kendall/bucketed-shards batteries
set (one of which caught a real divide-by-zero pre-promotion)."""

from __future__ import annotations

# opt-out marker for the pre-proof batteries: `-m "not battery"` is the
# fast iteration path; the default gate still runs everything
pytestmark = __import__("pytest").mark.battery

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_WORDS = ["alpha", "beta", "gamma", "delta", "x1", "yy", "zz9"]


def _r6(x: float) -> float:
    """Half-up 6dp rounding — Spark/DuckDB round() semantics (away from
    zero on ties), NOT Python's banker's round (a falsifying example
    here caught exactly that divergence: round(-3.1195625, 6))."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _texts(min_size=1, max_size=6):
    return st.lists(
        st.sampled_from(_WORDS), min_size=min_size, max_size=max_size
    ).map(" ".join)


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


@settings(max_examples=6, deadline=None)
@given(st.lists(_texts(0, 5), min_size=2, max_size=6))
def test_levenshtein_pairs_matches_python_dp(spark, texts):
    """Every emitted distance equals the classic DP, the gate is the
    exact integer cross-multiplication, and no pair below threshold
    survives."""
    from healthcare_dbt_datamart_spark.llmops.dedup import levenshtein_pairs

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, j) for i in range(len(texts)) for j in range(i + 1, len(texts))],
        "id_a long, id_b long",
    )
    got = {
        (r.id_a, r.id_b): (r.dist, r.maxlen, r.sim)
        for r in levenshtein_pairs(
            pairs, docs, "text", "doc_id", threshold_pct=30
        ).collect()
    }
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            d = _py_lev(texts[i], texts[j])
            m = max(len(texts[i]), len(texts[j]))
            kept = 100 * (m - d) >= 30 * m
            if kept:
                want_sim = 1.0 if m == 0 else _r6(1 - d / m)
                assert got[(i, j)] == (d, m, want_sim)
            else:
                assert (i, j) not in got


def _py_chrf_counts(pairs, max_n=6):
    from collections import Counter

    agg = {n: [0, 0, 0] for n in range(1, max_n + 1)}
    for cand, ref in pairs:
        c = "".join(cand.lower().strip().split())
        r = "".join(ref.lower().strip().split())
        for n in range(1, max_n + 1):
            cg = Counter(c[i : i + n] for i in range(len(c) - n + 1))
            rg = Counter(r[i : i + n] for i in range(len(r) - n + 1))
            agg[n][0] += sum(cg.values())
            agg[n][1] += sum(rg.values())
            agg[n][2] += sum((cg & rg).values())
    return agg


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(_texts(1, 5), _texts(1, 5)), min_size=1, max_size=5)
)
def test_chrf_report_matches_python_counter(spark, pairs):
    """Corpus chrF counts equal a pure-Python Counter-intersection
    reference at every order; F follows the single-division identity."""
    from healthcare_dbt_datamart_spark.llmops.evaluation import chrf_report

    df = spark.createDataFrame(
        [(i, c, r) for i, (c, r) in enumerate(pairs)],
        "id long, cand string, ref string",
    )
    got = {r.order: r for r in chrf_report(df, "cand", "ref", "id").collect()}
    want = _py_chrf_counts(pairs)
    for n in range(1, 7):
        c, r, m = want[n]
        assert (got[n].cand_ngrams, got[n].ref_ngrams, got[n].match_ngrams) \
            == (c, r, m), n
        if 4 * r + c > 0:
            assert got[n].fscore == _r6(5 * m / (4 * r + c))
        else:
            assert got[n].fscore is None


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_texts(1, 6), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=100),
)
def test_min_k_prob_matches_python_reference(spark, texts, k_pct):
    """Min-K% tail means equal a pure-Python replay of the quantized
    Laplace-unigram arithmetic (self-reference fit) at any k."""
    import math
    from collections import Counter

    from healthcare_dbt_datamart_spark.llmops.filtering import min_k_prob

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in min_k_prob(docs, "text", "doc_id", k_pct=k_pct).collect()
    }

    toks = [t.lower().strip().split() for t in texts]
    freq = Counter(w for ws in toks for w in ws)
    denom = sum(freq.values()) + len(freq)
    for i, ws in enumerate(toks):
        lps = sorted(
            math.floor(
                math.log((freq[w] + 1) / float(denom)) * 10**9 + 0.5
            )
            for w in ws
        )
        n = len(lps)
        kk = max(math.ceil(n * k_pct / 100.0), 1)
        assert got[i].n_tokens == n and got[i].n_lowest == kk
        assert got[i].min_k_logprob == _r6(sum(lps[:kk]) / (kk * 1e9))
        assert got[i].mean_logprob == _r6(sum(lps) / (n * 1e9))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=12
    )
)
def test_mad_scores_matches_python_order_stats(spark, vals):
    """Median/MAD equal the pure-Python lower-median reference; every
    robust_z follows; zero-MAD yields NULLs."""
    from healthcare_dbt_datamart_spark.llmops.splits import mad_scores

    docs = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    got = {r.id: r for r in mad_scores(docs, "v", "id").collect()}

    def lower_med(xs):
        s = sorted(xs)
        return s[(len(s) + 1) // 2 - 1]

    med = lower_med([float(v) for v in vals])
    mad = lower_med([abs(float(v) - med) for v in vals])
    for i, v in enumerate(vals):
        r = got[i]
        assert (r.median, r.mad) == (med, mad)
        if mad > 0:
            # mirror the engine's 6dp half-up integer-domain quantization
            # (floor(z·10⁶ + 0.5) on the IEEE double — NOT decimal-string
            # rounding, which disagrees on exact 6dp half-way cases like
            # 0.6745·(−18)/16) and the integer-fp outlier compare
            import math

            z_fp = math.floor(
                0.6745 * (float(v) - med) / mad * 1000000.0 + 0.5
            )
            z = z_fp / 1000000.0
            assert r.robust_z == z and r.outlier == (abs(z_fp) > 3500000)
        else:
            assert r.robust_z is None and r.outlier is None
