"""Measured 10x scaling ratios for the round-7 second-wave operators
(the evaluation family + the new dedup/graph/embedding ops), which have
no queries() slots yet and therefore no tools/scale_curve.py coverage.

Same protocol as scale_curve.py (whose replica builder this reuses):
run each operator on the driver's sf0.1 parquet and on a derived 10x
replica, report wall-clock ratios. Linear-ish (~10x) = cost is
scan/shuffle-proportional; >>10x would expose a super-linear term
(pair blowups, driver collects, single-partition sorts); well below
10x = fixed local-mode overhead still dominates.

    python tools/scale_wave2.py [--copies N] [op ...]

Prints one JSON line per op: {op, base_sec, scaled_sec, ratio}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_curve import build_replica  # noqa: E402


def _docs(spark, d):
    return spark.read.parquet(f"{d}/documents.parquet")


def _lineitem(spark, d):
    return spark.read.parquet(f"{d}/lineitem.parquet")


def _scored_lineitem(spark, d):
    return _lineitem(spark, d).select(
        (F.pmod(F.col("l_partkey"), F.lit(97)) / 96.0).alias("score"),
        (F.col("l_orderkey") % 2).cast("int").alias("label"),
    )


def op_roc_auc(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import roc_auc

    return roc_auc(_scored_lineitem(spark, d), "score", "label").count()


def op_calibration(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        calibration_summary,
    )

    return calibration_summary(
        _scored_lineitem(spark, d), "score", "label"
    ).count()


def op_spearman(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import spearman_rho

    li = _lineitem(spark, d).select(
        (F.pmod(F.col("l_partkey"), F.lit(997)) / 996.0).alias("x"),
        (F.pmod(F.col("l_suppkey") * 13, F.lit(991)) / 990.0).alias("y"),
    )
    return spearman_rho(li, "x", "y").count()


def op_bleu(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import bleu_corpus

    pairs = _docs(spark, d).select(
        "doc_id",
        F.col("text").alias("cand"),
        F.concat_ws(" ", F.col("text"), F.lit("tail token")).alias("ref"),
    )
    return bleu_corpus(pairs, "cand", "ref", "doc_id").count()


def op_rouge_l(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import rouge_l

    pairs = _docs(spark, d).select(
        "doc_id",
        F.col("text").alias("cand"),
        F.reverse(F.col("text")).alias("ref"),
    )
    return rouge_l(pairs, "cand", "ref", "doc_id").count()


def op_distinct_n(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import distinct_n

    return distinct_n(_docs(spark, d), "text").count()


def op_line_dedup(spark, d):
    from healthcare_dbt_datamart_spark.llmops.dedup import line_dedup

    return line_dedup(_docs(spark, d), "text", "doc_id").count()


def op_source_overlap(spark, d):
    from healthcare_dbt_datamart_spark.llmops.dedup import source_overlap_kmv

    return source_overlap_kmv(_docs(spark, d), "source", "text").count()


def op_krippendorff(spark, d):
    from healthcare_dbt_datamart_spark.llmops.preferences import (
        krippendorff_alpha,
    )

    votes = spark.read.parquet(f"{d}/events.parquet").select(
        F.pmod(F.col("user_id"), F.lit(5000)).alias("item_id"),
        F.col("event_type").alias("label"),
    )
    return krippendorff_alpha(votes, "item_id", "label").count()


def op_hits(spark, d):
    from healthcare_dbt_datamart_spark.llmops.graph import hits_fixedpoint

    edges = _lineitem(spark, d).select(
        F.pmod(F.col("l_partkey"), F.lit(20000)).alias("src"),
        F.pmod(F.col("l_suppkey"), F.lit(20000)).alias("dst"),
    ).filter("src != dst")
    return hits_fixedpoint(edges, n_iter=2).count()


def op_pca(spark, d):
    from healthcare_dbt_datamart_spark.llmops.similarity import pca_train

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    return len(pca_train(emb, "embedding", d_out=4)["components"])


def op_curriculum(spark, d):
    from healthcare_dbt_datamart_spark.llmops.splits import curriculum_report

    return curriculum_report(
        _docs(spark, d), "n_chars", "doc_id", [500.0, 2000.0]
    ).count()


def _judged_pool(spark, d):
    li = _lineitem(spark, d)
    return li.select(
        F.pmod(F.col("l_orderkey"), F.lit(50000)).alias("query"),
        F.col("l_partkey").alias("doc_id"),
        (F.pmod(F.col("l_suppkey"), F.lit(97)) / 96.0).alias("score"),
        F.pmod(F.col("l_partkey"), F.lit(4)).cast("int").alias("rel"),
    )


def op_ndcg(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import ndcg_at_k

    return ndcg_at_k(
        _judged_pool(spark, d), "query", "doc_id", "score", "rel"
    ).count()


def op_retrieval_metrics(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        retrieval_metrics,
    )

    return retrieval_metrics(
        _judged_pool(spark, d), "query", "doc_id", "score", "rel"
    ).count()


def op_calibration_by_group(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        calibration_by_group,
    )

    li = _lineitem(spark, d).select(
        F.col("l_returnflag").alias("grp"),
        (F.pmod(F.col("l_partkey"), F.lit(97)) / 96.0).alias("score"),
        (F.col("l_orderkey") % 2).cast("int").alias("label"),
    )
    return calibration_by_group(li, "score", "label", "grp").count()


def op_data_card(spark, d):
    from healthcare_dbt_datamart_spark.models.data_card import (
        source_data_card,
    )

    return source_data_card(_docs(spark, d)).count()


def _matches(spark, d):
    orders = spark.read.parquet(f"{d}/orders.parquet")
    lx = _lineitem(spark, d).select(
        "l_orderkey",
        F.col("l_suppkey").alias("supp"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    a, b = lx.alias("a"), lx.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(
            (F.col("a.supp") != F.col("b.supp"))
            & (
                F.col("a.cents") * F.col("b.qty")
                < F.col("b.cents") * F.col("a.qty")
            )
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("a.supp").alias("winner_id"),
            F.col("b.supp").alias("loser_id"),
            F.year("o_orderdate").alias("period"),
        )
    )


def op_elo(spark, d):
    from healthcare_dbt_datamart_spark.llmops.preferences import elo_ratings

    return elo_ratings(_matches(spark, d), k=16).count()


def op_wilson(spark, d):
    from healthcare_dbt_datamart_spark.llmops.preferences import (
        wilson_winrate,
    )

    return wilson_winrate(_matches(spark, d)).count()


def op_unimax(spark, d):
    from healthcare_dbt_datamart_spark.llmops.splits import unimax_allocation

    counts = _docs(spark, d).groupBy(F.col("source").alias("grp")).agg(
        F.sum("n_chars").alias("n_tokens")
    )
    return unimax_allocation(counts, budget=10**7, max_epochs=2).count()


def op_conformal(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        conformal_report,
    )

    scored = _docs(spark, d).select(
        "doc_id",
        (F.pmod(F.col("n_chars") * 31, F.lit(997)) / 996.0).alias("s"),
    )
    return conformal_report(
        scored.filter(F.col("doc_id") % 2 == 0),
        scored.filter(F.col("doc_id") % 2 == 1),
        "s",
        alpha=0.1,
    ).count()


def op_vocab_richness(spark, d):
    from healthcare_dbt_datamart_spark.llmops.textstats import vocab_richness

    return vocab_richness(_docs(spark, d), "text", zipf_top_k=500).count()


def op_brier_decomposition(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        brier_decomposition,
    )

    return brier_decomposition(
        _scored_lineitem(spark, d), "score", "label"
    ).count()


def op_isotonic(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import (
        isotonic_apply,
        isotonic_calibration,
    )

    sc = _scored_lineitem(spark, d)
    blocks = isotonic_calibration(sc, "score", "label")
    return isotonic_apply(sc, "score", blocks).count()


def op_sparse_logreg(spark, d):
    from healthcare_dbt_datamart_spark.llmops.textstats import (
        hashed_ngram_features,
        sparse_logreg_score,
        sparse_logreg_train,
    )

    docs = _docs(spark, d)
    feats = hashed_ngram_features(docs, "text", "doc_id", n_buckets=2**16)
    labels = docs.select(
        "doc_id", (F.col("n_chars") % 2).cast("int").alias("y")
    )
    model = sparse_logreg_train(feats, labels, n_iter=2, lr=0.5)
    return sparse_logreg_score(feats, model).count()


def op_bt_ties(spark, d):
    from healthcare_dbt_datamart_spark.llmops.preferences import (
        bradley_terry_ties,
    )

    m = _matches(spark, d).select(
        F.col("winner_id").alias("side_a"),
        F.col("loser_id").alias("side_b"),
        (F.col("period") % 7 == 0).alias("is_tie"),  # a deterministic slice
    )
    return bradley_terry_ties(m, n_iter=2).count()


def op_procrustes(spark, d):
    from healthcare_dbt_datamart_spark.llmops.similarity import (
        procrustes_align,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    pairs = emb.select(
        "vec_id",
        F.col("embedding").alias("x"),
        F.reverse(F.col("embedding")).alias("y"),  # a fixed permutation
    )
    return len(procrustes_align(pairs, "x", "y")["rotation"])


def op_wilson_from_pairs(spark, d):
    from healthcare_dbt_datamart_spark.llmops.preferences import (
        wilson_from_pairs,
    )

    pc = _matches(spark, d).groupBy(
        F.col("winner_id").alias("i"), F.col("loser_id").alias("j")
    ).agg((F.lit(2) * F.count(F.lit(1))).alias("w2"))
    return wilson_from_pairs(pc).count()


def op_bpe_token_counts(spark, d):
    from healthcare_dbt_datamart_spark.llmops.bpe import (
        bpe_token_counts,
        bpe_train,
    )

    docs = _docs(spark, d)
    merges = bpe_train(docs.limit(200), "text", n_merges=4)
    return bpe_token_counts(docs, "text", "doc_id", merges).count()


def op_ppr(spark, d):
    from healthcare_dbt_datamart_spark.llmops.graph import (
        personalized_pagerank,
    )

    edges = _lineitem(spark, d).select(
        F.pmod(F.col("l_partkey"), F.lit(20000)).cast("string").alias("src"),
        F.pmod(F.col("l_suppkey"), F.lit(20000)).cast("string").alias("dst"),
    ).filter("src != dst")
    seeds = [r.src for r in edges.select("src").distinct().limit(3).collect()]
    return personalized_pagerank(edges, seeds, n_iter=2).count()


def op_compare_relations(spark, d):
    from healthcare_dbt_datamart_spark.operators.audit import (
        compare_relations,
    )

    o = spark.read.parquet(f"{d}/orders.parquet")
    mutated = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice")),
    )
    return compare_relations(o, mutated, "o_orderkey").count()


def op_chunk_text(spark, d):
    from healthcare_dbt_datamart_spark.llmops.packing import chunk_text

    return chunk_text(_docs(spark, d), "text", "doc_id", 200, 40).count()


def op_levenshtein_pairs(spark, d):
    from healthcare_dbt_datamart_spark.llmops.dedup import (
        candidate_pairs,
        levenshtein_pairs,
        lsh_band_buckets,
        minhash_signatures,
    )

    docs = _docs(spark, d)
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8, n_shingle=3)
    pairs = candidate_pairs(lsh_band_buckets(sigs, "doc_id", 8, 2), "doc_id")
    return levenshtein_pairs(
        pairs, docs, "text", "doc_id", threshold_pct=50
    ).count()


def op_chrf_report(spark, d):
    from healthcare_dbt_datamart_spark.llmops.evaluation import chrf_report

    pairs = _docs(spark, d).select(
        "doc_id",
        F.substring("text", 1, 300).alias("cand"),
        F.substring("text", 101, 300).alias("ref"),
    )
    return chrf_report(pairs, "cand", "ref", "doc_id").count()


def op_min_k_prob(spark, d):
    from healthcare_dbt_datamart_spark.llmops.filtering import min_k_prob

    docs = _docs(spark, d)
    return min_k_prob(
        docs, "text", "doc_id",
        ref_df=docs.filter(F.col("source") == "src0"), k_pct=20,
    ).count()


def op_mad_scores(spark, d):
    from healthcare_dbt_datamart_spark.llmops.splits import mad_scores

    return mad_scores(
        _docs(spark, d).select(
            "lang", "doc_id", F.col("n_chars").cast("double").alias("v")
        ),
        "v", "doc_id", grp_col="lang",
    ).count()


OPS = {
    "roc_auc": op_roc_auc,
    "ndcg_at_k": op_ndcg,
    "retrieval_metrics": op_retrieval_metrics,
    "calibration_by_group": op_calibration_by_group,
    "source_data_card": op_data_card,
    "calibration_summary": op_calibration,
    "spearman_rho": op_spearman,
    "bleu_corpus": op_bleu,
    "rouge_l": op_rouge_l,
    "distinct_n": op_distinct_n,
    "line_dedup": op_line_dedup,
    "source_overlap_kmv": op_source_overlap,
    "krippendorff_alpha": op_krippendorff,
    "hits_fixedpoint": op_hits,
    "pca_train": op_pca,
    "curriculum_report": op_curriculum,
    "elo_ratings": op_elo,
    "wilson_winrate": op_wilson,
    "unimax_allocation": op_unimax,
    "conformal_report": op_conformal,
    "vocab_richness": op_vocab_richness,
    "brier_decomposition": op_brier_decomposition,
    "isotonic_calibration": op_isotonic,
    "sparse_logreg": op_sparse_logreg,
    "bradley_terry_ties": op_bt_ties,
    "procrustes_align": op_procrustes,
    "wilson_from_pairs": op_wilson_from_pairs,
    "bpe_token_counts": op_bpe_token_counts,
    "personalized_pagerank": op_ppr,
    "compare_relations": op_compare_relations,
    "chunk_text": op_chunk_text,
    "levenshtein_pairs": op_levenshtein_pairs,
    "chrf_report": op_chrf_report,
    "min_k_prob": op_min_k_prob,
    "mad_scores": op_mad_scores,
}


def main() -> None:
    args = sys.argv[1:]
    copies = 10
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
        del args[i : i + 2]
    names = args or list(OPS)

    from healthcare_dbt_datamart_spark.session import get_spark

    spark = get_spark("scale-wave2")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/root/testdata/sf0.1"
    out_dir = tempfile.mkdtemp(prefix="spark-graft-wave2-")
    try:
        t0 = time.perf_counter()
        build_replica(spark, base, out_dir, copies)
        print(
            f"# replica x{copies} built in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        for name in names:
            fn = OPS[name]
            fn(spark, base)  # warm codegen/session
            t0 = time.perf_counter()
            fn(spark, base)
            base_sec = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, out_dir)
            scaled_sec = time.perf_counter() - t0
            print(json.dumps({
                "op": name,
                "base_sec": round(base_sec, 3),
                "scaled_sec": round(scaled_sec, 3),
                "ratio": round(scaled_sec / max(base_sec, 1e-9), 2),
            }))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
