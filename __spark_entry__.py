"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``city_payroll_data_pipeline_spark``; this
module is a thin adapter over the suite registry
(city_payroll_data_pipeline_spark/suite/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from city_payroll_data_pipeline_spark.suite import build_suite  # noqa: E402

_SUITE = None


def _suite():
    global _SUITE
    if _SUITE is None:
        _SUITE = build_suite()
    return _SUITE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the budget report
    (reference serve_flight.py:295 semantics) over the orders fact."""
    from city_payroll_data_pipeline_spark.suite.parity import q_budget_report

    return q_budget_report(spark, "/root/testdata/sf0.001")


def _already_checked() -> set[str]:
    """Names already driver-verified in some round (CHECKED.md ledger)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "CHECKED.md")
    try:
        with open(path) as f:
            return {
                line[2:].strip()
                for line in f
                if line.startswith("- ")
            }
    except OSError:
        return set()


# Queries added in the CURRENT round — the least battle-tested
# cross-engine surfaces, surfaced to the very front of the driver's
# 50-query sample so each round's new operators get an official
# driver verdict immediately. Refresh this tuple each round.
_ROUND_NEW = (
    # --- round-6 CHANGED queries: both graduated from rows-only to
    # full register-level HLL oracles this round (VERDICT r5 item 6) —
    # the changed plans + new oracles need an official verdict first.
    "approx_distinct_stats",
    "approx_rolling_users",
    # --- the one remaining no-oracle query (current_timestamp is
    # irreducibly non-deterministic): last official rows-only verdict
    # was r3; VERDICT r5 item 7 asks for a current-gate re-verdict so
    # every no-oracle query has a fresh ledger row.
    "audit_timestamp",
    # --- round-6 NEW queries: hash-sampled eval twins (VERDICT r5
    # item 4) — brand-new cross-engine surfaces, verdict needed first.
    "ann_recall_report_sampled",
    "ndcg_eval_sampled",
    # --- round-6 NEW: product-quantization retriever + index audit.
    "pq_ann_topk",
    "pq_code_balance",
    "ivfpq_ann_topk",
    "ivf_probe_curve",
    "pq_distortion_report",
    "pq_recall_report",
    # --- round-6 NEW: published Gopher ruleset as a per-source funnel.
    "gopher_rules_funnel",
    "gopher_repetition_funnel",
    # --- round-6 NEW: greedy (WordPiece-inference) encoder vs BPE replay.
    "wordpiece_greedy_encode",
    # --- round-6 NEW: leave-one-source-out mix influence.
    "loo_source_influence",
    # --- round-6 NEW: deterministic Laplace-mechanism DP release.
    "dp_noisy_counts",
    # --- round-6 NEW: Fellegi-Sunter probabilistic record linkage.
    "fellegi_sunter_linkage",
    # --- the 15 queued below the r5 cut (VERDICT r5 item 1 names
    # these as the front of the r6 queue).
    "dedup_clusters",
    "minhash_dedup_pairs",
    "semantic_dedup_pairs",
    "touch_attribution",  # r4 bench regression — floor re-confirmed solo r5
    "jl_projection_error",  # r4 bench regression — fixed, floor 0.88 s r5
    "quantile_normalize_lengths",  # r4: rebuilt on sharded row ids
    "trade_pagerank",
    "nation_ppr",
    "bpe_encode_tokens",
    "media_thumbnail",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "sq8_ann_topk",
    "cosine_topk",
    "incremental_dedup",
    # --- 32 more never-checked, custom-determinism machinery first
    # (dedup/fingerprint/media/sharding plumbing over simple aggs).
    "simhash_near_pairs",  # also the r6 solo-refloor target
    "exact_dedup_groups",
    "dedup_clusters_star",
    "dedup_best_keeper",
    "prefix_jaccard_pairs",
    "ngram_jaccard_pairs",
    "dedup_threshold_sweep",
    "cosine_neardup_pairs",
    "rrf_fused_topk",
    "nearest_centroid_eval",
    "matryoshka_recall",
    "hard_negative_topk",
    "contrastive_negatives",
    "knn_label_noise",
    "media_feature_extract",
    "media_frame_sample",
    "media_chunk_plan",
    "media_bytes_meta",
    "doc_fingerprint",
    "chunk_dedup_rate",
    "merkle_bucket_manifest",
    "rendezvous_shards",
    "epoch_shuffle_plan",
    "pack_sequences",
    "doc_chunks",
    "blocked_fuzzy_match",
    "fuzzy_name_pairs",
    "hash_uniformity_check",
    "zorder_layout_stats",
    "pps_weighted_sample",
    "hash_sample_docs",
    "train_val_test_split",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering: the driver's correctness gate samples the FIRST 50
    entries, so this round's new queries come first, then queries
    never yet driver-checked (per CHECKED.md) — each round extends the
    union of driver-verified queries instead of re-checking the same
    prefix. Every query is still locally verified against the same
    oracle by tests/test_oracle_parity.py regardless of position."""
    done = _already_checked()
    # _ROUND_NEW members keep the tuple's own order (it is a priority
    # list — this round's new queries first, then the heavy
    # never-checked machinery), so position 50 cuts exactly where the
    # tuple says, not where module import order happens to fall.
    rank = {name: i for i, name in enumerate(_ROUND_NEW)}
    items = sorted(
        _suite().items(),
        key=lambda kv: (
            kv[0] not in rank,
            rank.get(kv[0], 0),
            kv[0] in done,
        ),
    )
    return {name: q.spark for name, q in items}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: q.oracle for name, q in _suite().items() if q.oracle is not None}
