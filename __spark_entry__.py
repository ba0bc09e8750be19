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
    # --- round-7 NEW queries: brand-new cross-engine surfaces, the
    # least battle-tested — verdict needed first.
    "media_phash_pairs",          # perceptual-hash image dedup (r6 item 7)
    "pq_recall_report_sampled",   # sampled bench twin (r6 item 2)
    "unigram_viterbi_encode",     # unigram-LM Viterbi segmentation DP
    "media_audio_energy",         # framed audio energy/VAD (integer DSP)
    "embedding_mmd_drift",        # embedding-space drift (linear MMD^2)
    # --- VERDICT r6 item 1's named priority list: custom-determinism
    # machinery over simple aggregates, never driver-checked.
    "heavy_hitter_tokens",
    "repeated_spans",
    "histogram_quantiles",
    "pack_sequences",
    "pii_scrub",
    "c4_line_filter",
    "rendezvous_shards",
    "zorder_layout_stats",
    "merkle_bucket_manifest",
    "dataset_manifest",
    "incremental_report_maintenance",
    "psi_drift",
    "ks_source_drift",
    "trade_triangles",
    "quality_logit_deciles",
    "quality_logit_deciles_scaled",
    # --- the r6 queue tail that fell below that round's 50-cut.
    "doc_fingerprint",
    "chunk_dedup_rate",
    "epoch_shuffle_plan",
    "doc_chunks",
    "blocked_fuzzy_match",
    "fuzzy_name_pairs",
    "hash_uniformity_check",
    "pps_weighted_sample",
    "hash_sample_docs",
    "train_val_test_split",
    # --- more custom-determinism machinery (sampling/split plumbing,
    # text scoring) ahead of plain aggregates.
    "stratified_split_plan",
    "split_leakage_check",
    "per_group_sample",
    "stratified_sample",
    "budget_rebalance_sample",
    "tfidf_top_terms",
    "doc_quality",
    "doc_repetition",
    "per_source_ols",
    "quality_metrics_long",
    "contamination_check",
    "unicode_sanitize",
    # --- stats / corpus-ops tail (fills the 50 exactly; the remaining
    # ~37 never-checked names close out in round 8).
    "length_zscores",
    "mixed_lang_docs",
    "dedup_rate_report",
    "temperature_mixture",
    "corpus_snapshot_diff",
    "data_freshness_audit",
    "label_centroid_sim",
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
