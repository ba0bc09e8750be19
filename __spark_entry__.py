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
    # --- round-5 NEW queries (least battle-tested cross-engine)
    "embedding_auc_separability",
    "lpa_communities",
    "hll_distinct_audit",
    "sprt_conversion_gate",
    "countmin_heavy_tokens",
    "mi_feature_screen",
    "median_of_means",
    "bloom_fpr_audit",
    "randomization_test_uplift",
    "lsh_tuning_curve",
    "xent_mix_weights",
    "hll_union_intersect_audit",
    "offpolicy_eval_ips",
    "quantile_treatment_effects",
    "lpa_modularity",
    "experiment_power_mde",
    "t_closeness_audit",
    "jackknife_ratio_se",
    "adamic_adar_links",
    "calibration_ece",
    "span_corruption_plan",
    "ndcg_eval",
    "poisson_bootstrap_ci",
    "cuped_adjustment",
    "kneser_ney_bigram",
    "degree_assortativity",
    "mahalanobis_outliers",
    "conformal_calibration",
    "embedding_spectral_norm",
    "bpe_compression_curve",
    "dedup_method_agreement",
    "k_core_decay",
    "l_diversity_audit",
    "quantile_sketch_error",
    "markov_stationary",
    "weighted_reservoir_sample",
    "log_rank_test",
    "simpson_paradox_audit",
    "decision_stump_split",
    "bpe_merges",  # graduated rows-only -> full oracle this round
    # --- round-5 rewrites: a fresh official verdict on the changed
    # plans retires the most risk. (mann_whitney_test and
    # stable_doc_ids represent the two r4 rewrite patterns —
    # distinct-value cumsum and sharded row ids; their pattern twins
    # queue for r6.)
    "revenue_concentration",  # r5: rewritten on sharded row ids
    "key_gini_skew",  # r5: rewritten on distinct-count cumsum ranks
    "mann_whitney_test",  # r4: rebuilt on distinct-value cumsum
    "stable_doc_ids",  # r4: rebuilt on sharded row ids
    # --- heaviest never-checked custom-determinism machinery (VERDICT
    # r4 item 7 names these six; ann_recall_report also certifies all
    # four retrievers). All six must sit ABOVE the driver's 50-cut.
    "ann_recall_report",
    "bm25_search",
    "cdc_chunks",
    "corpus_clean_pipeline",
    "bloom_semi_join",
    "winnow_fingerprints",
    # below the 50-cut this round; next in line for r6
    "dedup_clusters",
    "minhash_dedup_pairs",
    "semantic_dedup_pairs",
    "touch_attribution",  # r4 bench regression — floor re-confirmed solo
    "jl_projection_error",  # r4 bench regression — fixed + floor confirmed
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
