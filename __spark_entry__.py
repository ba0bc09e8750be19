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
    # --- round-8 NEW queries: brand-new cross-engine surfaces, the
    # least battle-tested — verdict needed first.
    # (uncommented one-by-one as each lands this round:)
    "unigram_em_fit",             # SentencePiece-style unigram-LM EM trainer
    "unigram_em_encode",          # Viterbi re-encode with the EM-trained table
    "multiscale_repeated_spans",  # {8,16,32,64}-token cross-doc span dedup mass
    "dsir_importance_weights",    # hashed-ngram DSIR domain-selection weights
    "crossdoc_line_dedup",        # C4-style exact line dedup across documents
    # r8 queries added AFTER the 50-slot rotation filled (they sort
    # into the never-checked pool automatically and lead the r9
    # rotation): mmr_diversified_topk, filter_agreement_kappa,
    # max_coverage_select, quality_threshold_sweep, source_dedup_matrix,
    # pq_rerank_topk.
    # --- the FULL remaining never-checked complement (40 names, closes
    # the driver-verification union at 290/290 — VERDICT r7 item 1).
    "length_deciles",
    "length_deciles_scaled",
    "common_phrases",
    "training_mix_report",
    "embedding_norms",
    "ann_retrieve_docs",
    "item_pmi",
    "mad_outliers",
    "discriminative_terms",
    "k_anonymity_audit",
    "lineitem_corr",
    "basket_pairs",
    "source_vocab_overlap",
    "markov_transitions",
    "twap_price",
    "bigram_novelty",
    "rfm_segments",
    "rfm_segments_scaled",
    "benford_audit",
    "calinski_harabasz",
    "embedding_scatter",
    "trimmed_mean_prices",
    "lexical_diversity",
    "zipf_slope",
    "event_burstiness",
    "peak_concurrency",
    "session_coverage",
    "join_fanout_audit",
    "cramers_v",
    "corpus_health_report",
    "conversion_lag_quantiles",
    "spearman_length_tokens",
    "journey_entropy",
    "hill_tail_index",
    "template_prefix_audit",
    "heaps_law_curve",
    "seasonal_anomalies",
    "cusum_changepoint",
    "event_trigram_mining",
    "ab_test_analysis",
    # --- declared re-verdicts (DECLARED_REVERDICTS in
    # tests/test_suite_meta.py): r1/r3-green queries rewritten in the
    # r4/r5 window-rework after their verdicts — their CURRENT
    # implementations have never been driver-checked.
    "mann_whitney_test",
    "quantile_normalize_lengths",
    "bm25_search",
    "revenue_concentration",
    "key_gini_skew",
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
