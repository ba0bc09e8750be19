"""Partitioning-invariance sweep — the 1000-executor determinism claim.

Every suite query is supposed to produce BIT-IDENTICAL results no
matter how the data is partitioned: on a real cluster the shuffle
partition count, input split layout, and executor count all differ
from local[32], and any query whose values depend on them (a raw
double sum folded in shuffle order, a rank with an under-specified
ORDER BY, a first()/head() masquerading as a reduction) would pass
every fixed-layout test and still be wrong in production.

This sweep re-runs a representative query subset with a hostile
layout — a prime shuffle-partition count AND every input table
round-robin repartitioned to a different prime (via the
``suite._HOSTILE_REPARTITION`` loader hook, so input-layout-sensitive
paths like mapInPandas candidate generation are exercised too) — and
asserts exact frame equality against the default layout. It is the
local stand-in for "would the answer change on a 1000-executor
cluster?".
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import (
    assert_frames_match,
    pooled_spark_frames,
    selected_param_names,
)

# One representative per determinism-sensitive mechanism:
#   decimal-routed sums, window ranks, integer-exact statistics,
#   dedup candidate pipelines, sketch + recheck, sharded numbering,
#   rational-arithmetic reports, time-series windows.
REPRESENTATIVES = [
    "budget_report",            # decimal-routed SUM + global sort
    "kpi_stats",                # grand totals + exact median
    "pricing_summary",          # multi-agg decimal routing
    "top_orders_per_priority",  # window rank with tie-breaks
    "event_sessions",           # gap sessionization windows
    "exact_dedup_groups",       # hash-fingerprint groupBy
    "minhash_dedup_pairs",      # shingle→LSH→verify pipeline
    "prefix_jaccard_pairs",     # prefix filter + compact verify
    "heavy_hitter_tokens",      # partition-dependent candidates, exact result
    "stable_doc_ids",           # sharded two-phase numbering
    "rfm_segments",             # NTILE quintiles + decimal sums
    "jl_projection_error",      # DECIMAL(38,0) residual sums
    "training_mix_report",      # composed rational-arithmetic plan
    "gap_fill_interpolate",     # spine fan-out + IGNORE NULLS windows
    "markov_transitions",       # LEAD over (user, time)
    "bm25_search",              # rounded-ln idf + decimal score sums
    "cdc_chunks",               # rolling-hash boundaries + window chunk ids
    "cramers_v",                # decimal-routed chi-square cell sums
    "mann_whitney_test",        # pooled rank sums with tie averaging
    "rfm_segments_scaled",      # ntile-without-global-sort machinery
    # round-5 machinery
    "peak_concurrency",         # _sharded_sweep splice + approx boundaries
    "revenue_concentration",    # sharded rank + running-sum splice
    "embedding_spectral_norm",  # integer power iteration, driver normalize
    "kneser_ney_bigram",        # bigram-type stats + TakeOrdered survivors
    "markov_stationary",        # collected matrix + exact integer iteration
    "quantile_sketch_error",    # bin cumsum + rank-in-located-bin
    "log_rank_test",            # risk-set cumsums + decimal term sums
    "decision_stump_split",     # bin cumsum + double-score argmax
    "t_closeness_audit",        # band-spine cumsum + decimal cross products
    "jackknife_ratio_se",       # decimal-quantized leave-one-out sums
    "adamic_adar_links",        # per-size decimal term sums + top-k
    "poisson_bootstrap_ci",     # hash-ladder Poisson weights + replica ranks
    # round-5 mlops batch
    "embedding_auc_separability",  # integer dot scores + per-label rank cumsum
    "lpa_communities",          # iterative argmax windows on checkpointed edges
    "hll_distinct_audit",       # max-register aggregate + LC branch decision
    "randomization_test_uplift",  # bit-parallel rerandomized decimal sums
    "xent_mix_weights",         # rounded-ln terms + decimal MWU trajectory
    # round-7 additions
    "unigram_viterbi_encode",   # collect_list-built option arrays + decimal DP
    "media_phash_pairs",        # per-batch mapInPandas hash + banded join
    # round-8 additions
    "unigram_em_fit",           # DataFrame-resident EM loop: seed top-m,
                                # Viterbi E-step folds, prune/renormalize
    "multiscale_repeated_spans",  # scale-tagged hash explode + dup semi signal
    "mmr_diversified_topk",     # greedy struct-max fold over collected pools
    "max_coverage_select",      # driver-round greedy argmax collects
    "dsir_importance_weights",  # decimal per-doc sums from broadcast deltas
    # round-9 additions
    "pq_trained_recall",        # driver-side Lloyd over an orderBy-sorted
                                # collected sample + ADC eval arms
    "ivfpq_residual_recall",    # residual Lloyd build + coarse-dot ADC
    "hits_scores",              # iterative joins + in-plan normalize totals
    "stylometry_burrows_delta",  # corpus count shuffle + TakeOrdered top-M
    "session_overlap_pairs",    # bucket-explode self-join + map-side dedup
    "fps_coreset",              # driver-round argmax greedy (TakeOrdered)
    "holt_linear_forecast",     # array_sort'd collect_list + codegen fold
    "join_size_estimate",       # mergeable CM sketches + inner product
    # round-10 additions
    "quality_probe_train",      # integer XᵀX sums + in-plan Cramer solve
    "packing_bfd_compare",      # sort_array'd collect_list + BFD array fold
    "kmv_source_overlap",       # min-k WindowGroupLimit + sorted sketch arrays
    "shapley_vocab_attribution",  # collect_set owner sets + micro-unit sums
    "wasserstein_length_drift",   # histogram cumsums + decimal term sums
    "bradley_terry_sources",    # sharded pairing + checkpointed integer MM
    "holt_winters_seasonal",    # two-season init + rotating-seasonal fold
    "loop_degeneration_report",  # map-side run fold + broadcast argmin join
    "zorder_skipping_gain",     # broadcast bounds + map-side layout keys
]


@pytest.fixture(scope="module")
def suite():
    from city_payroll_data_pipeline_spark.suite import build_suite

    return build_suite()


@pytest.fixture(scope="module")
def invariance_frames(request, suite, spark):
    """Both layouts' results for every representative, computed in two
    pooled phases (oracle_utils.pooled_spark_frames): ALL baselines
    under the default layout, then — with the hostile shuffle count and
    the ``_HOSTILE_REPARTITION`` input-relayout hook set ONCE — all
    hostile runs. Phase ordering preserves exactly the per-test
    set/run/restore semantics this sweep had when each test flipped the
    globals around its own pair of runs; the pooling only overlaps the
    independent Spark jobs within a phase (the serial sweep was part of
    the pytest wall-time that outgrew the driver's budget, VERDICT r10
    item 1)."""
    import city_payroll_data_pipeline_spark.suite as suite_mod

    names = selected_param_names(
        request, "test_result_invariant_under_partitioning", REPRESENTATIVES
    )
    baselines = pooled_spark_frames(suite, spark, SF_SMOKE, names)

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    # loud failure if the hook is ever renamed — a bare setattr would
    # create a dead attribute and silently stop exercising the
    # input-layout sensitivity this sweep exists for
    assert hasattr(suite_mod, "_HOSTILE_REPARTITION")
    suite_mod._HOSTILE_REPARTITION = 5  # round-robin input re-layout
    try:
        hostiles = pooled_spark_frames(suite, spark, SF_SMOKE, names)
    finally:
        suite_mod._HOSTILE_REPARTITION = None
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    return saved, baselines, hostiles


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_under_partitioning(name, invariance_frames):
    saved, baselines, hostiles = invariance_frames
    baseline, exc_b = baselines[name]
    if exc_b is not None:
        raise exc_b
    hostile, exc_h = hostiles[name]
    if exc_h is not None:
        raise exc_h
    assert_frames_match(
        hostile, baseline, f"{name} [shuffle=7, input repartition=5 vs {saved}]"
    )
