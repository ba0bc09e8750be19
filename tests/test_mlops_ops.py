"""Behavioral tests for the round-5 mlops batch: these prove the
SEMANTICS (separation ⇒ AUC=1, cliques ⇒ communities, sketch error
bounds, CM one-sidedness, robustness to outliers), complementing the
oracle-parity tests which prove cross-engine equality."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE

from city_payroll_data_pipeline_spark.suite import build_suite


@pytest.fixture(scope="module")
def suite():
    return build_suite()


def _synthetic_sf(spark, tmp_path_factory, name, df, table_name):
    d = tmp_path_factory.mktemp(name)
    df.write.mode("overwrite").parquet(f"{d}/{table_name}.parquet")
    return str(d)


def test_auc_is_one_on_perfectly_separated_labels(
    spark, suite, tmp_path_factory
):
    """Labels living on orthogonal axes are perfectly ranked by their
    centroid similarity → one-vs-rest AUC must be exactly 1.0."""
    rows = []
    for i in range(24):
        label = i % 2
        vec = [0.0] * 64
        vec[label] = 10.0
        vec[32 + (i % 4)] = 0.25  # within-class variation, orthogonal
        rows.append((i, vec, label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sf = _synthetic_sf(spark, tmp_path_factory, "auc_sep", df, "embeddings")
    out = {
        r["label"]: r["auc"]
        for r in suite["embedding_auc_separability"].spark(spark, sf).collect()
    }
    assert out == {0: 1.0, 1: 1.0}


def test_lpa_recovers_disjoint_cliques(spark, suite, tmp_path_factory):
    """Two disconnected co-purchase cliques → exactly two communities,
    each holding its clique's parts."""
    rows = []
    # clique A: parts 1-4 co-ordered in orders 1..6
    for o in range(1, 7):
        for p in (1, 2, 3, 4):
            rows.append((o, p))
    # clique B: parts 11-14 co-ordered in orders 101..106
    for o in range(101, 107):
        for p in (11, 12, 13, 14):
            rows.append((o, p))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = _synthetic_sf(spark, tmp_path_factory, "lpa_cliques", df, "lineitem")
    out = suite["lpa_communities"].spark(spark, sf).collect()
    sizes = sorted(r["n_parts"] for r in out)
    assert sizes == [4, 4], out
    # min-label tie-break: community ids are the smallest member ids
    assert sorted(r["community"] for r in out) == [1, 11]


def test_hll_error_inside_theoretical_bound(spark, suite):
    """HLL standard error is 1.04/sqrt(m); every group must land well
    inside 4 sigma (p12 -> 1.6% sigma, bound 6.5%)."""
    out = suite["hll_distinct_audit"].spark(spark, SF_CORRECT).collect()
    sigma = 1.04 / math.sqrt(4096)
    for r in out:
        assert abs(r["rel_error"]) < 4 * sigma, r


def test_countmin_never_undercounts(spark, suite):
    """The CM one-sided guarantee: estimate >= exact on every probe."""
    out = suite["countmin_heavy_tokens"].spark(spark, SF_CORRECT).collect()
    assert len(out) == 20
    for r in out:
        assert r["cm_estimate"] >= r["exact_cnt"], r
        assert r["overcount"] == r["cm_estimate"] - r["exact_cnt"]


def test_bloom_fpr_near_theory(spark, suite):
    """Measured FPR must be nonnegative and within sampling noise of
    the theoretical operating point (loose 3x + 1% band)."""
    r = suite["bloom_fpr_audit"].spark(spark, SF_CORRECT).collect()[0]
    assert r["false_positives"] >= 0
    assert r["measured_fpr"] <= 3 * r["theoretical_fpr"] + 0.01, r


def test_randomization_test_null_is_not_extreme(spark, suite):
    """Arms are a hash split of the same population → the observed gap
    is a null draw; p must not be at the extreme low end."""
    r = suite["randomization_test_uplift"].spark(spark, SF_CORRECT).collect()[0]
    assert r["n_replicas"] == 32
    assert r["p_value"] > 2 / 33, r


def test_median_of_means_shrugs_off_outliers(
    spark, suite, tmp_path_factory
):
    """A handful of enormous orders drags the plain mean far more than
    the median-of-means — the estimator's whole point."""
    rows = [(i, 100.0) for i in range(2000)]
    rows += [(100000 + i, 1e9) for i in range(5)]  # corrupted tail
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    sf = _synthetic_sf(spark, tmp_path_factory, "mom_outliers", df, "orders")
    r = suite["median_of_means"].spark(spark, sf).collect()[0]
    assert abs(r["mom_mean"] - 100.0) < abs(r["plain_mean"] - 100.0) / 100
    assert r["plain_mean"] > 1e6  # the plain mean IS dragged


def test_lsh_curve_monotone_and_bounded(spark, suite):
    out = (
        suite["lsh_tuning_curve"].spark(spark, SF_CORRECT)
        .orderBy("s_pct")
        .collect()
    )
    ps = [r["p_catch"] for r in out]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert ps == sorted(ps) and ps[0] < ps[-1]
    # census consistency: one census, repeated on every curve row
    assert len({(r["n_buckets"], r["n_candidate_pairs"]) for r in out}) == 1


def test_sprt_llr_consistent_with_decision(spark, suite):
    out = suite["sprt_conversion_gate"].spark(spark, SF_CORRECT).collect()
    up, lo = 2.9444389791664403, -2.9444389791664403
    prev_n = 0
    for r in sorted(out, key=lambda r: r["day"]):
        assert r["n_cum"] >= prev_n
        prev_n = r["n_cum"]
        want = (
            "accept_h1" if r["llr"] >= up
            else "accept_h0" if r["llr"] <= lo
            else "continue"
        )
        assert r["decision"] == want, r


def test_mwu_upweights_higher_cross_entropy(spark, suite):
    """The mix weight must be strictly increasing in the source's
    cross-entropy (the polynomial-MWU factor is monotone in H)."""
    out = suite["xent_mix_weights"].spark(spark, SF_CORRECT).collect()
    by_h = sorted(out, key=lambda r: r["xent_nats"])
    ws = [r["mix_weight"] for r in by_h]
    assert ws == sorted(ws)
    assert abs(sum(ws) - 1.0) < 1e-4


def test_mi_zero_for_constant_feature(spark, suite, tmp_path_factory):
    """A constant feature carries zero information about any label —
    MI must be exactly 0 for it."""
    rows = [
        (i, float(i % 2) / 10, "A", "F", 1.0, "2024-01-0%d" % (i % 9 + 1))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_discount double, l_returnflag string,"
        " l_linestatus string, l_quantity double, l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    sf = _synthetic_sf(spark, tmp_path_factory, "mi_const", df, "lineitem")
    out = {
        r["feature"]: r["mi_nats"]
        for r in suite["mi_feature_screen"].spark(spark, sf).collect()
    }
    # returnflag and linestatus are constant -> zero MI; qty too
    assert out["returnflag"] == 0.0
    assert out["linestatus"] == 0.0


def test_modularity_half_on_two_cliques(spark, suite, tmp_path_factory):
    """Two equal disconnected communities: Q = 2*(1/2 - (1/2)^2) = 0.5,
    the textbook value for a perfect 2-community partition."""
    rows = []
    for o in range(1, 7):
        for p in (1, 2, 3, 4):
            rows.append((o, p))
    for o in range(101, 107):
        for p in (11, 12, 13, 14):
            rows.append((o, p))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    d = tmp_path_factory.mktemp("mod_cliques")
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    out = suite["lpa_modularity"].spark(spark, str(d)).collect()
    assert out[0]["n_communities"] == 2
    assert out[0]["modularity"] == pytest.approx(0.5, abs=1e-6)
    # every edge is intra-community in a perfect partition
    for r in out:
        assert r["in_c"] == r["deg_c"]


def test_lpa_edge_frame_is_symmetric_on_hub_graphs(spark, tmp_path_factory):
    """Per-dst kNN alone is asymmetric on hubs: a 10-spoke hub's top-8
    prunes (spoke→hub) for its two weakest spokes while every spoke
    keeps (hub→spoke). The symmetrized frame must contain the reverse
    of every edge with the same weight — the invariant Newman
    modularity's Σw = 2m premise rests on."""
    from city_payroll_data_pipeline_spark.suite.mlops import _lpa_edges

    rows = []
    order = 0
    for spoke in range(1, 11):  # hub part 100, spokes 1..10
        for _ in range(spoke):  # pair weight = spoke index
            order += 1
            rows.append((order, 100))
            rows.append((order, spoke))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    d = tmp_path_factory.mktemp("lpa_hub")
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    edges = {
        (r["src"], r["dst"], r["w"])
        for r in _lpa_edges(spark, str(d)).collect()
    }
    assert edges  # non-degenerate
    assert {(d_, s, w) for (s, d_, w) in edges} == edges  # symmetric
    # survival-by-either-endpoint: all 10 hub edges survive even
    # though the hub's own top-8 drops the two weakest
    assert {(100, s, s) for s in range(1, 11)} <= edges


def test_power_mde_shrinks_with_n(spark, suite):
    """More data → smaller detectable effect: MDE at sf0.01 must beat
    the sf0.001 readout (1/sqrt(n) scaling, ~3x for 10x rows)."""
    small = suite["experiment_power_mde"].spark(spark, SF_SMOKE).collect()[0]
    big = suite["experiment_power_mde"].spark(spark, SF_CORRECT).collect()[0]
    assert big["n_c"] + big["n_t"] > 5 * (small["n_c"] + small["n_t"])
    assert 0 < big["mde_rel"] < small["mde_rel"]
    assert big["mde_abs"] == pytest.approx(
        small["mde_abs"] / ((small["n_c"] + small["n_t"])
                            / (big["n_c"] + big["n_t"])) ** -0.5,
        rel=0.35,
    )


def test_mann_whitney_z_matches_textbook_formula(spark, suite):
    """Independent pure-Python recomputation of the normal-approx
    Mann-Whitney z on the same data: Var(U) = nc*nt*(N+1)/12. The
    original implementation dropped the /3 inside the 4x-variance
    shortcut, understating every z by sqrt(3) — and the oracle
    replicated the formula, so hash parity could not catch it."""
    import hashlib

    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT o_custkey, o_totalprice FROM "
        f"read_parquet('{SF_CORRECT}/orders.parquet')"
    ).fetchall()
    sample = []
    for ck, price in rows:
        arm = int(hashlib.md5(str(ck).encode()).hexdigest()[:12], 16) % 2
        sample.append((arm, float(price)))
    # tie-averaged ranks
    sample_sorted = sorted(range(len(sample)), key=lambda i: sample[i][1])
    ranks = [0.0] * len(sample)
    i = 0
    while i < len(sample_sorted):
        j = i
        while (
            j + 1 < len(sample_sorted)
            and sample[sample_sorted[j + 1]][1] == sample[sample_sorted[i]][1]
        ):
            j += 1
        avg = (i + 1 + j + 1) / 2
        for k in range(i, j + 1):
            ranks[sample_sorted[k]] = avg
        i = j + 1
    nt = sum(1 for a, _ in sample if a != 0)
    nc = len(sample) - nt
    r_t = sum(r for (a, _), r in zip(sample, ranks) if a != 0)
    u = r_t - nt * (nt + 1) / 2
    mu = nc * nt / 2
    var = nc * nt * (nc + nt + 1) / 12
    z_expected = (u - mu) / var**0.5

    out = suite["mann_whitney_test"].spark(spark, SF_CORRECT).collect()[0]
    assert out["n_control"] == nc and out["n_treatment"] == nt
    assert out["z_stat"] == pytest.approx(z_expected, abs=1e-4)
