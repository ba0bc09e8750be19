"""ML-evaluation and sketch-certification operators (round 5 batch).

Operators a training-data platform runs AFTER the corpus is built:
classifier/embedding evals (AUC), community structure, sequential
experiment gates, robust estimators, and hand-rolled sketches whose
math is replayed exactly by the DuckDB oracle (the engine does not ask
you to trust its sketch — it proves the registers).

Reference parity note: the reference (SURVEY §2) has no ML-eval
surface at all; everything here is beyond-parity, built Spark-first.

Determinism rule (house style, see suite/__init__.py): integers /
DECIMAL end-to-end until one final division or ROUND; every ln is
taken on an exact integer ratio or shared literal and rounded to
8-10 dp immediately in BOTH engines (the bm25/psi ln rule).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from city_payroll_data_pipeline_spark.functions.sketches import (
    HLL_M as _HLL_M,
)
from city_payroll_data_pipeline_spark.functions.sketches import (
    hll_bucket_rho,
)
from city_payroll_data_pipeline_spark.suite import Query, table
from city_payroll_data_pipeline_spark.suite.parity import _sql_round

# --------------------------------------------------------------------------
# embedding_auc_separability — per-label one-vs-rest ROC AUC of the
# centroid-similarity scorer.
#
# The standard "are my classes linearly findable in embedding space"
# eval: score every vector by its dot product with each label's
# centroid and ask how well that score ranks members of the label
# above non-members. AUC is computed EXACTLY via the tie-adjusted
# rank-sum identity AUC = U / (n1·n0) (AUC is the Mann-Whitney
# statistic — Hanley & McNeil 1982), with the doubled-rank integer
# trick from mann_whitney_test: the doubled tie-averaged rank of a
# score group is 2·(#below) + (#at) + 1, an exact BIGINT, so U and
# the AUC numerator never touch a double.
#
# Determinism: scores are exact BIGINT dot products of 1e-4-grid
# quantized vectors (operators/similarity.py) against UNNORMALIZED
# integer sum-centroids (cosine/AUC are rank evals — monotone
# transforms of the score change nothing, so the un-divided centroid
# is the right one to use). At 1e9 vectors the centroid elements are
# ≤1e13 and dots ≤6.4e18 — still inside BIGINT; beyond that, drop the
# grid to 1e-3.
#
# Scale: corpus read once; the ×|labels| fan-out is a broadcast
# nested-loop against the |labels|-row centroid frame (map-side);
# the rank cumsum is a window PARTITIONED by label over distinct
# scores, so no single-reducer frame exists anywhere.
# --------------------------------------------------------------------------


def q_embedding_auc_separability(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators import similarity as sim

    emb = table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", "label", sim.quantize(F.col("embedding")).alias("q")
    )
    # consumed twice (centroid build + scoring) and the scoring branch
    # blocks on the centroid broadcast: materialize the quantized scan
    # once instead of re-reading + re-quantizing per branch.
    # Local-vs-cluster delta: this frame is corpus-sized — at 100 TB
    # swap the checkpoint for recompute (quantize is one map-side
    # projection) or persist(DISK_ONLY); the local materialization is
    # a small-input-only convenience (same accepted trade as
    # stable_doc_ids, see SCALE.md).
    emb = emb.localCheckpoint()
    sums = (
        emb.select("label", F.posexplode("q").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.sum("val").alias("s"))
    )
    cents = sums.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "s"))),
            lambda x: x["s"],
        ).alias("c")
    ).select(F.col("label").alias("probe"), "c")
    scored = emb.join(F.broadcast(cents)).select(
        "probe",
        sim.dot_q(F.col("q"), F.col("c")).alias("score"),
        F.when(F.col("label") == F.col("probe"), 1).otherwise(0).alias("pos"),
    )
    per_val = scored.groupBy("probe", "score").agg(
        F.count("*").alias("c"), F.sum("pos").alias("n1_v")
    )
    w = (
        W.partitionBy("probe")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = per_val.withColumn(
        "c_prev", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    # doubled tie-averaged rank of the score group (exact BIGINT)
    r2 = 2 * F.col("c_prev") + F.col("c") + 1
    wide = ranked.groupBy("probe").agg(
        F.sum("n1_v").alias("n_pos"),
        F.sum(F.col("c") - F.col("n1_v")).alias("n_neg"),
        F.sum(F.col("n1_v") * r2).alias("rank_sum_2x"),
    )
    n1, n0 = F.col("n_pos"), F.col("n_neg")
    u2 = F.col("rank_sum_2x") - n1 * (n1 + 1)  # doubled U
    return wide.select(
        F.col("probe").alias("label"),
        n1,
        n0,
        u2.alias("u_2x"),
        F.round(u2.cast("double") / (2 * n1 * n0).cast("double"), 6).alias(
            "auc"
        ),
    ).orderBy("label")


def _embedding_auc_sql() -> str:
    from city_payroll_data_pipeline_spark.suite.vectors import (
        DIM,
        _QUANT_SQL,
        _dot_sql,
    )

    return f"""
WITH q AS (
  SELECT vec_id, label, {_QUANT_SQL} AS q FROM embeddings
),
pos AS (
  SELECT label, p.pos AS pos, q[p.pos] AS val
  FROM q CROSS JOIN (SELECT unnest(range(1, {DIM} + 1)) AS pos) p
),
cents AS (
  SELECT label AS probe, list(s ORDER BY pos) AS c
  FROM (SELECT label, pos, CAST(SUM(val) AS BIGINT) AS s
        FROM pos GROUP BY label, pos)
  GROUP BY label
),
scored AS (
  SELECT probe, {_dot_sql('q.q', 'cents.c')} AS score,
         CASE WHEN q.label = probe THEN 1 ELSE 0 END AS pos, vec_id
  FROM q CROSS JOIN cents
),
ranked AS (
  SELECT probe, score, pos,
         ROW_NUMBER() OVER (PARTITION BY probe
                            ORDER BY score, vec_id) AS rn
  FROM scored
),
ties AS (
  SELECT probe, score, MIN(rn) + MAX(rn) AS r2
  FROM ranked GROUP BY probe, score
),
wide AS (
  SELECT r.probe,
         CAST(SUM(r.pos) AS BIGINT) AS n_pos,
         CAST(SUM(1 - r.pos) AS BIGINT) AS n_neg,
         CAST(SUM(CASE WHEN r.pos = 1 THEN t.r2 ELSE 0 END) AS BIGINT)
           AS rank_sum_2x
  FROM ranked r JOIN ties t ON r.probe = t.probe AND r.score = t.score
  GROUP BY r.probe
)
SELECT probe AS label, n_pos, n_neg,
       rank_sum_2x - n_pos * (n_pos + 1) AS u_2x,
       {_sql_round(
           'CAST(rank_sum_2x - n_pos * (n_pos + 1) AS DOUBLE)'
           ' / CAST(2 * n_pos * n_neg AS DOUBLE)',
           6,
       )} AS auc
FROM wide
ORDER BY label
"""


# --------------------------------------------------------------------------
# lpa_communities — synchronous weighted Label Propagation on the
# part co-purchase graph.
#
# Community detection (Raghavan et al. 2007) over "parts that ship in
# the same order": each node starts as its own community and
# repeatedly adopts the label carrying the largest incident edge
# weight among its neighbors (ties → smallest label, making the
# sweep fully deterministic — async/random-order LPA is not
# reproducible, so the engine ships the synchronous variant). Three
# unrolled rounds; the readout is the community-size histogram, the
# "is this graph modular or hairball" audit that decides whether
# category-level sampling is meaningful.
#
# Scale: pair generation is bounded by construction (≤ C(7,2) pairs
# per order — the basket_pairs bound), then the graph is sparsified
# to each node's top-K strongest incident edges (w DESC, neighbor
# ASC) and SYMMETRIZED (kept ∪ reversed-kept: an edge survives if
# either endpoint ranked it — the union-kNN sparsification, chosen
# over raw per-dst kNN because the raw co-occurrence graph is
# quadratic-dense in hub nodes AND modularity scoring needs a
# symmetric frame). The per-round frame is ≤ 2K·|nodes| regardless
# of corpus size. Round 1 is free: with identity initialization the
# votes ARE the edges, so the first join is elided. Each later round
# is ONE edges⋈labels shuffle plus a (dst,label) aggregate; every
# argmax window is PARTITIONED by dst. Fixed round count → lineage
# is statically bounded (edge frame checkpointed once).
# --------------------------------------------------------------------------

_LPA_ROUNDS = 3
_LPA_KNN = 8


def _lpa_top1(votes):
    """Per-dst argmax vote: lexicographic struct-min of (−vote, lbl) ≡
    the old row_number window over (vote DESC, lbl ASC) — same winner,
    same smallest-label tie-break, but a map-side-combinable hash
    aggregation instead of a full per-partition sort + window pass
    (guide §2.3; the max_coverage_select struct-argmax precedent).
    Labels are partkeys (numeric by construction) so the negation is
    total; a string-labelled caller would need a different encoding."""
    return (
        votes.groupBy("dst")
        .agg(
            F.min(
                F.struct(
                    (-F.col("vote")).alias("nv"), F.col("lbl").alias("lbl")
                )
            ).alias("_m")
        )
        .select(F.col("dst").alias("node"), F.col("_m.lbl").alias("lbl"))
    )


def _lpa_edges(spark, sf_dir):
    """The SYMMETRIZED kNN-sparsified co-purchase edge frame both LPA
    queries run on (one definition — lpa_modularity must score the
    exact graph lpa_communities votes on). Each node keeps its K
    strongest incident edges (w DESC, neighbor ASC tie-break), then
    the kept set is UNIONED with its reverses: an edge survives if
    EITHER endpoint ranked it, so the frame is symmetric by
    construction — for every (a,b,w) row the (b,a,w) row exists.
    Per-dst kNN alone is asymmetric (a hub can rank (a,b) while b's
    top-K drops (b,a)), which would silently break the Σw = 2m /
    intra-counted-both-ways premise Newman modularity needs.
    Returns a localCheckpoint'd frame (consumed once per LPA round)."""
    # Pair generation without the per-order self-join (r11, guide
    # §2.4): one groupBy(order) collect_set builds each order's sorted
    # part basket (collect_set subsumes the old distinct — duplicate
    # (order, part) rows collapse inside the set), and the unordered
    # pairs explode MAP-SIDE from the sorted array (pa < pb by the
    # sort; ≤ C(7,2) pairs per order by the basket bound, so the
    # explode is bounded per row). Replaces distinct + self-join +
    # groupBy (4 exchanges, one of them edge-sized twice) with
    # groupBy(order) + groupBy(pair) (2 exchanges); w = number of
    # orders containing both parts, exactly as the join computed.
    baskets = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    und = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ps"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ps"),
                                i + F.lit(2),
                                F.size(F.col("ps")) - i - 1,
                            ),
                            lambda y: F.struct(
                                x.alias("pa"), y.alias("pb")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("w"))
    )
    both = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), "w"
    ).unionAll(
        und.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w")
    )
    w_knn = W.partitionBy("dst").orderBy(F.desc("w"), F.asc("src"))
    kept = (
        both.withColumn("rn", F.row_number().over(w_knn))
        .where(F.col("rn") <= _LPA_KNN)
        .drop("rn")
    )
    # symmetrize: w is the undirected pair weight, so the reversed row
    # carries the identical w and a full-row DISTINCT dedups the
    # mutually-kept edges
    edges = kept.unionAll(
        kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).distinct()
    return edges.localCheckpoint()


def _lpa_labels(edges):
    """_LPA_ROUNDS of synchronous weighted label propagation over a
    symmetric edge frame. Round 1 is free: with identity
    initialization the votes ARE the edges (lbl = src); each later
    round is ONE edges⋈labels shuffle plus a (dst,label) aggregate."""
    labels = _lpa_top1(
        edges.select("dst", F.col("src").alias("lbl"), F.col("w").alias("vote"))
    )
    for _ in range(_LPA_ROUNDS - 1):
        votes = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy("dst", "lbl")
            .agg(F.sum("w").alias("vote"))
        )
        labels = _lpa_top1(votes)
    return labels


def q_lpa_communities(spark, sf_dir):
    labels = _lpa_labels(_lpa_edges(spark, sf_dir))
    return (
        labels.groupBy("lbl")
        .agg(F.count("*").alias("n_parts"))
        .select(F.col("lbl").alias("community"), "n_parts")
        .orderBy(F.desc("n_parts"), "community")
    )


def _lpa_sql() -> str:
    head = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY pa, pb
),
kept AS (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           ROW_NUMBER() OVER (PARTITION BY dst
                              ORDER BY w DESC, src ASC) AS rn
    FROM (SELECT pa AS src, pb AS dst, w FROM und
          UNION ALL
          SELECT pb AS src, pa AS dst, w FROM und)
  ) WHERE rn <= {_LPA_KNN}
),
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst, w FROM (
    SELECT src, dst, w FROM kept
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM kept
  )
),
r1 AS MATERIALIZED (
  SELECT dst AS node, lbl FROM (
    SELECT dst, src AS lbl, w AS vote FROM edges
  )
  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst
                             ORDER BY vote DESC, lbl ASC) = 1
)"""
    steps = []
    for k in range(2, _LPA_ROUNDS + 1):
        steps.append(f""",
r{k} AS MATERIALIZED (
  SELECT dst AS node, lbl
  FROM (
    SELECT e.dst, r.lbl, CAST(SUM(e.w) AS BIGINT) AS vote
    FROM edges e JOIN r{k - 1} r ON e.src = r.node
    GROUP BY e.dst, r.lbl
  )
  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst
                             ORDER BY vote DESC, lbl ASC) = 1
)""")
    return (
        head
        + "".join(steps)
        + f"""
SELECT lbl AS community, COUNT(*) AS n_parts
FROM r{_LPA_ROUNDS}
GROUP BY lbl
ORDER BY n_parts DESC, community
"""
    )


# --------------------------------------------------------------------------
# hll_distinct_audit — hand-rolled HyperLogLog whose registers the
# oracle replays bit-for-bit.
#
# Spark's approx_count_distinct is engine-specific (its HLL++ register
# layout can't be replayed in DuckDB). This operator closes that gap
# — and as of round 6 the relational approx_* queries
# (approx_distinct_stats, approx_rolling_users) reuse the same
# derivation, so every sketch estimate in the suite is
# register-level-oracled: an explicit HLL (Flajolet et al. 2007) built from
# md5-derived buckets, p=12 → m=4096 registers, rho from the 48-bit
# suffix — every register, the raw estimate, the linear-counting
# small-range branch, and the relative error against the EXACT
# distinct are all hash-matched against the DuckDB oracle. The engine
# does not ask you to trust its sketch; it proves the registers.
#
# Determinism: bucket and suffix come from md5 hex (identical in both
# engines); rho = 49 − bitlen(suffix) with bitlen = length(bin(v))
# (verified identical semantics, no leading zeros, bin(0)='0');
# Z is kept as the exact BIGINT S = Σ 2^(49−M_j) + empty·2^49, so the
# only doubles are one division 2^49/S, a fixed multiply chain, and
# the ln-of-integer-ratio (8-dp rounded, the bm25 ln rule).
#
# Scale: THE streaming-cardinality pattern — the register frame is
# (groups × 4096) regardless of input size, built by one map-side
# partial max aggregate; duplicates never survive past the mapper.
# Exact distinct is computed alongside only to certify the error
# (drop it at 100 TB — certification runs on a sample tier).
# --------------------------------------------------------------------------

# register derivation (p, bucket, rho) lives in functions/sketches.py
# — shared with the streaming register job so the surfaces stay
# bit-identical and mergeable
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_HLL_C49 = 1 << 49


def q_hll_distinct_audit(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    bucket, rho = hll_bucket_rho(F.col("o_custkey"))
    regs = (
        orders.select(F.col("o_orderpriority").alias("grp"), bucket.alias("b"), rho.alias("rho"))
        .groupBy("grp", "b")
        .agg(F.max("rho").alias("m_j"))
    )
    per = regs.groupBy("grp").agg(
        F.count("*").alias("v_obs"),
        F.sum(F.expr("shiftleft(1L, 49 - m_j)")).alias("s_obs"),
    )
    exact = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    v_empty = F.lit(_HLL_M) - F.col("v_obs")
    s = F.col("s_obs") + v_empty * F.lit(_HLL_C49)
    raw = (
        F.lit(_HLL_ALPHA)
        * _HLL_M
        * _HLL_M
        * (F.lit(float(_HLL_C49)) / s.cast("double"))
    )
    lc = _HLL_M * F.round(
        F.log(F.lit(_HLL_M).cast("double") / v_empty.cast("double")), 8
    )
    est = F.when((raw <= 2.5 * _HLL_M) & (v_empty > 0), lc).otherwise(raw)
    joined = per.join(exact, "grp")
    return joined.select(
        F.col("grp").alias("o_orderpriority"),
        "n_exact",
        "v_obs",
        F.round(est, 4).alias("hll_estimate"),
        F.round(
            (est - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
            6,
        ).alias("rel_error"),
    ).orderBy("o_orderpriority")


def _hll_sql() -> str:
    return f"""
WITH hashed AS (
  SELECT o_orderpriority AS grp,
         CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 3) AS INT)
           AS b,
         CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 4, 12)
              AS BIGINT) AS v48
  FROM orders
),
regs AS (
  SELECT grp, b,
         MAX(CASE WHEN v48 = 0 THEN 49 ELSE 49 - length(bin(v48)) END)
           AS m_j
  FROM hashed GROUP BY grp, b
),
per AS (
  SELECT grp, COUNT(*) AS v_obs,
         CAST(SUM(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT) AS s_obs
  FROM regs GROUP BY grp
),
exact AS (
  SELECT o_orderpriority AS grp, COUNT(DISTINCT o_custkey) AS n_exact
  FROM orders GROUP BY o_orderpriority
),
est AS (
  SELECT grp, n_exact, v_obs,
         CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M}
           * (CAST({_HLL_C49} AS DOUBLE)
              / CAST(s_obs + ({_HLL_M} - v_obs)
                             * CAST({_HLL_C49} AS BIGINT) AS DOUBLE)) AS raw,
         {_HLL_M} - v_obs AS v_empty
  FROM per JOIN exact USING (grp)
),
final AS (
  SELECT grp, n_exact, v_obs,
         CASE WHEN raw <= 2.5 * {_HLL_M} AND v_empty > 0
              THEN {_HLL_M} * {_sql_round(
                  f'ln(CAST({_HLL_M} AS DOUBLE) / CAST(v_empty AS DOUBLE))', 8
              )}
              ELSE raw END AS est
  FROM est
)
SELECT grp AS o_orderpriority, n_exact, v_obs,
       {_sql_round('est', 4)} AS hll_estimate,
       {_sql_round(
           '(est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)', 6
       )} AS rel_error
FROM final
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# sprt_conversion_gate — Wald's Sequential Probability Ratio Test as
# a daily experiment gate.
#
# The always-valid alternative to fixed-horizon A/B reads: after each
# day, the cumulative log-likelihood ratio of the treatment arm's
# conversion rate under H1 (p=0.30) vs H0 (p=0.25) is compared to the
# Wald boundaries ln((1−β)/α) / ln(β/(1−α)) at α=β=0.05 — the first
# boundary crossing is a decision that needs no multiple-testing
# correction (Wald 1945). Trials are user-days (any event = a trial,
# a purchase event = a conversion); the arm is the md5-parity
# assignment shared with mann_whitney_test.
#
# Determinism: the four ln constants are Python-computed literals
# embedded identically in both engines; the cumulative LLR is
# integer-count × literal with a fixed expression shape, rounded 8 dp.
#
# Scale: one (user, day) aggregate + one per-day aggregate; the only
# window is the cumsum over the ~30-row day spine (bounded by the
# observation horizon, the cusum_changepoint allowlist class).
# --------------------------------------------------------------------------

_SPRT_L1 = 0.1823215567939546  # ln(p1/p0), p1=0.30, p0=0.25
_SPRT_L0 = -0.06899287148695156  # ln((1-p1)/(1-p0))
_SPRT_UP = 2.9444389791664403  # ln((1-beta)/alpha), alpha=beta=0.05
_SPRT_LO = -2.9444389791664403  # ln(beta/(1-alpha))


def q_sprt_conversion_gate(spark, sf_dir):
    from city_payroll_data_pipeline_spark.functions.text import hex_to_long

    ev = table(spark, sf_dir, "events")
    arm = F.pmod(
        hex_to_long(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12)),
        F.lit(2),
    )
    trials = (
        ev.where(arm == 1)
        .groupBy(F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    daily = trials.groupBy("day").agg(
        F.count("*").alias("n_d"), F.sum("conv").alias("c_d")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("n_d").over(w).alias("n_cum"),
        F.sum("c_d").over(w).alias("c_cum"),
    )
    llr = F.round(
        F.col("c_cum") * F.lit(_SPRT_L1)
        + (F.col("n_cum") - F.col("c_cum")) * F.lit(_SPRT_L0),
        8,
    )
    return cum.select(
        "day",
        "n_cum",
        "c_cum",
        llr.alias("llr"),
        F.when(llr >= _SPRT_UP, "accept_h1")
        .when(llr <= _SPRT_LO, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


_SPRT_SQL = f"""
WITH trials AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events
  WHERE CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)
             AS BIGINT) % 2 = 1
  GROUP BY user_id, date_trunc('day', ts)
),
daily AS (
  SELECT day, COUNT(*) AS n_d, CAST(SUM(conv) AS BIGINT) AS c_d
  FROM trials GROUP BY day
),
cum AS (
  SELECT day,
         CAST(SUM(n_d) OVER (ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cum,
         CAST(SUM(c_d) OVER (ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_cum
  FROM daily
),
scored AS (
  SELECT day, n_cum, c_cum,
         {_sql_round(
             f'c_cum * CAST({_SPRT_L1!r} AS DOUBLE)'
             f' + (n_cum - c_cum) * CAST({_SPRT_L0!r} AS DOUBLE)', 8
         )} AS llr
  FROM cum
)
SELECT day, n_cum, c_cum, llr,
       CASE WHEN llr >= {_SPRT_UP!r} THEN 'accept_h1'
            WHEN llr <= {_SPRT_LO!r} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM scored
ORDER BY day
"""


# --------------------------------------------------------------------------
# countmin_heavy_tokens — Count-Min sketch whose cells the oracle
# replays, certified against exact heavy-hitter counts.
#
# The other half of the sketch pair (hll_distinct_audit = distinct
# cardinality; this = frequency): a d=4 × w=512 Count-Min sketch
# (Cormode & Muthukrishnan 2005) over whitespace-token occurrences,
# probed at the exact top-20 tokens. The output carries both the
# exact count and the sketch estimate; the hash match proves the
# one-sided error guarantee est ≥ exact ON EVERY ROW (a theorem the
# oracle independently re-derives), and the overcount column shows
# the collision noise the 512-cell width buys at this corpus size.
#
# Determinism: cell indices are md5-derived (row-salted) mod w in
# both engines; every count is an exact BIGINT — the query contains
# zero doubles.
#
# Scale: the sketch is a (d·w)-row aggregate regardless of corpus
# size — the ×d fan-out is map-side and partial-aggregated before
# the exchange (the mergeable-summaries property: per-partition
# sketches ADD). Probing joins the 20-row candidate frame against
# the 2048-row cell frame — both broadcast-sized by construction.
# --------------------------------------------------------------------------

_CM_D = 4
_CM_W = 512
_CM_TOPK = 20


def _cm_cell(tok: F.Column, i: int) -> F.Column:
    from city_payroll_data_pipeline_spark.functions.text import hex_to_long

    return F.pmod(
        hex_to_long(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), tok)), 1, 12)
        ),
        F.lit(_CM_W),
    )


def q_countmin_heavy_tokens(spark, sf_dir):
    from city_payroll_data_pipeline_spark.functions.text import tokens_array

    docs = table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        F.explode(tokens_array(F.col("text"))).alias("tok")
    )
    # toks feeds BOTH the sketch and the exact counts, but is NOT
    # checkpointed: the explosion is corpus-sized (materializing it
    # would be a memory hazard at scale), and re-deriving it is one
    # map-side pass per consumer — recompute beats store here, the
    # opposite call from the tiny quantized/member frames elsewhere
    # in this module.
    hits = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), _cm_cell(F.col("tok"), i).alias("cell")
            )
            for i in range(_CM_D)
        ]
    )
    cells = (
        toks.select(F.explode(hits).alias("h"))
        .groupBy(F.col("h.i").alias("i"), F.col("h.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "tok").limit(_CM_TOPK)
    probes = top.select(
        "tok",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cm_cell(F.col("tok"), i).alias("cell"),
                    )
                    for i in range(_CM_D)
                ]
            )
        ).alias("p"),
    ).select("tok", "exact_cnt", F.col("p.i").alias("i"), F.col("p.cell").alias("cell"))
    est = (
        probes.join(F.broadcast(cells), ["i", "cell"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    return est.select(
        "tok",
        "exact_cnt",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_cnt")).alias("overcount"),
    ).orderBy(F.desc("exact_cnt"), "tok")


def _countmin_sql() -> str:
    def cell(tok_expr: str, i: int) -> str:
        return (
            f"CAST('0x' || substr(md5('{i}:' || {tok_expr}), 1, 12) "
            f"AS BIGINT) % {_CM_W}"
        )

    cell_rows = " UNION ALL ".join(
        f"SELECT {i} AS i, {cell('tok', i)} AS cell FROM toks"
        for i in range(_CM_D)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT tok, exact_cnt, {i} AS i, {cell('tok', i)} AS cell FROM top"
        for i in range(_CM_D)
    )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT unnest(regexp_extract_all(trim(text), '\\S+', 0)) AS tok
  FROM documents
),
cells AS MATERIALIZED (
  SELECT i, cell, COUNT(*) AS cnt FROM ({cell_rows}) GROUP BY i, cell
),
exact AS (
  SELECT tok, COUNT(*) AS exact_cnt FROM toks GROUP BY tok
),
top AS (
  SELECT tok, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, tok LIMIT {_CM_TOPK}
),
probes AS ({probe_rows}),
est AS (
  SELECT p.tok, p.exact_cnt, MIN(c.cnt) AS cm_estimate
  FROM probes p JOIN cells c ON p.i = c.i AND p.cell = c.cell
  GROUP BY p.tok, p.exact_cnt
)
SELECT tok, exact_cnt, cm_estimate,
       cm_estimate - exact_cnt AS overcount
FROM est
ORDER BY exact_cnt DESC, tok
"""


# --------------------------------------------------------------------------
# join_size_estimate — Count-Min INNER-PRODUCT join-cardinality
# estimation (Cormode & Muthukrishnan 2005 §4.2), the third member of
# the CM family (point query = countmin_heavy_tokens; this = the
# a·b estimator an optimizer consults before picking a join strategy
# for two already-sketched inputs):
#
#   |A ⋈_k B| = Σ_k cA(k)·cB(k)        (exact, one reduce per side)
#   est       = min_i Σ_cell A_i[cell]·B_i[cell]   (d row sketches)
#
# The estimator is one-sided (est ≥ exact for every row i — hash
# collisions only ADD mass), and the driver hash match re-derives
# that certificate on both engines along with the exact overestimate
# ratio the 512-cell width buys at this key cardinality.
#
# Determinism: identical md5 row-salted cells as countmin (keys cast
# to string through the same _cm_cell), every count and product an
# exact BIGINT; the one double is the final ratio division. (Products
# fit BIGINT to ~3e9 rows per side at w=512; beyond that route the
# two SUMs through DECIMAL(38,0) — same discipline as mi_feature_
# screen's documented bound.)
#
# Scale: each side collapses to a (d·w)-row mergeable sketch in one
# map-side partial aggregation — the join-size answer then costs a
# (d·w)⋈(d·w) broadcast join, NEVER a key-level join of the inputs;
# that is the entire point of the estimator at 100 TB (the exact arm
# here is the certificate, not the production path).
# --------------------------------------------------------------------------


def _jse_cells(df, key_col: str):
    k = F.col(key_col).cast("string")
    hits = F.array(
        *[
            F.struct(F.lit(i).alias("i"), _cm_cell(k, i).alias("cell"))
            for i in range(_CM_D)
        ]
    )
    return (
        df.select(F.explode(hits).alias("h"))
        .groupBy(F.col("h.i").alias("i"), F.col("h.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def q_join_size_estimate(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    events = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k")
    )
    ca = orders.groupBy("k").agg(F.count("*").alias("ca"))
    cb = events.groupBy("k").agg(F.count("*").alias("cb"))
    exact = ca.join(cb, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("exact_size")
    )
    a_cells = _jse_cells(orders, "k").withColumnRenamed("cnt", "a")
    b_cells = _jse_cells(events, "k").withColumnRenamed("cnt", "b")
    per_row = (
        a_cells.join(b_cells, ["i", "cell"])
        .groupBy("i")
        .agg(F.sum(F.col("a") * F.col("b")).cast("long").alias("ip"))
    )
    est = per_row.agg(F.min("ip").alias("cm_estimate"))
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_size",
        "cm_estimate",
        (F.col("cm_estimate") / F.col("exact_size")).alias(
            "overestimate_ratio"
        ),
    )


def _join_size_estimate_sql() -> str:
    def cell(key_expr: str, i: int) -> str:
        return (
            f"CAST('0x' || substr(md5('{i}:' || {key_expr}), 1, 12) "
            f"AS BIGINT) % {_CM_W}"
        )

    def cells(src: str, alias: str) -> str:
        rows = " UNION ALL ".join(
            f"SELECT {i} AS i, {cell('k', i)} AS cell FROM {src}"
            for i in range(_CM_D)
        )
        return (
            f"SELECT i, cell, COUNT(*) AS {alias} FROM ({rows})"
            f" GROUP BY i, cell"
        )

    return f"""
WITH a AS MATERIALIZED (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
b AS MATERIALIZED (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
exact AS (
  SELECT CAST(SUM(x.ca * y.cb) AS BIGINT) AS exact_size
  FROM (SELECT k, COUNT(*) AS ca FROM a GROUP BY k) x
  JOIN (SELECT k, COUNT(*) AS cb FROM b GROUP BY k) y ON x.k = y.k
),
acells AS MATERIALIZED ({cells('a', 'a')}),
bcells AS MATERIALIZED ({cells('b', 'b')}),
per_row AS (
  SELECT x.i, CAST(SUM(x.a * y.b) AS BIGINT) AS ip
  FROM acells x JOIN bcells y ON x.i = y.i AND x.cell = y.cell
  GROUP BY x.i
),
est AS (SELECT MIN(ip) AS cm_estimate FROM per_row)
SELECT exact_size, cm_estimate,
       CAST(cm_estimate AS DOUBLE) / exact_size AS overestimate_ratio
FROM exact, est
"""


JOIN_SIZE_ESTIMATE_SQL = _join_size_estimate_sql()


# --------------------------------------------------------------------------
# kmv_source_overlap — KMV (k-minimum-values) distinct-overlap
# estimation between source vocabularies (Bar-Yossef 2002; Beyer
# 2007), the SET-OPERATION member completing the sketch family
# (HLL = cardinality, Bloom = membership, CM = frequency/join size;
# this = union/intersection/Jaccard between already-sketched sets):
#
#   keep each source's k smallest 48-bit term hashes;
#   union estimate  Û = (k−1)·2⁴⁸ / h₍ₖ₎ of the merged sketch
#                      (exact |union| when the merge holds < k values);
#   Jaccard estimate = |k-min of union ∩ A ∩ B| / min(k, |union|).
#
# The exact per-pair vocabulary intersection/union rides beside the
# estimates as the certificate — the driver hash match re-derives
# both arms. Unlike HLL, a KMV sketch supports INTERSECTION natively,
# which is why dataset-overlap tooling (did these two crawls collect
# the same sites?) ships KMV/theta sketches rather than HLL.
#
# Determinism: hashes are the shared md5→48-bit integer primitive;
# per-source min-k is an exact ROW_NUMBER ≤ k (map-side WindowGroup-
# Limit — only ~k rows per source per input partition are shuffled);
# all set logic runs on ≤ 2k-element sorted integer arrays; the two
# doubles are single exact-operand divisions rounded immediately.
#
# Scale: a KMV sketch is MERGEABLE (min-k of a union = min-k of the
# concatenated min-k's), so at 100 TB each shard emits its k-row
# sketch and the per-source merge is a k-row reduce; the pairwise
# comparison frame is |sources|²·k — model-sized. The exact arm's
# vocabulary self-join is the certificate, not the production path
# (the join_size_estimate asymmetry).
# --------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE = 1 << 48  # md5 12-hex-char hash space


def q_kmv_source_overlap(spark, sf_dir):
    from city_payroll_data_pipeline_spark.functions.text import (
        hex_to_long,
        word_tokens,
    )

    docs = table(spark, sf_dir, "documents", spread=True)
    terms = docs.select(
        "source", F.explode(word_tokens(F.col("text"))).alias("w")
    ).distinct()
    # KMV lives in hash space: distinct hashes per source (two terms
    # colliding in 48 bits collapse — that IS the sketch's domain)
    hashed = terms.select(
        "source",
        hex_to_long(F.substring(F.md5(F.col("w")), 1, 12)).alias("h"),
    ).distinct()
    mink = (
        hashed.withColumn(
            "rk",
            F.row_number().over(W.partitionBy("source").orderBy("h")),
        )
        .filter(F.col("rk") <= _KMV_K)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
    )
    a = mink.select(F.col("source").alias("source_a"), F.col("hs").alias("ha"))
    b = mink.select(F.col("source").alias("source_b"), F.col("hs").alias("hb"))
    pair = a.join(b, F.col("source_a") < F.col("source_b"))
    union_arr = F.array_sort(F.array_union(F.col("ha"), F.col("hb")))
    usz = F.size(union_arr)
    kk = F.least(F.lit(_KMV_K), usz)
    hk = F.element_at(union_arr, kk)
    inter_kmv = F.size(
        F.filter(
            F.slice(union_arr, 1, _KMV_K),
            lambda x: F.array_contains(F.col("ha"), x)
            & F.array_contains(F.col("hb"), x),
        )
    )
    est = pair.select(
        "source_a",
        "source_b",
        kk.alias("kmv_k"),
        F.round(
            F.when(
                usz >= _KMV_K,
                F.lit((_KMV_K - 1) * _KMV_SPACE) / hk.cast("double"),
            ).otherwise(usz.cast("double")),
            4,
        ).alias("kmv_union_est"),
        F.round(inter_kmv / kk.cast("double"), 6).alias("kmv_jaccard"),
    )
    # exact certificate arm: true vocabulary overlap per source pair.
    # Pairs come from the FULL a<b grid over the (model-sized) source
    # catalog, with the shared-term counts left-joined in — an inner
    # join on shared terms would silently DROP disjoint-vocabulary
    # pairs, exactly the rows an overlap audit most needs to report
    # (overlap = 0 must be distinguishable from pair-not-compared).
    ta = terms.select(F.col("source").alias("source_a"), "w")
    tb = terms.select(F.col("source").alias("source_b"), "w")
    inter_counts = (
        ta.join(tb, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = terms.groupBy("source").agg(F.count("*").alias("nv"))
    sa = sizes.select(F.col("source").alias("source_a"), F.col("nv").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("nv").alias("nb"))
    exact = (
        sa.join(sb, F.col("source_a") < F.col("source_b"))
        .join(inter_counts, ["source_a", "source_b"], "left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
        .select(
            "source_a",
            "source_b",
            "na",
            "nb",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard_exact"),
        )
    )
    return exact.join(est, ["source_a", "source_b"]).orderBy(
        "source_a", "source_b"
    )


KMV_SOURCE_OVERLAP_SQL = f"""
WITH terms AS (
  SELECT DISTINCT source, w FROM (
    SELECT source,
           unnest(regexp_extract_all(lower(text), '[A-Za-z]+', 0)) AS w
    FROM documents
  )
),
hashed AS (
  SELECT DISTINCT source,
         CAST('0x' || substr(md5(w), 1, 12) AS BIGINT) AS h
  FROM terms
),
mink AS (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
    FROM hashed
  ) WHERE rk <= {_KMV_K}
),
srcs AS (SELECT DISTINCT source FROM mink),
u AS (
  SELECT p.source_a, p.source_b, m.h,
         MAX(CASE WHEN m.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN m.source = p.source_b THEN 1 ELSE 0 END) AS in_b
  FROM (SELECT a.source AS source_a, b.source AS source_b
        FROM srcs a JOIN srcs b ON a.source < b.source) p
  JOIN mink m ON m.source IN (p.source_a, p.source_b)
  GROUP BY p.source_a, p.source_b, m.h
),
ur AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source_a, source_b
                               ORDER BY h) AS rk,
         COUNT(*) OVER (PARTITION BY source_a, source_b) AS usz
  FROM u
),
kmv AS (
  SELECT source_a, source_b,
         LEAST({_KMV_K}, MAX(usz)) AS kmv_k,
         MAX(CASE WHEN rk = LEAST({_KMV_K}, usz) THEN h END) AS hk,
         CAST(SUM(CASE WHEN rk <= {_KMV_K} AND in_a = 1 AND in_b = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS inter_kmv,
         MAX(usz) AS usz
  FROM ur GROUP BY source_a, source_b
),
est AS (
  SELECT source_a, source_b, CAST(kmv_k AS INT) AS kmv_k,
         {_sql_round(
             f"CASE WHEN usz >= {_KMV_K} THEN "
             f"CAST({(_KMV_K - 1) * _KMV_SPACE} AS DOUBLE) / CAST(hk AS DOUBLE) "
             f"ELSE CAST(usz AS DOUBLE) END", 4)} AS kmv_union_est,
         {_sql_round("CAST(inter_kmv AS DOUBLE) / kmv_k", 6)} AS kmv_jaccard
  FROM kmv
),
sizes AS (SELECT source, COUNT(*) AS nv FROM terms GROUP BY source),
inter AS (
  SELECT ta.source AS source_a, tb.source AS source_b,
         COUNT(*) AS n_inter
  FROM terms ta JOIN terms tb ON ta.w = tb.w AND ta.source < tb.source
  GROUP BY 1, 2
),
-- full a<b pair grid LEFT-joined to the shared-term counts:
-- disjoint-vocabulary pairs must report n_inter = 0, not vanish
exact AS (
  SELECT sa.source AS source_a, sb.source AS source_b,
         CAST(sa.nv AS BIGINT) AS na, CAST(sb.nv AS BIGINT) AS nb,
         CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
         CAST(sa.nv + sb.nv - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union,
         {_sql_round(
             "CAST(COALESCE(i.n_inter, 0) AS DOUBLE)"
             " / (sa.nv + sb.nv - COALESCE(i.n_inter, 0))", 6)}
           AS jaccard_exact
  FROM sizes sa
  JOIN sizes sb ON sa.source < sb.source
  LEFT JOIN inter i ON i.source_a = sa.source AND i.source_b = sb.source
)
SELECT e.source_a AS source_a, e.source_b AS source_b,
       e.na, e.nb, e.n_inter, e.n_union, e.jaccard_exact,
       s.kmv_k, s.kmv_union_est, s.kmv_jaccard
FROM exact e
JOIN est s ON s.source_a = e.source_a AND s.source_b = e.source_b
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# mi_feature_screen — mutual-information feature ranking against a
# binary target.
#
# The model-free feature screen run before any training job: which
# categorical columns carry signal about the label (here: is the line
# discounted ≥ 5%)? MI(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over
# exact contingency counts; features are ranked by MI in nats.
# Constant features score exactly 0, independent ones ≈ 0 — the
# ranking, not the absolute value, drives column selection.
#
# Determinism: all counts are exact BIGINTs from one pass; each ln is
# taken on one integer-ratio double and rounded 8 dp, the weighted
# sum routes through DECIMAL (the char_entropy discipline), one final
# division. (n_xy·N fits BIGINT to ~3e9 rows per feature; beyond
# that, split the ln into ln(n_xy)+ln(N)−ln(n_x)−ln(n_y) — same
# rounding rule.)
#
# Scale: the melt is map-side (×|features| explode), partial
# aggregation shrinks the exchange to the contingency frame
# (Σ_f |dom(f)|·2 rows); marginals join on that frame, never the
# fact.
# --------------------------------------------------------------------------

# (name, Spark column expr, DuckDB SQL expr) — derived categoricals
# where the testdata lacks native ones
_MI_FEATURES = (
    ("returnflag", "l_returnflag", "l_returnflag"),
    ("linestatus", "l_linestatus", "l_linestatus"),
    ("ship_month", "month(l_shipdate)", "month(l_shipdate)"),
    ("qty_band", "CAST(l_quantity AS INT) DIV 10", "CAST(l_quantity AS INT) // 10"),
)


def q_mi_feature_screen(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    label = F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)
    melted = li.select(
        label.alias("y"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        F.expr(col).cast("string").alias("val"),
                    )
                    for name, col, _ in _MI_FEATURES
                ]
            )
        ).alias("f"),
    ).select(F.col("f.feature").alias("feature"), F.col("f.val").alias("val"), "y")
    joint = melted.groupBy("feature", "val", "y").agg(
        F.count("*").alias("n_xy")
    )
    margx = joint.groupBy("feature", "val").agg(F.sum("n_xy").alias("n_x"))
    margy = joint.groupBy("feature", "y").agg(F.sum("n_xy").alias("n_y"))
    tot = joint.groupBy("feature").agg(F.sum("n_xy").alias("n_tot"))
    cells = (
        joint.join(margx, ["feature", "val"])
        .join(margy, ["feature", "y"])
        .join(tot, "feature")
    )
    term = F.round(
        F.col("n_xy")
        * F.round(
            F.log(
                (F.col("n_xy") * F.col("n_tot")).cast("double")
                / (F.col("n_x") * F.col("n_y")).cast("double")
            ),
            8,
        ),
        8,
    ).cast("decimal(28,8)")
    per_feat = cells.groupBy("feature").agg(
        F.max("n_tot").alias("n_rows"),
        F.count("*").alias("n_cells"),
        F.sum(term).alias("wsum"),
    )
    return per_feat.select(
        "feature",
        "n_rows",
        "n_cells",
        F.round(
            F.col("wsum").cast("double") / F.col("n_rows").cast("double"), 8
        ).alias("mi_nats"),
    ).orderBy(F.desc("mi_nats"), "feature")


def _mi_sql() -> str:
    melt = " UNION ALL ".join(
        f"SELECT '{name}' AS feature, CAST({sql} AS VARCHAR) AS val, "
        f"CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS y FROM lineitem"
        for name, _, sql in _MI_FEATURES
    )
    ln_term = _sql_round(
        "ln(CAST(n_xy * n_tot AS DOUBLE) / CAST(n_x * n_y AS DOUBLE))", 8
    )
    return f"""
WITH melted AS ({melt}),
joint AS (
  SELECT feature, val, y, COUNT(*) AS n_xy
  FROM melted GROUP BY feature, val, y
),
margx AS (
  SELECT feature, val, CAST(SUM(n_xy) AS BIGINT) AS n_x
  FROM joint GROUP BY feature, val
),
margy AS (
  SELECT feature, y, CAST(SUM(n_xy) AS BIGINT) AS n_y
  FROM joint GROUP BY feature, y
),
tot AS (
  SELECT feature, CAST(SUM(n_xy) AS BIGINT) AS n_tot
  FROM joint GROUP BY feature
),
per_feat AS (
  SELECT j.feature,
         MAX(n_tot) AS n_rows,
         COUNT(*) AS n_cells,
         SUM(CAST({_sql_round(f'n_xy * CAST({ln_term} AS DOUBLE)', 8)}
             AS DECIMAL(28,8))) AS wsum
  FROM joint j
  JOIN margx USING (feature, val)
  JOIN margy USING (feature, y)
  JOIN tot USING (feature)
  GROUP BY j.feature
)
SELECT feature, n_rows, n_cells,
       {_sql_round('CAST(wsum AS DOUBLE) / CAST(n_rows AS DOUBLE)', 8)}
         AS mi_nats
FROM per_feat
ORDER BY mi_nats DESC, feature
"""


# --------------------------------------------------------------------------
# median_of_means — the robust mean estimator for heavy-tailed data.
#
# Split the data into k deterministic hash shards, take each shard's
# mean, report the MEDIAN of the k means: a single corrupted or
# heavy-tailed shard moves one order statistic instead of the whole
# estimate (sub-Gaussian deviation bounds under only a finite
# variance assumption — Nemirovsky & Yudin 1983; the estimator behind
# most "robust statistics at scale" pipelines). Reported next to the
# plain mean: their gap is the heavy-tail alarm.
#
# Determinism: shard assignment is md5-mod-k; shard sums are exact
# DECIMAL; the k means are doubles divided from exact parts; the
# median of k=32 doubles matches kpi_stats' proven F.median/DuckDB
# parity.
#
# Scale: ONE pass, one k-row aggregate — the shuffle carries k
# partial (sum, count) pairs per map task. k is the robustness/
# variance knob (k ≈ 8·ln(1/δ) for confidence δ).
# --------------------------------------------------------------------------

_MOM_K = 32


def q_median_of_means(spark, sf_dir):
    from city_payroll_data_pipeline_spark.functions.text import hex_to_long

    orders = table(spark, sf_dir, "orders")
    shard = F.pmod(
        hex_to_long(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12)
        ),
        F.lit(_MOM_K),
    )
    shards = (
        orders.select(
            shard.alias("shard"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("shard")
        .agg(F.count("*").alias("n_s"), F.sum("v").alias("sum_s"))
        .select(
            "n_s",
            "sum_s",
            (F.col("sum_s").cast("double") / F.col("n_s")).alias("mean_s"),
        )
    )
    return shards.agg(
        F.sum("n_s").alias("n_rows"),
        F.count("*").alias("n_shards"),
        F.round(
            F.sum("sum_s").cast("double") / F.sum("n_s"), 6
        ).alias("plain_mean"),
        F.round(F.median("mean_s"), 6).alias("mom_mean"),
    )


_MOM_SQL = f"""
WITH shards AS (
  SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)
              AS BIGINT) % {_MOM_K} AS shard,
         COUNT(*) AS n_s,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_s
  FROM orders GROUP BY shard
),
means AS (
  SELECT n_s, sum_s, CAST(sum_s AS DOUBLE) / n_s AS mean_s FROM shards
)
SELECT CAST(SUM(n_s) AS BIGINT) AS n_rows,
       COUNT(*) AS n_shards,
       {_sql_round('CAST(SUM(sum_s) AS DOUBLE) / SUM(n_s)', 6)}
         AS plain_mean,
       {_sql_round('median(mean_s)', 6)} AS mom_mean
FROM means
"""


# --------------------------------------------------------------------------
# bloom_fpr_audit — measured vs theoretical Bloom-filter false-
# positive rate, register-replayed.
#
# Completes the sketch-certification trio (hll_distinct_audit =
# cardinality, countmin_heavy_tokens = frequency, this = membership):
# an m=16384-bit, k=4-hash Bloom set is built over the customer keys
# that placed orders, then probed with a DISJOINT synthetic key range
# (max(custkey)+1 onward, derived in-plan so the disjointness holds
# at every scale factor). Every probe that "hits" is
# by construction a false positive, so the measured FPR is exact —
# reported against the theoretical (1 − e^{−kn/m})^k. The oracle
# replays bit positions, hit counts, and both rates; the hash match
# certifies the filter's actual operating point, not its textbook
# one.
#
# Determinism: bit positions are md5-derived (salted per hash
# function) mod m; membership is an integer EXISTS join on bit
# position; the theoretical rate is exp/pow on one integer-derived
# double, rounded 6 dp (both engines evaluate the identical
# expression shape).
#
# Scale: the bitset is a ≤m-row DISTINCT aggregate (broadcastable at
# any corpus size — that is the point of a Bloom filter); probes are
# map-side hash evaluations + one semi-join on the bit frame.
# bloom_semi_join is the in-plan consumer of this pattern; this query
# is its calibration readout.
# --------------------------------------------------------------------------

_BF_M = 16384
_BF_K = 4
_BF_PROBES = 5000
# Probe keys start at max(o_custkey)+1, derived IN-PLAN (one 1-row
# broadcast), not a fixed literal: TPC-H has 150k customers per unit
# SF, so any constant offset is eventually overtaken (a 100 TB run
# crosses 10M custkeys around sf≈67) and "every hit is a false
# positive" silently stops being true — true members would inflate
# measured_fpr with no oracle mismatch to catch it, because both
# engines would share the bad constant.


def _bf_bit(key: F.Column, i: int) -> F.Column:
    from city_payroll_data_pipeline_spark.functions.text import hex_to_long

    return F.pmod(
        hex_to_long(
            F.substring(
                F.md5(F.concat(F.lit(f"bf{i}:"), key.cast("string"))), 1, 12
            )
        ),
        F.lit(_BF_M),
    )


def q_bloom_fpr_audit(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    members = orders.select(F.col("o_custkey").alias("key")).distinct()
    # consumed by the bitset build AND the n-count readout
    members = members.localCheckpoint()
    bits = (
        members.select(
            F.explode(
                F.array(*[_bf_bit(F.col("key"), i) for i in range(_BF_K)])
            ).alias("bit")
        )
        .distinct()
    )
    maxk = members.agg(F.max("key").alias("_maxk"))
    probes = (
        spark.range(0, _BF_PROBES)
        .crossJoin(F.broadcast(maxk))
        .select((F.col("_maxk") + 1 + F.col("id")).alias("key"))
    )
    probe_bits = probes.select(
        "key",
        F.explode(
            F.array(*[_bf_bit(F.col("key"), i) for i in range(_BF_K)])
        ).alias("bit"),
    )
    # a probe is a (false) positive iff ALL k bits are set
    hits = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("key")
        .agg(F.count("*").alias("set_cnt"))
        .where(F.col("set_cnt") == _BF_K)
    )
    n_mem = members.agg(F.count("*").alias("n_members"))
    n_bits = bits.agg(F.count("*").alias("bits_set"))
    n_fp = hits.agg(F.count("*").alias("false_positives"))
    theory = F.round(
        F.pow(
            F.lit(1.0)
            - F.exp(
                -F.lit(float(_BF_K))
                * F.col("n_members").cast("double")
                / F.lit(float(_BF_M))
            ),
            F.lit(float(_BF_K)),
        ),
        6,
    )
    return (
        n_mem.join(n_bits)
        .join(n_fp)
        .select(
            "n_members",
            "bits_set",
            "false_positives",
            F.round(
                F.col("false_positives").cast("double") / _BF_PROBES, 6
            ).alias("measured_fpr"),
            theory.alias("theoretical_fpr"),
        )
    )


def _bloom_fpr_sql() -> str:
    def bit(key_expr: str, i: int) -> str:
        return (
            f"CAST('0x' || substr(md5('bf{i}:' || CAST({key_expr} AS VARCHAR)),"
            f" 1, 12) AS BIGINT) % {_BF_M}"
        )

    member_bits = " UNION ALL ".join(
        f"SELECT {bit('key', i)} AS bit FROM members" for i in range(_BF_K)
    )
    probe_bits = " UNION ALL ".join(
        f"SELECT key, {bit('key', i)} AS bit FROM probes"
        for i in range(_BF_K)
    )
    return f"""
WITH members AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS key FROM orders
),
bits AS MATERIALIZED (
  SELECT DISTINCT bit FROM ({member_bits})
),
probes AS (
  SELECT (SELECT MAX(key) FROM members) + 1 + unnest(range(0, {_BF_PROBES}))
         AS key
),
probe_bits AS ({probe_bits}),
hits AS (
  SELECT key FROM probe_bits JOIN bits USING (bit)
  GROUP BY key HAVING COUNT(*) = {_BF_K}
),
wide AS (
  SELECT (SELECT COUNT(*) FROM members) AS n_members,
         (SELECT COUNT(*) FROM bits) AS bits_set,
         (SELECT COUNT(*) FROM hits) AS false_positives
)
SELECT n_members, bits_set, false_positives,
       {_sql_round(
           f'CAST(false_positives AS DOUBLE) / {_BF_PROBES}', 6
       )} AS measured_fpr,
       {_sql_round(
           f'pow(1.0 - exp(-CAST({_BF_K} AS DOUBLE)'
           f' * CAST(n_members AS DOUBLE) / {float(_BF_M)!r}),'
           f' CAST({_BF_K} AS DOUBLE))',
           6,
       )} AS theoretical_fpr
FROM wide
"""


# --------------------------------------------------------------------------
# randomization_test_uplift — Fisher randomization test for the A/B
# mean difference, hash-rerandomized.
#
# The assumption-free significance readout: how often does a random
# re-assignment of arms produce a mean gap as large as the observed
# one? B=32 deterministic re-randomizations (md5(key:b) parity — the
# Bernoulli-reassignment variant standard at scale, where fixing
# exact arm sizes is immaterial), p = (1 + #extreme)/(B + 1), the
# add-one estimator that keeps the test valid at finite B. Pairs
# with mann_whitney_test (rank test) and poisson_bootstrap_ci
# (interval): three inferential lenses over the same hash-assigned
# experiment machinery.
#
# Determinism: arm indicators are md5-derived — ONE hash per row,
# replica b's coin is bit b of the 48-bit value (md5 bits are
# independent fair coins; bit 0 ≡ the canonical md5-parity
# assignment mann_whitney_test / ab_test_analysis use, so replica 0
# IS the observed experiment). Every replica sum is exact DECIMAL;
# means divide exact parts; the extreme-count compare runs on
# identically-constructed doubles in both engines.
#
# Scale: hashing is one md5 per ROW (not per row×replica); the ×B
# fan-out explodes map-side BEFORE the groupBy (the poisson_bootstrap
# shape) — the shuffle carries 2B partial aggregates per map task;
# everything after runs on the 2B-row replica frame. B ≤ 48 is the
# bit budget; re-salt the hash for more.
# --------------------------------------------------------------------------

_RT_B = 32


def q_randomization_test_uplift(spark, sf_dir):
    from city_payroll_data_pipeline_spark.functions.text import hex_to_long

    orders = table(spark, sf_dir, "orders", spread=True)
    base = orders.select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        hex_to_long(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12)
        ).alias("h"),
        F.explode(
            F.array(*[F.lit(b) for b in range(_RT_B + 1)])
        ).alias("b"),  # b=0 is the OBSERVED assignment (h & 1 ≡ md5 parity)
    )
    reps = (
        base.select(
            "b", "v", F.expr("shiftright(h, b) & 1").alias("arm")
        )
        .groupBy("b", "arm")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    diffs = reps.groupBy("b").agg(
        (
            F.sum(F.when(F.col("arm") == 1, F.col("s"))).cast("double")
            / F.sum(F.when(F.col("arm") == 1, F.col("n")))
            - F.sum(F.when(F.col("arm") == 0, F.col("s"))).cast("double")
            / F.sum(F.when(F.col("arm") == 0, F.col("n")))
        ).alias("diff"),
        F.sum("n").alias("n_rows"),
    )
    obs = diffs.where(F.col("b") == 0).select(
        F.col("diff").alias("obs_diff")
    )
    nulls = diffs.where(F.col("b") > 0)
    return (
        nulls.join(F.broadcast(obs))
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.count("*").alias("n_replicas"),
            F.round(F.max("obs_diff"), 6).alias("obs_diff"),
            F.sum(
                F.when(
                    F.abs(F.col("diff")) >= F.abs(F.col("obs_diff")), 1
                ).otherwise(0)
            ).alias("n_extreme"),
        )
        .select(
            "n_rows",
            "n_replicas",
            "obs_diff",
            "n_extreme",
            F.round(
                (F.col("n_extreme") + 1).cast("double") / (_RT_B + 1), 6
            ).alias("p_value"),
        )
    )


def _randomization_test_sql() -> str:
    return f"""
WITH base AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)
              AS BIGINT) AS h,
         unnest(range(0, {_RT_B + 1})) AS b
  FROM orders
),
assigned AS (
  SELECT b, v, (h >> b) & 1 AS arm FROM base
),
reps AS (
  SELECT b, arm, COUNT(*) AS n, SUM(v) AS s
  FROM assigned GROUP BY b, arm
),
diffs AS (
  SELECT b,
         CAST(SUM(CASE WHEN arm = 1 THEN s END) AS DOUBLE)
           / SUM(CASE WHEN arm = 1 THEN n END)
         - CAST(SUM(CASE WHEN arm = 0 THEN s END) AS DOUBLE)
           / SUM(CASE WHEN arm = 0 THEN n END) AS diff,
         CAST(SUM(n) AS BIGINT) AS n_rows
  FROM reps GROUP BY b
),
obs AS (SELECT diff AS obs_diff, n_rows FROM diffs WHERE b = 0),
wide AS (
  SELECT MAX(d.n_rows) AS n_rows,
         COUNT(*) AS n_replicas,
         MAX(o.obs_diff) AS obs_diff_raw,
         CAST(SUM(CASE WHEN abs(d.diff) >= abs(o.obs_diff)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM diffs d CROSS JOIN obs o
  WHERE d.b > 0
)
SELECT n_rows, n_replicas,
       {_sql_round('obs_diff_raw', 6)} AS obs_diff,
       n_extreme,
       {_sql_round(
           f'CAST(n_extreme + 1 AS DOUBLE) / {_RT_B + 1}', 6
       )} AS p_value
FROM wide
"""


# --------------------------------------------------------------------------
# lsh_tuning_curve — the S-curve design readout for the shipped
# MinHash-LSH configuration, with the measured bucket load beside it.
#
# Banding theory says a (b bands × r rows) LSH catches a pair of
# Jaccard similarity s with probability 1 − (1 − s^r)^b; picking
# (b, r) IS the dedup recall/cost trade. This query emits that curve
# for the shipped config (b=4, r=4 — operators/dedup.py) on a 5%
# similarity grid, joined with the EMPIRICAL band-bucket census from
# running the actual banding over the corpus: bucket count, singleton
# count, candidate-pair load Σ C(size,2) (the verify-stage cost the
# curve is traded against) and the largest bucket (the skew to watch).
#
# Determinism: the curve is literal-grid arithmetic with s^r and
# (1−s^r)^b expanded to left-associated multiplies mirrored exactly
# in SQL; the census rides the same md5/Kirsch-Mitzenmacher minhash
# replay the minhash_dedup_pairs oracle already proves.
#
# Scale: the census aggregates the (doc × bands) frame to bucket
# sizes — one groupBy; the curve is 19 literal rows; their join is a
# 1-row broadcast. No pair join is ever materialized (the POINT:
# this query prices the pair join before you run it).
# --------------------------------------------------------------------------


def q_lsh_tuning_curve(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators import dedup

    docs = table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    bb = dedup.lsh_band_buckets(
        dedup.minhash_signatures(docs, "doc_id", "text")
    )
    sizes = bb.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("size")
    )
    census = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("size") == 1, 1).otherwise(0)).alias(
            "n_singletons"
        ),
        F.sum(
            F.expr("CAST(size * (size - 1) AS BIGINT) div 2")
        ).alias("n_candidate_pairs"),
        F.max("size").alias("max_bucket"),
    )
    grid = spark.range(1, 20).select(
        (F.col("id") * 5).cast("int").alias("s_pct")
    )
    s = F.col("s_pct") / F.lit(100.0)
    s4 = s * s * s * s
    q = F.lit(1.0) - s4
    p = F.lit(1.0) - q * q * q * q
    return (
        grid.join(F.broadcast(census))
        .select(
            "s_pct",
            F.round(p, 8).alias("p_catch"),
            "n_buckets",
            "n_singletons",
            "n_candidate_pairs",
            "max_bucket",
        )
        .orderBy("s_pct")
    )


def _lsh_tuning_sql() -> str:
    from city_payroll_data_pipeline_spark.suite.textops import (
        _SHINGLE_AB_CTES,
    )

    k, bands = 16, 4
    r = k // bands
    mins = ",\n         ".join(f"min(a + {i} * b) AS h{i}" for i in range(k))
    band_cases = " ".join(
        "WHEN {b} THEN md5({parts})".format(
            b=b,
            parts=" || '|' || ".join(f"h{b * r + j}" for j in range(r)),
        )
        for b in range(bands)
    )
    s = "(s_pct / 100.0)"
    s4 = f"({s} * {s} * {s} * {s})"
    q = f"(1.0 - {s4})"
    p = f"1.0 - {q} * {q} * {q} * {q}"
    return rf"""
WITH corpus AS (SELECT doc_id, text FROM documents),
{_SHINGLE_AB_CTES}
sigs AS (
  SELECT doc_id,
         {mins}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band_idx,
         CASE b.band_idx {band_cases} END AS band_hash
  FROM sigs CROSS JOIN (VALUES (0),(1),(2),(3)) AS b(band_idx)
),
sizes AS (
  SELECT band_idx, band_hash, COUNT(*) AS size
  FROM bands GROUP BY band_idx, band_hash
),
census AS (
  SELECT COUNT(*) AS n_buckets,
         CAST(SUM(CASE WHEN size = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_singletons,
         CAST(SUM(size * (size - 1) // 2) AS BIGINT) AS n_candidate_pairs,
         MAX(size) AS max_bucket
  FROM sizes
),
grid AS (SELECT CAST(unnest(range(1, 20)) * 5 AS INT) AS s_pct)
SELECT s_pct,
       {_sql_round(p, 8)} AS p_catch,
       n_buckets, n_singletons, n_candidate_pairs, max_bucket
FROM grid CROSS JOIN census
ORDER BY s_pct
"""


# --------------------------------------------------------------------------
# xent_mix_weights — difficulty-weighted data-mixing via polynomial
# multiplicative weights.
#
# The DoReMi-family idea in its deterministic skeleton: score each
# source by how SURPRISING its token stream is under the pooled
# corpus unigram LM (cross-entropy H_s = −Σ_w n_{s,w}·ln(c_w/N)/N_s),
# then upweight hard/diverse sources with the polynomial
# multiplicative-weights update w_s = (1 + η·H̄_s)^T (the
# (1+ηℓ)-variant of MWU — chosen over exp(ηℓ) precisely because it
# stays in exact DECIMAL arithmetic; exp is not trusted cross-engine,
# the Kaplan-Meier rule). Output: per-source cross-entropy, the
# normalized mix weight, and the token allocation under a fixed
# budget. Complements temperature_mixture (size-based) with a
# difficulty-based mix.
#
# Determinism: token counts are exact; each ln is one
# integer-ratio double rounded 8 dp; H̄_s rounds to DECIMAL(18,8);
# the T=5 MWU factors multiply in DECIMAL with a 12-dp round per
# step (positive values: HALF_UP ≡ half-away in both engines);
# one final double normalization rounded 6 dp.
#
# Scale: the only corpus-sized work is the (source, term) count
# aggregate; the corpus-LM join runs on the vocabulary frame; the
# MWU trajectory is |sources|-row algebra.
# --------------------------------------------------------------------------

_MWU_ETA = "0.1"  # decimal literal, exact in DECIMAL arithmetic
_MWU_T = 5
_MIX_BUDGET = 1_000_000


def q_xent_mix_weights(spark, sf_dir):
    from city_payroll_data_pipeline_spark.functions.text import tokens_array

    docs = table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "source", F.explode(tokens_array(F.col("text"))).alias("tok")
    )
    st = toks.groupBy("source", "tok").agg(F.count("*").alias("n_sw"))
    corpus = st.groupBy("tok").agg(F.sum("n_sw").alias("c_w"))
    tot = corpus.agg(F.sum("c_w").alias("n_tot"))
    terms = st.join(corpus, "tok").join(F.broadcast(tot))
    per_src = terms.groupBy("source").agg(
        F.sum("n_sw").alias("n_tokens"),
        F.sum(
            F.round(
                F.col("n_sw")
                * F.round(
                    F.log(
                        F.col("c_w").cast("double")
                        / F.col("n_tot").cast("double")
                    ),
                    8,
                ),
                8,
            ).cast("decimal(28,8)")
        ).alias("wsum"),
    )
    xent = F.round(
        (-F.col("wsum").cast("double")) / F.col("n_tokens").cast("double"), 8
    )
    scored = per_src.select(
        "source",
        "n_tokens",
        xent.cast("decimal(10,8)").alias("h"),
    )
    # polynomial MWU, T rounds unrolled in exact DECIMAL. Types are
    # sized so every product stays under precision 38 — Spark would
    # otherwise silently REDUCE the scale of an overflowing decimal
    # product (a one-ulp divergence the oracle catches).
    w = F.lit("1").cast("decimal(20,12)")
    factor = (
        F.lit(1).cast("decimal(3,1)")
        + F.expr(f"CAST({_MWU_ETA} AS DECIMAL(3,1))") * F.col("h")
    ).cast("decimal(12,9)")
    for _ in range(_MWU_T):
        w = F.round(w * factor, 12).cast("decimal(20,12)")
    weighted = scored.select(
        "source", "n_tokens", F.col("h").cast("double").alias("xent_nats"),
        w.alias("w_raw"),
    )
    z = weighted.agg(F.sum("w_raw").alias("z"))
    return (
        weighted.join(F.broadcast(z))
        .select(
            "source",
            "n_tokens",
            "xent_nats",
            F.round(
                F.col("w_raw").cast("double") / F.col("z").cast("double"), 6
            ).alias("mix_weight"),
            F.floor(
                F.lit(_MIX_BUDGET)
                * (F.col("w_raw").cast("double") / F.col("z").cast("double"))
            ).cast("bigint").alias("alloc_tokens"),
        )
        .orderBy("source")
    )


def _xent_mix_sql() -> str:
    ln_term = _sql_round(
        "ln(CAST(c_w AS DOUBLE) / CAST(n_tot AS DOUBLE))", 8
    )
    mwu = "CAST(1 AS DECIMAL(20,12))"
    factor = (
        f"CAST(CAST(1 AS DECIMAL(3,1))"
        f" + CAST({_MWU_ETA} AS DECIMAL(3,1)) * h AS DECIMAL(12,9))"
    )
    for _ in range(_MWU_T):
        mwu = f"CAST(round({mwu} * {factor}, 12) AS DECIMAL(20,12))"
    return rf"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(trim(text), '\S+', 0)) AS tok
  FROM documents
),
st AS (
  SELECT source, tok, COUNT(*) AS n_sw FROM toks GROUP BY source, tok
),
corpus AS (
  SELECT tok, CAST(SUM(n_sw) AS BIGINT) AS c_w FROM st GROUP BY tok
),
tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_tot FROM corpus),
per_src AS (
  SELECT source,
         CAST(SUM(n_sw) AS BIGINT) AS n_tokens,
         SUM(CAST({_sql_round(f'n_sw * CAST({ln_term} AS DOUBLE)', 8)}
             AS DECIMAL(28,8))) AS wsum
  FROM st JOIN corpus USING (tok) CROSS JOIN tot
  GROUP BY source
),
scored AS (
  SELECT source, n_tokens,
         CAST({_sql_round(
             '(-CAST(wsum AS DOUBLE)) / CAST(n_tokens AS DOUBLE)', 8
         )} AS DECIMAL(10,8)) AS h
  FROM per_src
),
weighted AS (
  SELECT source, n_tokens, CAST(h AS DOUBLE) AS xent_nats,
         {mwu} AS w_raw
  FROM scored
),
z AS (SELECT SUM(w_raw) AS z FROM weighted)
SELECT source, n_tokens, xent_nats,
       {_sql_round('CAST(w_raw AS DOUBLE) / CAST(z AS DOUBLE)', 6)}
         AS mix_weight,
       CAST(floor({_MIX_BUDGET}
                  * (CAST(w_raw AS DOUBLE) / CAST(z AS DOUBLE)))
            AS BIGINT) AS alloc_tokens
FROM weighted CROSS JOIN z
ORDER BY source
"""


# --------------------------------------------------------------------------
# hll_union_intersect_audit — sketch MERGEABILITY, certified: distinct
# customers of two order-date halves, their union by register max,
# their intersection by inclusion-exclusion — each against the exact
# answer.
#
# The property that makes sketches the distributed-rollup currency is
# that registers MERGE (max per bucket) without re-reading data: any
# time-range union is a 4096-row max, not a scan. This query builds
# per-half HLL registers (same p=12 family as hll_distinct_audit),
# merges them, and reports estimated vs exact |A|, |B|, |A∪B| and the
# inclusion-exclusion |A∩B| — the latter is the sketch's known weak
# spot (error compounds), which the exact column makes visible
# instead of hiding.
#
# Determinism: identical md5 register math as hll_distinct_audit;
# merge = MAX over the union of register frames; only doubles are the
# three raw-estimate divisions (the corpus keeps every group out of
# the linear-counting regime; the LC branch is certified separately
# in hll_distinct_audit).
#
# Scale: registers are built by one map-side partial-max aggregate
# per half; the merge and all estimates run on ≤ 3·4096 rows. Exact
# distincts ride along only to certify (sample tier at 100 TB).
# --------------------------------------------------------------------------


def q_hll_union_intersect_audit(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    mid = orders.agg(
        (F.min("o_orderdate") + F.expr("INTERVAL 365 DAYS")).alias("cut")
    )
    bucket, rho = hll_bucket_rho(F.col("o_custkey"))
    tagged = orders.join(F.broadcast(mid)).select(
        F.when(F.col("o_orderdate") < F.col("cut"), "early")
        .otherwise("late")
        .alias("half"),
        bucket.alias("b"),
        rho.alias("rho"),
        "o_custkey",
    )
    regs = tagged.groupBy("half", "b").agg(F.max("rho").alias("m_j"))
    union_regs = regs.groupBy("b").agg(F.max("m_j").alias("m_j")).select(
        F.lit("union").alias("half"), "b", "m_j"
    )
    all_regs = regs.unionAll(union_regs)
    per = all_regs.groupBy("half").agg(
        F.count("*").alias("v_obs"),
        F.sum(F.expr("shiftleft(1L, 49 - m_j)")).alias("s_obs"),
    )
    v_empty = F.lit(_HLL_M) - F.col("v_obs")
    raw = (
        F.lit(_HLL_ALPHA)
        * _HLL_M
        * _HLL_M
        * (
            F.lit(float(_HLL_C49))
            / (F.col("s_obs") + v_empty * F.lit(_HLL_C49)).cast("double")
        )
    )
    lc = _HLL_M * F.round(
        F.log(F.lit(_HLL_M).cast("double") / v_empty.cast("double")), 8
    )
    est = per.select(
        "half",
        F.round(
            F.when((raw <= 2.5 * _HLL_M) & (v_empty > 0), lc).otherwise(raw),
            4,
        ).alias("est"),
    )
    exact_halves = tagged.groupBy("half").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    exact_union = tagged.agg(
        F.countDistinct("o_custkey").alias("n_exact")
    ).select(F.lit("union").alias("half"), "n_exact")
    exact = exact_halves.unionAll(exact_union)
    wide = (
        est.join(exact, "half")
        .groupBy()
        .pivot("half", ["early", "late", "union"])
        .agg(F.max("est").alias("est"), F.max("n_exact").alias("exact"))
    )
    inter_est = F.round(
        F.col("early_est") + F.col("late_est") - F.col("union_est"), 4
    )
    inter_exact = (
        F.col("early_exact") + F.col("late_exact") - F.col("union_exact")
    )
    return wide.select(
        F.col("early_exact").alias("exact_early"),
        F.col("early_est").alias("hll_early"),
        F.col("late_exact").alias("exact_late"),
        F.col("late_est").alias("hll_late"),
        F.col("union_exact").alias("exact_union"),
        F.col("union_est").alias("hll_union"),
        inter_exact.alias("exact_intersect"),
        inter_est.alias("hll_intersect"),
    )


def _hll_union_sql() -> str:
    reg_math = """
         CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 3) AS INT)
           AS b,
         CASE WHEN CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 4, 12)
                        AS BIGINT) = 0 THEN 49
              ELSE 49 - length(bin(CAST('0x' ||
                     substr(md5(CAST(o_custkey AS VARCHAR)), 4, 12)
                     AS BIGINT)))
         END AS rho"""
    raw_est = (
        f"CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M}"
        f" * (CAST({_HLL_C49} AS DOUBLE)"
        f" / CAST(s_obs + ({_HLL_M} - v_obs)"
        f" * CAST({_HLL_C49} AS BIGINT) AS DOUBLE))"
    )
    return f"""
WITH mid AS (
  SELECT MIN(o_orderdate) + INTERVAL 365 DAY AS cut FROM orders
),
tagged AS (
  SELECT CASE WHEN o_orderdate < (SELECT cut FROM mid)
              THEN 'early' ELSE 'late' END AS half,
         {reg_math},
         o_custkey
  FROM orders
),
regs AS (
  SELECT half, b, MAX(rho) AS m_j FROM tagged GROUP BY half, b
),
all_regs AS (
  SELECT half, b, m_j FROM regs
  UNION ALL
  SELECT 'union' AS half, b, MAX(m_j) AS m_j FROM regs GROUP BY b
),
per AS (
  SELECT half, COUNT(*) AS v_obs,
         CAST(SUM(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT) AS s_obs
  FROM all_regs GROUP BY half
),
raw AS (
  SELECT half, v_obs, {_HLL_M} - v_obs AS v_empty,
         {raw_est} AS raw
  FROM per
),
est AS (
  SELECT half,
         {_sql_round(
             f'''CASE WHEN raw <= 2.5 * {_HLL_M} AND v_empty > 0
              THEN {_HLL_M} * CAST({_sql_round(
                  f"ln(CAST({_HLL_M} AS DOUBLE) / CAST(v_empty AS DOUBLE))", 8
              )} AS DOUBLE)
              ELSE raw END''',
             4,
         )} AS est
  FROM raw
),
exact AS (
  SELECT half, COUNT(DISTINCT o_custkey) AS n_exact FROM tagged GROUP BY half
  UNION ALL
  SELECT 'union', COUNT(DISTINCT o_custkey) FROM tagged
),
wide AS (
  SELECT
    MAX(CASE WHEN half = 'early' THEN n_exact END) AS exact_early,
    MAX(CASE WHEN half = 'early' THEN est END) AS hll_early,
    MAX(CASE WHEN half = 'late' THEN n_exact END) AS exact_late,
    MAX(CASE WHEN half = 'late' THEN est END) AS hll_late,
    MAX(CASE WHEN half = 'union' THEN n_exact END) AS exact_union,
    MAX(CASE WHEN half = 'union' THEN est END) AS hll_union
  FROM est JOIN exact USING (half)
)
SELECT exact_early, hll_early, exact_late, hll_late,
       exact_union, hll_union,
       exact_early + exact_late - exact_union AS exact_intersect,
       {_sql_round('hll_early + hll_late - hll_union', 4)} AS hll_intersect
FROM wide
"""


# --------------------------------------------------------------------------
# offpolicy_eval_ips — counterfactual policy value via inverse
# propensity scoring (IPS) and its self-normalized variant (SNIPS).
#
# The logged-bandit eval every recommender/agent pipeline needs:
# "what reward WOULD the uniform target policy have earned on this
# logged traffic?" — answered without running it, by reweighting each
# logged event with π_target/π_behavior (Horvitz-Thompson). The
# behavior propensity is the MLE event-type share; the target is
# uniform over the K observed types. SNIPS divides by Σw instead of
# n (lower variance, and here Σw = n·(K_obs/K)·… collapses exactly —
# the readout shows both).
#
# Determinism: rewards sum in DECIMAL per type BEFORE any division —
# IPS = (1/n)·Σ_type [ n·S_type / (K·n_type) ] needs exactly one
# double division per TYPE (K rows), each rounded 8 dp and
# DECIMAL-summed; no per-row weight is ever a float.
#
# Scale: one groupBy to the |types|-row frame; the whole estimator
# is algebra on it. Per-row reweighting (the textbook formulation)
# is algebraically eliminated — the map-side partial sums ARE the
# sufficient statistics.
# --------------------------------------------------------------------------


def q_offpolicy_eval_ips(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.count("*").alias("n_t"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s_t"),
    )
    tot = per_type.agg(
        F.sum("n_t").alias("n"), F.count("*").alias("k")
    )
    terms = per_type.join(F.broadcast(tot)).select(
        "event_type",
        "n_t",
        "s_t",
        "n",
        "k",
        # per-type IPS contribution: (n / (K·n_t)) · S_t, one division
        F.round(
            (F.col("s_t").cast("double") * F.col("n"))
            / (F.col("k") * F.col("n_t")).cast("double"),
            8,
        ).alias("contrib"),
    )
    wide = terms.groupBy().agg(
        F.max("n").alias("n_events"),
        F.max("k").alias("n_arms"),
        F.sum(
            F.round(F.col("contrib"), 8).cast("decimal(28,8)")
        ).alias("ips_total"),
        F.sum("s_t").alias("reward_total"),
    )
    return wide.select(
        "n_events",
        "n_arms",
        F.round(
            F.col("reward_total").cast("double") / F.col("n_events"), 6
        ).alias("logged_mean_reward"),
        F.round(
            F.col("ips_total").cast("double") / F.col("n_events"), 6
        ).alias("ips_value"),
        # SNIPS: Σ contrib / Σ w, and Σw = Σ_t n·n_t/(K·n_t) = n — so
        # SNIPS ≡ IPS here; emitted anyway as the variance-reduced
        # form consumers expect (they differ under partial support)
        F.round(
            F.col("ips_total").cast("double") / F.col("n_events"), 6
        ).alias("snips_value"),
    )


_OFFPOLICY_SQL = f"""
WITH per_type AS (
  SELECT event_type, COUNT(*) AS n_t,
         SUM(CAST(value AS DECIMAL(18,2))) AS s_t
  FROM events GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(n_t) AS BIGINT) AS n, COUNT(*) AS k FROM per_type
),
terms AS (
  SELECT event_type, n_t, s_t, n, k,
         {_sql_round(
             '(CAST(s_t AS DOUBLE) * n) / CAST(k * n_t AS DOUBLE)', 8
         )} AS contrib
  FROM per_type CROSS JOIN tot
),
wide AS (
  SELECT MAX(n) AS n_events, MAX(k) AS n_arms,
         SUM(CAST({_sql_round('contrib', 8)} AS DECIMAL(28,8)))
           AS ips_total,
         SUM(s_t) AS reward_total
  FROM terms
)
SELECT n_events, n_arms,
       {_sql_round(
           'CAST(reward_total AS DOUBLE) / n_events', 6
       )} AS logged_mean_reward,
       {_sql_round('CAST(ips_total AS DOUBLE) / n_events', 6)} AS ips_value,
       {_sql_round('CAST(ips_total AS DOUBLE) / n_events', 6)} AS snips_value
FROM wide
"""


# --------------------------------------------------------------------------
# quantile_treatment_effects — decile-level uplift, not just the mean.
#
# A treatment that moves the median is a different business story
# than one that only inflates the whales; the QTE curve
# q_treatment(p) − q_control(p) across deciles is how you see which.
# Arms are the same md5-parity assignment as mann_whitney_test /
# randomization_test_uplift — the three queries together are the
# mean / rank / distributional readout of one experiment.
#
# Determinism: both engines interpolate the exact quantile at
# p·(n−1) (the proven group_percentiles parity); a 6-dp round
# absorbs last-ulp association differences.
#
# Scale: exact per-arm quantiles are a sort-based aggregate — the
# audit path. At 100 TB swap approx_percentile (same output shape)
# or the mergeable histogram_quantiles bins for the dashboard path.
# --------------------------------------------------------------------------

_QTE_PS = [round(0.1 * i, 1) for i in range(1, 10)]


def q_quantile_treatment_effects(spark, sf_dir):
    from city_payroll_data_pipeline_spark.functions.text import hex_to_long

    orders = table(spark, sf_dir, "orders")
    arm = F.when(
        F.pmod(
            hex_to_long(
                F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12)
            ),
            F.lit(2),
        )
        == 0,
        "control",
    ).otherwise("treatment")
    per_arm = orders.groupBy(arm.alias("arm")).agg(
        F.count("*").alias("n"),
        F.percentile("o_totalprice", _QTE_PS).alias("qs"),
    )
    melted = per_arm.select(
        "arm", "n", F.posexplode("qs").alias("i", "q")
    ).select(
        "arm",
        "n",
        ((F.col("i") + 1) * 10).cast("int").alias("pctile"),
        "q",
    )
    wide = (
        melted.groupBy("pctile")
        .pivot("arm", ["control", "treatment"])
        .agg(F.max("q").alias("q"), F.max("n").alias("n"))
    )
    return wide.select(
        "pctile",
        F.col("control_n").alias("n_control"),
        F.col("treatment_n").alias("n_treatment"),
        F.round("control_q", 6).alias("q_control"),
        F.round("treatment_q", 6).alias("q_treatment"),
        F.round(F.col("treatment_q") - F.col("control_q"), 6).alias("qte"),
    ).orderBy("pctile")


def _qte_sql() -> str:
    ps = ", ".join(str(p) for p in _QTE_PS)
    return f"""
WITH arms AS (
  SELECT CASE WHEN CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12)
                   AS BIGINT) % 2 = 0
              THEN 'control' ELSE 'treatment' END AS arm,
         o_totalprice
  FROM orders
),
per_arm AS (
  SELECT arm, COUNT(*) AS n,
         quantile_cont(o_totalprice, [{ps}]) AS qs
  FROM arms GROUP BY arm
),
melted AS (
  SELECT arm, n, CAST(u.i * 10 AS INT) AS pctile, u.q
  FROM per_arm,
       LATERAL (SELECT unnest(qs) AS q,
                       generate_subscripts(qs, 1) AS i) u
),
wide AS (
  SELECT pctile,
         MAX(CASE WHEN arm = 'control' THEN n END) AS n_control,
         MAX(CASE WHEN arm = 'treatment' THEN n END) AS n_treatment,
         MAX(CASE WHEN arm = 'control' THEN q END) AS cq,
         MAX(CASE WHEN arm = 'treatment' THEN q END) AS tq
  FROM melted GROUP BY pctile
)
SELECT pctile, n_control, n_treatment,
       {_sql_round('cq', 6)} AS q_control,
       {_sql_round('tq', 6)} AS q_treatment,
       {_sql_round('tq - cq', 6)} AS qte
FROM wide
ORDER BY pctile
"""


# --------------------------------------------------------------------------
# lpa_modularity — Newman modularity of the LPA partition, exact.
#
# Closes the community-detection loop: lpa_communities FINDS a
# partition, this query SCORES it — Q = Σ_c [ in_c/(2m) −
# (deg_c/(2m))² ], the standard "is this partition better than
# chance" readout (Q ≈ 0: hairball; Q ≳ 0.3: real modular
# structure). Reported per the whole partition plus the per-community
# contributions of the top communities, so a single bloated
# community's negative contribution is visible.
#
# Determinism: in_c (intra-community weight) and deg_c are exact
# BIGINT sums over the same weighted edge frame LPA ran on; Q's
# terms are cross-multiplied into exact integers — numerator
# Σ_c [ 2m·in_c·2 − deg_c² ]... kept simpler: each term is one
# rounded double from exact integer ratios (the ln-rule discipline,
# minus the ln), DECIMAL-summed.
#
# Scale: one labels⋈edges join on src + one on dst (the LPA round
# shape), then |communities|-row algebra.
# --------------------------------------------------------------------------


def q_lpa_modularity(spark, sf_dir):
    edges = _lpa_edges(spark, sf_dir)
    labels = _lpa_labels(edges)
    labels = labels.localCheckpoint()  # |nodes|-row label frame, used twice
    lsrc = labels.select(F.col("node").alias("src"), F.col("lbl").alias("c_src"))
    ldst = labels.select(F.col("node").alias("dst"), F.col("lbl").alias("c_dst"))
    # aggregate the src-label join down to (dst, c_src) vote rows BEFORE
    # attaching the dst label: the second join then reads the aggregated
    # frame (≤ |edges| rows, usually far fewer) instead of re-shuffling
    # the full edge frame a second time (guide §2.3 — aggregate before
    # you shuffle). Bigint sums regroup exactly: Σ over (dst, c_src)
    # partial sums ≡ Σ over raw tagged edges.
    votes = (
        edges.join(lsrc, "src")
        .groupBy("dst", "c_src")
        .agg(F.sum("w").alias("vw"))
    )
    tagged = votes.join(ldst, "dst")
    # _lpa_edges is symmetric by construction, so Σw = 2m exactly and
    # every intra-community edge is counted once per direction
    per_c = tagged.groupBy(F.col("c_dst").alias("community")).agg(
        F.sum("vw").alias("deg_c"),
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), F.col("vw")).otherwise(0)).alias("in_c"),
    )
    m2 = per_c.agg(F.sum("deg_c").alias("m2"))  # = 2m
    terms = per_c.join(F.broadcast(m2)).select(
        "community",
        "deg_c",
        "in_c",
        F.round(
            F.col("in_c").cast("double") / F.col("m2")
            - (F.col("deg_c").cast("double") / F.col("m2"))
            * (F.col("deg_c").cast("double") / F.col("m2")),
            10,
        ).alias("q_c"),
    )
    q = terms.agg(
        F.sum(F.round(F.col("q_c"), 10).cast("decimal(28,10)")).alias("q"),
        F.count("*").alias("n_communities"),
    )
    top = terms.orderBy(F.desc("deg_c"), "community").limit(10).select(
        "community", "deg_c", "in_c", F.round("q_c", 8).alias("q_contrib")
    )
    return top.join(F.broadcast(q)).select(
        "community",
        "deg_c",
        "in_c",
        "q_contrib",
        "n_communities",
        F.round(F.col("q").cast("double"), 8).alias("modularity"),
    ).orderBy(F.desc("deg_c"), "community")


def _lpa_modularity_sql() -> str:
    base = _lpa_sql()
    # reuse the full LPA CTE chain up to its final SELECT
    cte_part = base[: base.rindex("SELECT lbl AS community")].rstrip()
    return f"""{cte_part},
lsrc AS (SELECT node AS src, lbl AS c_src FROM r{_LPA_ROUNDS}),
ldst AS (SELECT node AS dst, lbl AS c_dst FROM r{_LPA_ROUNDS}),
tagged AS (
  SELECT e.w, lsrc.c_src, ldst.c_dst
  FROM edges e JOIN lsrc USING (src) JOIN ldst USING (dst)
),
per_c AS (
  SELECT c_dst AS community,
         CAST(SUM(w) AS BIGINT) AS deg_c,
         CAST(SUM(CASE WHEN c_src = c_dst THEN w ELSE 0 END) AS BIGINT)
           AS in_c
  FROM tagged GROUP BY c_dst
),
m2 AS (SELECT CAST(SUM(deg_c) AS BIGINT) AS m2 FROM per_c),
terms AS (
  SELECT community, deg_c, in_c,
         {_sql_round(
             'CAST(in_c AS DOUBLE) / m2'
             ' - (CAST(deg_c AS DOUBLE) / m2)'
             ' * (CAST(deg_c AS DOUBLE) / m2)',
             10,
         )} AS q_c
  FROM per_c CROSS JOIN m2
),
q AS (
  SELECT SUM(CAST({_sql_round('q_c', 10)} AS DECIMAL(28,10))) AS q,
         COUNT(*) AS n_communities
  FROM terms
),
top AS (
  SELECT community, deg_c, in_c, {_sql_round('q_c', 8)} AS q_contrib
  FROM terms ORDER BY deg_c DESC, community LIMIT 10
)
SELECT community, deg_c, in_c, q_contrib, n_communities,
       {_sql_round('CAST(q AS DOUBLE)', 8)} AS modularity
FROM top CROSS JOIN q
ORDER BY deg_c DESC, community
"""


# --------------------------------------------------------------------------
# experiment_power_mde — "how small an effect could this experiment
# even see?" — the pre-registration readout that prevents both
# underpowered launches and post-hoc significance fishing.
#
# Closed-form two-sample MDE at α=0.05 (two-sided), power 80%:
# MDE = (z_{α/2} + z_β)·sqrt(σ²/n_c + σ²/n_t), with σ² the pooled
# variance of the metric and the arms the standard md5-parity split.
# Also reported relative to the mean (the "X% lift detectable"
# number product teams actually quote).
#
# Determinism: z constants are Python literals; σ² comes from exact
# DECIMAL power sums (the length_moments discipline); one sqrt chain
# at the end.
#
# Scale: one 1-row moment aggregate — nothing else.
# --------------------------------------------------------------------------

_Z_ALPHA = 1.959963984540054  # Phi^{-1}(0.975)
_Z_BETA = 0.8416212335729143  # Phi^{-1}(0.80)


def q_experiment_power_mde(spark, sf_dir):
    from city_payroll_data_pipeline_spark.functions.text import hex_to_long

    orders = table(spark, sf_dir, "orders")
    arm = F.pmod(
        hex_to_long(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12)
        ),
        F.lit(2),
    )
    v = F.col("o_totalprice").cast("decimal(18,2)")
    m = orders.agg(
        F.count("*").alias("n"),
        F.sum(F.when(arm == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(v).alias("s1"),
        F.sum((v * v).cast("decimal(38,4)")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    mde = (_Z_ALPHA + _Z_BETA) * F.sqrt(
        var / F.col("n_c") + var / F.col("n_t")
    )
    return m.select(
        "n_c",
        "n_t",
        F.round(mean, 6).alias("metric_mean"),
        F.round(F.sqrt(var), 6).alias("metric_sd"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / mean, 6).alias("mde_rel"),
    )


_POWER_MDE_SQL = f"""
WITH m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN CAST('0x' ||
               substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12)
               AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN CAST('0x' ||
               substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12)
               AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s1,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                  * CAST(o_totalprice AS DECIMAL(18,2))
                  AS DECIMAL(38,4))) AS s2
  FROM orders
)
SELECT n_c, n_t,
       {_sql_round('CAST(s1 AS DOUBLE) / n', 6)} AS metric_mean,
       {_sql_round(
           'sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)'
           ' * CAST(s1 AS DOUBLE) / n) / (n - 1))', 6
       )} AS metric_sd,
       {_sql_round(
           f'({_Z_ALPHA!r} + {_Z_BETA!r})'
           ' * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)'
           ' * CAST(s1 AS DOUBLE) / n) / (n - 1) / n_c'
           ' + (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)'
           ' * CAST(s1 AS DOUBLE) / n) / (n - 1) / n_t)', 6
       )} AS mde_abs,
       {_sql_round(
           f'({_Z_ALPHA!r} + {_Z_BETA!r})'
           ' * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)'
           ' * CAST(s1 AS DOUBLE) / n) / (n - 1) / n_c'
           ' + (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)'
           ' * CAST(s1 AS DOUBLE) / n) / (n - 1) / n_t)'
           ' / (CAST(s1 AS DOUBLE) / n)', 6
       )} AS mde_rel
FROM m
"""


# --------------------------------------------------------------------------
# bradley_terry_sources — Bradley–Terry preference-strength fit over
# the sources, via Hunter (2004)'s MM algorithm. This is THE
# aggregation primitive of preference data: RLHF reward-model prep,
# Chatbot-Arena-style leaderboards, and rater-consistency audits all
# reduce to "given pairwise win counts, recover latent strengths π
# with P(i beats j) = π_i/(π_i+π_j)". Win rates alone are biased by
# who-played-whom; BT corrects for opponent strength.
#
# Matches here are synthesized deterministically (the stand-in for
# human preference pairs — the FIT is the operator): docs pair by
# consecutive stable row id in md5 order (operators/rowids.py, so no
# global-sort window at scale), cross-source pairs keep, and the
# longer doc wins (doc_id breaks ties). The MM update
# π_i ← W_i / Σ_j n_ij/(π_i+π_j) runs 6 unrolled iterations in
# SCALE-fixed-point BIGINTs (the HITS/pagerank machinery): per-term
# truncating div, sum-normalization to |players|·SCALE via a
# cross-multiplied truncating div on a broadcast 1-row total.
#
# Invariants: after iteration 1, P_i = 0 ⟺ W_i = 0 (the MLE limit
# for a never-winner), and a pair with n_ij ≥ 1 always has
# P_i + P_j > 0 (its match had a winner), so no division guard is
# needed — documented rather than coded. Overflow: terms peak at
# n_ij·SCALE² — swap BIGINT for DECIMAL(38,0) when per-pair match
# counts approach 10^6 (they are |sources|²-aggregated first, so the
# iteration never touches corpus-sized data).
#
# Scale: pairing is the stable_row_ids two-phase shape (largest sort
# 1/n_shards); the wins matrix aggregates everything to |sources|²
# rows before any iteration; each MM step is two broadcast joins +
# one groupBy over that tiny frame.
# --------------------------------------------------------------------------

_BT_ITERS = 6
_BT_SCALE = 1_000_000


def q_bradley_terry_sources(spark, sf_dir):
    from city_payroll_data_pipeline_spark.operators.preference import (
        bt_mm_scaled,
    )
    from city_payroll_data_pipeline_spark.operators.rowids import stable_row_ids

    S = _BT_SCALE
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        "n_chars",
        # numeric 48-bit md5 prefix (the epoch_shuffle_plan key shape)
        # so the rowids shard-boundary percentiles get a numeric key
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
        )
        .cast("bigint")
        .alias("hkey"),
    )
    ids = stable_row_ids(
        base, "hkey", tiebreakers=("doc_id",), n_shards=8, id_col="rid"
    )
    sides = ids.withColumn("pair", F.expr("(rid - 1) div 2")).withColumn(
        "side", F.expr("(rid - 1) % 2")
    )
    doc_struct = F.struct("source", "n_chars", "doc_id")
    matches = (
        sides.groupBy("pair")
        .agg(
            F.max(F.when(F.col("side") == 0, doc_struct)).alias("a"),
            F.max(F.when(F.col("side") == 1, doc_struct)).alias("b"),
        )
        .where(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a.source") != F.col("b.source"))
        )
        .select(
            F.when(F.col("a.n_chars") > F.col("b.n_chars"), F.col("a.source"))
            .when(F.col("b.n_chars") > F.col("a.n_chars"), F.col("b.source"))
            .when(F.col("a.doc_id") < F.col("b.doc_id"), F.col("a.source"))
            .otherwise(F.col("b.source"))
            .alias("winner"),
            F.when(F.col("a.n_chars") > F.col("b.n_chars"), F.col("b.source"))
            .when(F.col("b.n_chars") > F.col("a.n_chars"), F.col("a.source"))
            .when(F.col("a.doc_id") < F.col("b.doc_id"), F.col("b.source"))
            .otherwise(F.col("a.source"))
            .alias("loser"),
        )
    )
    wins = matches.groupBy(
        F.col("winner").alias("i"), F.col("loser").alias("j")
    ).agg(F.count("*").alias("w"))
    fitted = bt_mm_scaled(wins, iters=_BT_ITERS, scale=S)
    return fitted.select(
        F.col("i").alias("source"),
        F.col("w_i").alias("wins"),
        "matches",
        F.col("p").alias("bt_micro"),
        F.round(F.col("p") / F.lit(float(S)), 6).alias("bt_strength"),
    ).orderBy("source")


def _bradley_terry_sql(iters: int = _BT_ITERS) -> str:
    """Unrolled MM iterations mirroring q_bradley_terry_sources term
    by term: '//' and Spark 'div' agree on positives; the pairing
    ROW_NUMBER here is the oracle's formulation of the stable-row-id
    order (bit-identical by the rowids contract)."""
    S = _BT_SCALE
    head = f"""
WITH ids AS MATERIALIZED (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                         AS BIGINT),
                    doc_id) AS rid
  FROM documents
),
m AS MATERIALIZED (
  SELECT CASE WHEN a.n_chars > b.n_chars THEN a.source
              WHEN b.n_chars > a.n_chars THEN b.source
              WHEN a.doc_id < b.doc_id THEN a.source
              ELSE b.source END AS winner,
         CASE WHEN a.n_chars > b.n_chars THEN b.source
              WHEN b.n_chars > a.n_chars THEN a.source
              WHEN a.doc_id < b.doc_id THEN b.source
              ELSE a.source END AS loser
  FROM ids a JOIN ids b ON b.rid = a.rid + 1 AND a.rid % 2 = 1
  WHERE a.source <> b.source
),
wins AS MATERIALIZED (
  SELECT winner AS i, loser AS j, CAST(COUNT(*) AS BIGINT) AS w
  FROM m GROUP BY winner, loser
),
n_pairs AS MATERIALIZED (
  SELECT i, j, CAST(SUM(w) AS BIGINT) AS n_ij FROM (
    SELECT i, j, w FROM wins
    UNION ALL
    SELECT j AS i, i AS j, w FROM wins
  ) GROUP BY i, j
),
w_all AS MATERIALIZED (
  SELECT p.i, COALESCE(t.w_i, 0) AS w_i
  FROM (SELECT DISTINCT i FROM n_pairs) p
  LEFT JOIN (SELECT i, CAST(SUM(w) AS BIGINT) AS w_i FROM wins GROUP BY i) t
    ON p.i = t.i
),
p0 AS MATERIALIZED (
  SELECT i, CAST({S} AS BIGINT) AS p FROM (SELECT DISTINCT i FROM n_pairs)
)"""
    steps = []
    for k in range(1, iters + 1):
        prev = f"p{k - 1}"
        steps.append(f""",
d{k} AS MATERIALIZED (
  SELECT n.i, CAST(SUM((n.n_ij * {S} * {S}) // (pi.p + pj.p)) AS BIGINT) AS d
  FROM n_pairs n
  JOIN {prev} pi ON n.i = pi.i
  JOIN {prev} pj ON n.j = pj.i
  GROUP BY n.i
),
r{k} AS MATERIALIZED (
  SELECT d.i, (w.w_i * {S} * {S}) // d.d AS praw
  FROM d{k} d JOIN w_all w ON d.i = w.i
),
p{k} AS MATERIALIZED (
  SELECT i,
         CAST(praw * (SELECT COUNT(*) FROM r{k}) * {S}
              // (SELECT SUM(praw) FROM r{k}) AS BIGINT) AS p
  FROM r{k}
)""")
    tail = f"""
SELECT p.i AS source,
       w.w_i AS wins,
       nm.matches,
       p.p AS bt_micro,
       {_sql_round(f'CAST(p.p AS DOUBLE) / {S}', 6)} AS bt_strength
FROM p{iters} p
JOIN w_all w ON p.i = w.i
JOIN (SELECT i, CAST(SUM(n_ij) AS BIGINT) AS matches
      FROM n_pairs GROUP BY i) nm ON p.i = nm.i
ORDER BY source
"""
    return head + "".join(steps) + tail


BRADLEY_TERRY_SOURCES_SQL = _bradley_terry_sql()


QUERIES: dict[str, Query] = {
    "embedding_auc_separability": Query(
        q_embedding_auc_separability,
        _embedding_auc_sql(),
        ("ml-eval", "auc", "embeddings", "separability"),
    ),
    "lpa_communities": Query(
        q_lpa_communities,
        _lpa_sql(),
        ("graph", "communities", "label-propagation"),
    ),
    "hll_distinct_audit": Query(
        q_hll_distinct_audit,
        _hll_sql(),
        ("sketch", "hyperloglog", "cardinality", "certification"),
    ),
    "sprt_conversion_gate": Query(
        q_sprt_conversion_gate,
        _SPRT_SQL,
        ("stats", "sequential-testing", "ab-testing", "sprt"),
    ),
    "countmin_heavy_tokens": Query(
        q_countmin_heavy_tokens,
        _countmin_sql(),
        ("sketch", "count-min", "frequency", "certification"),
    ),
    "join_size_estimate": Query(
        q_join_size_estimate,
        JOIN_SIZE_ESTIMATE_SQL,
        ("sketch", "count-min", "join-cardinality", "optimizer"),
    ),
    "kmv_source_overlap": Query(
        q_kmv_source_overlap,
        KMV_SOURCE_OVERLAP_SQL,
        ("sketch", "kmv", "set-overlap", "jaccard", "mergeable"),
    ),
    "mi_feature_screen": Query(
        q_mi_feature_screen,
        _mi_sql(),
        ("ml-eval", "mutual-information", "feature-selection"),
    ),
    "median_of_means": Query(
        q_median_of_means,
        _MOM_SQL,
        ("stats", "robust", "median-of-means"),
    ),
    "bloom_fpr_audit": Query(
        q_bloom_fpr_audit,
        _bloom_fpr_sql(),
        ("sketch", "bloom", "membership", "certification"),
    ),
    "randomization_test_uplift": Query(
        q_randomization_test_uplift,
        _randomization_test_sql(),
        ("stats", "randomization-test", "ab-testing"),
    ),
    "lsh_tuning_curve": Query(
        q_lsh_tuning_curve,
        _lsh_tuning_sql(),
        ("dedup", "lsh", "tuning", "s-curve"),
    ),
    "xent_mix_weights": Query(
        q_xent_mix_weights,
        _xent_mix_sql(),
        ("training-mix", "cross-entropy", "mwu"),
    ),
    "hll_union_intersect_audit": Query(
        q_hll_union_intersect_audit,
        _hll_union_sql(),
        ("sketch", "hyperloglog", "mergeability", "set-ops"),
    ),
    "offpolicy_eval_ips": Query(
        q_offpolicy_eval_ips,
        _OFFPOLICY_SQL,
        ("ml-eval", "off-policy", "ips", "counterfactual"),
    ),
    "bradley_terry_sources": Query(
        q_bradley_terry_sources,
        BRADLEY_TERRY_SOURCES_SQL,
        ("preference", "bradley-terry", "rlhf", "iterative"),
    ),
    "quantile_treatment_effects": Query(
        q_quantile_treatment_effects,
        _qte_sql(),
        ("stats", "qte", "ab-testing", "quantiles"),
    ),
    "lpa_modularity": Query(
        q_lpa_modularity,
        _lpa_modularity_sql(),
        ("graph", "communities", "modularity"),
    ),
    "experiment_power_mde": Query(
        q_experiment_power_mde,
        _POWER_MDE_SQL,
        ("stats", "power", "mde", "ab-testing"),
    ),
}
