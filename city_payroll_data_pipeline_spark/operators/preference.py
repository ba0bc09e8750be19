"""Bradley–Terry preference-strength fitting (Hunter 2004 MM), exact
integer fixed-point — the aggregation primitive under RLHF reward-data
prep, pairwise-eval leaderboards, and rater-consistency audits.

Model: P(i beats j) = π_i / (π_i + π_j). The MM update
π_i ← W_i / Σ_j n_ij/(π_i+π_j) monotonically increases the likelihood
(Hunter 2004, Thm 1) and needs no step size. Scores ride SCALE-
fixed-point BIGINTs (the operators/graph.py pagerank/HITS machinery):
per-term truncating division, then sum-normalization to
|players|·SCALE via a cross-multiplied truncating div on a broadcast
1-row total — zero driver round trips, bit-replayable by an unrolled
recursive-CTE oracle ('//' and Spark 'div' agree on positives).

Invariants: a never-winner (W_i = 0) fixes at P_i = 0 exactly (the
MLE limit). The converse — a WINNER never flooring to 0 — holds only
while w_i·S² exceeds its MM denominator, i.e. while a player's total
match count stays below ~2·S·w_i (S = 10^6 default). Past that, the
truncating division can floor a rare winner's strength to 0, and a
pair of two floored players would then divide by zero (NULL term,
silently dropped by the sum — no longer the exact MM fixed point).
The fix is the SAME knob as the overflow advisory below: raise S
(or move to DECIMAL), which restores the margin proportionally —
size S to keep 2·S·w_i above the heaviest player's match count.

Scale: callers aggregate matches to the |players|² wins matrix BEFORE
calling this; every iteration is two broadcast joins + one groupBy
over that model-sized frame. Overflow bound: terms peak at
n_ij·SCALE² — swap BIGINT for DECIMAL(38,0) when per-pair match
counts approach 10^6.

Reference parity note: the reference engine (SURVEY §2) has no
preference/ranking surface; this is beyond-parity, built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def bt_mm_scaled(wins: DataFrame, iters: int = 6, scale: int = SCALE) -> DataFrame:
    """Fit Bradley–Terry strengths from an ordered wins matrix.

    ``wins``: (i, j, w) — i beat j exactly w ≥ 1 times (ordered pairs;
    absent pair = 0 wins). Returns one row per player appearing in any
    pair: (i, w_i, matches, p) with p the SCALE-fixed-point strength
    normalized to Σp = |players|·scale.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    S = scale
    n_pairs = (
        wins.select("i", "j", "w")
        .unionAll(
            wins.select(F.col("j").alias("i"), F.col("i").alias("j"), F.col("w"))
        )
        .groupBy("i", "j")
        .agg(F.sum("w").alias("n_ij"))
    )
    # eager localCheckpoint (the pagerank_scaled lineage rule): the
    # wins matrix is |players|²-bounded, and truncating its lineage
    # here keeps each iteration's plan FLAT — without it, every
    # iteration re-embeds the caller's whole match-generation plan
    # and Catalyst analysis time grows superlinearly in iters.
    n_pairs = n_pairs.localCheckpoint(eager=True)
    w_tot = wins.groupBy("i").agg(F.sum("w").alias("w_i"))
    players = n_pairs.select("i").distinct()
    # left join: a player that never WON still has matches (rows in
    # n_pairs) but no w_tot row — its W_i is genuinely 0.
    w_all = (
        players.join(w_tot, "i", "left")
        .withColumn("w_i", F.coalesce(F.col("w_i"), F.lit(0)).cast("bigint"))
        .localCheckpoint(eager=True)
    )

    p = players.select("i", F.lit(S).cast("bigint").alias("p"))
    for _ in range(iters):
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        terms = (
            n_pairs.join(F.broadcast(p), "i")
            .join(F.broadcast(pj), "j")
            .withColumn("t", F.expr(f"(n_ij * {S} * {S}) div (p + p_j)"))
        )
        d = terms.groupBy("i").agg(F.sum("t").alias("d"))
        praw = d.join(F.broadcast(w_all), "i").select(
            "i", F.expr(f"(w_i * {S} * {S}) div d").alias("praw")
        )
        tot = praw.agg(F.sum("praw").alias("tp"), F.count("*").alias("np"))
        p = (
            praw.crossJoin(F.broadcast(tot))
            .select(
                "i",
                F.expr(f"(praw * np * {S}) div tp").cast("bigint").alias("p"),
            )
            # player-count-sized frame: per-iteration truncation is
            # cheap and bounds the plan at one iteration's depth
            .localCheckpoint(eager=True)
        )

    n_match = n_pairs.groupBy("i").agg(F.sum("n_ij").alias("matches"))
    return (
        p.join(F.broadcast(w_all), "i")
        .join(F.broadcast(n_match), "i")
        .select("i", "w_i", "matches", "p")
    )
