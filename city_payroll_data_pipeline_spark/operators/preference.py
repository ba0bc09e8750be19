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


def bt_mm_scaled(
    wins: DataFrame,
    iters: int = 6,
    scale: int = SCALE,
    collect_bound: int = 100_000,
) -> DataFrame:
    """Fit Bradley–Terry strengths from an ordered wins matrix.

    ``wins``: (i, j, w) — i beat j exactly w ≥ 1 times (ordered pairs;
    absent pair = 0 wins). Returns one row per player appearing in any
    pair: (i, w_i, matches, p) with p the SCALE-fixed-point strength
    normalized to Σp = |players|·scale.

    ``collect_bound``: fail-fast cap on the collected wins matrix
    (ADVICE r10) — the |players|² contract is ENFORCED, not assumed: a
    caller passing raw corpus-sized match rows gets a loud error
    instead of a driver OOM, and the ``limit`` below caps driver
    traffic before any check runs.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    S = scale
    # The wins matrix is |players|²-bounded BY CONTRACT (callers
    # aggregate corpus-sized matches down before calling), so collect
    # it once and run the MM fixed point on the driver — the
    # pq_codebook_trained bounded-collect shape. The previous form ran
    # each of the ``iters`` rounds as 3-4 sequential Spark jobs
    # (broadcast p, broadcast totals, eager checkpoint) over a
    # model-sized frame: pure scheduling latency, no data-parallel
    # work to distribute (guide §1.2 — the distributed algorithm term
    # here is the one wins aggregation the caller already pays).
    # Arithmetic is exact integers; Python ``//`` and Spark ``div``
    # agree on non-negatives, so the fixed point is bit-identical.
    spark = wins.sparkSession
    win_rows = wins.select("i", "j", "w").limit(collect_bound + 1).collect()
    if len(win_rows) > collect_bound:
        raise ValueError(
            f"bt_mm_scaled: wins frame exceeds collect_bound="
            f"{collect_bound} rows — callers must aggregate matches to "
            "the |players|^2 wins matrix before calling (raise the "
            "bound only for a genuinely larger player universe)"
        )
    n_ij: dict[tuple, int] = {}
    w_tot: dict = {}
    matches: dict = {}
    for r in win_rows:
        i, j, w = r["i"], r["j"], int(r["w"])
        n_ij[(i, j)] = n_ij.get((i, j), 0) + w
        n_ij[(j, i)] = n_ij.get((j, i), 0) + w
        w_tot[i] = w_tot.get(i, 0) + w
    # per-player total match count in one pass over n_ij (ADVICE r10:
    # the previous per-player scan of all pairs was O(|players|·|pairs|))
    for (i, _j), nij in n_ij.items():
        matches[i] = matches.get(i, 0) + nij
    players = sorted({i for i, _ in n_ij})
    p_cur = {i: S for i in players}
    for _ in range(iters):
        d = {i: 0 for i in players}
        for (i, j), nij in n_ij.items():
            d[i] += (nij * S * S) // (p_cur[i] + p_cur[j])
        praw = {i: (w_tot.get(i, 0) * S * S) // d[i] for i in players}
        tp = sum(praw.values())
        p_cur = {i: (praw[i] * len(players) * S) // tp for i in players}
    out = [
        (
            i,
            int(w_tot.get(i, 0)),
            int(matches.get(i, 0)),
            int(p_cur[i]),
        )
        for i in players
    ]
    i_type = wins.schema["i"].dataType.simpleString()
    return spark.createDataFrame(
        out, f"i {i_type}, w_i bigint, matches bigint, p bigint"
    )
