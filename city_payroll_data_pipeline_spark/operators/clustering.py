"""K-means clustering over embedding columns (Lloyd's algorithm),
expressed Spark-first.

This is the iterative-algorithm pattern the reference never needed
(it has no ML surface — SURVEY §2.10: no UDF/UDAF/UDTF anywhere), but
a training-data pipeline does: semantic bucketing for curriculum
mixes, cluster-balanced sampling, and semantic dedup all start with
"cluster the embedding column".

Scale design (the part that must survive 100 TB):

* Centroids live on the DRIVER as ``k × dim`` floats (a few KB) and
  are re-broadcast each iteration as literal array columns — exactly
  MLlib's strategy. The corpus is never collected.
* Each iteration is ONE shuffle: assign (narrow map over the cached
  corpus against literal centroids) → posexplode → partial/final
  aggregate per (cluster, dimension). Shuffle width is ``k·dim``
  rows — independent of corpus size.
* The per-iteration plan is CONSTANT SIZE: it depends only on the
  cached corpus and the centroid literals, so lineage never grows and
  no checkpointing is needed (unlike connected components, where each
  round's frame feeds the next — see operators/dedup.py).
* Determinism: init is maximin farthest-point (no RNG); per-dimension
  means are summed as DECIMAL(38,12) so partial-aggregation order
  cannot perturb the result; distance ties break to the lowest
  centroid index via lexicographic struct min. Two runs on any
  partitioning produce identical clusters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _sq_dist(vec: Column, center: list[float]) -> Column:
    """Squared L2 distance to a literal centroid — a codegen'd
    sequential fold over the array: no UDF, and the summation order is
    fixed (left-to-right) so the value is partition-independent."""
    return F.aggregate(
        F.zip_with(vec, _lit_vec(center), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def assign_clusters(
    df: DataFrame, vec_col: str, centers: list[list[float]]
) -> DataFrame:
    """Add a ``cluster`` column: index of the nearest centroid.

    ``array_min`` over ``struct(dist, idx)`` is the argmin — struct
    comparison is lexicographic, so equal distances resolve to the
    lowest index deterministically.
    """
    v = F.col(vec_col).cast("array<double>")
    candidates = F.array(
        *[
            F.struct(
                _sq_dist(v, c).alias("dist"),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centers)
        ]
    )
    return df.withColumn("cluster", F.array_min(candidates)["idx"])


def _farthest_point_init(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> list[list[float]]:
    """Deterministic maximin init (RNG-free k-means++ stand-in): seed
    with the lowest-id point, then repeatedly add the point farthest
    from its nearest chosen center (ties → lowest id). k-1 corpus
    scans, each collecting ONE row."""
    first = (
        df.orderBy(id_col)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .first()
    )
    centers = [list(first["v"])]
    v = F.col(vec_col).cast("array<double>")
    while len(centers) < k:
        nearest = F.array_min(
            F.array(*[_sq_dist(v, c) for c in centers])
        )
        far = (
            df.select(
                F.col(id_col).alias("_id"),
                v.alias("v"),
                nearest.alias("d"),
            )
            .orderBy(F.desc("d"), F.asc("_id"))
            .first()
        )
        centers.append(list(far["v"]))
    return centers


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> tuple[DataFrame, list[list[float]], int]:
    """Lloyd's k-means. Returns ``(assignments, centers, n_iter)``
    where assignments is ``(id_col, cluster)``.

    The corpus is persisted once up front (every iteration and the
    init scan re-read it). Mean recomputation goes through
    posexplode → DECIMAL sums per (cluster, dim) → exact division, so
    centroid updates are bit-identical across partitionings.
    """
    corpus = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .persist()
    )
    try:
        centers = _farthest_point_init(corpus, id_col, "_v", k)
        n_iter = 0
        for n_iter in range(1, max_iter + 1):
            assigned = assign_clusters(corpus, "_v", centers)
            new_rows = (
                assigned.select("cluster", F.posexplode("_v").alias("pos", "x"))
                .groupBy("cluster", "pos")
                .agg(
                    F.sum(F.col("x").cast("decimal(38,12)")).alias("s"),
                    F.count("*").alias("n"),
                )
                .groupBy("cluster")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "s", "n"))
                    ).alias("dims")
                )
                .select(
                    "cluster",
                    # cast each exact DECIMAL sum to double BEFORE the
                    # division (house determinism rule): double/double
                    # is one correctly-rounded op both here and in the
                    # SQL replay, while decimal-division-then-cast
                    # drifts 1 ulp under Spark's decimal scale rules
                    F.transform(
                        "dims",
                        lambda t: t["s"].cast("double")
                        / t["n"].cast("double"),
                    ).alias("mean"),
                )
                .collect()
            )
            new_centers = list(centers)
            for row in new_rows:  # empty clusters keep their old center
                new_centers[row["cluster"]] = list(row["mean"])
            shift = max(
                sum((a - b) ** 2 for a, b in zip(old, new))
                for old, new in zip(centers, new_centers)
            )
            centers = new_centers
            if shift <= tol:
                break
        assignments = assign_clusters(corpus, "_v", centers).select(
            id_col, "cluster"
        )
        # materialize BEFORE the finally unpersists corpus: the
        # returned frame is a narrow (id, cluster) projection, and
        # without the eager checkpoint the caller's first action
        # would recompute the whole upstream scan the persist existed
        # to avoid
        assignments = assignments.localCheckpoint(eager=True)
        return assignments, centers, n_iter
    finally:
        corpus.unpersist(blocking=False)


def fps_select(
    corpus: DataFrame, k: int, id_col: str = "vec_id", q_col: str = "q"
) -> list[tuple[int, int, int | None]]:
    """Farthest-point sampling (k-center greedy, Gonzalez 1985) over a
    quantized integer-grid embedding column — the coreset/pruning
    baseline for embedding-space data selection (pick the k most
    mutually distant exemplars; the k-th selection distance IS the
    2-approximation bound on the optimal k-center radius).

    Returns ``[(step, id, sel_d2), ...]`` — at each step the point
    whose minimum squared L2 distance (exact BIGINT on the quantized
    grid) to the already-selected set is LARGEST, ties to the smaller
    id; step 1 seeds deterministically at the smallest id (no RNG),
    ``sel_d2`` is NULL for the seed.

    Scale shape — the greedy_max_coverage precedent: FPS is inherently
    sequential (each argmax conditions on the selected set), so the
    operator runs k driver rounds of ONE distributed argmax each; the
    per-round driver traffic is a single row (id + dmin + the selected
    vector, model-sized), and the selected vector returns as a literal
    in the next round's dmin update — the corpus never moves. The dmin
    frame is eagerly localCheckpoint'd per round so each argmax reads
    a materialized narrow frame instead of re-running the chain.
    """
    dist = F.aggregate(
        F.zip_with(
            F.col(q_col), F.col("_sel_q"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc + d,
    )
    seed_rows = (
        corpus.orderBy(id_col)
        .limit(1)
        .select(id_col, q_col)
        .collect()
    )
    if not seed_rows:
        raise ValueError("fps_select: corpus is empty")
    seed = seed_rows[0]
    out: list[tuple[int, int, int | None]] = [(1, seed[id_col], None)]
    sel_q = list(seed[q_col])
    cur = corpus.select(
        id_col,
        q_col,
        F.lit(None).cast("bigint").alias("dmin"),
    ).filter(F.col(id_col) != seed[id_col])
    for step in range(2, k + 1):
        lit_q = F.array(*[F.lit(int(v)) for v in sel_q])
        cur = cur.withColumn("_sel_q", lit_q).select(
            id_col,
            q_col,
            # coalesce AFTER least: the seed round (dmin NULL) stores
            # the exact first distance — no 2^62 sentinel that would
            # silently clamp a genuinely huge d² (ADVICE r9)
            F.coalesce(
                F.least(F.col("dmin"), dist), dist
            ).alias("dmin"),
        )
        cur = cur.localCheckpoint(eager=True)
        picks = cur.orderBy(F.desc("dmin"), id_col).limit(1).collect()
        if not picks:
            raise ValueError(
                f"fps_select: corpus exhausted after {step - 1} of "
                f"{k} requested selections"
            )
        pick = picks[0]
        out.append((step, pick[id_col], pick["dmin"]))
        sel_q = list(pick[q_col])
        cur = cur.filter(F.col(id_col) != pick[id_col])
    return out
