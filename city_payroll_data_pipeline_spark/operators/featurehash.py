"""Hashing-trick featurization (Weinberger et al., ICML'09) — map an
unbounded token vocabulary onto a fixed bucket space with a stateless
hash, the standard way large-scale pipelines featurize text without a
driver-side vocabulary (no fit step, no dictionary broadcast, new
tokens never invalidate the space).

The reference has no feature surface at all (SURVEY §2.10 — no
UDF/UDAF anywhere); this is beyond-parity training-data surface, in
the same family as tfidf_top_terms / vocab_coverage.

Scale design:

* Bucketing is a pure per-row expression (md5 → 48-bit int → pmod) —
  no shuffle, no state, no vocabulary. The only exchange in the audit
  is the (bucket, token)-keyed aggregate, bounded by the distinct
  vocabulary, not the corpus.
* 48 hash bits (< 2^53) survive BIGINT/double round-trips exactly in
  both Spark and DuckDB, so the oracle replays bucketing bit-for-bit
  (`CAST('0x' || substr(md5(t), 1, 12) AS BIGINT)` on the DuckDB
  side — the house md5-mirroring pattern).
* The collision audit (distinct tokens per bucket, share of the top
  token) is exactly what a production owner checks before shrinking
  ``n_buckets`` — collisions are the hashing trick's only cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(token: Column, n_buckets: int) -> Column:
    """Deterministic bucket id in [0, n_buckets): first 48 bits of
    md5(token), reduced mod n_buckets. conv() returns a string in
    Spark — cast through long before the mod."""
    h48 = F.conv(F.substring(F.md5(token), 1, 12), 16, 10).cast("long")
    return F.pmod(h48, F.lit(n_buckets))


def feature_hash_audit(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-bucket collision audit of the hashed feature space:
    occupancy (token occurrences, docs touching the bucket), collision
    width (distinct tokens sharing the bucket), and the bucket's
    dominant token with its share of the bucket's mass.

    One exchange on (bucket, token); everything after runs on the
    vocabulary-sized frame. The dominant-token window partitions by
    bucket (n_buckets partitions — bounded by construction).
    """
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens_col).alias("t")
    ).select("_id", "t", hash_bucket(F.col("t"), n_buckets).alias("bucket"))
    per_tok = toks.groupBy("bucket", "t").agg(F.count("*").alias("cnt"))
    per_bucket = per_tok.groupBy("bucket").agg(
        F.sum("cnt").alias("n_total"),
        F.count("*").alias("n_distinct_tokens"),
    )
    from pyspark.sql import Window as W

    # dominant token: count ties break to the lexicographically lowest
    # token (rank, not arg_max — cross-engine deterministic)
    w = W.partitionBy("bucket").orderBy(F.desc("cnt"), F.asc("t"))
    top = (
        per_tok.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("bucket", F.col("t").alias("top_token"),
                F.col("cnt").alias("top_cnt"))
    )
    docs_per_bucket = toks.groupBy("bucket").agg(
        F.count_distinct("_id").alias("n_docs")
    )
    return (
        per_bucket.join(top, "bucket")
        .join(docs_per_bucket, "bucket")
        .select(
            "bucket",
            "n_total",
            "n_docs",
            "n_distinct_tokens",
            "top_token",
            F.round(
                F.col("top_cnt").cast("double")
                / F.col("n_total").cast("double"),
                6,
            ).alias("top_share"),
        )
        .orderBy("bucket")
    )


def greedy_max_coverage(feats: DataFrame, k: int) -> list[tuple]:
    """Greedy maximum-coverage subset selection (Nemhauser 1978 — the
    (1−1/e)-approximate greedy that data-curation pipelines run to
    pick a small, feature-diverse document subset): ``feats`` is the
    DISTINCT (doc_id, bucket) hashed-feature incidence; each round
    selects the document covering the most not-yet-covered buckets
    (ties → lowest doc_id) and marks its buckets covered. ``doc_id``
    MUST be numeric (ADVICE r10): the lowest-id tie-break rides a
    ``-doc_id`` struct-max field, so a string-keyed caller fails at
    analysis time — map string ids to a dense numeric key first (the
    previous orderBy form accepted any orderable type but paid a
    per-round sort for it). Returns
    [(rank, doc_id, gain, covered_total)], stopping early when no
    document adds coverage.

    Distributed shape — the train_bpe driver-round pattern, one job
    per round: the incidence is aggregated ONCE to a per-doc bucket
    array frame (checkpointed — the rounds scan arrays, never the
    exploded incidence again), and each round is a single 1-row
    struct-max aggregation ``max(struct(gain, -doc_id, new_buckets))``
    whose winner carries its own uncovered-bucket list back — the
    argmax and the winner's buckets, previously two jobs per round,
    arrive in one collect (guide §1.2: fewer passes; §2.4: the
    per-round shuffle of the re-filtered incidence is gone). The
    covered set stays a driver-bounded literal ≤ k·max-doc-features
    ids; doc_id is unique per row so the struct max never compares the
    array field. The greedy loop is inherently sequential (each argmax
    depends on the covered set), so k driver round trips is the
    scale-correct shape, exactly like batched-BPE's top-k collects.

    Cache lifecycle is CALLER-OWNED for ``feats`` (scanned once here
    for the array aggregation; callers typically also scan it for the
    coverage total): ``feats.persist()`` before, ``unpersist()`` in a
    finally after its last use. The per-doc array frame is
    localCheckpoint'd internally (eager, ContextCleaner-released)."""
    docs = (
        feats.groupBy("doc_id")
        .agg(F.collect_set("bucket").alias("bl"))
        .localCheckpoint()
    )
    covered: list[int] = []
    out: list[tuple] = []
    for r in range(1, k + 1):
        newb = (
            F.array_except(
                F.col("bl"), F.array(*[F.lit(b) for b in covered])
            )
            if covered
            else F.col("bl")
        )
        top = docs.select(
            F.max(
                F.struct(
                    F.size(newb).alias("gain"),
                    (-F.col("doc_id")).alias("negid"),
                    newb.alias("nb"),
                )
            ).alias("s")
        ).collect()[0]["s"]
        if top is None or top["gain"] <= 0:
            break
        covered.extend(top["nb"])
        out.append((r, -top["negid"], int(top["gain"]), len(covered)))
    return out
