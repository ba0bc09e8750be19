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
    (ties → lowest doc_id) and marks its buckets covered. Returns
    [(rank, doc_id, gain, covered_total)], stopping early when no
    document adds coverage.

    Distributed shape — the train_bpe driver-round pattern: each of
    the ≤ k rounds is ONE distributed aggregation over the feature
    frame (filtered by the covered-bucket list, a driver-bounded
    broadcast literal ≤ k·max-doc-features ids); the only collects are
    the 1-row argmax and the winner's ≤ max-doc-features new buckets —
    model-sized, never corpus-sized. The greedy loop is inherently
    sequential (each argmax depends on the covered set), so k driver
    round trips is the scale-correct shape, exactly like batched-BPE's
    top-k collects.

    Cache lifecycle is CALLER-OWNED: the caller should
    ``feats.persist()`` before (the frame is scanned k+1 times) and
    ``unpersist()`` in a finally after its last use — the operator
    deliberately does not persist, so a forgotten handle can't leak
    cached incidence partitions into the rest of the session."""
    covered: list[int] = []
    out: list[tuple] = []
    for r in range(1, k + 1):
        rem = (
            feats.filter(~F.col("bucket").isin(covered)) if covered else feats
        )
        top = (
            rem.groupBy("doc_id")
            .agg(F.count("*").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        doc, gain = top[0]["doc_id"], int(top[0]["gain"])
        newb = [
            row["bucket"]
            for row in rem.filter(F.col("doc_id") == doc)
            .select("bucket")
            .collect()
        ]
        covered.extend(newb)
        out.append((r, doc, gain, len(covered)))
    return out
