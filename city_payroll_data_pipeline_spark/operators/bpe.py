"""Distributed BPE (byte-pair-encoding) merge training.

Tokenizer training is a corpus-wide job in a real training-data
pipeline: the merge table must reflect pair frequencies over the WHOLE
corpus, so it cannot be trained on a driver-side sample without bias.
The classic Sennrich et al. 2016 algorithm is inherently iterative
(each merge changes the pair counts the next merge sees), but each
iteration maps to plain distributed primitives:

1. collapse the corpus to its distinct-word histogram once —
   (word, count) — so every later pass is over vocabulary size, not
   corpus size (the standard trick: pair counts are linear in word
   frequencies, Σ_occurrences = Σ_words count·pairs_in_word);
2. per iteration: explode each word's adjacent symbol pairs weighted
   by word count, one groupBy to total them, take the argmax
   (deterministic lexicographic tie-break), and rewrite each word's
   symbol array with a left-to-right greedy fold merging that pair.

Everything stays JVM-side: the pair explode is ``transform`` over
array slices, the merge rewrite is ``F.aggregate`` (a codegen'd fold —
no Python in the loop). The per-iteration shuffle carries only
(pair, count) — tiny next to the corpus. Lineage is truncated each
round with ``localCheckpoint`` (the plan would otherwise nest one
fold per learned merge and Catalyst analysis time would dominate; on
a cluster use ``checkpoint()`` with a reliable dir).

Scale: iterations = number of merges (thousands for a real tokenizer);
each is one small shuffle over the vocab histogram, embarrassingly
parallel. The vocab histogram for 100 TB of text is millions-to-
billions of distinct words — far smaller than the corpus and safely
distributed (never collected); only the single argmax row comes back
to the driver per round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from city_payroll_data_pipeline_spark.functions.text import tokens_array


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over the whitespace-tokenized corpus — the one
    corpus-sized pass; everything after runs on this."""
    return (
        df.select(F.explode(tokens_array(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _adjacent_pairs(sym: Column) -> Column:
    """array<struct<left,right>> of adjacent symbol pairs."""
    return F.transform(
        F.slice(sym, 1, F.greatest(F.size(sym) - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("left"), F.element_at(sym, i + 2).alias("right")
        ),
    )


def _merge_pair(sym: Column, left: str, right: str) -> Column:
    """Left-to-right greedy merge of adjacent (left, right) into one
    symbol — the BPE rewrite — as a single codegen'd fold: append each
    symbol, or replace the just-appended ``left`` when ``right``
    follows it. A merged symbol never re-matches as ``left`` in the
    same pass (its text is left||right ≠ left), which is exactly the
    non-overlapping greedy semantics of the reference algorithm."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges over the corpus. Returns
    [(left, right, corpus_pair_count), ...] in learned order. Stops
    early when no pair reaches ``min_pair_count``. Ties break
    lexicographically so the merge table is bit-deterministic."""
    vocab = word_histogram(df, text_col).select(
        "count", F.split("word", "").alias("sym")
    )
    vocab = vocab.localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            vocab.select(
                "count", F.explode(_adjacent_pairs(F.col("sym"))).alias("p")
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("count").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((left, right, cnt))
        vocab = vocab.select(
            "count", _merge_pair(F.col("sym"), left, right).alias("sym")
        ).localCheckpoint()
    return merges


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode each document with a learned merge table: per word,
    char-split then replay the merges in learned order. One narrow
    map stage (transform + chained folds), no shuffle; expression
    depth grows with the merge count, so chunk long tables through
    intermediate projections if thousands of merges are replayed."""
    word_syms = lambda w: F.split(w, "")  # noqa: E731
    def encode(w: Column) -> Column:
        sym = word_syms(w)
        for left, right, _ in merges:
            sym = _merge_pair(sym, left, right)
        return sym

    return df.withColumn(
        out_col,
        F.flatten(
            F.transform(tokens_array(F.col(text_col)), lambda w: encode(w))
        ),
    )
