"""Library-level tests for the training-data operators: dedup recall,
similarity exactness, multimodal plumbing, text functions."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet")


def test_drop_exact_duplicates(spark, docs):
    from city_payroll_data_pipeline_spark.operators.dedup import (
        drop_exact_duplicates,
    )

    base = docs.select("doc_id", "text")
    copies = base.limit(20).select((F.col("doc_id") + 5000).alias("doc_id"), "text")
    corpus = base.unionAll(copies)
    kept = drop_exact_duplicates(corpus, "doc_id", "text")
    assert kept.count() == base.count()
    # deterministic winner: the original (lower) ids survive
    assert kept.filter(F.col("doc_id") >= 5000).count() == 0


def test_minhash_recall_on_exact_copies(spark, docs):
    """Exact copies have Jaccard 1.0 → every band collides → 100% recall."""
    from city_payroll_data_pipeline_spark.operators.dedup import minhash_dedup_pairs

    base = docs.select("doc_id", "text")
    copies = base.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    pairs = minhash_dedup_pairs(base.unionAll(copies), "doc_id", "text", threshold=0.9)
    found = {
        (r["doc_a"], r["doc_b"]) for r in pairs.filter(F.col("jaccard") >= 0.999).collect()
    }
    assert {(i, i + 5000) for i in range(30)} <= found


def test_simhash_identical_distance_zero(spark, docs):
    from city_payroll_data_pipeline_spark.operators.dedup import simhash_near_pairs

    base = docs.select("doc_id", "text").filter(F.col("doc_id") < 50)
    copies = base.select((F.col("doc_id") + 5000).alias("doc_id"), "text")
    pairs = simhash_near_pairs(base.unionAll(copies), "doc_id", "text", hamming_max=0)
    found = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert {(i, i + 5000) for i in range(50)} <= found


def test_brute_force_topk_self_similarity(spark):
    """A vector's exact copy must rank as its #1 neighbor with cosine≈1."""
    from city_payroll_data_pipeline_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    copies = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionAll(copies)
    top = brute_force_topk(
        corpus, "vec_id", "embedding",
        queries=corpus.filter(F.col("vec_id") >= 9000), k=1,
    ).collect()
    assert len(top) == 5
    for r in top:
        assert r["neighbor_id"] == r["query_id"] - 9000
        assert r["cosine"] >= 0.999999


def test_lsh_topk_is_subset_quality(spark):
    """LSH top-1 neighbor should usually agree with brute force when the
    true neighbor is an exact copy (same bucket by construction)."""
    from city_payroll_data_pipeline_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    copies = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionAll(copies)
    top = lsh_topk(
        corpus, "vec_id", "embedding",
        queries=corpus.filter(F.col("vec_id") >= 9000), k=1, dim=64,
    ).collect()
    # identical vectors share every hyperplane sign → guaranteed same bucket
    assert {r["neighbor_id"] for r in top} == {r["query_id"] - 9000 for r in top}


def test_multimodal_plumbing(spark, docs):
    from city_payroll_data_pipeline_spark.functions.multimodal import (
        FEATURE_DIM,
        extract_features,
        frame_sample_plan,
        media_metadata,
        synthesize_media,
    )

    media = synthesize_media(spark, docs)
    meta = media_metadata(media)
    assert meta.columns == ["media_id", "kind", "width", "height", "mime"]

    feats = extract_features(media.limit(50)).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
        # normalized histogram sums to ~1
        assert abs(sum(r["features"]) - 1.0) < 1e-9

    frames = frame_sample_plan(media, every_n=30)
    vid = media.filter(F.col("kind") == "video").count()
    assert frames.count() >= vid  # ≥1 sampled frame per video


def test_decode_ppm_default_and_unknown_format(spark):
    import numpy as np
    import pandas as pd

    from city_payroll_data_pipeline_spark.functions.multimodal import (
        decode_image_batch,
        decode_ppm,
        encode_ppm,
    )

    # non-netpbm bytes are an explicit error, not a silent decode
    with pytest.raises(ValueError):
        decode_image_batch(pd.Series([b"123"]))

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    gray16 = np.array([[0, 300], [65535, 7]], dtype=np.uint16)
    # header comments + roundtrip for P6/uint8 and P5/uint16
    blob = encode_ppm(rgb).replace(b"\n3 2\n", b"\n# c\n3 2\n", 1)
    out = decode_image_batch(pd.Series([blob, encode_ppm(gray16)]))
    assert (out[0] == rgb).all() and out[0].dtype == np.uint8
    assert (out[1] == gray16).all() and out[1].dtype == np.uint16
    assert (decode_ppm(encode_ppm(gray16)) == gray16).all()


def test_audio_frame_stats_exact():
    """Framed energy must match a hand-computed reference, including
    the short last frame and the silence threshold."""
    import numpy as np

    from city_payroll_data_pipeline_spark.functions.multimodal import (
        AUDIO_FRAME,
        AUDIO_SILENT_T,
        audio_frame_stats,
    )

    # 300 samples: one full frame + one 44-sample tail
    vals = (np.arange(300) % 7 + 120).astype(np.uint8)  # s in [-8, -2]
    pcm = vals.tobytes()
    n, nf, tot, mx, silent, peak = audio_frame_stats(pcm)
    s = vals.astype(np.int64) - 128
    e0 = int((s[:AUDIO_FRAME] ** 2).sum())
    e1 = int((s[AUDIO_FRAME:] ** 2).sum())
    assert (n, nf) == (300, 2)
    assert (tot, mx) == (e0 + e1, max(e0, e1))
    assert silent == sum(e < AUDIO_SILENT_T for e in (e0, e1))
    assert peak == int(np.abs(s).max())
    # single loud frame is not silent
    loud = (np.full(256, 255, np.uint8)).tobytes()
    assert audio_frame_stats(loud)[4] == 0


def test_dhash_invariances_and_banded_pairs(spark):
    """dHash must be invariant to uniform brightness shift and to a
    codec round-trip (the properties that make it a perceptual dedup
    key), flip bits under a real content change, and the pigeonhole
    block join must recover a planted near-dup pair exactly."""
    import numpy as np
    import pandas as pd

    from city_payroll_data_pipeline_spark.functions.multimodal import (
        DHASH_BITS,
        decode_ppm,
        dhash60,
        dhash_batch,
        encode_ppm,
    )
    from city_payroll_data_pipeline_spark.operators.dedup import (
        hamming_near_pairs,
    )

    rng_rows = np.arange(40, dtype=np.uint8)
    img = (rng_rows[:, None] * 3 + np.arange(32, dtype=np.uint16)[None, :] * 5) % 200
    img = img.astype(np.uint8)
    h0 = dhash60(img)
    assert 0 <= h0 < (1 << DHASH_BITS)
    # brightness shift preserves every pairwise order → identical hash
    assert dhash60(np.clip(img.astype(np.int32) + 40, 0, 255).astype(np.uint8)) == h0
    # codec round-trip is lossless → identical hash
    assert dhash60(decode_ppm(encode_ppm(img))) == h0
    # transpose changes the gradient structure → different hash
    assert dhash60(img.T.copy()) != h0
    # batch wrapper agrees with the scalar path
    assert dhash_batch(pd.Series([encode_ppm(img)]))[0] == h0

    # planted near-dup: flip 2 pixels hard → small Hamming distance;
    # an unrelated image stays far. The banded join finds exactly the
    # planted pair at hamming_max=3.
    near = img.copy()
    near[0, 0] = 255 - near[0, 0]
    other = ((img.astype(np.int32) * 7 + 13) % 251).astype(np.uint8)
    sigs = spark.createDataFrame(
        [(0, dhash60(img)), (1, dhash60(near)), (2, dhash60(other))],
        "doc_id long, sig long",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_near_pairs(
            sigs, "doc_id", "sig", hamming_max=3, n_bits=DHASH_BITS
        ).collect()
    }
    assert set(got) == {(0, 1)} and got[(0, 1)] <= 3

    with pytest.raises(ValueError, match="split evenly"):
        hamming_near_pairs(sigs, "doc_id", "sig", hamming_max=6, n_bits=60)


def test_lang_id_markers(spark):
    from city_payroll_data_pipeline_spark.functions.text import lang_id

    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("le chat et la maison est une belle",),
            ("der hund und die katze ist ein tier",),
            ("xyzzy qwerty",),
        ],
        schema="text string",
    ).select(lang_id(F.col("text")).alias("lang"))
    assert [r["lang"] for r in df.collect()] == ["en", "fr", "de", "und"]


def test_lang_id_detects_chinese_and_quality_survives_cjk(spark):
    """Java/RE2 \\b fires only at ASCII \\w transitions, so \\b-wrapped
    CJK markers never matched pure Chinese text (zh was undetectable),
    and ASCII [A-Za-z]/[^\\w\\s] classified every CJK char as
    punctuation, collapsing quality_score to ~0 for exactly the
    documents LANG_MARKERS declares supported."""
    from city_payroll_data_pipeline_spark.functions.text import (
        lang_id,
        quality_features,
        quality_score,
    )

    zh = "我的书是在桌子上的 和 他是好人 " * 5  # markers: 的/是/在/和
    df = spark.createDataFrame([(zh,), ("the cat is here " * 5,)], "text string")
    out = df.select(
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        quality_features(F.col("text"))["punct_ratio"].alias("pr"),
    ).collect()
    assert out[0]["lang"] == "zh"
    assert out[0]["pr"] < 0.05  # CJK letters are NOT punctuation
    assert out[1]["lang"] == "en"
    # a clean CJK doc scores in the same band as clean English minus
    # the (intentionally en-only) stopword term, not near zero
    assert out[0]["q"] > 0.5


def test_shingles_short_doc(spark):
    from city_payroll_data_pipeline_spark.functions.text import (
        shingles,
        tokens_array,
    )

    df = spark.createDataFrame(
        [("a b",), ("a b c d",), ("",)], schema="text string"
    ).select(shingles(tokens_array(F.col("text"))).alias("s"))
    out = [r["s"] for r in df.collect()]
    assert out[0] == []  # shorter than n → empty, not descending-range garbage
    assert out[1] == ["a b c", "b c d"]


def test_approx_distinct_error_bound(spark):
    """HLL++ has no cross-engine oracle; bound its relative error
    against the exact count instead (default rsd = 5%)."""
    from city_payroll_data_pipeline_spark.suite import build_suite
    from tests.conftest import SF_CORRECT

    row = build_suite()["approx_distinct_stats"].spark(spark, SF_CORRECT).collect()[0]
    for approx, exact in (
        (row["approx_orders"], row["exact_orders"]),
        (row["approx_parts"], row["exact_parts"]),
    ):
        assert exact > 0
        assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF with seed centroids + n_probe=3/8 lists must recover a solid
    majority of the exact top-k set (it matches its own oracle exactly;
    this guards the recall/cost trade-off from regressing)."""
    from city_payroll_data_pipeline_spark.suite import build_suite
    from tests.conftest import SF_CORRECT

    suite = build_suite()
    exact = suite["cosine_topk"].spark(spark, SF_CORRECT).toPandas()
    ivf = suite["ivf_ann_topk"].spark(spark, SF_CORRECT).toPandas()
    es = set(zip(exact.query_id, exact.neighbor_id))
    iv = set(zip(ivf.query_id, ivf.neighbor_id))
    assert len(es & iv) / len(es) >= 0.6


def test_sq8_topk_recall_vs_brute_force(spark):
    """Int8 scalar quantization keeps ~all of the exact top-k on
    64-dim vectors — recall@5 must stay high or the compression is
    mis-scaled."""
    from city_payroll_data_pipeline_spark.suite import build_suite
    from tests.conftest import SF_CORRECT

    suite = build_suite()
    exact = suite["cosine_topk"].spark(spark, SF_CORRECT).toPandas()
    sq8 = suite["sq8_ann_topk"].spark(spark, SF_CORRECT).toPandas()
    es = set(zip(exact.query_id, exact.neighbor_id))
    qs = set(zip(sq8.query_id, sq8.neighbor_id))
    assert len(es & qs) / len(es) >= 0.7


def test_pq_topk_recall_vs_brute_force(spark):
    """PQ/ADC with the tuned 32×64 seed codebooks must hold a solid
    majority of the exact top-k (measured 0.70 at sf0.01 / 0.62 at
    sf0.1; the bound is slack for per-round testdata regeneration).
    It matches its own oracle exactly — this guards the
    recall/compression trade-off from regressing."""
    from city_payroll_data_pipeline_spark.suite import build_suite
    from tests.conftest import SF_CORRECT

    suite = build_suite()
    exact = suite["cosine_topk"].spark(spark, SF_CORRECT).toPandas()
    pq = suite["pq_ann_topk"].spark(spark, SF_CORRECT).toPandas()
    es = set(zip(exact.query_id, exact.neighbor_id))
    ps = set(zip(pq.query_id, pq.neighbor_id))
    assert len(es & ps) / len(es) >= 0.5


def test_ivfpq_topk_recall_vs_brute_force(spark):
    """IVF-PQ pays double approximation (cell prune + code distortion)
    — measured 0.58 at sf0.01; the bound is slack for per-round
    testdata regeneration. Its own oracle is exact."""
    from city_payroll_data_pipeline_spark.suite import build_suite
    from tests.conftest import SF_CORRECT

    suite = build_suite()
    exact = suite["cosine_topk"].spark(spark, SF_CORRECT).toPandas()
    ip = suite["ivfpq_ann_topk"].spark(spark, SF_CORRECT).toPandas()
    es = set(zip(exact.query_id, exact.neighbor_id))
    ps = set(zip(ip.query_id, ip.neighbor_id))
    assert len(es & ps) / len(es) >= 0.4


def test_pq_codes_complete_and_bounded(spark):
    """Every corpus vector gets exactly one code per subspace and all
    codes are in [0, k_codes) — the invariant the ADC sum relies on
    (m_sub addends per (query, neighbor) pair)."""
    from pyspark.sql import functions as F

    from city_payroll_data_pipeline_spark.operators import similarity as sim
    from city_payroll_data_pipeline_spark.suite import table
    from city_payroll_data_pipeline_spark.suite.vectors import (
        _PQ_DSUB,
        PQ_KS,
        PQ_M,
        PQ_STRIDE,
    )
    from tests.conftest import SF_CORRECT

    emb = table(spark, SF_CORRECT, "embeddings")
    corpus = sim.with_quantized(emb, "vec_id", "embedding")
    cb = sim.pq_codebook(corpus, PQ_M, _PQ_DSUB, PQ_KS, PQ_STRIDE)
    enc = sim.pq_encode(corpus, cb, PQ_M, _PQ_DSUB)
    n_vecs = corpus.count()
    stats = enc.agg(
        F.count("*").alias("n"),
        F.countDistinct("vec_id").alias("nv"),
        F.min("cw").alias("lo"),
        F.max("cw").alias("hi"),
    ).collect()[0]
    assert stats["n"] == n_vecs * PQ_M  # one code per (vector, subspace)
    assert stats["nv"] == n_vecs
    assert 0 <= stats["lo"] and stats["hi"] < PQ_KS


def test_pq_codebook_rejects_truncated_seeds(spark):
    """A corpus too small to seed every codeword must raise, not
    silently yield a truncated codebook (ADVICE r6: ivfpq_topk's
    defaults need vec_id up to stride·(k_codes-1), which the smallest
    corpus can't supply — degraded recall with no error). The guard is
    LAZY (ADVICE r7): building the plan is side-effect free; the error
    fires on the first action that executes the codebook."""
    import pytest

    from city_payroll_data_pipeline_spark.operators import similarity as sim

    emb = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.5)] * 4).alias("embedding"),
    )
    corpus = sim.with_quantized(emb, "vec_id", "embedding")
    # stride 13, k_codes 64 → needs vec_id 819; corpus has 20 rows.
    # Plan construction must NOT raise (and must not run a job)…
    cb_bad = sim.pq_codebook(corpus, 2, 2, 64, 13)
    # …the first action that reads cw does (every sanctioned consumer
    # reads cw; a bare count() prunes all columns and skips the guard).
    with pytest.raises(Exception, match="pq_codebook: corpus seeds"):
        cb_bad.collect()
    # and the exact fit passes: stride 1, k_codes 20
    cb = sim.pq_codebook(corpus, 2, 2, 20, 1)
    assert cb.count() == 2 * 20


def test_sanitize_text_strips_and_restores(spark):
    """Control chars, zero-width chars, and whitespace runs all go;
    tabs/newlines collapse to single spaces; clean text is unchanged."""
    from city_payroll_data_pipeline_spark.functions.text import sanitize_text

    rows = [
        ("\x01a\u200bb\x7f",),           # control + zero-width
        ("  a\t\tb\nc  ",),              # whitespace runs
        ("already clean",),
        ("\ufeffbom prefix",),
    ]
    out = [
        r[0]
        for r in spark.createDataFrame(rows, ["t"])
        .select(sanitize_text(F.col("t")).alias("s"))
        .collect()
    ]
    assert out == ["ab", "a b c", "already clean", "bom prefix"]


def test_resize_default_ppm_and_injected_resizer(spark):
    import numpy as np
    import pandas as pd

    from city_payroll_data_pipeline_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_image_batch,
    )

    # default path: decode → nearest-neighbor → re-encode, pure numpy
    rgb = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_image_batch(pd.Series([encode_ppm(rgb)]), 3, 2)
    small = decode_ppm(out[0])
    assert small.shape == (2, 3, 3)
    assert (small == rgb[::2, ::2]).all()  # exact 2× decimation
    # upscale keeps corner pixels
    up = decode_ppm(resize_image_batch(pd.Series([encode_ppm(rgb)]), 12, 8)[0])
    assert up.shape == (8, 12, 3)
    assert (up[0, 0] == rgb[0, 0]).all() and (up[-1, -1] == rgb[-1, -1]).all()
    # non-netpbm bytes need an injected resizer
    with pytest.raises(ValueError):
        resize_image_batch(pd.Series([b"\x89PNG"]), 64, 64)
    out = resize_image_batch(
        pd.Series([b"abc", b"de"]), 2, 2, resizer=lambda b, w, h: b[: w * h // 2]
    )
    assert list(out) == [b"ab", b"de"]


def test_connected_components_multihop_chain(spark):
    """A 5-node chain (0-1-2-3-4) plus an isolated pair collapses to
    the right components even though labels need multiple propagation
    rounds to cross the chain."""
    from city_payroll_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)],
        schema="doc_a bigint, doc_b bigint",
    )
    out = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10}


def test_connected_components_string_ids_multihop(spark):
    """String doc ids must converge too: the old sum-of-labels
    convergence signal was NULL on strings (sum casts to double), so
    NULL == NULL ended the loop after one round and any component of
    diameter >= 2 came back split."""
    from city_payroll_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        schema="doc_a string, doc_b string",
    )
    out = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "x": "x", "y": "x"}


def test_kmeans_deterministic_and_improving(spark):
    """Two independent fits produce identical assignments; the fitted
    objective (total within-cluster sq dist) beats assigning everything
    to the init centroid set without iterating."""
    from city_payroll_data_pipeline_spark.operators import clustering as cl
    from city_payroll_data_pipeline_spark.suite import table

    emb = table(spark, SF_CORRECT, "embeddings")

    def fit():
        a, c, n = cl.kmeans(emb, "vec_id", "embedding", k=10, max_iter=15)
        return sorted(tuple(r) for r in a.collect()), c, n

    a1, c1, n1 = fit()
    a2, c2, n2 = fit()
    assert a1 == a2 and c1 == c2 and n1 == n2
    assert n1 >= 2  # it actually iterated

    def objective(centers):
        v = F.col("embedding").cast("array<double>")
        d = F.array_min(F.array(*[cl._sq_dist(v, c) for c in centers]))
        return emb.select(F.sum(d).alias("o")).first()["o"]

    init = cl._farthest_point_init(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("_v")),
        "vec_id", "_v", 10,
    )
    assert objective(c1) < objective(init)
    # every point assigned exactly once, k clusters non-trivial
    assert len(a1) == emb.count()
    assert len({c for _, c in a1}) == 10


def test_semantic_dedup_recall_vs_brute_force(spark):
    """Cluster-then-pair semantic dedup must recover every pair the
    O(n^2) brute-force variant finds at the same threshold: exact
    copies have identical vectors, land in the same cluster, and can
    never straddle a centroid boundary."""
    from city_payroll_data_pipeline_spark.suite import build_suite

    s = build_suite()
    semantic = {
        (r["vec_a"], r["vec_b"])
        for r in s["semantic_dedup_pairs"].spark(spark, SF_CORRECT).collect()
    }
    brute = {
        (r["vec_a"], r["vec_b"])
        for r in s["cosine_neardup_pairs"].spark(spark, SF_CORRECT).collect()
    }
    assert brute, "brute-force twin found no pairs — synthesis broken"
    assert brute <= semantic  # full recall; (semantic <= brute holds by construction)
    # and it found at least the 10 synthesized copies
    assert len(semantic) >= 10


def test_approx_buckets_agree_with_exact_ntile(spark):
    """The sketch+map binning (no global sort) must put almost every
    row in the same decile as exact ntile — disagreement is confined
    to rows within sketch error of a boundary."""
    from pyspark.sql import Window as W

    from city_payroll_data_pipeline_spark.operators.binning import (
        with_quantile_buckets,
    )
    from city_payroll_data_pipeline_spark.suite import table

    docs = table(spark, SF_CORRECT, "documents").select("doc_id", "n_chars")
    approx = with_quantile_buckets(docs, "n_chars", 10)
    exact = docs.withColumn(
        "exact", F.ntile(10).over(W.orderBy("n_chars", "doc_id"))
    )
    joined = approx.join(exact, "doc_id")
    n = joined.count()
    agree = joined.filter(F.col("bucket") == F.col("exact")).count()
    assert agree / n >= 0.9, f"only {agree}/{n} rows agree"
    # buckets are roughly balanced: each within 2x of ideal
    sizes = [
        r["c"]
        for r in approx.groupBy("bucket").agg(F.count("*").alias("c")).collect()
    ]
    assert len(sizes) == 10
    assert max(sizes) <= 2 * (n / 10) and min(sizes) >= (n / 10) / 2


# --------------------------------------------------------------------------
# BPE merge training
# --------------------------------------------------------------------------

def _reference_bpe(words: dict[str, int], n_merges: int, min_count: int = 2):
    """Independent pure-Python Sennrich-style BPE: the oracle for the
    distributed trainer (same tie-break: max count, then lexicographic)."""
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < min_count:
            break
        merges.append((left, right, cnt))
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            for s in sym:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_implementation(spark):
    """The distributed trainer must reproduce the classic sequential
    algorithm exactly, merge for merge, on a corpus with ties."""
    from city_payroll_data_pipeline_spark.operators.bpe import train_bpe

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    corpus = spark.createDataFrame([(text,)], "text string")
    got = train_bpe(corpus, "text", n_merges=8)
    want = _reference_bpe(words, 8)
    assert got == want, f"{got} != {want}"


def test_greedy_piece_counts_matches_reference(spark):
    """The two-pass + fold greedy encoder must reproduce the obvious
    sequential longest-match-first algorithm word for word, including
    words with unknown characters (advance-1 fallback) and pieces
    that cross BPE merge boundaries."""
    from pyspark.sql import functions as F

    from city_payroll_data_pipeline_spark.operators.bpe import (
        greedy_piece_counts,
    )

    pieces = ["ab", "abc", "bcd", "d", "a", "b", "c", "xy"]
    words = ["abcd", "ababc", "dcba", "zzz", "xyabc", "a"]

    def ref(word):
        pos, n = 0, 0
        while pos < len(word):
            adv = 1
            for ln in range(min(len(word) - pos, 3), 0, -1):
                if word[pos : pos + ln] in pieces:
                    adv = ln
                    break
            pos += adv
            n += 1
        return n

    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    vdf = spark.createDataFrame(
        [(p, len(p)) for p in pieces], "piece string, plen int"
    )
    got = {
        r["word"]: r["n_greedy"]
        for r in greedy_piece_counts(wdf, vdf, 3).collect()
    }
    want = {w: ref(w) for w in words}
    assert got == want, f"{got} != {want}"


def test_bpe_deterministic_across_runs(spark):
    from city_payroll_data_pipeline_spark.operators.bpe import train_bpe
    from city_payroll_data_pipeline_spark.suite import table

    docs = (
        table(spark, SF_CORRECT, "documents", spread=True)
        .filter(F.col("doc_id") % 20 == 0)
        .select("text")
    )
    a = train_bpe(docs, "text", n_merges=5)
    b = train_bpe(docs, "text", n_merges=5)
    assert a == b and len(a) == 5


def test_bpe_batched_equals_serial(spark):
    """Batched top-k rounds (default batch_k=16) must emit merges
    BIT-IDENTICAL to the merge-serial trainer (batch_k=1) — the
    safe-prefix prover only accepts pairs whose serial argmax it can
    guarantee, so batching is a pure round-trip optimization."""
    from city_payroll_data_pipeline_spark.operators.bpe import train_bpe
    from city_payroll_data_pipeline_spark.suite import table

    docs = (
        table(spark, SF_CORRECT, "documents", spread=True)
        .filter(F.col("doc_id") % 10 == 0)
        .select("text")
    )
    batched = train_bpe(docs, "text", n_merges=24)
    serial = train_bpe(docs, "text", n_merges=24, batch_k=1)
    assert batched == serial and len(batched) == 24


def test_bpe_batched_round_trips(spark, monkeypatch):
    """Disjoint top pairs with distinct counts must all be learned
    from ONE driver collect (VERDICT r5 item 5: ≤⌈n_merges/k⌉ round
    trips when the corpus allows it)."""
    import pyspark.sql.classic.dataframe as cdf

    from city_payroll_data_pipeline_spark.operators.bpe import train_bpe

    text = " ".join(["ab"] * 50 + ["cd"] * 40 + ["ef"] * 30 + ["gh"] * 20)
    corpus = spark.createDataFrame([(text,)], "text string")
    calls = {"n": 0}
    orig = cdf.DataFrame.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cdf.DataFrame, "collect", counting)
    merges = train_bpe(corpus, "text", n_merges=4)
    assert merges == [
        ("a", "b", 50),
        ("c", "d", 40),
        ("e", "f", 30),
        ("g", "h", 20),
    ]
    assert calls["n"] == 1, calls["n"]


def test_viterbi_piece_table_matches_reference_dp(spark):
    """The one-fold Viterbi segmentation must agree with an independent
    Python DP on piece count AND total log-probability, including the
    (max score, then min pieces) tie-break."""
    from decimal import Decimal
    from math import inf

    from city_payroll_data_pipeline_spark.operators.bpe import (
        viterbi_piece_table,
    )

    vocab = {"a": -3.2, "b": -2.5, "ab": -1.75, "ba": -4.0, "aba": -2.0,
             "c": -5.0}
    words = ["ababa", "abc", "cba", "aaaa", "b", "abab"]
    vdf = spark.createDataFrame(
        [(p, len(p), Decimal(str(lp))) for p, lp in vocab.items()],
        "piece string, plen int, lp decimal(18,6)",
    )
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (r["n_vit"], float(r["logprob"]))
        for r in viterbi_piece_table(wdf, vdf, 3).collect()
    }

    def ref(w):
        dp = [(0.0, 0)] + [(-inf, 0)] * len(w)
        for e in range(1, len(w) + 1):
            best = (-inf, 0)
            for j in range(1, min(3, e) + 1):
                piece = w[e - j:e]
                if piece in vocab:
                    cand = (dp[e - j][0] + vocab[piece],
                            -(dp[e - j][1] + 1))
                    if cand > best:
                        best = cand
            dp[e] = (best[0], -best[1])
        return (dp[-1][1], round(dp[-1][0], 6))

    want = {w: ref(w) for w in words}
    assert {w: (got[w][0], round(got[w][1], 6)) for w in words} == want


def test_viterbi_unsegmentable_word_returns_null(spark):
    """ADVICE r7 (medium): a word containing a character no vocab piece
    covers must surface as (word, NULL, NULL) — the dense DP grid
    propagates an explicit sentinel — never as a wrong score read from
    a compressed, misaligned option array. Covered words in the same
    frame are unaffected."""
    from decimal import Decimal

    from city_payroll_data_pipeline_spark.operators.bpe import (
        viterbi_piece_table,
    )

    vdf = spark.createDataFrame(
        [("a", 1, Decimal("-1.5")), ("b", 1, Decimal("-2.0")),
         ("ab", 2, Decimal("-2.5"))],
        "piece string, plen int, lp decimal(18,6)",
    )
    # 'x' has no covering piece: mid-word, leading, trailing, and the
    # regression shape from the advice — gaps that previously shifted
    # every later position's dp slot.
    wdf = spark.createDataFrame(
        [("axb",), ("xab",), ("abx",), ("ab",), ("axxxb",)],
        "word string",
    )
    got = {
        r["word"]: (r["n_vit"], r["logprob"])
        for r in viterbi_piece_table(wdf, vdf, 2).collect()
    }
    assert got["ab"] == (1, Decimal("-2.500000"))
    for w in ("axb", "xab", "abx", "axxxb"):
        assert got[w] == (None, None), (w, got[w])


def test_bpe_safe_prefix_same_batch_name_collision():
    """Two merges accepted in the SAME batch must never spell the same
    concatenation (ADVICE r6): ("ab","c") then ("a","bc") both mint
    "abc", so a pair involving "abc" can be created by BOTH merges and
    its true post-batch count is the SUM of the two bridge counts —
    which the prover's max-of-bridge-rows bound cannot dominate. The
    round must end at the colliding candidate so the next collect
    recounts, keeping batched output merge-serial-identical."""
    from pyspark.sql import Row

    from city_payroll_data_pipeline_spark.operators.bpe import (
        _safe_batch_prefix,
    )

    rows = [
        Row(left="ab", right="c", pair_count=100),
        Row(left="a", right="bc", pair_count=90),
        Row(left="x", right="y", pair_count=85),
    ]
    got = _safe_batch_prefix(
        rows, k=16, budget=10, min_pair_count=2, learned_names=set()
    )
    assert got == [("ab", "c", 100)], got


def test_bpe_apply_preserves_characters(spark):
    """Encoding is a segmentation: concatenating a word's BPE tokens
    must reproduce the word's characters exactly."""
    from city_payroll_data_pipeline_spark.operators.bpe import (
        apply_bpe,
        train_bpe,
    )

    corpus = spark.createDataFrame(
        [("low lower newest newest widest low",)], "text string"
    )
    merges = train_bpe(corpus, "text", n_merges=6)
    assert merges
    out = apply_bpe(corpus, "text", merges)
    row = out.select(
        F.concat_ws("", F.col("bpe_tokens")).alias("joined"),
        F.regexp_replace("text", r"\s+", "").alias("flat"),
    ).collect()[0]
    assert row["joined"] == row["flat"]
    # and at least one multi-char token was actually produced
    toks = out.select("bpe_tokens").collect()[0][0]
    assert any(len(t) > 1 for t in toks)


# --------------------------------------------------------------------------
# Range-sharded ordered export
# --------------------------------------------------------------------------

def test_range_shard_assignment_partitions_rows(spark):
    from city_payroll_data_pipeline_spark.operators import sharding
    from city_payroll_data_pipeline_spark.suite import table

    orders = table(spark, SF_CORRECT, "orders")
    bounds = sharding.range_shard_boundaries(orders, "o_totalprice", 8)
    assert bounds == sorted(bounds) and len(bounds) == 7
    tagged = sharding.assign_range_shards(orders, "o_totalprice", bounds)
    summary = (
        tagged.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("shard")
        .collect()
    )
    assert [r["shard"] for r in summary] == list(range(8))
    assert sum(r["n"] for r in summary) == orders.count()
    # quantile cuts → balanced shards (within 20% of ideal)
    ideal = orders.count() / 8
    assert all(abs(r["n"] - ideal) <= 0.2 * ideal for r in summary)
    # ranges are disjoint and ordered
    for prev, nxt in zip(summary, summary[1:]):
        assert prev["hi"] <= nxt["lo"]


def test_write_range_sharded_sorted_disjoint_files(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from city_payroll_data_pipeline_spark.operators import sharding
    from city_payroll_data_pipeline_spark.suite import table

    orders = table(spark, f"{SF_CORRECT}", "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = str(tmp_path / "sharded")
    sharding.write_range_sharded(orders, path, "o_totalprice", 4)
    shard_ranges = {}
    for d in sorted(glob.glob(f"{path}/shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        vals = []
        for f in glob.glob(f"{d}/*.parquet"):
            col = pq.read_table(f, columns=["o_totalprice"])["o_totalprice"]
            file_vals = col.to_pylist()
            # every file is internally sorted
            assert file_vals == sorted(file_vals), f"unsorted file {f}"
            vals.extend(file_vals)
        shard_ranges[shard] = (min(vals), max(vals))
    assert sorted(shard_ranges) == list(range(4))
    # shard key ranges are disjoint and ascending → global order by
    # visiting shards in order
    for s in range(3):
        assert shard_ranges[s][1] <= shard_ranges[s + 1][0]
    # nothing lost in the write
    total = sum(
        pq.read_table(f).num_rows for f in glob.glob(f"{path}/shard=*/*.parquet")
    )
    assert total == orders.count()


def test_hll_rolling_users_tracks_exact(spark):
    """The sketch-based rolling-users estimates must stay within HLL
    error (<5% at default lgConfigK=12) of the exact distinct counts,
    for both the daily and the merged trailing-7d window — merging
    per-day sketches must not compound the error."""
    from city_payroll_data_pipeline_spark.suite import build_suite

    s = build_suite()
    exact = {
        r["day"]: (r["dau"], r["wau7"])
        for r in s["rolling_active_users"].spark(spark, SF_CORRECT).collect()
    }
    approx = s["approx_rolling_users"].spark(spark, SF_CORRECT).collect()
    assert len(approx) == len(exact)
    for r in approx:
        dau, wau = exact[r["day"]]
        assert abs(r["est_dau"] - dau) / dau < 0.05, (r["day"], r["est_dau"], dau)
        assert abs(r["est_wau7"] - wau) / wau < 0.05, (r["day"], r["est_wau7"], wau)


def test_bpe_stops_when_no_pair_repeats(spark):
    """A corpus whose every adjacent pair is unique learns zero merges
    (min_pair_count=2) instead of memorizing noise."""
    from city_payroll_data_pipeline_spark.operators.bpe import train_bpe

    corpus = spark.createDataFrame([("abcdefg",)], "text string")
    assert train_bpe(corpus, "text", n_merges=5) == []


def test_bpe_compression_curve_survives_early_stop(spark, tmp_path):
    """A corpus with fewer learnable merges than max(_CURVE_KS)=8 must
    yield a full 0/2/4/8 curve (the stopped vocabulary repeats), not a
    KeyError — and the DuckDB oracle replay must stall on the same
    merge the trainer refuses, keeping the hashes equal."""
    import duckdb

    from city_payroll_data_pipeline_spark.suite import build_suite

    # 'aa' repeats -> exactly one learnable merge (a,a); after it no
    # adjacent pair reaches min_pair_count=2
    docs = spark.createDataFrame(
        [(1, "aa xy"), (2, "aa qr")], "doc_id int, text string"
    )
    d = tmp_path / "sf_tiny"
    d.mkdir()
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))

    q = build_suite()["bpe_compression_curve"]
    got = [
        (r["n_merges"], r["bpe_tokens"], r["words"])
        for r in q.spark(spark, str(d)).collect()
    ]
    # 6 words? no: 4 words total (aa, xy, aa, qr) -> hist aa:2 xy:1 qr:1
    # chars: aa=2,xy=2,qr=2 -> 8 tokens at k=0; the single (a,a) merge
    # collapses both 'aa' to 1 symbol -> 6 tokens for every k >= 2
    assert got == [(0, 8, 4), (2, 6, 4), (4, 6, 4), (8, 6, 4)]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d / 'documents.parquet'}/*.parquet')"
    )
    oracle = con.execute(q.oracle).fetchall()
    assert [(r[0], r[1], r[2]) for r in oracle] == got


def test_single_shard_degenerates_to_identity(spark):
    """n_shards=1 → no boundaries, every row in shard 0."""
    from city_payroll_data_pipeline_spark.operators import sharding

    df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    bounds = sharding.range_shard_boundaries(df, "v", 1)
    assert bounds == []
    tagged = sharding.assign_range_shards(df, "v", bounds)
    assert tagged.groupBy("shard").count().collect()[0]["shard"] == 0


def test_gap_fill_single_event_user(spark):
    """A user with one event back-fills the spine point before it —
    no division, no NULL leak."""
    import datetime as dt

    from city_payroll_data_pipeline_spark.suite.relational import (
        q_gap_fill_interpolate,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        t0 = dt.datetime(2024, 1, 1, 0, 30)
        spark.createDataFrame(
            [(1, t0, 0, "e", 42.0, "{}")],
            "user_id long, ts timestamp, event_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        # user_id 1 fails the %20 filter → use 20
        spark.createDataFrame(
            [(20, t0, 0, "e", 42.0, "{}")],
            "user_id long, ts timestamp, event_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        out = q_gap_fill_interpolate(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["fill_kind"] == "bfill" and r["value"] == 42.0


def _cc_reference(edges):
    """Union-find ground truth for component labeling."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_cc_agrees_with_propagation_and_union_find(spark):
    """large-star/small-star must produce the identical (node → min-id
    component) labeling as both the min-label propagation and a
    union-find reference — on a graph with a long chain (the shape
    where propagation needs O(diameter) rounds and star contraction
    O(log n))."""
    from city_payroll_data_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = (
        [(i, i + 1) for i in range(10, 30)]          # 21-node chain
        + [(100, 101), (101, 102), (100, 102)]       # triangle
        + [(200, 201)]                                # pair
        + [(300, 301), (302, 301), (303, 300)]       # star-ish
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = _cc_reference(edges)
    star = {
        r["doc_id"]: r["component"]
        for r in connected_components_star(pairs).collect()
    }
    prop = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, max_iters=40).collect()
    }
    assert star == want
    assert prop == want


def test_star_cc_on_minhash_pairs_matches_propagation(spark):
    """On the real near-dup pair graph at sf0.01 the two algorithms
    agree exactly."""
    from city_payroll_data_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
        minhash_dedup_pairs,
    )
    from city_payroll_data_pipeline_spark.suite.textops import _near_corpus

    pairs = minhash_dedup_pairs(
        _near_corpus(spark, SF_CORRECT), "doc_id", "text", threshold=0.5
    ).select("doc_a", "doc_b").localCheckpoint()
    star = {
        r["doc_id"]: r["component"]
        for r in connected_components_star(pairs).collect()
    }
    prop = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert star == prop and len(star) > 0


# --------------------------------------------------------------------------
# graph: integer-scaled PageRank (operators/graph.py)
# --------------------------------------------------------------------------


def test_pagerank_two_node_symmetric(spark):
    """Two nodes linking only to each other: ranks stay uniform (0.5
    each, at integer scale) regardless of iteration count."""
    from city_payroll_data_pipeline_spark.operators.graph import SCALE, pagerank_scaled

    edges = spark.createDataFrame(
        [(1, 2, 10), (2, 1, 10)], "src long, dst long, weight long"
    )
    out = {r["node"]: r["rank_scaled"] for r in pagerank_scaled(edges, iters=3).collect()}
    assert out == {1: SCALE // 2, 2: SCALE // 2}


def test_pagerank_sink_attracts_mass(spark):
    """Star graph 2,3,4 → 1 plus a back-edge 1 → 2: the 1↔2 cycle
    accumulates nearly all the mass (2 highest — it receives ALL of
    1's rank while 1 only gets the leaves' and 2's donations), leaves
    3,4 keep only the uniform teleport share, and total mass stays
    ≈ SCALE (truncation dust only)."""
    from city_payroll_data_pipeline_spark.operators.graph import SCALE, pagerank_scaled

    edges = spark.createDataFrame(
        [(2, 1, 1), (3, 1, 1), (4, 1, 1), (1, 2, 1)],
        "src long, dst long, weight long",
    )
    rows = pagerank_scaled(edges, iters=10).collect()
    ranks = {r["node"]: r["rank_scaled"] for r in rows}
    assert ranks[2] > ranks[1] > ranks[3] == ranks[4]
    assert ranks[1] > 5 * ranks[3]
    assert ranks[3] == 15 * SCALE // 100 // 4  # pure teleport share
    assert abs(sum(ranks.values()) - SCALE) < 1000  # dust ≪ resolution


def test_pagerank_dangling_mass_redistributed(spark):
    """Node 2 has no out-edges (dangling): its mass must be recycled —
    total stays ≈ SCALE instead of leaking 85% of node 2's rank."""
    from city_payroll_data_pipeline_spark.operators.graph import SCALE, pagerank_scaled

    edges = spark.createDataFrame([(1, 2, 5)], "src long, dst long, weight long")
    ranks = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_scaled(edges, iters=6).collect()
    }
    assert set(ranks) == {1, 2}
    assert abs(sum(ranks.values()) - SCALE) < 1000
    assert ranks[2] > ranks[1]  # 2 receives 1's links AND the uniform share


def test_bpe_apply_matches_pure_python_replay(spark):
    """apply_bpe's codegen'd fold must equal the classic sequential
    greedy left-to-right merge replay, token for token — including the
    no-re-match-within-a-pass rule (merged symbol can't be `left`
    again in the same pass)."""
    from city_payroll_data_pipeline_spark.operators.bpe import apply_bpe, train_bpe
    from city_payroll_data_pipeline_spark.suite import table

    def py_encode(text, merges):
        out = []
        for w in text.split():
            syms = list(w)
            for left, right, _ in merges:
                res, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            out.extend(syms)
        return out

    docs = (
        table(spark, SF_CORRECT, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    merges = train_bpe(docs, "text", n_merges=8)
    assert len(merges) == 8
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in apply_bpe(docs, "text", merges).collect()
    }
    for r in docs.collect():
        assert got[r["doc_id"]] == py_encode(r["text"], merges), r["doc_id"]


def test_personalized_pagerank_seed_dominates(spark):
    """PPR on a 3-cycle with seed 1: mass decays along hops from the
    seed (1 > 2 > 3 after the cycle closes), and total mass ≈ SCALE."""
    from city_payroll_data_pipeline_spark.operators.graph import SCALE, pagerank_scaled

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, 1)], "src long, dst long, weight long"
    )
    ranks = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_scaled(edges, iters=12, teleport_node=1).collect()
    }
    assert ranks[1] > ranks[2] > ranks[3]
    assert abs(sum(ranks.values()) - SCALE) < 1000


def test_stable_row_ids_contiguous_and_ordered(spark):
    """Skewed keys across few shards: IDs must be exactly 1..n in key
    order regardless of shard boundaries (including empty shards and
    all rows landing in one shard)."""
    from city_payroll_data_pipeline_spark.operators.rowids import stable_row_ids

    rows = [(k,) for k in [7, 7, 7, 7, 100, 3, 50, 7, 2, 99]]
    df = spark.createDataFrame(rows, "k long").withColumn(
        "uid", F.monotonically_increasing_id()
    )
    # tiebreaker needed because k has duplicates
    out = stable_row_ids(df, "k", tiebreakers=("uid",), n_shards=4).collect()
    got = sorted((r["row_id"], r["k"]) for r in out)
    assert [rid for rid, _ in got] == list(range(1, 11))
    assert [k for _, k in got] == sorted(r[0] for r in rows)


def test_stable_row_ids_single_shard_degenerate(spark):
    from city_payroll_data_pipeline_spark.operators.rowids import stable_row_ids

    df = spark.createDataFrame([(i,) for i in [5, 1, 9]], "k long")
    out = {r["k"]: r["row_id"] for r in stable_row_ids(df, "k", n_shards=1).collect()}
    assert out == {1: 1, 5: 2, 9: 3}


def test_heavy_hitters_pigeonhole_guarantee(spark):
    """Adversarial spread: a true heavy hitter scattered thinly across
    partitions must still be found (pigeonhole: some partition sees
    local share >= epsilon), and sub-threshold tokens must not."""
    from city_payroll_data_pipeline_spark.operators.heavyhitters import heavy_hitters

    # 'hot' = 30/100 tokens spread over all partitions; 'warm' = 10/100
    rows = [("hot",)] * 30 + [("warm",)] * 10 + [(f"t{i}",) for i in range(60)]
    toks = spark.createDataFrame(rows, "tok string").repartition(8)
    got = {r["tok"]: r["cnt"] for r in heavy_hitters(toks, "tok", 0.2).collect()}
    assert got == {"hot": 30}

    got2 = {r["tok"] for r in heavy_hitters(toks, "tok", 0.05).collect()}
    assert got2 == {"hot", "warm"}


def test_heavy_hitters_on_bigint_keys(spark):
    """The contract is any groupable key: a bigint key column must
    work (the candidate emitter's output schema used to be hardcoded
    'string', crashing the Arrow serializer on int64 partitions)."""
    from city_payroll_data_pipeline_spark.operators.heavyhitters import heavy_hitters

    rows = [(7,)] * 30 + [(i,) for i in range(60)]
    toks = spark.createDataFrame(rows, "uid bigint").repartition(4)
    got = {r["uid"]: r["cnt"] for r in heavy_hitters(toks, "uid", 0.2).collect()}
    assert got == {7: 31}  # 30 hot + the one range row uid=7


def test_pav_kernel_known_cases():
    """Hand-checked PAV fixtures: violation pooling, already-monotone
    passthrough, total pooling, and weights."""
    from city_payroll_data_pipeline_spark.operators.calibration import pav

    assert pav([3, 1, 2]) == [2, 2, 2]
    assert pav([1, 2, 3]) == [1, 2, 3]
    assert pav([3, 2, 1]) == [2, 2, 2]
    assert pav([1, 3, 2, 4]) == [1, 2.5, 2.5, 4]
    # weight 3 on the first point drags the pooled block toward it
    assert pav([4, 0], [3, 1]) == [3, 3]


def test_pav_invariants_random():
    """Monotone output + mean preservation on pseudo-random inputs."""
    from city_payroll_data_pipeline_spark.operators.calibration import pav

    seq = [((i * 1103515245 + 12345) % 97) / 7.0 for i in range(200)]
    fit = pav(seq)
    assert all(a <= b + 1e-12 for a, b in zip(fit, fit[1:]))
    assert abs(sum(fit) - sum(seq)) < 1e-6


def test_isotonic_fit_distributed_matches_kernel(spark):
    """The applyInPandas fit equals the pure-Python kernel applied to
    each group's (x, tiebreak)-sorted ys."""
    from city_payroll_data_pipeline_spark.operators.calibration import (
        isotonic_fit,
        pav,
    )

    rows = [
        ("a", 1, 5, 1), ("a", 2, 3, 2), ("a", 3, 4, 3),
        ("b", 1, 1, 4), ("b", 1, 3, 5), ("b", 2, 2, 6),
    ]
    df = spark.createDataFrame(
        rows, "source string, n_chars long, n_tokens long, doc_id long"
    ).repartition(4)
    got = {}
    for r in isotonic_fit(df, "source", "n_chars", "n_tokens", "doc_id").collect():
        got.setdefault(r["source"], []).append(
            (r["n_chars"], r["n_tokens"], r["y_hat"])
        )
    for src in got:
        got[src].sort()
    want_a = pav([5, 3, 4])
    ys_b = [1, 3, 2]  # sorted by (x, doc_id): (1,d4)->1, (1,d5)->3, (2,d6)->2
    want_b = pav(ys_b)
    assert [y for _, _, y in got["a"]] == want_a
    assert [y for _, _, y in got["b"]] == want_b


def test_containment_catches_what_jaccard_misses(spark, docs):
    """A 70%-prefix truncation sits at containment ≈ 1 inside its
    parent while Jaccard reads only ~0.7 — at a 0.9 bar the asymmetric
    metric must find every synthesized truncation pair and the
    symmetric one must find none of them."""
    from city_payroll_data_pipeline_spark.operators.dedup import (
        jaccard_verify_compact,
        ngram_containment_pairs,
        shingle_frame,
    )

    base = docs.select("doc_id", "text")
    trunc = base.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.col("text")
        .substr(F.lit(1), F.floor(F.length("text") * 0.7).cast("int"))
        .alias("text"),
    )
    corpus = base.unionAll(trunc)
    pairs = ngram_containment_pairs(
        corpus, "doc_id", "text", t_num=9, t_den=10, max_shingle_df=100
    )
    found = {
        (r["doc_a"], r["doc_b"])
        for r in pairs.filter(F.col("doc_b") >= 5000).collect()
    }
    # Boundary effect: truncating cuts mid-token, minting up to ~3
    # shingles absent from the parent — negligible for normal docs,
    # dominant for very short ones (a 11-token doc's truncation has ~5
    # shingles, so one boundary shingle already drops C below 0.9).
    # Every long-enough doc's pair MUST be found; short-doc misses are
    # the metric being honest, not a recall bug.
    toks = {
        r["doc_id"]: r["nt"]
        for r in base.select(
            "doc_id",
            F.size(
                F.expr(r"regexp_extract_all(trim(text), '\\S+', 0)")
            ).alias("nt"),
        ).collect()
    }
    expected = {(i, i + 5000) for i in range(30) if toks[i] >= 20}
    assert len(expected) >= 20  # the corpus is mostly long enough
    assert expected <= found, f"missed {sorted(expected - found)[:5]}"
    # the symmetric metric at the same bar finds NONE of these pairs
    sh = shingle_frame(corpus, "doc_id", "text")
    shc = (
        sh.select(
            "doc_id",
            (F.col("a") * 4096 + F.pmod(F.col("b"), 4096)).alias("c"),
        ).distinct()
    )
    cands = spark.createDataFrame(
        [(i, i + 5000) for i in range(30)], "doc_a long, doc_b long"
    )
    jac = jaccard_verify_compact(cands, shc, threshold=0.9)
    assert jac.count() == 0


def test_asof_forward_tolerance_semantics(spark):
    """Forward as-of: earliest right row at ts' >= ts matches
    (equal-ts inclusive); a match beyond the tolerance nulls out."""
    from city_payroll_data_pipeline_spark.operators.asof import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 100)], "event_id long, ts long"
    ).withColumn("k", F.lit("u"))
    right = spark.createDataFrame(
        [(10, 111), (60, 222), (400, 333)], "rts long, payload long"
    ).withColumn("k", F.lit("u"))
    out = {
        r["event_id"]: (r["payload"], r["_asof_matched_ts"])
        for r in asof_join_forward(
            left, right, by="k", left_ts="ts", right_ts="rts",
            payload=["payload"], tolerance="15",
        ).collect()
    }
    assert out[1] == (111, 10)  # equal-ts right row matches
    assert out[2] == (222, 60)  # next-forward within tolerance 15
    assert out[3] == (None, None)  # 400 is 300 past ts=100: beyond tol


def test_asof_forward_null_payload_not_torn(spark):
    """ADVICE r4 regression: when the earliest forward right row has a
    NULL payload value, the match must stay row-atomic — NULL payload
    with that row's timestamp — never a later row's payload stitched
    onto the earlier row's tolerance decision."""
    from city_payroll_data_pipeline_spark.operators.asof import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, 10)], "event_id long, ts long"
    ).withColumn("k", F.lit("u"))
    # earliest forward row (rts=12, within tol) has NULL payload; the
    # next (rts=500) is far beyond tolerance
    right = spark.createDataFrame(
        [(12, None), (500, 999)], "rts long, payload long"
    ).withColumn("k", F.lit("u"))
    row = asof_join_forward(
        left, right, by="k", left_ts="ts", right_ts="rts",
        payload=["payload"], tolerance="15",
    ).collect()[0]
    assert row["_asof_matched_ts"] == 12  # the row that won the match
    assert row["payload"] is None  # its genuinely-NULL payload — not 999


def test_pareto_frontier_has_no_dominated_rows(spark):
    """Every returned part must be undominated under (bigger size,
    lower price): the old <=-only filter kept parts undercut at their
    OWN size (39 of 44 rows at sf0.01 were dominated). Brute-force
    NOT-EXISTS audit against the full part table."""
    from city_payroll_data_pipeline_spark.suite import build_suite, table
    from tests.conftest import SF_CORRECT

    frontier = [
        (r["p_partkey"], r["p_size"], r["price"])
        for r in build_suite()["part_pareto_frontier"]
        .spark(spark, SF_CORRECT)
        .collect()
    ]
    assert frontier
    allp = [
        (r["p_partkey"], r["p_size"], float(r["p_retailprice"]))
        for r in table(spark, SF_CORRECT, "part")
        .select("p_partkey", "p_size", "p_retailprice")
        .collect()
    ]
    for fk, fs, fp in frontier:
        dominated = any(
            s >= fs and p <= fp and (s > fs or p < fp)
            for (k, s, p) in allp
            if k != fk
        )
        assert not dominated, (fk, fs, fp)
