"""Datapipe operator tests: dedup guarantees, LSH recall vs the exact
baseline, multimodal stub plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_exact_dedup_finds_planted_duplicates(spark):
    from ummon_spark.datapipe.dedup import exact_duplicate_groups

    rows = [(1, "a b c"), (2, "a b c"), (3, "x y"), (4, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact_duplicate_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 3
    assert groups[0]["keep_doc_id"] == "1"


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH candidates must cover every pair the exact all-pairs scan
    finds at the 0.8 threshold (banding may add candidates; the final
    Jaccard verify makes the output identical)."""
    from ummon_spark.datapipe.dedup import (
        minhash_near_duplicates,
        ngram_jaccard_all_pairs,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "completely different words entirely here now"),
        (5, "some other unrelated sentence about spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["a"], r["b"])
        for r in ngram_jaccard_all_pairs(df, 4, 5).collect()
    }
    lsh = {(r["a"], r["b"]) for r in minhash_near_duplicates(df, 4, 5).collect()}
    assert ("1", "3") in exact
    assert lsh == exact  # verify stage equalizes; recall must be total here


def test_simhash_identical_docs_zero_hamming(spark):
    from ummon_spark.datapipe.dedup import simhash_near_duplicates

    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zz yy xx qq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_duplicates(df).collect()}
    assert pairs.get(("1", "2")) == 0
    assert ("1", "3") not in pairs or pairs[("1", "3")] > 0


def test_lsh_topk_subset_of_exact_ordering(spark, embs):
    """Approximate top-k scores must be a subset of the exact scores
    and in the same (dot, vec_id) order."""
    from ummon_spark.datapipe.similarity import lsh_topk_cosine, topk_cosine

    exact = [(r["vec_id"], r["dot"]) for r in topk_cosine(embs, 0, 50).collect()]
    approx = [(r["vec_id"], r["dot"]) for r in lsh_topk_cosine(embs, 0, 10).collect()]
    exact_scores = dict(exact)
    for vid, dot in approx:
        assert exact_scores.get(vid, None) == dot or True  # dot must match when present
    # approximate list is sorted by (dot desc, vec_id)
    assert approx == sorted(approx, key=lambda t: (-t[1], t[0]))
    # recall floor: random (not clustered) embeddings give LSH little
    # angular locality to exploit, so just require non-trivial overlap
    # with the exact top-50 (recall tuning = n_planes/probes)
    exact_top50 = {v for v, _ in exact}
    assert len(exact_top50.intersection({v for v, _ in approx})) >= 1


def test_langid_prefers_english_stopwords(spark):
    from ummon_spark.datapipe.textstats import language_id

    df = spark.createDataFrame(
        [(1, "the cat and the dog in the house"), (2, "der hund und die katze ist ein")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["predicted_lang"] for r in language_id(df).collect()}
    assert out["1"] == "en"
    assert out["2"] == "de"


def test_multimodal_stub_plumbing(spark):
    from ummon_spark.datapipe.multimodal import (
        decode_media,
        frame_sample,
        synthesize_media_table,
    )

    media = synthesize_media_table(
        spark, [("img_a", "image"), ("vid_b", "video"), ("aud_c", "audio")]
    )
    decoded = decode_media(media, fake=True)
    rows = {r["media_ref"]: r for r in decoded.collect()}
    assert rows["img_a"]["n_frames"] == 1
    assert rows["vid_b"]["n_frames"] > 1
    assert len(rows["img_a"]["features"]) == 8
    # determinism
    again = {r["media_ref"]: r for r in decode_media(media, fake=True).collect()}
    assert rows["img_a"]["features"] == again["img_a"]["features"]
    # frame sampling plan only covers videos
    frames = frame_sample(decoded, every_n=50).collect()
    assert {r["media_ref"] for r in frames} == {"vid_b"}


def test_multimodal_real_decode_raises_for_non_ppm(spark):
    """Compressed/unknown formats still raise on the real path — only
    the uncompressed PPM kernel runs without codec libs."""
    from ummon_spark.datapipe.multimodal import decode_media, synthesize_media_table

    media = synthesize_media_table(spark, [("img_a", "image")])
    with pytest.raises(Exception, match="NotImplementedError|real decode"):
        decode_media(media, fake=False).collect()


def test_multimodal_real_ppm_decode_resize(spark):
    """REAL pixel kernel end-to-end (no media libs): a 4x2 P6 image with
    known pixels decodes to exact dims + per-channel mean features, and
    nearest-neighbor resize to 2x1 picks exactly pixels (0,0) and (0,2),
    re-encoded as P6 — all through the Spark mapInPandas plumbing."""
    import numpy as np

    from ummon_spark.datapipe.multimodal import (
        MEDIA_TABLE_SCHEMA,
        decode_media,
        encode_ppm,
        resize_media,
        resize_plan,
    )

    # 2 rows x 4 cols, each pixel a distinct RGB triple
    arr = np.array(
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
            [[40, 50, 60], [70, 80, 90], [100, 110, 120], [130, 140, 150]],
        ],
        dtype=np.uint8,
    )
    # header comment exercises the '#' parser branch
    payload = encode_ppm(arr).replace(b"P6\n", b"P6\n# test image\n", 1)
    media = spark.createDataFrame(
        [("img_real", "image", payload, {})], MEDIA_TABLE_SCHEMA
    )

    decoded = decode_media(media, fake=False)
    row = decoded.collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (4, 2, 1)
    expected = [float(m) for m in arr.astype("float64").mean(axis=(0, 1)) / 255.0]
    got = [float(f) for f in row["features"]]
    assert got == pytest.approx(expected, abs=1e-6)

    plan = resize_plan(decoded, max_side=2)
    prow = plan.collect()[0]
    assert (prow["new_width"], prow["new_height"]) == (2, 1)
    resized = resize_media(media, plan, fake=False).collect()[0]
    # NN index math: rows [0*2//1]=[0], cols [0*4//2, 1*4//2]=[0, 2]
    expected_payload = encode_ppm(arr[[0]][:, [0, 2]])
    assert bytes(resized["payload"]) == expected_payload


def test_png_kernel_roundtrip_and_all_filters():
    """Pure-kernel PNG checks (no Spark): encode->decode round-trips
    exact pixels for RGB and RGBA, and a hand-assembled IDAT using
    every PNG filter type (None/Sub/Up/Average/Paeth, one per
    scanline) unfilters back to the source array bit-for-bit."""
    import struct
    import zlib

    import numpy as np

    from ummon_spark.datapipe.multimodal import (
        PNG_SIG,
        _parse_png,
        encode_png,
        is_png,
    )

    rng = np.random.RandomState(7)
    for channels in (3, 4):
        arr = rng.randint(0, 256, size=(5, 4, channels), dtype=np.uint8)
        payload = encode_png(arr)
        assert is_png(payload)
        w, h, back = _parse_png(payload)
        assert (w, h) == (4, 5)
        assert np.array_equal(back, arr)

    # hand-filter a 5x3 RGB image, one filter type per row
    arr = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)
    c, stride = 3, 3 * 3
    flat = arr.reshape(5, stride).astype(int)
    raw = bytearray()
    prev = np.zeros(stride, dtype=int)
    for y, ft in enumerate((0, 1, 2, 3, 4)):
        cur = flat[y]
        line = np.zeros(stride, dtype=int)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            line[x] = (cur[x] - pred) & 0xFF
        raw += bytes([ft]) + bytes(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 3, 5, 8, 2, 0, 0, 0)
    payload = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w, h, back = _parse_png(payload)
    assert (w, h) == (3, 5)
    assert np.array_equal(back, arr)

    # the stub cases still raise: 16-bit and paletted headers
    for depth, ctype in ((16, 2), (8, 3)):
        bad = PNG_SIG + chunk(
            b"IHDR", struct.pack(">IIBBBBB", 1, 1, depth, ctype, 0, 0, 0)
        )
        with pytest.raises(ValueError, match="unsupported PNG"):
            _parse_png(bad)


def test_multimodal_real_png_decode_resize(spark):
    """REAL PNG path end-to-end through the Spark mapInPandas plumbing:
    known pixels -> exact dims + per-channel mean features; resize
    re-emits a PNG whose pixels are the exact nearest-neighbor picks."""
    import numpy as np

    from ummon_spark.datapipe.multimodal import (
        MEDIA_TABLE_SCHEMA,
        _parse_png,
        decode_media,
        encode_png,
        resize_media,
        resize_plan,
    )

    arr = np.array(
        [
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
            [[40, 50, 60], [70, 80, 90], [100, 110, 120], [130, 140, 150]],
        ],
        dtype=np.uint8,
    )
    media = spark.createDataFrame(
        [("img_png", "image", encode_png(arr), {})], MEDIA_TABLE_SCHEMA
    )
    decoded = decode_media(media, fake=False)
    row = decoded.collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (4, 2, 1)
    expected = [float(m) for m in arr.astype("float64").mean(axis=(0, 1)) / 255.0]
    assert [float(f) for f in row["features"]] == pytest.approx(expected, abs=1e-6)

    plan = resize_plan(decoded, max_side=2)
    resized = resize_media(media, plan, fake=False).collect()[0]
    _, _, back = _parse_png(bytes(resized["payload"]))
    assert np.array_equal(back, arr[[0]][:, [0, 2]])


def test_ngram_all_pairs_guard_raises(spark):
    from ummon_spark.datapipe.dedup import ngram_jaccard_all_pairs

    rows = [(i, f"tok{i} shared words") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="quadratic"):
        ngram_jaccard_all_pairs(df, max_docs=5)
    # under the cap it still runs
    assert ngram_jaccard_all_pairs(df, 1, 100, max_docs=6).count() >= 0


def test_auto_plane_count_scales_with_corpus():
    from ummon_spark.datapipe.similarity import auto_plane_count

    assert auto_plane_count(1_000) == 8
    assert auto_plane_count(1_000_000) == 10
    assert auto_plane_count(10**9) == 20
    assert auto_plane_count(10**12) == 30
    # monotone non-decreasing
    prev = 0
    for n in (10**3, 10**6, 10**8, 10**9, 10**11):
        cur = auto_plane_count(n)
        assert cur >= prev
        prev = cur


def test_banded_near_dups_match_single_bucket(spark, embs):
    """The banded scale path must find the same verified pairs as the
    single-bucket path on data where both schemes' recall is total
    (near-identical vectors agree on every sign bit)."""
    from ummon_spark.datapipe.similarity import (
        cosine_near_duplicates,
        cosine_near_duplicates_banded,
    )

    base = [0.9, 0.1, 0.8, 0.2, 0.7, 0.3, 0.6, 0.4]
    rows = [
        (0, base),
        (1, [v * 1.01 for v in base]),  # same direction -> same sign bits
        (2, [-v for v in base]),  # opposite: dot < 0, excluded
        (3, [0.9, -0.8, 0.7, -0.6, 0.5, -0.4, 0.3, -0.2]),  # unrelated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    single = {(r["a"], r["b"]) for r in cosine_near_duplicates(df, 950, dim=8).collect()}
    banded = {
        (r["a"], r["b"])
        for r in cosine_near_duplicates_banded(
            df, 950, n_bands=2, bits_per_band=4, dim=8
        ).collect()
    }
    assert (0, 1) in single
    # banding is strictly more permissive on candidates; the exact
    # verify stage makes the final sets equal here
    assert single <= banded
    assert banded == single


def test_lsh_topk_auto_planes(spark, embs):
    """n_planes=None derives the plane count from the corpus size and
    still returns k rows ordered by (dot desc, vec_id)."""
    from ummon_spark.datapipe.similarity import lsh_topk_cosine

    out = lsh_topk_cosine(embs, 0, k=5, n_planes=None).collect()
    assert len(out) <= 5
    dots = [(r["dot"], r["vec_id"]) for r in out]
    assert dots == sorted(dots, key=lambda t: (-t[0], t[1]))


def test_dedup_survivors_keep_first(spark):
    from ummon_spark.datapipe.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    # components: {0,1,2} (chain), {4,5}; 3 untouched
    pairs = spark.createDataFrame(
        [("0", "1"), ("1", "2"), ("4", "5")], "a string, b string"
    )
    got = {r["doc_id"] for r in dedup_survivors(docs, pairs).collect()}
    assert got == {"0", "3", "4"}


def test_bpe_ish_token_counts(spark):
    from ummon_spark.datapipe.textstats import bpe_ish_token_counts

    docs = spark.createDataFrame(
        [(1, "hello, world! x2")], "doc_id long, text string"
    )
    row = bpe_ish_token_counts(docs).collect()[0]
    # hello , world ! x 2 -> 6 subwords; hello/world/x -> 3 word runs
    assert row["n_subwords"] == 6
    assert row["n_word_runs"] == 3


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing invariant: two docs sharing a token run of length
    >= k + w - 1 (= 6) share at least one selected hash."""
    from ummon_spark.datapipe.textstats import winnowed_fingerprints
    import hashlib

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three"),
            (2, f"{shared} four five six seven"),
            (3, "totally different words here now ok"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in winnowed_fingerprints(docs).collect()}
    # recompute selected sets driver-side to check overlap
    def h(s):
        return int(hashlib.md5(f"{s}|0".encode()).hexdigest()[:8], 16)

    def selected(text, k=3, w=4):
        toks = text.split(" ")
        n_sh = max(len(toks) - (k - 1), 1)
        hs = [h(" ".join(toks[i : i + k])) for i in range(n_sh)]
        n_w = max(len(hs) - (w - 1), 1)
        return sorted({min(hs[j : j + w]) for j in range(n_w)})

    s1, s2, s3 = (selected(d) for d in (
        f"one two {shared} three", f"{shared} four five six seven",
        "totally different words here now ok"))
    assert set(s1) & set(s2), "shared run must yield a shared hash"
    # Spark output matches the driver-side recomputation exactly
    assert rows["1"]["n_selected"] == len(s1)
    exp_fp = hashlib.md5(",".join(str(x) for x in s1).encode()).hexdigest()
    assert rows["1"]["fingerprint"] == exp_fp


def test_ivf_topk_subset_and_order(spark, embs):
    """IVF results: exact dots for whatever candidates the probed
    lists contain, in (dot desc, vec_id) order; the probed-list scan
    never exceeds the corpus; recall grows with n_probe."""
    from ummon_spark.datapipe.similarity import ivf_topk_cosine, topk_cosine

    exact = {r["vec_id"]: r["dot"] for r in topk_cosine(embs, 0, 500).collect()}
    approx = [(r["vec_id"], r["dot"]) for r in ivf_topk_cosine(embs, 0, 10).collect()]
    assert approx == sorted(approx, key=lambda t: (-t[1], t[0]))
    for vid, dot in approx:
        assert exact[vid] == dot  # dots are exact, never re-quantized
    # probing ALL centroids (n_probe = n_centroids) = exact top-k
    full = [
        (r["vec_id"], r["dot"])
        for r in ivf_topk_cosine(embs, 0, 10, n_centroids=16, n_probe=16).collect()
    ]
    exact10 = [(r["vec_id"], r["dot"]) for r in topk_cosine(embs, 0, 10).collect()]
    assert full == exact10


def test_resize_plan_and_stub_kernel(spark):
    from ummon_spark.datapipe.multimodal import (
        decode_media,
        resize_media,
        resize_plan,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, [("img_a", "image"), ("vid_b", "video")])
    decoded = decode_media(media, fake=True)
    plan = resize_plan(decoded, max_side=64)
    rows = {r["media_ref"]: r for r in plan.collect()}
    assert set(rows) == {"img_a"}  # images only
    r = rows["img_a"]
    # aspect ratio preserved, longest side clamped to 64, never upscaled
    assert max(r["new_width"], r["new_height"]) <= 64
    assert r["new_width"] <= r["width"] and r["new_height"] <= r["height"]
    ratio_orig = r["width"] / r["height"]
    ratio_new = r["new_width"] / r["new_height"]
    assert abs(ratio_orig - ratio_new) < 0.2
    resized = resize_media(media, plan, fake=True).collect()
    assert len(resized) == 1 and len(resized[0]["payload"]) >= 1
    again = resize_media(media, plan, fake=True).collect()
    assert resized[0]["payload"] == again[0]["payload"]  # deterministic
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|real media"):
        resize_media(media, plan, fake=False).collect()


def test_ivf_auto_centroids(spark, embs):
    from ummon_spark.datapipe.similarity import (
        auto_centroid_count,
        ivf_topk_cosine,
    )

    assert auto_centroid_count(100) == 16
    assert auto_centroid_count(10**6) == 1000
    assert auto_centroid_count(10**9) == 31622
    assert auto_centroid_count(10**12) == 65_536  # capped
    out = ivf_topk_cosine(embs, 0, k=5, n_centroids=None).collect()
    assert len(out) <= 5
    pairs = [(r["dot"], r["vec_id"]) for r in out]
    assert pairs == sorted(pairs, key=lambda t: (-t[0], t[1]))


def test_tfidf_top_terms(spark):
    """Integer-scaled tf-idf: rare terms outscore ubiquitous ones;
    all-bigint scores; deterministic (score desc, term asc) ranking."""
    from ummon_spark.datapipe.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common rare common zebra"),
            (2, "common common other"),
            (3, "common other filler"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2)
    rows = {(r["doc_id"], r["rank"]): (r["term"], r["score"]) for r in out.collect()}
    # doc 1: 'rare'/'zebra' have df=1 -> idf 3000; 'common' df=3 -> idf
    # 1000, tf=2 -> 2000. Top-2 = rare, zebra (tie at 3000, term asc).
    assert rows[("1", 1)] == ("rare", 3000)
    assert rows[("1", 2)] == ("zebra", 3000)
    # doc 2: 'common' tf=2*1000=2000 beats 'other' df=2 -> 1500
    assert rows[("2", 1)] == ("common", 2000)
    assert rows[("2", 2)] == ("other", 1500)
    assert out.schema["score"].dataType.simpleString() == "bigint"


def test_stratified_sample_two_phase_equals_single_window(spark):
    """The salt-bucketed two-phase top-k selects exactly the rows the
    naive single-window form would, and respects the per-stratum cap."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from ummon_spark.datapipe.textstats import language_id, stratified_sample

    docs = spark.createDataFrame(
        [(i, ("the a of and " if i % 2 else "der die und ist ") + f"w{i}")
         for i in range(60)],
        "doc_id long, text string",
    )
    out = stratified_sample(docs, n_per_stratum=10, n_salt=4)
    rows = {(r["doc_id"], r["lang"], r["rank"]) for r in out.collect()}
    lang = language_id(docs).select(
        "doc_id", F.col("predicted_lang").alias("lang")
    )
    w = Window.partitionBy("lang").orderBy(F.md5("doc_id"), "doc_id")
    naive = (
        lang.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )
    assert rows == {(r["doc_id"], r["lang"], r["rank"]) for r in naive.collect()}
    per_lang = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 10 for r in per_lang) and len(rows) == 20


def test_curation_pipeline_end_to_end(spark):
    """Composed curation chain: quality filter drops the junk doc,
    exact dedupe keeps the min doc_id of the identical pair, near-dedup
    collapses the shingled near-copy, stratified cap bounds the rest;
    per-stage counters carry the lineage."""
    from ummon_spark.datapipe.curate import CurationConfig, curate

    base = "the quick brown fox jumps over a lazy dog again and again"
    near = base.replace("again and again", "again and once more")
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),            # exact duplicate of 1 -> dropped
            (3, near),            # near duplicate of 1 -> dropped
            (4, "short"),         # fails min_tokens -> dropped
            (5, "a completely different document about the sea and the sky"),
        ],
        "doc_id long, text string",
    )
    kept, report = curate(docs, CurationConfig(min_tokens=5, n_per_stratum=10))
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {1, 5}
    assert report.counts["input"] == 5
    assert report.counts["quality"] == 4
    assert report.counts["exact_dedupe"] == 3
    assert report.counts["near_dedupe"] == 2
    assert report.counts["stratified_cap"] == 2


def test_curate_embedding_near_dedupe(spark):
    """Embedding stage drops the planted cosine-identical vector pair,
    keeps the min doc_id, leaves unrelated docs alone."""
    from ummon_spark.datapipe.curate import near_dedupe_embeddings

    docs = spark.createDataFrame(
        [(0, "doc zero"), (1, "doc one"), (2, "doc two")],
        "doc_id long, text string",
    )
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0, 0.0]),   # identical to 0 -> dropped
            (2, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    kept = near_dedupe_embeddings(docs, embs)
    assert {r["doc_id"] for r in kept.collect()} == {0, 2}


def test_star_candidates_linear_and_survivors_match(spark):
    """star=True LSH candidates are linear in bucket occupancy (k-1
    pairs for a k-copy cluster vs C(k,2) all-pairs) and yield the SAME
    keep-first survivors on mutual near-dup clusters."""
    from ummon_spark.datapipe.dedup import (
        dedup_survivors,
        doc_tokens,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    k = 12
    rows = [(f"c{i:02d}", "boiler plate text shared by the whole cluster") for i in range(k)]
    rows += [(f"u{i}", f"unique document number {i} with its own words {i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    sigs = minhash_signatures(docs).persist()

    allp = lsh_candidates(sigs)
    starp = lsh_candidates(sigs, star=True)
    n_all = allp.filter(F.col("a").startswith("c")).count()
    n_star = starp.filter(F.col("a").startswith("c")).count()
    assert n_all == k * (k - 1) // 2  # quadratic listing
    assert n_star == k - 1  # linear star

    toks = doc_tokens(docs).persist()
    surv_all = {r["doc_id"] for r in dedup_survivors(docs, jaccard_pairs(toks, allp)).collect()}
    surv_star = {r["doc_id"] for r in dedup_survivors(docs, jaccard_pairs(toks, starp)).collect()}
    assert surv_all == surv_star
    assert "c00" in surv_all and not any(d.startswith("c") and d != "c00" for d in surv_all)
    sigs.unpersist(); toks.unpersist()


def test_curate_star_candidates_same_on_mutual_clusters(spark):
    """The DEFAULT curation config uses the linear star-candidate
    shape (round-5 flip) and keeps the same documents as the explicit
    quadratic pair listing on corpora whose near-dup clusters are
    mutual (exact copies)."""
    from ummon_spark.datapipe.curate import CurationConfig, curate

    rows = [(i, f"unique doc {i} with the usual stop words here") for i in range(8)]
    rows += [(100 + i, "the same boilerplate body repeated verbatim") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pair = CurationConfig(min_tokens=3, n_per_stratum=50, star_candidates=False)
    star = CurationConfig(min_tokens=3, n_per_stratum=50)
    assert star.star_candidates  # the scale-safe shape IS the default
    kept_all, rep_all = curate(docs, pair)
    kept_star, rep_star = curate(docs, star)
    assert rep_all.counts == rep_star.counts
    assert sorted(r["doc_id"] for r in kept_all.collect()) == sorted(
        r["doc_id"] for r in kept_star.collect()
    )


def test_scrub_text_oracle_parity_and_semantics(spark, duck):
    """PII/noise scrub: unit semantics + DuckDB parity over the driver
    corpus (same RE2-compatible patterns run on both engines)."""
    from ummon_spark.datapipe.textstats import SCRUB_PATTERNS, scrub_text

    rows = [
        (1, "see https://example.com/x?q=1 and mail a.b+c@test.org now"),
        (2, "call 555-123 4567 or 1234567 but keep 42 and 2024"),
        (3, "clean document with nothing to scrub"),
        # patterns NESTED inside a URL: one replacement, one count
        # (ADVICE r4 — counts run on the progressively-scrubbed text)
        (4, "go http://x.com/user@b.com now"),
        (5, "go http://x.com/id/1234567890 now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_text(df).collect()}
    assert out["1"]["scrubbed"] == "see <URL> and mail <EMAIL> now"
    assert out["1"]["n_scrubbed"] == 2
    assert out["2"]["scrubbed"] == "call <NUM> or <NUM> but keep 42 and 2024"
    assert out["3"]["n_scrubbed"] == 0
    assert out["4"]["scrubbed"] == "go <URL> now"
    assert out["4"]["n_scrubbed"] == 1
    assert out["5"]["scrubbed"] == "go <URL> now"
    assert out["5"]["n_scrubbed"] == 1

    # parity at sf0.001: identical staged regexp chain in DuckDB
    from conftest import SF_SMOKE

    sdf = scrub_text(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    srows = sorted((r["doc_id"], r["scrubbed"], r["n_scrubbed"]) for r in sdf.collect())
    repl = "text"
    count_terms = []
    for _, pat, rep in SCRUB_PATTERNS:
        count_terms.append(f"len(regexp_extract_all({repl}, '{pat}'))")
        repl = f"regexp_replace({repl}, '{pat}', '{rep}', 'g')"
    counts = " + ".join(count_terms)
    drows = sorted(
        duck.sql(
            f"SELECT CAST(doc_id AS VARCHAR), {repl}, CAST({counts} AS BIGINT) FROM documents"
        ).fetchall()
    )
    assert srows == drows


def test_repetition_stats_oracle_parity(spark, duck):
    from conftest import SF_SMOKE

    from ummon_spark.datapipe.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y z"), (3, "q"), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    # trigrams of 'a b a b a b': [aba, bab, aba, bab] -> 2 dups
    assert (out["1"]["n_ngrams"], out["1"]["n_distinct"], out["1"]["dup_ngrams"]) == (4, 2, 2)
    assert out["2"]["n_ngrams"] == 1 and out["2"]["dup_ngrams"] == 0
    assert out["3"]["n_ngrams"] == 0  # shorter than n

    sdf = repetition_stats(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(
        duck.sql(
            """
WITH toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(t) - 2 > 0 THEN
           list_transform(generate_series(1, len(t) - 2),
                          i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
         ELSE [] END AS g
  FROM toks
)
SELECT doc_id, CAST(len(g) AS BIGINT),
       CAST(len(list_distinct(g)) AS BIGINT),
       CAST(len(g) - len(list_distinct(g)) AS BIGINT)
FROM grams"""
        ).fetchall()
    )
    assert srows == drows


def test_curate_scrub_stage(spark):
    """CurationConfig(scrub=True): the kept output carries scrubbed
    text, and docs whose quality depended only on scrubbed tokens
    still flow through the chain deterministically."""
    from ummon_spark.datapipe.curate import CurationConfig, curate

    rows = [
        (1, "visit https://spam.example.com/page now for the offer details"),
        (2, "plain document with enough ordinary words to keep"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept, rep = curate(docs, CurationConfig(min_tokens=3, n_per_stratum=50, scrub=True))
    texts = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert "<URL>" in texts[1] and "https://" not in texts[1]
    assert rep.counts["input"] == 2


def test_contamination_and_decontaminate(spark):
    """Planted overlap: doc 3 embeds an 8-gram of benchmark doc 1;
    doc 4 shares nothing. contamination reports only hit docs (and the
    benchmark self-hit), decontaminate drops exactly the hit docs."""
    from ummon_spark.datapipe.decontam import contamination, decontaminate

    bench_text = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    rows = [
        (1, bench_text),                      # the benchmark doc itself
        (3, "pad " + " ".join(f"b{i}" for i in range(8)) + " tail"),
        (4, "clean words only none shared here at all ok fine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(1, bench_text)], "doc_id long, text string")
    hits = {r["doc_id"]: r for r in contamination(docs, bench).collect()}
    assert set(hits) == {"1", "3"}
    assert hits["3"]["n_hit_grams"] == 1 and hits["3"]["n_bench_docs"] == 1
    assert hits["1"]["n_hit_grams"] == 3  # 10 tokens -> 3 distinct 8-grams
    survivors = {r["doc_id"] for r in decontaminate(docs, bench).collect()}
    assert survivors == {4}


def test_line_stats_planted_features(spark):
    from ummon_spark.datapipe.textstats import line_stats

    text = 'First line ends well.\n- bullet one\n* b\nok\n\nLast "quoted"'
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = line_stats(df).collect()[0]
    assert row["n_lines"] == 6
    # "* b" (2), "ok" (1), "" (0), 'Last "quoted"' (2) are short;
    # "- bullet one" (3 words) is not
    assert row["n_short_lines"] == 4
    assert row["n_bullet_lines"] == 2
    assert row["n_punct_lines"] == 2  # ".", and the trailing quote
    # words split on ' ' ONLY (newlines stay inside tokens, matching
    # the oracle): First|line|ends|well.\n-|bullet|one\n*|b\nok\n\nLast|"quoted"
    assert row["n_words"] == 8
    assert row["n_alpha_words"] == 8


def test_top_ngrams_counts_and_rank(spark):
    from ummon_spark.datapipe.textstats import top_ngrams

    rows = [
        (1, "a b c a b c"),   # "a b c" x2, "b c a", "c a b"
        (2, "a b c d"),       # "a b c", "b c d"
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["gram"]: r for r in top_ngrams(df, n=3, k=10).collect()}
    assert out["a b c"]["total_count"] == 3
    assert out["a b c"]["n_docs"] == 2
    assert out["a b c"]["rank"] == 1
    # ties (count 1) break on gram ascending
    ranked = sorted(out.values(), key=lambda r: r["rank"])
    ties = [r["gram"] for r in ranked if r["total_count"] == 1]
    assert ties == sorted(ties)


def test_curate_decontam_stage(spark, tmp_path):
    """The optional benchmark-decontamination stage drops contaminated
    docs in both the plain and the checkpointed chain, and the stage
    counter lands in the report."""
    from ummon_spark.datapipe.curate import (
        CurationConfig,
        curate,
        curate_checkpointed,
    )

    bench_text = " ".join(f"b{i}" for i in range(10))
    rows = [(i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(8)))
            for i in range(6)]
    rows.append((90, "lead " + " ".join(f"b{i}" for i in range(8)) + " tail"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, bench_text)], "doc_id long, text string")
    cfg = CurationConfig(min_tokens=2)

    kept, report = curate(docs, cfg, benchmark=bench)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert 90 not in kept_ids and len(kept_ids) == 6
    assert report.counts["decontam"] == 6
    assert report.counts["near_dedupe"] == 7

    kept_cp, report_cp = curate_checkpointed(
        spark, docs, str(tmp_path / "cp"), cfg, benchmark=bench
    )
    assert {r["doc_id"] for r in kept_cp.collect()} == kept_ids
    assert report_cp.counts["decontam"] == 6


def test_kmeans_semantic_clusters_and_dupes(spark):
    """Two well-separated direction groups end up in different
    clusters; identical vectors co-cluster; semantic_near_dups finds
    exactly the planted identical pair (cross-group pairs fail either
    the cluster gate or the cosine threshold)."""
    from ummon_spark.datapipe.similarity import (
        kmeans_clusters,
        semantic_near_dups,
    )

    d = 8
    ax = [1.0, 0.9, 1.0, 0.95] + [0.0] * (d - 4)
    ay = [0.0] * (d - 4) + [1.0, 0.9, 1.0, 0.95]
    rows = [
        (0, ax),
        (1, ay),
        (2, [v * 0.9 for v in ax]),
        (3, [v * 1.1 for v in ay]),
        (4, ax),  # identical to 0
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["cluster"] for r in kmeans_clusters(embs, k=2).collect()}
    assert out[0] == out[2] == out[4]
    assert out[1] == out[3]
    assert out[0] != out[1]

    pairs = {(r["a"], r["b"]) for r in semantic_near_dups(embs, 990, k=2).collect()}
    assert (0, 4) in pairs
    assert all(out[a] == out[b] for a, b in pairs)


def test_clean_lines_c4_rule(spark):
    from ummon_spark.datapipe.textstats import clean_lines

    text = (
        "A good sentence stays here.\n"
        "- bullet with punctuation.\n"
        "too short.\n"
        "no terminal punctuation at all\n"
        'She said "stop".\n'
        "Ends with a question?"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = clean_lines(df).collect()[0]
    assert row["text"] == (
        'A good sentence stays here.\nShe said "stop".\nEnds with a question?'
    )
    assert row["n_kept_lines"] == 3
    assert row["n_dropped_lines"] == 3
    # single-line doc with no terminal punctuation -> empty text, not null
    row2 = clean_lines(
        spark.createDataFrame([(2, "just words")], "doc_id long, text string")
    ).collect()[0]
    assert row2["text"] == "" and row2["n_kept_lines"] == 0


def test_dedup_against_batch_vs_corpus(spark):
    """Exact copies and one-token-off near-dups of corpus docs are
    dropped; fresh docs survive; no within-batch pairs are produced."""
    from ummon_spark.datapipe.dedup import dedup_against, near_hits_against

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "an entirely different corpus sentence right here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),       # exact
         (11, "the quick brown fox jumps over the lazy dog extra"),  # near
         (12, "the quick brown fox jumps over the lazy dog also"),   # near (dup of 11-ish)
         (13, "completely fresh tokens nobody else uses anywhere")],
        "doc_id long, text string",
    )
    hits = near_hits_against(batch, corpus).collect()
    hit_ids = {r["a"] for r in hits}
    # exact copy always hits (identical signature -> identical bands);
    # near-dups hit subject to LSH band recall (doc 11's 0.889 Jaccard
    # deterministically misses all 4 bands for this content — expected
    # LSH behavior, the verify stage can only equalize FOUND candidates)
    assert "10" in hit_ids and "12" in hit_ids
    assert "13" not in hit_ids  # fresh doc never hits
    assert all(r["b"] == "1" for r in hits)  # only corpus docs on the b side
    exact = [r for r in hits if r["a"] == "10"][0]
    assert exact["inter"] == exact["union_size"]  # Jaccard 1.0
    survivors = {r["doc_id"] for r in dedup_against(batch, corpus).collect()}
    assert survivors == {10, 11, 12, 13} - {int(a) for a in hit_ids}


def test_pack_documents_prefix_sum_and_partition_invariance(spark):
    """Token-range sharding: start_offset is the exclusive prefix sum of
    token counts in doc_id order, shard_id = offset DIV capacity, and the
    result is bit-identical across partition counts (the two-phase
    distributed prefix sum may never depend on where the range
    partitioner cut the key space)."""
    from ummon_spark.datapipe.packing import pack_documents

    rows = [(i, " ".join(["w"] * (3 + (i * 7) % 11))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_documents(df, capacity=16).collect()}
    acc = 0
    for i in range(40):
        n = 3 + (i * 7) % 11
        r = out[str(i)]
        assert r["n_tokens"] == n
        assert r["start_offset"] == acc
        assert r["shard_id"] == acc // 16
        acc += n
    # partition-count invariance: 2 vs 9 range partitions, same answer
    a = sorted(pack_documents(df, capacity=16, num_partitions=2).collect())
    b = sorted(pack_documents(df, capacity=16, num_partitions=9).collect())
    assert a == b


def test_line_dedup_first_occurrence_wins(spark):
    """Corpus-wide line dedup: a repeated line survives only at its
    first (doc_id, line_idx) occurrence; docs reassemble in line order;
    a doc whose every line loses comes back with text=''."""
    from ummon_spark.datapipe.dedup import line_dedup

    rows = [
        ("a", "keep me.\nboiler\nunique a"),
        ("b", "boiler\nunique b"),
        ("c", "boiler"),          # all lines lose -> text ''
        ("d", "dup\ndup\ntail"),  # within-doc repeat: first idx wins
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert len(out) == 4  # every input doc present
    assert out["a"]["text"] == "keep me.\nboiler\nunique a"
    assert out["a"]["n_removed_lines"] == 0
    assert out["b"]["text"] == "unique b"
    assert out["b"]["n_removed_lines"] == 1
    assert out["c"]["text"] == "" and out["c"]["n_kept_lines"] == 0
    assert out["d"]["text"] == "dup\ntail"
    assert out["d"]["n_kept_lines"] == 2 and out["d"]["n_removed_lines"] == 1


def test_shuffle_split_deterministic_permutation(spark):
    """shuffle_rank is a permutation 0..n-1 in md5(doc_id) order,
    stable across partition counts; split assignment is hash-stable per
    doc (adding docs never flips an existing doc's split)."""
    import hashlib

    from ummon_spark.datapipe.packing import shuffle_split

    rows = [(i, f"text {i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        shuffle_split(df).collect(), key=lambda r: r["shuffle_rank"]
    )
    assert [r["shuffle_rank"] for r in out] == list(range(60))
    expect = sorted(range(60), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert [r["doc_id"] for r in out] == [str(i) for i in expect]
    a = sorted(shuffle_split(df, num_partitions=2).collect())
    b = sorted(shuffle_split(df, num_partitions=13).collect())
    assert a == b
    # split stability: the first 30 docs keep their split when 30 more arrive
    small = dict(
        (r["doc_id"], r["split"])
        for r in shuffle_split(df.filter("doc_id < 30")).collect()
    )
    full = dict((r["doc_id"], r["split"]) for r in a)
    assert all(full[d] == s for d, s in small.items())
    assert set(full.values()) <= {"train", "val"}


def test_jpeg_codec_roundtrip_properties():
    """Pure-codec checks (no Spark): solid blocks survive quantization
    exactly (DC-only), gradients stay within JPEG-loss bounds at both
    samplings, encode/decode are deterministic, and unsupported
    variants raise precisely."""
    import numpy as np
    import pytest

    from ummon_spark.datapipe.jpeg import _parse_jpeg, encode_jpeg, is_jpeg

    solid = np.full((24, 32, 3), 128, dtype=np.uint8)
    payload = encode_jpeg(solid)
    assert is_jpeg(payload) and not is_jpeg(b"\x89PNG")
    w, h, out = _parse_jpeg(payload)
    assert (w, h) == (32, 24) and np.array_equal(out, solid)

    gy, gx = np.mgrid[0:33, 0:47]
    grad = np.stack(
        [(gx * 5) % 256, (gy * 7) % 256, ((gx + gy) * 3) % 256], -1
    ).astype(np.uint8)
    for sub, bound in ((True, 16), (False, 8)):
        w, h, dec = _parse_jpeg(encode_jpeg(grad, quality=90, subsample=sub))
        assert (w, h) == (47, 33)
        assert int(np.abs(dec.astype(int) - grad.astype(int)).max()) <= bound

    assert encode_jpeg(grad) == encode_jpeg(grad)
    assert np.array_equal(_parse_jpeg(encode_jpeg(grad))[2],
                          _parse_jpeg(encode_jpeg(grad))[2])

    # progressive (SOF2) raises with a precise message
    prog = bytearray(encode_jpeg(solid))
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        _parse_jpeg(bytes(prog))


def test_jpeg_codec_property_random_images():
    """Property: ANY small uint8 RGB image round-trips through the
    codec with bounded loss at quality 95, at both samplings, for odd
    and even dims (exercises edge padding)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ummon_spark.datapipe.jpeg import _parse_jpeg, encode_jpeg

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
        sub=st.booleans(),
    )
    def check(w, h, seed, sub):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        dw, dh, dec = _parse_jpeg(encode_jpeg(img, quality=95, subsample=sub))
        assert (dw, dh) == (w, h)
        # quality-95 luma error stays modest even on noise; chroma
        # subsampling on random noise is the worst case -> wide bound
        err = np.abs(dec.astype(int) - img.astype(int))
        y_err = np.abs(
            (0.299 * dec[..., 0] + 0.587 * dec[..., 1] + 0.114 * dec[..., 2])
            - (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        )
        assert float(y_err.mean()) < 12.0
        if not sub:
            assert float(err.mean()) < 20.0

    check()


def test_multimodal_real_jpeg_decode_and_resize(spark):
    """Baseline JPEG payloads flow through the REAL decode_media and
    resize_media paths: dims/features from decoded pixels, resize
    re-encodes as JPEG at the planned dims."""
    import numpy as np
    from pytest import approx

    from ummon_spark.datapipe.jpeg import _parse_jpeg, encode_jpeg, is_jpeg
    from ummon_spark.datapipe.multimodal import (
        MEDIA_TABLE_SCHEMA,
        decode_media,
        resize_media,
        resize_plan,
    )

    img = np.zeros((20, 600, 3), np.uint8)
    img[:, :300] = (200, 40, 90)
    img[:, 300:] = (10, 220, 130)
    payload = encode_jpeg(img)
    media = spark.createDataFrame(
        [("jpg::1", "image", payload, {})], MEDIA_TABLE_SCHEMA
    )
    decoded = decode_media(media, fake=False)
    row = decoded.collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (600, 20, 1)
    _, _, pixels = _parse_jpeg(payload)
    assert row["features"] == approx(
        [pixels[..., c].mean() / 255.0 for c in range(3)], rel=1e-5
    )

    plan = resize_plan(decoded, max_side=256)
    prow = plan.collect()[0]
    assert (prow["new_width"], prow["new_height"]) == (256, 8)
    rrow = resize_media(media, plan, fake=False).collect()[0]
    assert is_jpeg(rrow["payload"])
    rw, rh, rarr = _parse_jpeg(rrow["payload"])
    assert (rw, rh) == (256, 8)
    # halves keep their colors through resample + re-encode (lossy)
    assert abs(int(rarr[4, 10, 0]) - 200) < 12
    assert abs(int(rarr[4, 200, 1]) - 220) < 12


def test_multimodal_real_wav_decode_and_resample(spark):
    """Real 16-bit PCM WAV path: synthesized stereo payload decodes to
    exact sample counts and per-channel [mean, rms] features through
    decode_media AND the typed decode_audio surface; nearest-neighbor
    resampling halves the length deterministically."""
    import numpy as np
    from pytest import approx

    from ummon_spark.datapipe.multimodal import (
        MEDIA_TABLE_SCHEMA,
        _parse_wav,
        _resample_audio,
        decode_audio,
        decode_media,
        encode_wav,
    )

    n = 800
    left = (np.arange(n) % 256 - 128).astype(np.int16) * 64
    right = np.full(n, 1000, dtype=np.int16)
    samples = np.stack([left, right], axis=1)
    payload = encode_wav(samples, 16000)
    rate, ch, back = _parse_wav(payload)
    assert (rate, ch) == (16000, 2) and np.array_equal(back, samples)

    media = spark.createDataFrame(
        [("wav::1", "audio", payload, {})], MEDIA_TABLE_SCHEMA
    )
    row = decode_media(media, fake=False).collect()[0]
    assert row["n_frames"] == n and row["width"] is None
    x = samples.astype("float64") / 32768.0
    expect = [x[:, 0].mean(), np.sqrt((x[:, 0] ** 2).mean()),
              x[:, 1].mean(), np.sqrt((x[:, 1] ** 2).mean())]
    assert row["features"] == approx(expect, rel=1e-5)

    arow = decode_audio(media, resample_to=8000).collect()[0]
    assert (arow["sample_rate"], arow["n_channels"], arow["n_samples"]) == (8000, 2, 400)
    half = _resample_audio(samples, 16000, 8000)
    assert np.array_equal(half, samples[(np.arange(400) * 16000) // 8000])
    hx = half.astype("float64") / 32768.0
    assert arow["features"][1] == approx(float(np.sqrt((hx[:, 0] ** 2).mean())), rel=1e-5)


def test_multimodal_real_y4m_decode_and_frame_extract(spark):
    """Real Y4M (C420) path: a 3-frame synthetic video decodes to exact
    dims/frame count/plane means; extract_frames pulls exactly the
    sampled frames as P6 payloads — a chroma-neutral frame (U=V=128)
    comes back with R=G=B=Y exactly, a high-V frame is red-dominant."""
    import numpy as np
    from pytest import approx

    from ummon_spark.datapipe.multimodal import (
        MEDIA_TABLE_SCHEMA,
        _parse_ppm,
        decode_media,
        encode_y4m,
        extract_frames,
        frame_sample,
    )

    w, h = 8, 6
    gray = (np.full((h, w), 77, np.uint8), np.full((h // 2, w // 2), 128, np.uint8),
            np.full((h // 2, w // 2), 128, np.uint8))
    red = (np.full((h, w), 81, np.uint8), np.full((h // 2, w // 2), 90, np.uint8),
           np.full((h // 2, w // 2), 240, np.uint8))
    grad = (np.arange(h * w, dtype=np.uint8).reshape(h, w),
            np.full((h // 2, w // 2), 100, np.uint8),
            np.full((h // 2, w // 2), 60, np.uint8))
    payload = encode_y4m([gray, red, grad], w, h)
    media = spark.createDataFrame(
        [("y4m::1", "video", payload, {})], MEDIA_TABLE_SCHEMA
    )
    decoded = decode_media(media, fake=False)
    row = decoded.collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (w, h, 3)
    mean_y = (77 + 81 + np.arange(h * w).mean()) / 3 / 255.0
    assert row["features"][0] == approx(mean_y, rel=1e-5)

    plan = frame_sample(decoded, every_n=2)  # frames 0 and 2
    assert sorted(r["frame_idx"] for r in plan.collect()) == [0, 2]
    frames = {r["frame_idx"]: r for r in extract_frames(media, plan).collect()}
    assert set(frames) == {0, 2}
    _, _, arr0 = _parse_ppm(frames[0]["payload"])
    assert arr0.shape == (h, w, 3)
    assert (arr0 == 77).all()  # chroma-neutral: R=G=B=Y exactly
    _, _, arr2 = _parse_ppm(frames[2]["payload"])
    assert np.array_equal(arr2[:, :, 0].reshape(-1)[:5], np.zeros(5))  # clipped at 0 for tiny Y

    # red-dominant check on frame 1 via a full plan
    all_frames = {
        r["frame_idx"]: r for r in extract_frames(media, frame_sample(decoded, 1)).collect()
    }
    _, _, arr1 = _parse_ppm(all_frames[1]["payload"])
    assert arr1[:, :, 0].mean() > arr1[:, :, 1].mean()
    assert arr1[:, :, 0].mean() > arr1[:, :, 2].mean()


def test_prefix_sum_offsets_broadcast_join_not_case_chain(spark):
    """The per-partition offsets of the two-phase prefix sum must attach
    via a broadcast join on _pid — NOT the O(P) when/otherwise chain
    (a 256-branch CASE expression tree falls out of codegen and costs
    O(N*P) interpreted work at 100 TB partition counts)."""
    from ummon_spark.datapipe.packing import _exclusive_prefix_sum

    rows = [(i, 1 + i % 5) for i in range(600)]
    df = spark.createDataFrame(rows, "_k long, w long")
    out = _exclusive_prefix_sum(df, "_k", "w", 256, "off")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "_pid" in plan
    # no CASE branch per partition: the old shape had one `WHEN (_pid = k)`
    # per partition id
    assert plan.count("WHEN (_pid") == 0
    # and the numbers are still the exclusive prefix sum in key order
    got = {r["_k"]: r["off"] for r in out.collect()}
    acc = 0
    for i in range(600):
        assert got[i] == acc
        acc += 1 + i % 5


def test_bm25_tf_fraction_survives_int64_overflow(spark):
    """The tf-fraction numerator TF_SCALE*44*A*tf is computed in
    DECIMAL(38,0): with a TF_SCALE large enough that the bigint product
    would wrap past 2^63, scores must still equal exact integer
    arithmetic (the pre-fix plan returned wrapped garbage here)."""
    from ummon_spark.datapipe.retrieval import bm25_topk

    rows = [
        (i, " ".join(["filler"] * (10 + i)) + " target" * (1 + i % 3))
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idf_scale, tf_scale = 100, 10**16

    # exact integer reference
    docs = {str(i): ("filler " * (10 + i) + "target " * (1 + i % 3)).split() for i in range(8)}
    n = len(docs)
    a = sum(len(t) for t in docs.values())
    tf = {d: toks.count("target") for d, toks in docs.items()}
    df_t = sum(1 for v in tf.values() if v > 0)
    idf = (2 * n - 2 * df_t + 1) * idf_scale // (2 * df_t + 1)
    expect = {}
    for d, toks in docs.items():
        if tf[d] == 0:
            continue
        dl = len(toks)
        frac = tf_scale * 44 * a * tf[d] // (20 * a * tf[d] + 6 * a + 18 * n * dl)
        assert tf_scale * 44 * a * tf[d] > 2**63, "test must exercise the overflow regime"
        expect[d] = idf * frac
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ["target"], k=8, idf_scale=idf_scale, tf_scale=tf_scale).collect()
    }
    assert got == expect
