"""Training-data operator tests: dedup families, similarity, text analysis,
multimodal plumbing -- determinism + semantic properties (LSH recall vs
exact ground truth) at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stratum_spark.operators import dedup, multimodal, similarity, textops


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup_groups(spark, docs):
    out = dedup.exact_dedup(docs)
    assert out.agg(F.sum("n_copies")).collect()[0][0] == docs.count()
    # with a planted duplicate the group collapses
    dup = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out2 = dedup.exact_dedup(docs.unionByName(dup))
    two = out2.where(F.col("n_copies") == 2).collect()
    assert len(two) == 1 and two[0]["keeper_id"] < 1_000_000


def test_ngram_jaccard_pairs_symmetric_planted(spark, docs):
    planted = docs.limit(1).withColumn("doc_id", F.lit(777_777))
    out = dedup.ngram_jaccard_pairs(docs.unionByName(planted), n=3, tau=0.9)
    hits = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    first_id = docs.orderBy("doc_id").first()["doc_id"]
    assert hits.get((first_id, 777_777)) == 1.0


def test_minhash_lsh_finds_planted_neardup(spark, docs):
    # plant a near-duplicate: same text with a few words changed
    base = docs.orderBy("doc_id").limit(1)
    near = base.select(
        F.lit(888_888).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail words here")).alias("text"),
        "lang", "source", "n_chars",
    )
    out = dedup.minhash_lsh_pairs(docs.unionByName(near), n=3, k=32, bands=8, tau=0.5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    first_id = base.first()["doc_id"]
    assert (first_id, 888_888) in pairs


def test_ngram_hot_shingle_capped(spark):
    """A stop-gram shared by EVERY doc must not explode the candidate join:
    with max_df binding, the hot posting list is cut, while true near-dups
    (which also share rare shingles) are still found with EXACT jaccard."""
    n = 1000
    rows = [(i, f"common stop phrase unique{i} word{i} tail{i} end{i}") for i in range(n)]
    rows.append((n, rows[7][1]))  # exact dup of doc 7 -> jaccard 1.0
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.ngram_jaccard_pairs(docs, n=3, tau=0.5, max_df=100).collect()
    assert {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out} == {(7, n, 1.0)}


def test_simhash_band_split_pigeonhole(spark):
    """Property: for ANY pair of 64-bit signatures within the configured
    Hamming radius, at least one interleaved sub-band matches exactly --
    the recall guarantee simhash_pairs' blocking relies on."""
    import random

    max_hamming = 7
    n_bands = max_hamming + 1
    rng = random.Random(42)
    rows = []
    for i in range(200):
        h = rng.getrandbits(63)  # bit 63 clear: both values stay valid int64
        mask = 0
        for b in rng.sample(range(63), max_hamming):
            mask |= 1 << b
        rows.append((h, h ^ mask))  # XOR popcount == max_hamming exactly
    df = spark.createDataFrame(rows, "a long, b long")
    band_eq = [
        (
            dedup._simhash_band(F.col("a"), b, n_bands)
            == dedup._simhash_band(F.col("b"), b, n_bands)
        ).cast("int")
        for b in range(n_bands)
    ]
    misses = df.where(sum(band_eq[1:], band_eq[0]) == 0).count()
    assert misses == 0


def test_simhash_properties(spark, docs):
    sh = docs.select(F.col("doc_id"), dedup.simhash64(F.col("text")).alias("h"))
    # deterministic
    a = {r["doc_id"]: r["h"] for r in sh.collect()}
    b = {r["doc_id"]: r["h"] for r in sh.collect()}
    assert a == b
    # identical text -> identical simhash -> hamming 0 pair found
    planted = docs.limit(1).withColumn("doc_id", F.lit(999_999))
    out = dedup.simhash_pairs(docs.unionByName(planted), max_hamming=3)
    first_id = docs.orderBy("doc_id").first()["doc_id"]
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    assert got.get((first_id, 999_999)) == 0


def test_brute_force_topk_shape_and_determinism(spark, emb):
    out = similarity.brute_force_topk(emb, n_queries=4, k=5).collect()
    assert len(out) == 20
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["sim"]))
    for q, rows in by_q.items():
        rows.sort()
        sims = [s for _, _, s in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(n != q for _, n, _ in rows)


def test_lsh_topk_recall_vs_exact(spark, emb):
    exact = similarity.brute_force_topk(emb, n_queries=8, k=5)
    approx = similarity.lsh_topk(emb, n_queries=8, k=5, n_planes=4, n_tables=16)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"LSH recall too low: {recall}"  # 16 tables x 4 planes


def test_embedding_neardup_self_planted(spark, emb):
    planted = emb.limit(1).withColumn("vec_id", F.lit(555_555))
    out = similarity.embedding_neardup_pairs(emb.unionByName(planted), tau=0.999)
    ids = {(r["id_a"], r["id_b"]) for r in out.collect()}
    first = emb.orderBy("vec_id").first()["vec_id"]
    assert (first, 555_555) in ids


def test_textops(spark, docs):
    tc = textops.token_counts(docs)
    row = tc.first()
    assert row["n_ws_tokens"] > 0 and row["n_re_tokens"] >= row["n_ws_tokens"] - 1

    q = textops.quality_scores(docs)
    assert q.where(F.col("quality") < 0).count() == 0
    assert q.where(F.col("quality") > 1).count() == 0

    lid = textops.language_id(docs)
    # the synthetic corpus is English word soup: 'the' dominates
    en = lid.where(F.col("guessed_lang") == "en").count()
    assert en > docs.count() * 0.5

    fp = textops.fingerprints(docs)
    assert fp.select("fingerprint").distinct().count() == docs.count()


def test_dup_clusters_planted_components(spark):
    from stratum_spark.operators.dedup import dup_clusters

    # component A: chain 1-2-3-4 (worst diameter); B: triangle 10,11,12;
    # C: pair 20-21. Non-dup docs never appear in pairs, so no row.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r["doc_id"]: r["cluster"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # survivors-to-keep = one canonical per cluster
    assert sorted({v for v in got.values()}) == [1, 10, 20]


def test_dup_clusters_long_chain_converges_in_log_rounds(spark):
    """Pointer jumping makes convergence O(log diameter): a 200-node
    chain (diameter 199) must converge well inside the default 25-round
    cap -- without the shortcutting step it needs 199 rounds."""
    from stratum_spark.operators.dedup import dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "doc_a bigint, doc_b bigint")
    got = {r["doc_id"]: r["cluster"] for r in dup_clusters(chain).collect()}
    assert got == {i: 0 for i in range(200)}


def test_contamination_pairs_planted_leak(spark):
    from stratum_spark.operators.dedup import contamination_pairs

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # leaked verbatim
            (2, "totally unrelated words apple banana cherry date"),
            (3, "quick brown fox jumps high today"),  # partial overlap
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    got = {(r["doc_id"], r["bench_id"]): r["shared"]
           for r in contamination_pairs(corpus, bench, n=3, min_shared=2).collect()}
    # doc 1 is a verbatim leak (all 7 distinct 3-grams shared); doc 3
    # shares 'quick brown fox' + 'brown fox jumps'; doc 2 shares nothing
    assert got == {(1, 100): 7, (3, 100): 2}
    # self-matches excluded when the benchmark is carved out of the corpus
    got_self = contamination_pairs(corpus, corpus.where("doc_id = 1"),
                                   n=3, min_shared=1).collect()
    assert all(r["doc_id"] != r["bench_id"] for r in got_self)
    # scale shape: the bench side must broadcast (no corpus-gram shuffle)
    plan = contamination_pairs(corpus, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_scores_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # grams: "a b a","b a b","a b a","b a b" -> 4 total, 2 distinct
            (2, "w x y z"),          # 2 grams, both distinct
            (3, "hi"),               # shorter than n: 1 whole-doc gram
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in textops.repetition_scores(df, n=3).collect()}
    assert (got[1]["n_grams"], got[1]["n_distinct_grams"]) == (4, 2)
    assert got[1]["rep_ratio"] == 0.5 and got[1]["repetitive"]
    assert (got[2]["n_grams"], got[2]["n_distinct_grams"]) == (2, 2)
    assert got[2]["rep_ratio"] == 0.0 and not got[2]["repetitive"]
    assert (got[3]["n_grams"], got[3]["n_distinct_grams"]) == (1, 1)


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith@corp.example.org or +1-555-0123 ok"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.io one phone 555-123-4567"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in textops.pii_scrub(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (1, 1)
    assert got[1]["redacted"] == "mail me at [EMAIL] or [PHONE] ok"
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (0, 0)
    assert got[2]["redacted"] == "no pii here at all"
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (2, 1)
    assert got[3]["redacted"] == "two mails [EMAIL] [EMAIL] one phone [PHONE]"


def test_multimodal_plumbing(spark, docs):
    media = multimodal.synth_media(docs)
    feats = multimodal.extract_features(media)
    got = {r["media_id"]: r for r in feats.collect()}
    assert len(got) == docs.count()
    sample = docs.orderBy("doc_id").first()
    f0 = got[sample["doc_id"]]
    assert f0["n_bytes"] == len(sample["text"].encode())
    assert f0["feature"][0] == float(f0["n_bytes"])
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in feats.collect()}
    assert all(got[k]["feature"] == again[k] for k in got)

    frames = multimodal.frame_sample(media, every_n=10)
    vid = media.where(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vid
    assert frames.where(F.col("frame_idx") % 10 != 0).count() == 0


def test_multimodal_image_kernel_guard_without_pil(spark, docs):
    """Where PIL is absent: kernel='image' refuses loudly, kernel='auto'
    falls back to the deterministic byte kernel."""
    import pytest as _pytest

    if multimodal._HAS_PIL:
        _pytest.skip("PIL installed; covered by the real-kernel test")
    media = multimodal.synth_media(docs)
    with _pytest.raises(ImportError):
        multimodal.extract_features(media, kernel="image")
    auto = {r["media_id"]: r["feature"]
            for r in multimodal.extract_features(media, kernel="auto").collect()}
    byte = {r["media_id"]: r["feature"]
            for r in multimodal.extract_features(media, kernel="bytes").collect()}
    assert auto == byte


def test_multimodal_real_image_decode_with_pil(spark):
    """REAL decode branch (skip-if-unavailable): tiny in-memory PNGs run
    through the same mapInPandas operator with kernel='image'; pixel
    stats (count, sum, max, min over the grayscale image) come back in
    the byte-kernel's feature shape."""
    import pytest as _pytest

    if not multimodal._HAS_PIL:
        _pytest.skip("PIL not installed in this environment")
    from io import BytesIO

    from PIL import Image

    def png(px):  # 2x2 grayscale png with constant pixel value
        img = Image.new("L", (2, 2), color=px)
        buf = BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, "image", bytearray(png(0)), (2, 2, 16000, 1)),
        (2, "image", bytearray(png(200)), (2, 2, 16000, 1)),
        (3, "audio", bytearray(b"\x01\x02\x03"), (0, 0, 16000, 1)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r["feature"]
           for r in multimodal.extract_features(media, kernel="image").collect()}
    assert got[1] == [4.0, 0.0, 0.0, 0.0]          # 4 px, all zero
    assert got[2] == [4.0, 800.0, 200.0, 200.0]    # 4 px of value 200
    assert got[3] == [3.0, 6.0, 3.0, 1.0]          # non-image: byte stats


def test_multimodal_real_audio_decode_with_wave(spark):
    """REAL audio decode branch (skip-if-unavailable, mirroring the PIL
    test): tiny in-memory 16-bit PCM WAVs run through the same
    mapInPandas operator with kernel='audio'; sample stats (count, sum,
    max, min) come back in the byte-kernel's feature shape, and non-WAV
    payloads degrade to byte stats via the RIFF sniff."""
    import pytest as _pytest

    if not multimodal._HAS_WAVE:
        _pytest.skip("stdlib wave module unavailable in this runtime")
    import struct
    import wave
    from io import BytesIO

    def wav(samples):  # mono 16-bit PCM @ 16 kHz
        buf = BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()

    rows = [
        (1, "audio", bytearray(wav([0, 100, -50, 25])), (0, 0, 16000, 1)),
        (2, "audio", bytearray(wav([-32768, 32767])), (0, 0, 16000, 1)),
        (3, "audio", bytearray(b"\x01\x02\x03"), (0, 0, 16000, 1)),  # not WAV
        (4, "image", bytearray(b"\x05\x06"), (2, 1, 16000, 1)),      # not audio
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r["feature"]
           for r in multimodal.extract_features(media, kernel="audio").collect()}
    assert got[1] == [4.0, 75.0, 100.0, -50.0]
    assert got[2] == [2.0, -1.0, 32767.0, -32768.0]
    assert got[3] == [3.0, 6.0, 3.0, 1.0]   # RIFF sniff -> byte stats
    assert got[4] == [2.0, 11.0, 6.0, 5.0]  # non-audio kind -> byte stats

    # 'auto' decodes audio kinds the same way (wave always available here)
    auto = {r["media_id"]: r["feature"]
            for r in multimodal.extract_features(media, kernel="auto").collect()}
    assert auto[1] == got[1] and auto[2] == got[2]


def test_multimodal_video_kernel_container_sniff_and_sampling(spark):
    """Video kernel (same (count, sum, max, min) shape as image/audio):
    recognized containers (MP4 ftyp / MKV EBML / AVI RIFF) get the
    deterministic frame-window byte sample; unknown payloads degrade to
    whole-payload byte stats; non-video kinds stay on the byte kernel."""
    mp4 = b"\x00\x00\x00\x18ftypisom" + bytes(range(200)) * 40  # 8012 B
    mkv = b"\x1aE\xdf\xa3" + bytes([7]) * 100
    avi = b"RIFF\x10\x00\x00\x00AVI " + bytes([9, 1]) * 50
    blob = bytes([3, 250, 7])  # not a container
    rows = [
        (1, "video", bytearray(mp4), (0, 0, 0, 30)),
        (2, "video", bytearray(mkv), (0, 0, 0, 30)),
        (3, "video", bytearray(avi), (0, 0, 0, 30)),
        (4, "video", bytearray(blob), (0, 0, 0, 30)),
        (5, "audio", bytearray(mp4), (0, 0, 16000, 1)),  # non-video kind
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r["feature"]
           for r in multimodal.extract_features(media, kernel="video").collect()}
    # oracle: recompute the documented sampling in-test
    def sampled(payload, n_samples=16, window=256):
        step = max(len(payload) // n_samples, 1)
        chunks = [payload[o:o + min(window, step)]
                  for o in range(0, len(payload), step)][:n_samples]
        return b"".join(chunks)
    for mid, payload in ((1, mp4), (2, mkv), (3, avi)):
        s = sampled(payload)
        # positions are length-deterministic; stats exact-integer
        assert got[mid][0] <= len(payload) and got[mid][0] > 0
        assert got[mid] == [float(len(s)), float(sum(s)),
                            float(max(s)), float(min(s))]
    assert got[4] == [3.0, 260.0, 250.0, 3.0]  # unknown container -> bytes
    assert got[5] == got[5] and got[5][0] == float(len(mp4))  # byte kernel
    # 'auto' routes video kinds through the same kernel
    auto = {r["media_id"]: r["feature"]
            for r in multimodal.extract_features(media, kernel="auto").collect()}
    assert auto[1] == got[1] and auto[4] == got[4]
    # determinism: a second pass is bit-identical
    again = {r["media_id"]: r["feature"]
             for r in multimodal.extract_features(media, kernel="video").collect()}
    assert again == got


def test_multimodal_real_video_decode_with_pyav(spark):
    """REAL keyframe decode branch -- skip-if-unavailable, mirroring the
    PIL image test: only runs where PyAV is installed."""
    import pytest as _pytest

    if not multimodal._HAS_AV:
        _pytest.skip("PyAV unavailable in this runtime")
    import av  # noqa: F401 pragma: no cover - exercised only with PyAV
    mp4 = b"\x00\x00\x00\x18ftypisom" + bytes(64)
    feats = multimodal._decode_video_real(mp4)
    assert len(feats) == 4
