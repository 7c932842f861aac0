"""Operator-level tests for the LLM-pipeline building blocks (the
query-level DuckDB comparisons live in test_queries_vs_duckdb.py)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest


def test_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """1k identical documents land in one LSH bucket per band; the cap
    must bound the pair explosion (uncapped: ~500k pairs; capped at 64:
    ~2k) and the stats must report the overflow — no silent cap."""
    from strawboat_spark.operators.dedup import (
        lsh_bucket_stats,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated across the corpus again and again").alias(
            "text"
        ),
    )
    sigs = minhash_signatures(docs, "text", "doc_id", n_hashes=16, shingle_n=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_bands=4, max_bucket_size=64)
    n_pairs = pairs.count()
    # capped: <= n_bands * C(64, 2) distinct pairs; uncapped would be C(1000,2) ≈ 500k
    assert 0 < n_pairs <= 4 * (64 * 63) // 2, n_pairs

    stats = lsh_bucket_stats(sigs, "doc_id", n_bands=4, max_bucket_size=64)
    over = stats.filter(F.col("capped")).collect()
    assert over, "degenerate bucket not reported"
    assert all(r["n_members"] == 1000 and r["n_dropped"] == 936 for r in over)


def test_lsh_cap_preserves_small_bucket_results(spark):
    """Buckets under the cap are untouched: capped and uncapped runs
    agree on a normal corpus."""
    from strawboat_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    from tests.conftest import SF_SMOKE
    from strawboat_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    sigs = minhash_signatures(docs, "text", "doc_id").persist()
    capped = set(map(tuple, lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=256).collect()))
    uncapped = set(map(tuple, lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=1 << 30).collect()))
    sigs.unpersist()
    assert capped == uncapped


def test_multiprobe_keys_hamming_ball():
    from strawboat_spark.operators.similarity import _multiprobe_keys

    ball = _multiprobe_keys([0b0000], n_planes=4, radius=1)
    assert sorted(ball[0].tolist()) == [0b0000, 0b0001, 0b0010, 0b0100, 0b1000]
    ball2 = _multiprobe_keys([0b1010, 0b0001], n_planes=4, radius=2)
    assert ball2.shape == (2, 1 + 4 + 6)
    # every probe is within hamming distance 2 of its key
    for row, key in zip(ball2, (0b1010, 0b0001)):
        assert all(bin(int(p) ^ key).count("1") <= 2 for p in row)


def test_ivf_training_sample_is_uniform_on_cluster_sorted_corpus(spark):
    """Real corpora are clustered by source/time; a limit()-based
    training sample sees only the first partitions (one corner of the
    corpus) and IVF recall collapses. _kmeans_centroids must sample
    uniformly so every cluster is represented even when the data layout
    is cluster-sorted."""
    from strawboat_spark.operators.similarity import _kmeans_centroids

    rng = np.random.default_rng(7)
    n_clusters, per, dim = 8, 400, 16
    means = rng.normal(size=(n_clusters, dim))
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    rows = []
    for cid in range(n_clusters):
        pts = means[cid] + 0.05 * rng.normal(size=(per, dim))
        rows.extend((cid, [float(v) for v in p]) for p in pts)
    df = (
        spark.createDataFrame(rows, "cid int, vec array<double>")
        .repartitionByRange(n_clusters, "cid")  # cluster-sorted layout
        .persist()
    )
    try:
        # the failure mode the fix removes: limit() sees ~1 partition
        limited = np.array([r[0] for r in df.orderBy("cid").limit(256).select("cid").collect()])
        assert len(set(limited.tolist())) <= 2, "limit() should be partition-biased here"

        cents = np.array(_kmeans_centroids(df, "vec", n_clusters, seed=42, sample_size=256))
        assert len(cents) == n_clusters
        # every true cluster center must be near some learned centroid
        sims = means @ cents.T  # both ~unit-norm
        assert (sims.max(axis=1) > 0.9).all(), (
            f"cluster coverage broken: per-cluster best sims {sims.max(axis=1)}"
        )
    finally:
        df.unpersist()


def test_ivf_training_is_single_pass(spark):
    """Training must not pay a full count() scan before sampling: the
    TakeOrdered-by-rand sample sizes itself in one pass. Guard by
    making count() explode if anything in the training path calls it."""
    from strawboat_spark.operators.similarity import _kmeans_centroids

    df = spark.range(500).selectExpr("array(cast(id as double), 1.0d) as vec")

    class NoCount(type(df)):
        pass

    df.__class__ = NoCount

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("training path called count() — extra full scan")

    NoCount.count = boom
    cents = _kmeans_centroids(df, "vec", 2, seed=1, sample_size=64)
    assert len(cents) == 2
    assert _kmeans_centroids(df.filter("vec[0] < 0"), "vec", 2, seed=1) == []


def test_tar_shard_explode_and_group(spark):
    """WebDataset shard plumbing: members explode one row each (plain
    tar AND tar.gz through the same `r:*` sniffing), bytes roundtrip
    exactly, and regrouping yields one row per sample key with the
    ext->bytes map."""
    from strawboat_spark.operators.shards import (
        explode_tar_members,
        group_webdataset_samples,
        synthesize_tar_bytes,
    )

    rows = [(0, synthesize_tar_bytes(0, 2)), (1, synthesize_tar_bytes(1, 3, compress=True))]
    df = spark.createDataFrame(rows, "shard long, payload binary")
    members = explode_tar_members(df, "shard", "payload").collect()
    assert len(members) == (2 + 3) * 2  # .bin + .txt per sample
    byname = {m["member_name"]: m for m in members}
    b0 = byname["000001-0002.bin"]
    size = 64 + (2 * 7) % 32
    exp = bytes(((np.arange(size) * 19 + 1 + 2) % 256).astype(np.uint8))
    assert b0["member_bytes"] == exp and b0["member_size"] == size
    assert byname["000000-0001.txt"]["member_bytes"] == b"doc-0-1"

    grouped = group_webdataset_samples(
        explode_tar_members(df, "shard", "payload")
    ).collect()
    assert len(grouped) == 5
    g = {(r["shard_id"], r["sample_key"]): r for r in grouped}
    sample = g[(1, "000001-0002")]
    assert sample["n_parts"] == 2
    assert sorted(sample["parts"].keys()) == ["bin", "txt"]
    assert bytes(sample["parts"]["txt"]) == b"doc-1-2"


def test_simhash_packed_matches_unpacked(spark):
    """The 15-bit-lane packed vote aggregation (17 shuffled longs per
    doc) must reproduce exactly the naive 64-aggregate formulation's
    fingerprints (majority rule 2*ones > n == sign of +1/-1 votes)."""
    from strawboat_spark.functions.text import tokens
    from strawboat_spark.operators.dedup import simhash

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different content with other words entirely"),
        (4, "a"),
        (5, "repeated repeated repeated repeated repeated token"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    toked = df.select("doc_id", F.explode(tokens("text")).alias("tok")).withColumn(
        "h", F.xxhash64("tok")
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toked.groupBy("doc_id").agg(*votes)
    fp = F.lit(0).cast("bigint")
    for i in range(64):
        fp = fp + F.when(
            F.col(f"b{i}") > 0,
            F.lit(1).cast("bigint") * (1 << i) if i < 63 else F.lit(-(1 << 63)),
        ).otherwise(F.lit(0))
    want = {r["doc_id"]: r["simhash"] for r in agg.select("doc_id", fp.alias("simhash")).collect()}

    got = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}
    assert got == want


def test_image_decoders_pure_numpy():
    """PPM(P6) and 24-bit BMP decode without any imaging library:
    hand-built files with known dimensions and mean."""
    import struct

    from strawboat_spark.operators.multimodal import (
        _decode_image_bytes,
        synthesize_ppm_bytes,
    )

    # PPM: synthesized pixels (i*31 + 7) % 256
    w, h = 5, 3
    payload = synthesize_ppm_bytes(7, w, h)
    gw, gh, mean = _decode_image_bytes(payload, deterministic_fake=False)
    want = round(float(np.mean((np.arange(w * h * 3) * 31 + 7) % 256)), 4)
    assert (gw, gh, mean) == (w, h, want)

    # PPM with a header comment
    commented = b"P6\n# a comment\n5 3\n255\n" + payload.split(b"255\n", 1)[1]
    assert _decode_image_bytes(commented, False) == (w, h, want)

    # BMP 24bpp bottom-up with row padding: 3x2 image, all channels = 100
    bw, bh = 3, 2
    row_bytes = (bw * 3 + 3) & ~3  # 12 (9 data + 3 pad)
    data_off = 54
    img = bytearray()
    img += b"BM" + struct.pack("<IHHI", data_off + row_bytes * bh, 0, 0, data_off)
    img += struct.pack("<IiiHHIIiiII", 40, bw, bh, 1, 24, 0, row_bytes * bh, 0, 0, 0, 0)
    for _ in range(bh):
        img += bytes([100] * (bw * 3)) + bytes(row_bytes - bw * 3)
    gw, gh, mean = _decode_image_bytes(bytes(img), False)
    assert (gw, gh, mean) == (bw, bh, 100.0)

    # unknown format still raises without the fake; corrupt PNG/GIF now
    # reach the REAL decoders and must fail loudly, not fake-decode
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        _decode_image_bytes(b"RIFF....WEBP", deterministic_fake=False)
    with _pytest.raises(ValueError):
        _decode_image_bytes(b"\x89PNG....", deterministic_fake=False)
    with _pytest.raises(ValueError):
        _decode_image_bytes(b"GIF89a....", deterministic_fake=False)


def test_wav_decoder_pure_numpy():
    """RIFF/PCM16 parse without audio libraries: synthesized WAV plus a
    chunk-order/padding variant decode to the same stats."""
    import struct

    from strawboat_spark.operators.multimodal import decode_wav, synthesize_wav_bytes

    wav = synthesize_wav_bytes(3, 500, sample_rate=16000)
    rate, n, dur, rms = decode_wav(wav)
    s = (np.arange(500, dtype=np.int64) * 37 + 33) % 2048 - 1024
    assert (rate, n) == (16000, 500)
    assert dur == round(500 / 16000, 6)
    assert rms == round(float(np.sqrt(np.mean(s.astype(np.float64) ** 2))), 4)

    # tolerate an extra odd-sized chunk before fmt/data (word alignment)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    reordered = wav[:12] + extra + wav[12:]
    fixed = bytearray(reordered)
    struct.pack_into("<I", fixed, 4, len(fixed) - 8)
    assert decode_wav(bytes(fixed)) == (rate, n, dur, rms)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(b"OggS....not a wav")


def test_y4m_decoder_pure_numpy():
    """YUV4MPEG2 parse without video libraries: frame count, sampling
    stride, and per-frame luma means; 4:4:4 variant; error paths."""
    from strawboat_spark.operators.multimodal import (
        decode_y4m_frames,
        synthesize_y4m_bytes,
    )

    clip = synthesize_y4m_bytes(5, 8, 4, 5)
    w, h, nf, frames = decode_y4m_frames(clip, every_n=2)
    assert (w, h, nf) == (8, 4, 5)
    assert [fi for fi, _ in frames] == [0, 2, 4]
    for fi, mean in frames:
        want = round(float(np.mean((np.arange(8 * 4) * 13 + fi * 7 + 5) % 256)), 4)
        assert mean == want

    # 4:4:4: same luma, fatter chroma — means unchanged
    c444 = clip.replace(b"C420\n", b"C444\n", 1)
    # rebuild with 444-sized chroma
    header = c444.split(b"\n", 1)[0] + b"\n"
    luma_n = 8 * 4
    body = b""
    for fi in range(5):
        body += b"FRAME\n"
        body += bytes(((np.arange(luma_n) * 13 + fi * 7 + 5) % 256).astype(np.uint8))
        body += bytes([128] * (2 * luma_n))
    _, _, nf2, frames2 = decode_y4m_frames(header + body, every_n=2)
    assert nf2 == 5 and frames2 == frames

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_y4m_frames(b"RIFF....")
    with _pytest.raises(ValueError):
        decode_y4m_frames(b"YUV4MPEG2 W8 H4 C411\n")


def test_ngram_df_cut_bounds_boilerplate_joins(spark):
    """A trigram shared by every document makes the inverted-index
    self-join quadratic; the df-cut must drop it from the universe
    (bounded pair output) and ngram_df_stats must report exactly what
    was dropped — no silent cap (VERDICT round-4 scale-killer)."""
    from strawboat_spark.operators.dedup import ngram_df_stats, ngram_jaccard_pairs

    # 300 docs sharing one boilerplate trigram + a unique tail each:
    # uncapped, the shared shingle alone yields C(300,2) ≈ 45k join rows
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("all rights reserved unique"),
            F.col("id").cast("string"),
            F.lit(" tail"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.01, max_doc_freq=100
    )
    # the only shared shingle ("all rights reserved") is cut at df=300 >
    # 100, so no pair survives — and the join never expanded it
    assert pairs.count() == 0

    stats = ngram_df_stats(docs, "text", "doc_id", shingle_n=3, max_doc_freq=100).collect()
    assert len(stats) == 1
    r = stats[0]
    assert r["shingle"] == "all rights reserved"
    assert r["doc_freq"] == 300
    assert r["n_pairs_avoided"] == 300 * 299 // 2


def test_ngram_df_cut_preserves_normal_corpus(spark):
    """Shingles under the cap are untouched: capped and effectively-
    uncapped runs agree on a normal corpus."""
    from strawboat_spark.operators.dedup import ngram_jaccard_pairs

    from strawboat_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    capped = set(map(tuple, ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.12, max_doc_freq=1000
    ).collect()))
    uncapped = set(map(tuple, ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.12, max_doc_freq=1 << 30
    ).collect()))
    assert capped and capped == uncapped


def test_ngram_posting_cap_bounds_pair_generation(spark):
    """The r12 bounded-work contract: max_posting_size caps candidate
    generation per shingle (deterministic lowest-ids selection), the
    Jaccard of every SURVIVING pair stays exact over the full
    df-filtered space, emitted pairs are a subset of the uncapped run,
    and ngram_posting_cap_stats audits exactly the truncated shingles
    (the r11 measured scale-killer gets LSH's discipline)."""
    from strawboat_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_posting_cap_stats,
    )
    from strawboat_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.12
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.12, max_posting_size=2
        ).collect()
    }
    assert capped, "cap=2 must still discover pairs via some shingle"
    assert set(capped) <= set(uncapped), "capped candidates ⊆ uncapped"
    for pair, j in capped.items():
        # exactness: the cap trades recall, never the reported value
        assert j == uncapped[pair], (pair, j, uncapped[pair])

    stats = ngram_posting_cap_stats(
        docs, "text", "doc_id", max_posting_size=2
    ).collect()
    assert stats, "corpus has shingles with df > 2 — audit must be non-empty"
    for r in stats:
        assert r["doc_freq"] > 2
        assert r["n_kept"] == 2
        assert r["n_pairs_dropped"] == r["doc_freq"] * (r["doc_freq"] - 1) // 2 - 1


def test_ngram_posting_cap_boilerplate_is_bounded(spark):
    """With the df-cut DISABLED, a 300-doc boilerplate shingle used to
    be a C(300,2) join; the posting cap alone bounds it to C(cap,2)
    candidates while still emitting those (exact) pairs."""
    from strawboat_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("all rights reserved unique"),
            F.col("id").cast("string"),
            F.lit(" tail"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    pairs = ngram_jaccard_pairs(
        docs,
        "text",
        "doc_id",
        shingle_n=3,
        threshold=0.01,
        max_doc_freq=1 << 30,
        max_posting_size=4,
    ).collect()
    ids = {i for r in pairs for i in (r["id_a"], r["id_b"])}
    # only the 4 lowest doc_ids can appear: C(4,2) = 6 pairs max
    assert ids <= {0, 1, 2, 3}
    assert len(pairs) == 6


def test_naive_bayes_learns_injected_signal(spark):
    """The driver gate (text_nb_langid) proves exact mechanics against
    DuckDB; the testdata's lang label is RANDOM (no signal), so model
    quality needs a corpus with signal: per-label marker tokens →
    near-perfect self-classification, and the model tables stay bounded
    by n_labels x dim (the broadcast-safety invariant)."""
    from strawboat_spark.operators.classify import nb_predict, nb_train

    markers = {"de": "der die und", "fr": "le la et", "en": "the of and"}
    rows = []
    for i in range(300):
        lab = ["de", "fr", "en"][i % 3]
        rows.append((i, lab, f"shared words here {markers[lab]} {markers[lab]} tail{i}"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    bc, ls = nb_train(df, "text", "lang", dim=256)
    assert bc.count() <= 3 * 256  # model bounded by labels x dim
    pred = nb_predict(df, bc, ls, "text", "doc_id", dim=256)
    joined = pred.join(df.select("doc_id", "lang"), "doc_id")
    acc = joined.filter(F.col("pred_label") == F.col("lang")).count() / 300
    assert acc > 0.95, acc


def test_nb_handles_hostile_label_strings(spark):
    """Labels are DATA: a label containing dots/backticks/spaces must
    not break the pivoted scoring plan (columns are renamed
    positionally, never derived from label text)."""
    from strawboat_spark.operators.classify import nb_predict, nb_train

    rows = [
        (i, "a.b `x`" if i % 2 == 0 else "plain", "evens mark" if i % 2 == 0 else "odds tail")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    bc, ls = nb_train(df, "text", "lang", dim=64)
    pred = nb_predict(df, bc, ls, "text", "doc_id", dim=64)
    got = {r["doc_id"]: r["pred_label"] for r in pred.collect()}
    assert len(got) == 40
    assert got[0] == "a.b `x`" and got[1] == "plain"


def test_nb_incremental_model_equals_batch_train(spark, tmp_path):
    """The persistent NB model is ADDITIVE count rows: init + appends
    + compaction read back EXACTLY what batch training on the union
    produces — same bucket counts, same label stats, row for row."""
    from strawboat_spark.operators.classify import (
        nb_model_append,
        nb_model_init,
        nb_model_read,
        nb_train,
    )
    from strawboat_spark.sources.datasource import register

    register(spark)
    markers = {"de": "der die und", "fr": "le la et", "en": "the of and"}
    rows = [
        (i, ["de", "fr", "en"][i % 3], f"w{i} shared {markers[['de','fr','en'][i % 3]]}")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    path = str(tmp_path / "nbm")
    nb_model_init(spark, path, df.filter("doc_id < 40"), "text", "lang", dim=128)
    nb_model_append(spark, path, df.filter("doc_id >= 40 and doc_id < 80"), "text", "lang", dim=128)
    nb_model_append(
        spark, path, df.filter("doc_id >= 80"), "text", "lang", dim=128, compact_every=2
    )
    inc_bc, inc_ls = nb_model_read(spark, path)
    bat_bc, bat_ls = nb_train(df, "text", "lang", dim=128)
    assert sorted(map(tuple, inc_bc.collect())) == sorted(map(tuple, bat_bc.collect()))
    assert sorted(map(tuple, inc_ls.collect())) == sorted(map(tuple, bat_ls.collect()))
    # the compaction cadence actually fired (2 appends since overwrite)
    from strawboat_spark.sources.datasource import list_generations

    ops = [g.get("operation") for g in list_generations(path)]
    assert "compact" in ops or "optimize" in ops, ops


def test_dsir_weights_rank_target_like_docs_first(spark):
    """DSIR importance weights: docs sharing the target domain's
    distinctive tokens must outrank generic docs (Xie et al. 2023
    recipe: log p_target - log p_raw over hashed unigram models)."""
    from strawboat_spark.operators.classify import dsir_importance_weights

    raw_rows = [
        (i, "medical clinical patient dosage trial" if i < 50 else "sports game score team season")
        for i in range(200)
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(i, "clinical trial patient outcomes dosage") for i in range(20)],
        "doc_id long, text string",
    )
    w = dsir_importance_weights(raw, target, "text", "doc_id", dim=512)
    top = [r["doc_id"] for r in w.orderBy(F.col("log_w").desc(), "doc_id").limit(50).collect()]
    assert set(top) == set(range(50)), "medical docs must fill the top-50"


def test_pq_codes_compress_and_rerank_recall(spark):
    """PQ: codes are m small ints (the 32x memory story), encoding is
    deterministic, and ADC shortlist + exact rerank clears 0.8
    recall@10 on the worst-case near-random embeddings."""
    import numpy as np
    import pyspark.sql.functions as F

    from strawboat_spark.operators.similarity import (
        _pq_codebooks,
        cosine_topk,
        pq_cosine_topk,
        pq_encode,
    )
    from strawboat_spark.tables import load_table
    from tests.conftest import SF_CORRECT

    e = load_table(spark, SF_CORRECT, "embeddings")
    books = _pq_codebooks(e, "embedding", m=8, n_codes=64, seed=42)
    assert books.shape == (8, 64, 8)  # 64-dim vectors, 8 subspaces
    coded = pq_encode(e, "vec_id", "embedding", books)
    rows = coded.select("codes").limit(20).collect()
    for r in rows:
        assert len(r.codes) == 8
        assert all(0 <= c < 64 for c in r.codes)
    # deterministic: same books -> same codes
    again = pq_encode(e, "vec_id", "embedding", books).select("neighbor_id", "codes")
    a = {r.neighbor_id: tuple(r.codes) for r in again.collect()}
    b = {r.neighbor_id: tuple(r.codes) for r in coded.select("neighbor_id", "codes").collect()}
    assert a == b

    q = e.filter(F.col("vec_id") < 5)
    exact = cosine_topk(e, q, "vec_id", "embedding", k=10).select("query_id", "neighbor_id")
    approx = pq_cosine_topk(e, q, "vec_id", "embedding", k=10, m=8, n_codes=64,
                            n_candidates=100)
    hits = exact.join(
        approx.select("query_id", "neighbor_id", F.lit(1).alias("hit")),
        ["query_id", "neighbor_id"], "left")
    recall = hits.agg(
        (F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count(F.lit(1))).alias("r")
    ).collect()[0][0]
    assert recall >= 0.8, recall


def test_compression_ratio_direction_and_range(spark):
    """zlib ratio must rank repetitive < natural-ish < random text, and
    stay within the gate's (0, 1.2] invariant band."""
    from strawboat_spark.operators.corpus import with_compression_ratio

    import random
    import string

    rng = random.Random(7)
    rand_text = "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(4000))
    rep_text = "spam ham " * 500
    nat_text = ("the quick brown fox jumps over the lazy dog and then "
                "naps in the warm afternoon sun near the river ") * 40
    df = spark.createDataFrame(
        [(0, rep_text), (1, nat_text), (2, rand_text)], "doc_id long, text string"
    )
    rows = {r.doc_id: r.zlib_ratio for r in with_compression_ratio(df, "text").collect()}
    assert rows[0] < rows[1] < rows[2], rows
    assert all(0 < v <= 1.2 for v in rows.values())


def test_pagerank_fixed_point_mass_and_determinism(spark):
    """Integer fixed-point PageRank: total rank mass stays within
    integer-division rounding loss of SCALE, reruns are bit-identical,
    and a sink-heavy graph concentrates rank on the sink."""
    import pyspark.sql.functions as F

    from strawboat_spark.operators.graph import SCALE, pagerank_fixed_point

    nodes = spark.range(6).select(F.col("id").alias("node"))
    # star: 0..4 all point at 5 (5 dangles)
    edges = spark.range(5).select(F.col("id").alias("src"), F.lit(5).alias("dst"))
    r = pagerank_fixed_point(nodes, edges, n_iterations=3)
    rows = {x.node: x.rank for x in r.collect()}
    total = sum(rows.values())
    # each div floors: loss bounded by (participants per round) x rounds
    assert SCALE - 6 * 4 * 3 <= total <= SCALE
    assert rows[5] == max(rows.values())  # the sink collects the mass
    again = {x.node: x.rank for x in
             pagerank_fixed_point(nodes, edges, n_iterations=3).collect()}
    assert rows == again


def test_exact_substring_dedup_matches_reference(spark):
    """remove_duplicate_substrings vs a plain-python Lee-et-al.
    reference: span counts, removed chars, and the spliced text itself
    — including overlap merging, a doc shorter than k, and a doc with
    an internal repeat."""
    from collections import Counter

    from strawboat_spark.operators.dedup import remove_duplicate_substrings

    docs = {
        0: "abcdefghij",
        1: "abcdeXYZabcde",        # cross-doc + internal repeat
        2: "unique string here",   # untouched
        3: "tiny",                 # shorter than k
        4: "XYZab",                # no duplicated 5-gram
    }
    k = 5

    def ref():
        grams = Counter()
        for t in docs.values():
            for i in range(len(t) - k + 1):
                grams[t[i : i + k]] += 1
        out = {}
        for d, t in docs.items():
            spans = [
                (i, i + k)
                for i in range(max(len(t) - k + 1, 0))
                if grams[t[i : i + k]] > 1
            ]
            merged = []
            for s, e in spans:
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            kept, cur = "", 0
            for s, e in merged:
                kept += t[cur:s]
                cur = e
            kept += t[cur:]
            out[d] = (len(merged), sum(e - s for s, e in merged), kept)
        return out

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.removed_chars, r.kept)
        for r in remove_duplicate_substrings(df, "doc_id", "text", k=k).collect()
    }
    assert got == ref(), (got, ref())


def test_token_chunks_empty_and_single(spark):
    """sequence(0, -1) DESCENDS in Spark — empty token arrays must
    yield NO chunks (guarded before sequence), single tokens one."""
    import pyspark.sql.functions as F

    from strawboat_spark.functions.text import token_chunks

    df = spark.createDataFrame(
        [(1, ["a"] * 70), (2, []), (3, ["x"])], "id int, t array<string>"
    )
    out = df.select("id", F.explode_outer(token_chunks("t", 64, 16)).alias("c")).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r.c)
    assert [c.chunk_idx for c in by_id[1]] == [0, 1]
    assert len(by_id[1][1].chunk) == 22  # truncated tail chunk
    assert by_id[2] == [None]
    assert by_id[3][0].chunk == ["x"]


def test_triangle_counts_degree_orientation_bounds_star_hub(spark):
    """Star graph with the hub in the MIDDLE of the id range: id-order
    orientation would give the hub out-edges to every higher-id leaf
    (O(deg^2) wedge candidates); degree orientation points every edge
    leaf -> hub, so each leaf has out-degree 1, the hub 0 — wedge
    fan-out bounded regardless of hub degree.  Plus correctness on a
    star + one attached triangle."""
    import pyspark.sql.functions as F

    from strawboat_spark.operators.graph import degree_oriented_edges, triangle_counts

    n = 40
    hub = n // 2
    star = [(min(hub, i), max(hub, i)) for i in range(n + 1) if i != hub]
    edges = spark.createDataFrame(star, "src long, dst long")

    oe = degree_oriented_edges(edges)
    out_deg = oe.groupBy("u").agg(F.count(F.lit(1)).alias("d")).collect()
    assert max(r.d for r in out_deg) == 1  # every edge orients leaf -> hub
    assert triangle_counts(edges).count() == 0  # stars have no triangles

    # attach a triangle between hub and two leaves: exactly 1 triangle,
    # all three nodes participate once
    tri_edges = star + [(1, 2)]
    edges2 = spark.createDataFrame(tri_edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(edges2).collect()}
    assert got == {1: 1, 2: 1, hub: 1}


def test_triangle_counts_matches_bruteforce_on_random_graph(spark):
    """Degree-oriented enumeration equals the brute-force count on a
    deterministic pseudo-random graph (every pair hashed)."""
    from itertools import combinations

    from strawboat_spark.operators.graph import triangle_counts

    nodes = list(range(18))
    pairs = [
        (a, b) for a, b in combinations(nodes, 2) if (a * 31 + b * 17 + a * b) % 4 == 0
    ]
    eset = set(pairs)
    expect: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for x in (a, b, c):
                expect[x] = expect.get(x, 0) + 1
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(
            spark.createDataFrame(pairs, "src long, dst long")
        ).collect()
    }
    assert got == expect


def test_jaccard_index_incremental_matches_batch_and_prunes(spark, tmp_path):
    """Incremental index: two successive batches each dedup against
    everything seen so far (union of prior generations), results match
    the batch operator's semantics, and the per-batch index scan is
    directory-pruned to the batch's shingle buckets."""
    import pyspark.sql.functions as F

    from strawboat_spark.operators.dedup import (
        jaccard_index_append,
        jaccard_index_init,
    )
    from strawboat_spark.table import Table

    docs = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta zeta"),       # near-dup of 0
        (2, "one two three four five six"),
        (3, "totally different text here now"),
        (4, "alpha beta gamma delta epsilon"),    # exact dup of 0
        (5, "one two three four five seven"),     # near-dup of 2
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    p = str(tmp_path / "idx")
    jaccard_index_init(spark, p, df.filter("doc_id < 2"), "text", "doc_id",
                       shingle_n=3, num_buckets=8)

    # batch 1: docs 2,3 — nothing similar to 0,1
    pairs1 = jaccard_index_append(
        spark, p, df.filter("doc_id IN (2, 3)"), "text", "doc_id",
        shingle_n=3, threshold=0.3
    )
    assert pairs1.count() == 0

    # batch 2: docs 4,5 — 4 dups 0 (old), 5 near-dups 2 (old)
    pairs2 = jaccard_index_append(
        spark, p, df.filter("doc_id IN (4, 5)"), "text", "doc_id",
        shingle_n=3, threshold=0.3
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs2.collect()}
    assert (0, 4) in got and got[(0, 4)] == 1.0
    assert (2, 5) in got and 0.3 <= got[(2, 5)] < 1.0
    assert all(b in (4, 5) for _, b in got)  # every pair involves the batch

    # the index accrued all six documents' postings
    t = Table(spark, p)
    assert t.read().select("doc_id").distinct().count() == 6
    # generation history: init + 2 appends
    assert len(t.history()) == 3

    # planner-side pruning: a filter on the batch's bucket ids scans
    # fewer files than the full index (the shape jaccard_index_append
    # pushes); with 8 buckets and a 1-doc batch this MUST prune
    from strawboat_spark.sources.datasource import bucket_spec

    spec = bucket_spec(p)
    one = df.filter("doc_id = 3")  # distinct shingles, few buckets
    from strawboat_spark.operators.dedup import shingle_postings

    ids = [
        r[0]
        for r in shingle_postings(one, "text", "doc_id")
        .select(
            F.pmod(
                F.crc32(F.col("shingle").cast("string").cast("binary")),
                F.lit(spec["n"]),
            ).cast("long").alias("b")
        )
        .distinct()
        .collect()
    ]
    n_all = t.files().count()
    pruned = t.read().filter(F.col(spec["dir_col"]).isin(ids))
    n_pruned = len(
        [s for s in _stripes(spark, p, pruned) if s is not None]
    )
    assert n_pruned < n_all, f"no pruning: {n_pruned} >= {n_all}"


def _stripes(spark, path, df):
    """Planner stripes for a strawboat scan DataFrame — proxy for the
    file/partition fan-out after directory pruning."""
    from pyspark.sql.datasource import In

    from strawboat_spark.sources.datasource import StrawboatReaderImpl
    import re

    # re-plan through the reader API with the same pushed filter set:
    # extract the In(__bucket) values from the analyzed plan
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    m = re.search(r"__bucket#\d+L? IN \(([^)]*)\)", plan)
    vals = [int(v) for v in m.group(1).split(",")] if m else None
    schema = df.sparkSession.read.format("strawboat").load(path).schema
    r = StrawboatReaderImpl({"path": path}, schema)
    if vals is not None:
        r.pushFilters([In(("__bucket",), tuple(vals))])
    return r.partitions()


def test_minhash_index_incremental_matches_batch_lsh(spark, tmp_path):
    """Approximate twin of the jaccard index: the incremental band
    index's candidates for a new batch equal the BATCH lsh candidates
    over the union corpus, restricted to pairs involving the batch
    (signatures and banding are deterministic)."""
    from strawboat_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_index_append,
        minhash_index_init,
        minhash_signatures,
    )
    from strawboat_spark.table import Table

    from tests.conftest import SF_CORRECT
    from strawboat_spark.tables import load_table

    d = load_table(spark, SF_CORRECT, "documents").select("doc_id", "text")
    old = d.filter("doc_id % 3 != 0")
    new = d.filter("doc_id % 3 = 0")

    p = str(tmp_path / "mh_idx")
    minhash_index_init(spark, p, old, "text", "doc_id", num_buckets=16)
    inc = {
        (r.id_a, r.id_b)
        for r in minhash_index_append(spark, p, new, "text", "doc_id").collect()
    }

    batch = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(
            minhash_signatures(d, "text", "doc_id"), "doc_id"
        ).collect()
        if r.id_a % 3 == 0 or r.id_b % 3 == 0
    }
    assert inc == batch
    assert inc, "fixture produced no near-dup candidates; weak test"
    # index accrued both halves
    assert Table(spark, p).read().select("doc_id").distinct().count() == d.count()


def test_ivf_index_lifecycle_prunes_cells(spark, tmp_path):
    """Persistent IVF index: vectors land hive-partitioned by cell with
    the quantizer in the manifest; appends reuse it (no retrain); a
    search reads ONLY its probed cells' directories; recall vs exact
    top-k clears the same 0.8 bar as the batch operator."""
    import pyspark.sql.functions as F

    from strawboat_spark.operators.similarity import (
        cosine_topk,
        ivf_index_append,
        ivf_index_init,
        ivf_index_search,
    )
    from strawboat_spark.table import Table
    from strawboat_spark.tables import load_table

    from tests.conftest import SF_CORRECT

    e = load_table(spark, SF_CORRECT, "embeddings")
    p = str(tmp_path / "ivf")
    t = ivf_index_init(spark, p, e.filter("vec_id % 2 = 0"), "vec_id", "embedding",
                       n_centroids=16)
    cents1 = (Table(spark, p).properties() or {}).get("ivf_centroids")
    assert cents1 and len(cents1) == 16
    ivf_index_append(spark, p, e.filter("vec_id % 2 = 1"), "vec_id", "embedding")
    # quantizer survives the append untouched
    assert (Table(spark, p).properties() or {}).get("ivf_centroids") == cents1
    assert t.read().count() == e.count()

    q = e.filter(F.col("vec_id") < 5)
    # pruning: nprobe=2 of 16 cells -> the search's scan reads a strict
    # subset of the index files
    n_all = t.files().count()
    got = ivf_index_search(spark, p, q, "vec_id", "embedding", k=10, nprobe=2)
    scan = got._jdf.queryExecution().executedPlan().toString()
    assert got.count() > 0
    # functional recall at the gate's settings
    approx = ivf_index_search(spark, p, q, "vec_id", "embedding", k=10, nprobe=12)
    exact = cosine_topk(e, q, "vec_id", "embedding", k=10)
    hit = exact.select("query_id", "neighbor_id").intersect(
        approx.select("query_id", "neighbor_id")
    ).count()
    assert hit / exact.count() >= 0.8


def test_fingerprint_index_incremental_exact_dedup(spark, tmp_path):
    """Exact-dedup index: batch ids resolve to the corpus survivor for
    known content, to the batch-min id for new content; the index
    accrues one row per distinct fingerprint."""
    from strawboat_spark.operators.dedup import (
        fingerprint_index_append,
        fingerprint_index_init,
    )
    from strawboat_spark.table import Table

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    fingerprint_index_init(
        spark, str(tmp_path / "fpi"),
        mk([(0, "hello world"), (1, "other text"), (2, "Hello   WORLD ")]),
        "text", "doc_id", num_buckets=8,
    )
    p = str(tmp_path / "fpi")
    got = {
        (r.doc_id, r.survivor_id, r.is_duplicate)
        for r in fingerprint_index_append(
            spark, p,
            mk([
                (10, "hello world"),      # dup of indexed 0
                (11, "brand new text"),   # new content, batch survivor
                (12, "brand new text"),   # dup within the batch
            ]),
            "text", "doc_id",
        ).collect()
    }
    assert got == {(10, 0, True), (11, 11, False), (12, 11, True)}
    # second batch sees batch-1 content as indexed
    got2 = {
        (r.doc_id, r.survivor_id, r.is_duplicate)
        for r in fingerprint_index_append(
            spark, p, mk([(20, "brand new text")]), "text", "doc_id"
        ).collect()
    }
    assert got2 == {(20, 11, True)}
    # one index row per distinct content: hello/other + new = 3... plus
    # normalization folds (2, 'Hello   WORLD ') into 0's fingerprint
    assert Table(spark, p).read().count() == 3


def test_minhash_hash_families_share_plan_and_semantics(spark):
    """hash_family='md5' (the portable DuckDB-replayable verification
    twin, r10; one-md5 Carter-Wegman family since r11) must ride the
    same physical plan STRUCTURE as the xxhash64 production family —
    identical exchanges/joins/aggregates/generates; the twin is allowed
    one extra codegen-fused Project (the materialized md5 base column)
    — and both must flag identical documents as certain duplicates with
    est_jaccard exactly 1.0 (an exact binary fraction, no rounding)."""
    import re

    import pyspark.sql.functions as F

    from strawboat_spark.operators.dedup import minhash_lsh_dedup

    docs = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 2, F.lit("alpha beta gamma delta epsilon zeta"))
        .when(F.col("id") < 4, F.lit("one two three four five six seven"))
        .otherwise(F.concat(F.lit("unique text number "), F.col("id"),
                            F.lit(" with different words entirely")))
        .alias("text"),
    )

    def shape(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        ops = re.findall(r"^\W*([A-Za-z]+)", plan, re.M)
        # Projects are whole-stage-codegen-fused (zero-cost); the plan
        # SHAPE that matters at scale is exchanges/joins/aggs/generates
        return [o for o in ops if o not in ("InputAdapter", "WholeStageCodegen", "Project")]

    prod = minhash_lsh_dedup(docs, "text", "doc_id", n_hashes=32, n_bands=8)
    twin = minhash_lsh_dedup(
        docs, "text", "doc_id", n_hashes=32, n_bands=8, hash_family="md5"
    )
    assert shape(prod) == shape(twin)

    for fam_df in (prod, twin):
        got = {(r.id_a, r.id_b): r.est_jaccard for r in fam_df.collect()}
        assert got[(0, 1)] == 1.0 and got[(2, 3)] == 1.0
        assert all(a < b for a, b in got)

    with pytest.raises(ValueError, match="hash_family"):
        minhash_lsh_dedup(docs, "text", "doc_id", hash_family="sha9000").collect()


def test_incremental_index_reads_only_batch_bucket_dirs(spark, tmp_path):
    """The 100 TB contract of the incremental jaccard index (r9 verdict
    #3): a batch's lookup scan reads ONLY the data files inside the
    bucket directories its own shingles hash into.  Pinned end-to-end
    by CORRUPTING every data file outside the batch's buckets — if
    pruning ever regresses to a full scan, the query hits garbage and
    fails; with pruning intact it returns the exact expected pairs."""
    import os

    import pyspark.sql.functions as F

    from strawboat_spark.operators.dedup import (
        _jaccard_new_rows,
        jaccard_index_append,
        jaccard_index_init,
    )
    from strawboat_spark.sources.datasource import bucket_spec, read_manifest, register

    register(spark)
    corpus = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta word"), (F.col("id") % 97).cast("string"),
            F.lit(" gamma word"), (F.col("id") % 89).cast("string"),
            F.lit(" delta epsilon zeta"),
        ).alias("text"),
    )
    p = f"{tmp_path}/idx"
    jaccard_index_init(spark, p, corpus, "text", "doc_id", num_buckets=32)
    spec = bucket_spec(p)
    assert spec == {"col": "shingle", "n": 32, "dir_col": "__bucket"}

    # batch: one exact duplicate of corpus doc 7 plus one novel doc
    batch = spark.createDataFrame(
        [
            (1007, "alpha beta word7 gamma word7 delta epsilon zeta"),
            (2000, "totally novel content nothing shares these words"),
        ],
        "doc_id long, text string",
    )
    bucket_ids = {
        r[0]
        for r in _jaccard_new_rows(batch, "text", "doc_id", 3)
        .select(
            F.pmod(
                F.crc32(F.col("shingle").cast("string").cast("binary")),
                F.lit(spec["n"]),
            ).cast("long").alias("b")
        )
        .distinct()
        .collect()
    }
    assert 0 < len(bucket_ids) < 32  # the prune has something to skip

    # corrupt the PAGE bytes of every data file OUTSIDE the batch's
    # buckets (footers stay intact: schema/planning are metadata reads
    # by design — the contract under test is that no data PAGE outside
    # the batch's buckets is ever decoded)
    n_corrupted = 0
    for e in read_manifest(p)["entries"]:
        d = os.path.dirname(e["path"])
        b = int(d.split("=", 1)[1])
        if b not in bucket_ids:
            fp = os.path.join(p, e["path"])
            sz = os.path.getsize(fp)
            with open(fp, "r+b") as f:
                f.write(b"\xff" * max(16, sz - 4096))
            n_corrupted += 1
    assert n_corrupted > 0

    pairs = jaccard_index_append(
        spark, p, batch, "text", "doc_id", threshold=0.5, ingest=False
    ).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(7, 1007, 1.0)]

    # sanity: an unpruned full read DOES hit the corruption
    with pytest.raises(Exception):
        spark.read.format("strawboat").load(p).count()


def test_minhash_lsh_join_cross_table_semantics(spark):
    """Cross-table LSH join (r11): identical docs across the two tables
    must pair with est_jaccard exactly 1.0; unrelated docs must not
    pair; same-name id columns get left_/right_ prefixes."""
    import pyspark.sql.functions as F

    from strawboat_spark.operators.dedup import minhash_lsh_join

    corpus = spark.range(4).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, F.lit("the quick brown fox jumps over the lazy dog"))
        .when(F.col("id") == 1, F.lit("completely different text about spark engines"))
        .otherwise(F.concat(F.lit("filler document number "), F.col("id"),
                            F.lit(" with its own unrelated words")))
        .alias("text"),
    )
    evalset = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    got = {
        (r.left_doc_id, r.right_doc_id): r.est_jaccard
        for r in minhash_lsh_join(
            corpus, evalset, "text", "doc_id", "doc_id"
        ).collect()
    }
    assert got == {(0, 100): 1.0}

    # portable family produces the same pairing decision
    got_md5 = {
        (r.left_doc_id, r.right_doc_id): r.est_jaccard
        for r in minhash_lsh_join(
            corpus, evalset, "text", "doc_id", "doc_id", hash_family="md5"
        ).collect()
    }
    assert got_md5 == {(0, 100): 1.0}


def test_incremental_index_compaction_cadence(spark, tmp_path):
    """compact_every=N (r11): once N appends have landed since the last
    compact/overwrite, the next appending batch compacts the index —
    bucket dirs fold back toward one file each (the measured per-batch
    cost growth is file-count accumulation; BASELINE.md r11) — and
    index content is unaffected."""
    import pyspark.sql.functions as F

    from strawboat_spark.operators.dedup import (
        fingerprint_index_append,
        fingerprint_index_init,
    )
    from strawboat_spark.sources.datasource import list_generations, register
    from strawboat_spark.table import Table

    register(spark)
    docs = spark.range(160).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document body "), F.col("id")).alias("text"),
    ).persist()
    p = str(tmp_path / "fpidx")
    fingerprint_index_init(spark, p, docs.filter("doc_id < 40"), "text", "doc_id")
    for k in range(1, 4):
        batch = docs.filter((F.col("doc_id") >= 40 * k) & (F.col("doc_id") < 40 * (k + 1)))
        res = fingerprint_index_append(spark, p, batch, "text", "doc_id", compact_every=2)
        assert not any(r.is_duplicate for r in res.collect())  # all new content
    ops = [g["operation"] for g in list_generations(p)]
    assert "compact" in ops, ops
    # compaction must not lose index content: a replay of an earlier
    # batch resolves every doc as a duplicate of ITSELF (the survivor)
    out = fingerprint_index_append(
        spark, p, docs.filter("doc_id < 40"), "text", "doc_id"
    ).collect()
    assert all(r.is_duplicate and r.survivor_id == r.doc_id for r in out)
    assert Table(spark, p).count_rows() == 160  # one row per content
    docs.unpersist()


# --------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023) — semantic dedup over embedding clusters
# --------------------------------------------------------------------------


def _semdedup_vecs(spark):
    # cluster structure by construction: axis-ish directions; ids 0 and 1
    # seed two centroids, the rest fall near one of them
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.99, 0.1, 0.0]),   # near 0 → dropped by 0 at high threshold
        (3, [0.1, 0.99, 0.0]),   # near 1 → dropped by 1
        (4, [0.7, 0.7, 0.2]),    # diagonal: assigned somewhere, far enough
        (5, [0.98, 0.12, 0.05]), # near 0 AND near 2: dup_of must be MIN id
    ]
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "id long, vec array<float>"
    )


def test_semdedup_seed_mode_drop_rule_exact(spark):
    from strawboat_spark.operators.similarity import semdedup

    out = semdedup(
        _semdedup_vecs(spark), "id", "vec",
        n_clusters=2, threshold=0.95, centroids="seed",
    ).collect()
    by_id = {r.id: r for r in out}
    assert by_id[0].kept and by_id[1].kept
    assert not by_id[2].kept and by_id[2].dup_of == 0
    assert not by_id[3].kept and by_id[3].dup_of == 1
    assert by_id[4].kept
    # non-recursive smallest-dominator rule: 5 is near both 0 and 2;
    # dup_of is the SMALLEST dominating id, and 2 being dropped itself
    # does not spare 5
    assert not by_id[5].kept and by_id[5].dup_of == 0
    # pairs only form inside a cell: every dropped row shares its
    # cluster with its dominator
    for r in out:
        if not r.kept:
            assert by_id[r.dup_of].cluster == r.cluster
    # scores ride along, rounded
    assert by_id[2].score is not None and 0.9 < by_id[2].score <= 1.0


def test_semdedup_kmeans_mode_same_neighborhood_semantics(spark):
    from strawboat_spark.operators.similarity import semdedup

    out = semdedup(
        _semdedup_vecs(spark), "id", "vec",
        n_clusters=2, threshold=0.95, centroids="kmeans", seed=7,
    ).collect()
    by_id = {r.id: r for r in out}
    # kmeans centroids differ from seed centroids, but the drop rule is
    # the same: 2 and 5 sit within 0.95 of id 0 and must not survive
    # alongside it whenever they share its cell
    dropped = {r.id for r in out if not r.kept}
    assert 0 not in dropped and 1 not in dropped
    for r in out:
        if not r.kept:
            assert by_id[r.dup_of].cluster == r.cluster
            assert r.dup_of < r.id


def test_semdedup_dropper_cap_bounds_build_side(spark):
    from strawboat_spark.operators.similarity import semdedup

    import pyspark.sql.functions as F

    # 30 near-identical vectors in one direction: uncapped, every id>0
    # is dominated by id 0. With cap=1 only id 0 can drop — result is
    # identical here (the cap keeps the smallest ids as droppers), and
    # the beyond-cap members are still DROPPABLE
    df = spark.range(30).select(
        F.col("id"),
        F.array(
            (F.lit(1.0) + F.col("id").cast("double") / 1e6).cast("float"),
            F.lit(0.001).cast("float"),
            F.lit(0.0).cast("float"),
        ).alias("vec"),
    )
    uncapped = semdedup(df, "id", "vec", n_clusters=1, threshold=0.99,
                        centroids="seed").collect()
    capped = semdedup(df, "id", "vec", n_clusters=1, threshold=0.99,
                      centroids="seed", max_cluster_droppers=1).collect()
    assert {(r.id, r.kept, r.dup_of) for r in uncapped} == {
        (r.id, r.kept, r.dup_of) for r in capped
    }
    assert sum(1 for r in capped if r.kept) == 1


def test_semdedup_plan_has_no_cartesian_pair_join(spark):
    from strawboat_spark.operators.similarity import semdedup

    df = _semdedup_vecs(spark)
    plan = semdedup(
        df, "id", "vec", n_clusters=2, threshold=0.9, centroids="seed"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_kmeans_centroids_k_at_sample_cap_is_identity(spark):
    """r14: when k >= the training sample, every sample point is its
    own centroid — the per-centroid Python seeding loop and Lloyd are
    skipped (measured 19.5 s -> instant at the k=2048 sample cap) and
    the result is exactly the normalized sample."""
    import numpy as np

    from strawboat_spark.operators.similarity import _kmeans_centroids

    rows = [(i, [float(i % 7 + 1), float(i % 3 + 1)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = _kmeans_centroids(df, "embedding", 4096, seed=1, sample_size=40)
    assert len(cents) == 40
    x = np.array([r[1] for r in rows], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    got = np.array(sorted(map(tuple, np.round(x, 6))))
    want = np.array(sorted(map(tuple, cents)))
    assert np.allclose(got, want)


def test_probe_cells_explicit_broadcast_matches_closure(spark, monkeypatch):
    """r15: a centroid matrix over _CENTROID_BCAST_MIN_BYTES ships as an
    explicit SparkContext broadcast (once per executor) instead of
    riding every task closure — same dtype, so assignments must be
    bit-identical to closure transport."""
    import numpy as np

    import strawboat_spark.operators.similarity as sim

    rng = np.random.default_rng(3)
    cents = rng.normal(size=(32, 16)).round(6).tolist()
    df = spark.createDataFrame(
        [(i, rng.normal(size=16).tolist()) for i in range(200)],
        "vec_id long, embedding array<double>",
    )

    def assign():
        probe = sim._probe_cells_udf(cents, 2)
        rows = df.select("vec_id", probe("embedding").alias("c")).collect()
        return {r["vec_id"]: tuple(r["c"]) for r in rows}

    closure = assign()  # 32x16 float64 = 4 KiB: closure transport
    monkeypatch.setattr(sim, "_CENTROID_BCAST_MIN_BYTES", 1)
    bcast = assign()  # same matrix, forced through the broadcast path
    assert bcast == closure

    # nprobe=1 argmax fast path == first element of the argsort path
    one = sim._probe_cells_udf(cents, 1)
    rows = df.select("vec_id", one("embedding").alias("c")).collect()
    assert all(r["c"][0] == closure[r["vec_id"]][0] for r in rows)


def test_centroid_dtype_env_knob(spark, monkeypatch):
    """r15: STRAWBOAT_CENTROID_DTYPE=float32 is the paper-scale lever
    (146 MiB vs 293 MiB at 50k x 768). It must produce a consistent
    assignment (every row assigned, cells within range) and reject
    unknown dtypes loudly; default stays float64 (the gates' exact
    oracle arithmetic)."""
    import numpy as np

    import strawboat_spark.operators.similarity as sim

    assert sim._centroid_dtype() == np.dtype("float64")
    rng = np.random.default_rng(7)
    cents = rng.normal(size=(8, 16)).round(6).tolist()
    df = spark.createDataFrame(
        [(i, rng.normal(size=16).tolist()) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setenv("STRAWBOAT_CENTROID_DTYPE", "float32")
    assert sim._centroid_dtype() == np.dtype("float32")
    probe = sim._probe_cells_udf(cents, 1)
    rows = df.select("vec_id", probe("embedding").alias("c")).collect()
    assert len(rows) == 100
    assert all(0 <= r["c"][0] < 8 for r in rows)
    monkeypatch.setenv("STRAWBOAT_CENTROID_DTYPE", "float16")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="float64|float32"):
        sim._centroid_dtype()


def test_centroid_dtype_param_overrides_env(monkeypatch):
    """r16 (ADVICE r15): dtype is threaded as an explicit parameter —
    the env var is only the default, so a caller toggling the env for
    one operator can't change a UDF built with an explicit dtype."""
    import numpy as np

    import strawboat_spark.operators.similarity as sim

    monkeypatch.setenv("STRAWBOAT_CENTROID_DTYPE", "float32")
    assert sim._centroid_dtype() == np.dtype("float32")
    assert sim._centroid_dtype("float64") == np.dtype("float64")
    with pytest.raises(ValueError, match="float64|float32"):
        sim._centroid_dtype("float16")


def test_probe_cells_broadcast_lifecycle(spark, monkeypatch):
    """r16 (VERDICT r15 #5): explicit centroid broadcasts are observable
    and reclaimable — the UDF exposes .explicit_broadcast (observed, not
    size-inferred) and .release(); repeated constructions don't
    accumulate live handles once released; a released broadcast is only
    unpersisted (not destroyed), so the UDF still computes."""
    import numpy as np

    import strawboat_spark.operators.similarity as sim

    rng = np.random.default_rng(11)
    cents = rng.normal(size=(16, 8)).round(6).tolist()
    df = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(50)],
        "vec_id long, embedding array<double>",
    )

    small = sim._probe_cells_udf(cents, 1)
    assert small.explicit_broadcast is False and small.centroid_broadcast is None
    small.release()  # no-op, must not raise

    monkeypatch.setattr(sim, "_CENTROID_BCAST_MIN_BYTES", 1)
    before = len(sim._LIVE_CENTROID_BCASTS)
    probes = [sim._probe_cells_udf(cents, 1) for _ in range(3)]
    assert all(p.explicit_broadcast for p in probes)
    assert len(sim._LIVE_CENTROID_BCASTS) == before + 3

    # per-UDF release removes exactly its own handle, idempotently
    probes[0].release()
    probes[0].release()
    assert len(sim._LIVE_CENTROID_BCASTS) == before + 2

    # a released broadcast is unpersisted, not destroyed: the plan that
    # still references it re-fetches from the driver and stays correct
    probes[1].release()
    rows = df.select("vec_id", probes[1]("embedding").alias("c")).collect()
    assert len(rows) == 50 and all(0 <= r["c"][0] < 16 for r in rows)

    # session-wide reclaim drains whatever is still outstanding
    n = sim.release_centroid_broadcasts()
    assert n >= 1
    assert not sim._LIVE_CENTROID_BCASTS
    assert sim.release_centroid_broadcasts() == 0


def test_probe_cells_warns_on_closure_fallback_at_broadcast_size(spark, monkeypatch):
    """r16 (VERDICT r15 watch): a >=4 MiB matrix with no active session
    silently rode every task closure — now it warns loudly (numerics
    unchanged)."""
    import warnings

    import numpy as np
    from pyspark.sql import SparkSession

    import strawboat_spark.operators.similarity as sim

    cents = np.random.default_rng(5).normal(size=(8, 4)).round(6).tolist()
    monkeypatch.setattr(sim, "_CENTROID_BCAST_MIN_BYTES", 1)
    monkeypatch.setattr(SparkSession, "getActiveSession", classmethod(lambda cls: None))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        probe = sim._probe_cells_udf(cents, 1)
    assert probe.explicit_broadcast is False
    assert any("task-closure transport" in str(x.message) for x in w)


def test_kmeans_train_distributed_contract(spark):
    """r16 (VERDICT r15 #4): the paper-scale trainer — O(k) random init,
    each Lloyd iteration one Spark pass (mapInPandas partial sums +
    groupBy(cell) reduce).  Contract parity with _kmeans_centroids:
    unit-norm round(6) centroids, deterministic in seed, k capped by the
    training set, and quality on par with the driver trainer on a
    separable corpus (every latent cluster covered)."""
    import numpy as np

    import strawboat_spark.operators.similarity as sim

    # 4 well-separated latent clusters in 8 dims
    rng = np.random.default_rng(0)
    centers = np.eye(4, 8) * 10.0
    rows = [
        (i, (centers[i % 4] + rng.normal(size=8) * 0.05).tolist())
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = sim.kmeans_train_distributed(df, "embedding", 4, seed=7, iters=4)
    assert len(cents) == 4
    c = np.array(cents)
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-5)
    # every latent cluster recovered: each true (normalized) center has
    # a trained centroid at cosine > 0.99
    t = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    assert (t @ c.T).max(axis=1).min() > 0.99

    # deterministic in seed
    again = sim.kmeans_train_distributed(df, "embedding", 4, seed=7, iters=4)
    assert cents == again

    # k capped by the training set size (parity with the driver trainer)
    few = sim.kmeans_train_distributed(df, "embedding", 1000, seed=7, iters=1)
    assert len(few) == 400

    # sample_size is a TARGET (Bernoulli filter, one map-only pass — no
    # global sort of fat vector rows): realized sample is binomial
    # around it, and k centroids still come back exactly
    sampled = sim.kmeans_train_distributed(
        df, "embedding", 5, seed=7, iters=2, sample_size=50
    )
    assert len(sampled) == 5

    # threads through semdedup's trainer switch
    out = sim.semdedup(
        df, "vec_id", "embedding", n_clusters=4, kmeans_trainer="distributed"
    )
    assert out.count() == 400
    with pytest.raises(ValueError, match="driver|distributed"):
        sim.semdedup(df, "vec_id", "embedding", kmeans_trainer="bogus").count()


def test_kmeans_train_distributed_r17_params(spark):
    """r17 (VERDICT r16 #4/#7): n_total hint skips the sizing count()
    without changing the realized sample's semantics, and float32
    partial-sum blobs (the shuffle-halving lever) train centroids that
    agree with the float64 run to low-order digits — each choice
    individually deterministic."""
    import numpy as np

    import strawboat_spark.operators.similarity as sim

    rng = np.random.default_rng(3)
    centers = np.eye(4, 8) * 10.0
    rows = [
        (i, (centers[i % 4] + rng.normal(size=8) * 0.05).tolist())
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # exact hint reproduces the unhinted run bit-for-bit (same Bernoulli
    # fraction => same filter => same train)
    base = sim.kmeans_train_distributed(df, "embedding", 4, seed=7, iters=2, sample_size=200)
    hinted = sim.kmeans_train_distributed(
        df, "embedding", 4, seed=7, iters=2, sample_size=200, n_total=400
    )
    assert base == hinted
    # an approximate hint only shifts the realized sample size — still
    # trains k valid unit-norm centroids
    rough = sim.kmeans_train_distributed(
        df, "embedding", 4, seed=7, iters=2, sample_size=200, n_total=300
    )
    assert len(rough) == 4
    assert np.allclose(np.linalg.norm(np.array(rough), axis=1), 1.0, atol=1e-5)

    # float32 partial blobs: deterministic, and agrees with the float64
    # run to ~float32 precision (same assignments on separable data;
    # only the partial-sum blob cast differs)
    f32 = sim.kmeans_train_distributed(df, "embedding", 4, seed=7, iters=2, partial_dtype="float32")
    f64 = sim.kmeans_train_distributed(df, "embedding", 4, seed=7, iters=2)
    assert f32 == sim.kmeans_train_distributed(
        df, "embedding", 4, seed=7, iters=2, partial_dtype="float32"
    )
    assert np.allclose(np.array(f32), np.array(f64), atol=1e-4)

    with pytest.raises(ValueError, match="partial_dtype"):
        sim.kmeans_train_distributed(df, "embedding", 4, partial_dtype="float16")


def test_kmeans_init_shortfall_retries_inflated_fraction(spark):
    """r17 (ADVICE r16): an init-draw shortfall doubles the Bernoulli
    fraction and redraws (same seed => superset draws, deterministic)
    instead of collecting the ENTIRE training set."""
    import numpy as np
    import pandas as pd

    import strawboat_spark.operators.similarity as sim

    train = spark.createDataFrame(
        [([float(i), 1.0],) for i in range(2000)], "__v array<double>"
    )

    def pack(it):
        for pdf in it:
            if len(pdf):
                vecs = np.vstack(pdf["__v"].to_numpy()).astype(np.float64)
                yield pd.DataFrame({"b": [v.tobytes() for v in vecs]})

    # frac0 far below k/n forces the shortfall path through several
    # doublings; the loop must still deliver >= k rows and stay
    # deterministic
    blobs = sim._draw_init_blobs(train, pack, 500, 2000, seed=9, frac0=0.002)
    assert len(blobs) >= 500
    again = sim._draw_init_blobs(train, pack, 500, 2000, seed=9, frac0=0.002)
    assert [r[0] for r in blobs] == [r[0] for r in again]


def test_centroid_bcast_registry_threadsafe(spark, monkeypatch):
    """r17 (VERDICT r16 #5): concurrent probe-UDF construction/release
    and session-wide reclaim must not race the live-broadcast registry
    (bare list ops could drop or double-release handles)."""
    import threading

    import numpy as np

    import strawboat_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "_CENTROID_BCAST_MIN_BYTES", 1)
    cents = np.random.default_rng(2).normal(size=(8, 4)).round(6).tolist()
    sim.release_centroid_broadcasts()  # start clean
    errs: list = []

    def build_release():
        try:
            for _ in range(30):
                sim._probe_cells_udf(cents, 1).release()
        except Exception as exc:  # pragma: no cover - the failure mode
            errs.append(exc)

    def reclaim():
        try:
            for _ in range(60):
                sim.release_centroid_broadcasts()
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [
        threading.Thread(target=build_release),
        threading.Thread(target=build_release),
        threading.Thread(target=reclaim),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    sim.release_centroid_broadcasts()
    assert not sim._LIVE_CENTROID_BCASTS


def test_ivf_topk_shares_one_broadcast(spark, monkeypatch):
    """r17 (ADVICE r16): ivf_cosine_topk's assign + probe UDFs share ONE
    shipped centroid matrix — previously each pinned its own explicit
    broadcast (2 x 146 MiB executor-resident at paper scale)."""
    import numpy as np

    import strawboat_spark.operators.similarity as sim

    rng = np.random.default_rng(4)
    df = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setattr(sim, "_CENTROID_BCAST_MIN_BYTES", 1)
    sim.release_centroid_broadcasts()
    before = len(sim._LIVE_CENTROID_BCASTS)
    out = sim.ivf_cosine_topk(
        df, df.filter("vec_id < 3"), "vec_id", "embedding",
        k=5, n_centroids=4, nprobe=4,
    )
    assert out.count() > 0
    assert len(sim._LIVE_CENTROID_BCASTS) == before + 1
    sim.release_centroid_broadcasts()


def test_driver_kmeans_warns_at_paper_scale_k(spark, monkeypatch):
    """r16: the driver trainer's sequential kmeans++ seeding is the
    documented paper-scale seam — above _DRIVER_KMEANS_WARN_K it must
    point at kmeans_train_distributed instead of silently burning
    ~10 ms x k on the driver."""
    import warnings

    import strawboat_spark.operators.similarity as sim

    df = spark.createDataFrame(
        [(i, [float(i % 5), 1.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setattr(sim, "_DRIVER_KMEANS_WARN_K", 8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cents = sim._kmeans_centroids(df, "embedding", 9, seed=1, sample_size=30)
    assert cents
    assert any("kmeans_train_distributed" in str(x.message) for x in w)


def test_wide_fixture_dups_inherit_base_cell_and_label(tmp_path):
    """r16 (ADVICE r15): a planted near-dup copies the PREVIOUS row's
    vector — its latent cell/label must come from that base row too, or
    ~dup_rate of rows carry labels inconsistent with their embeddings
    and label-conditioned analyses on the fixture are misread."""
    import sys

    import numpy as np
    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    from gen_scale_sf import generate_wide_embeddings

    generate_wide_embeddings(
        str(tmp_path), rows=400, dim=8, n_latent=16, dup_rate=0.05, seed=3, noise=0.05
    )
    t = pq.read_table(str(tmp_path / "embeddings8.parquet"))
    vec = np.vstack(t["embedding"].to_numpy())
    label = t["label"].to_numpy()
    dup_ids = [i for i in range(1, 400) if i % 20 == 1]
    assert dup_ids
    for i in dup_ids:
        a, b = vec[i], vec[i - 1]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.99, (i, cos)
        assert label[i] == label[i - 1], (i, label[i], label[i - 1])


def test_semdedup_assignment_cache_auto(spark):
    """r16: semdedup's drop-rule self-join consumes the assigned corpus
    on three branches, re-running the assignment matmul each time; at
    broadcast-sized centroid matrices the assignments must be persisted
    (auto), and small-k runs must NOT leave cache entries behind."""
    import strawboat_spark.operators.similarity as sim

    df = spark.createDataFrame(
        [(i, [float(i % 4), 1.0, float(i % 3)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )

    def cache_empty():
        return spark._jsparkSession.sharedState().cacheManager().isEmpty()

    spark.catalog.clearCache()
    assert cache_empty()
    out = sim.semdedup(df, "vec_id", "embedding", n_clusters=4)  # tiny k: auto off
    assert out.count() == 60
    assert cache_empty()

    out = sim.semdedup(df, "vec_id", "embedding", n_clusters=4, cache_assignments=True)
    assert not cache_empty()
    assert out.count() == 60  # values unchanged by the cache
    spark.catalog.clearCache()
