"""Training-data extension tests: text analysis, dedup, similarity,
multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from qsvspark.functions import (
    add_fingerprint,
    add_lang_id,
    add_quality,
    add_token_counts,
    brute_force_topk,
    dedup_exact,
    embedding_near_dups,
    lsh_ann_topk,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash,
)
from qsvspark.functions.dedup import simhash_hamming
from qsvspark.functions.multimodal import extract_features, sample_frames, synth_media

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (1, "the quick brown fox jumps over the lazy dog and runs away fast"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog and walks away fast"),  # near dup of 0
    (3, "der hund und die katze sind nicht mit dem vogel zu sehen"),
    (4, "completely different content about spark query engines and shuffles"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


class TestText:
    def test_token_counts(self, docs):
        r = {x["doc_id"]: x for x in add_token_counts(docs).collect()}
        assert r[0]["n_ws_tokens"] == 13
        assert r[0]["n_bpe_tokens"] == 13  # plain words, no punct

    def test_empty_text(self, spark):
        df = spark.createDataFrame([(0, ""), (1, "   ")], ["doc_id", "text"])
        rows = add_token_counts(df).collect()
        assert all(r["n_ws_tokens"] == 0 for r in rows)

    def test_lang_id(self, docs):
        r = {x["doc_id"]: x["lang_pred"] for x in add_lang_id(docs).collect()}
        assert r[0] == "en"
        assert r[3] == "de"

    def test_quality(self, docs):
        r = {x["doc_id"]: x for x in add_quality(docs).collect()}
        assert 0 < r[0]["q_score"] <= 1
        assert r[0]["q_stopword_hits"] >= 2  # the, and, over...

    def test_fingerprint_normalizes_whitespace(self, spark):
        df = spark.createDataFrame(
            [(0, "Hello  World"), (1, "hello world"), (2, "other")], ["doc_id", "text"]
        )
        r = [x["fingerprint"] for x in add_fingerprint(df).collect()]
        assert r[0] == r[1] != r[2]


class TestDedup:
    def test_exact(self, docs):
        kept = dedup_exact(docs).select("doc_id").collect()
        ids = sorted(r["doc_id"] for r in kept)
        assert ids == [0, 2, 3, 4]  # 1 removed (dup of 0, min id kept)

    def test_minhash_lsh_finds_near_dup(self, docs):
        pairs = {(r["id_a"], r["id_b"]) for r in
                 minhash_lsh_pairs(docs, num_hashes=16, bands=8, k=4).collect()}
        assert (0, 1) in pairs  # exact dup always collides
        assert (0, 2) in pairs  # near dup shares most shingles
        assert (0, 4) not in pairs and (3, 4) not in pairs

    def test_simhash_near_for_near_dups(self, spark, docs):
        sh = simhash(docs).select("doc_id", "simhash")
        a = sh.alias("a").crossJoin(sh.alias("b")).filter("a.doc_id < b.doc_id")
        d = a.select(
            F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"),
            simhash_hamming(F.col("a.simhash"), F.col("b.simhash")).alias("ham"),
        ).collect()
        ham = {(r["ia"], r["ib"]): r["ham"] for r in d}
        assert ham[(0, 1)] == 0          # identical text → identical simhash
        assert ham[(0, 2)] < ham[(0, 4)]  # near dup closer than unrelated

    def test_ngram_jaccard(self, spark, docs):
        pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 4)], ["id_a", "id_b"])
        j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard(pairs, docs, n=3).collect()}
        assert j[(0, 1)] == 1.0
        assert 0.3 < j[(0, 2)] < 1.0
        assert j[(0, 4)] == 0.0

    def test_embedding_near_dups(self, spark):
        vecs = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),   # ~same direction as 0
            (2, [0.0, 1.0, 0.0]),
        ]
        df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
        got = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(df, threshold=0.99).collect()}
        assert got == {(0, 1)}


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

    def test_brute_force_topk(self, emb):
        qv = emb.filter("vec_id = 0").collect()[0]["embedding"]
        top = brute_force_topk(emb, list(qv), k=5).collect()
        assert top[0]["vec_id"] == 0 and abs(top[0]["cos"] - 1.0) < 1e-6
        cos = [r["cos"] for r in top]
        assert cos == sorted(cos, reverse=True)

    def test_lsh_recall(self, emb):
        qv = list(emb.filter("vec_id = 0").collect()[0]["embedding"])
        exact = {r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()}
        approx = {r["vec_id"] for r in
                  lsh_ann_topk(emb, qv, k=10, bits=12, probe_hamming=4).collect()}
        recall = len(exact & approx) / 10
        assert recall >= 0.5  # LSH with generous probing on 500 vecs


class TestMultimodal:
    def test_synth_media_deterministic(self, spark):
        a = synth_media(spark, 50).collect()
        b = synth_media(spark, 50).collect()
        assert [r["payload"] for r in a] == [r["payload"] for r in b]

    def test_extract_features_schema_and_values(self, spark):
        feats = extract_features(synth_media(spark, 30))
        rows = feats.collect()
        assert feats.columns == ["media_id", "kind", "n_bytes", "byte_mean",
                                 "byte_hist", "aspect_ratio"]
        assert all(r["n_bytes"] == 64 for r in rows)
        assert all(len(r["byte_hist"]) == 16 for r in rows)
        assert all(sum(r["byte_hist"]) == 64 for r in rows)

    def test_sample_frames(self, spark):
        media = synth_media(spark, 60)
        frames = sample_frames(media, every_n=10)
        rows = frames.collect()
        assert all(r["frame_no"] % 10 == 0 for r in rows)
        n_videos = media.filter("kind = 'video'").count()
        assert frames.select("media_id").distinct().count() == n_videos

    def test_decode_stub_raises_without_pil(self):
        from qsvspark.functions.multimodal import decode_image

        try:
            import PIL  # noqa: F401
            pytest.skip("PIL present")
        except ImportError:
            with pytest.raises(NotImplementedError):
                decode_image(b"\x00\x01")
