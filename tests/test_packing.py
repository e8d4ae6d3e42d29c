"""Sequence packing (qsvspark.functions.packing) + round-4 text ops:
decontamination, PII scrub, repetition signals.

Packing invariants are checked against a single-threaded Python model —
the distributed prefix sum must agree exactly with the naive global
cumsum, and the greedy packer must satisfy the bin constraints for any
partitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qsvspark.functions import (
    add_repetition_signals,
    contamination,
    pack_chunked,
    pack_greedy,
    pack_stats,
    scrub_pii,
    word_ngrams,
)

SEQ_LEN = 64


def _docs(spark, n=200):
    """Deterministic (id, n_tok) corpus with ragged sizes incl. an
    oversized doc and a zero-token doc."""
    rows = []
    for i in range(n):
        tok = (i * 37) % 120 + 1
        if i == 50:
            tok = SEQ_LEN * 3 + 7  # oversized
        if i == 51:
            tok = 0
        rows.append((i, tok))
    return spark.createDataFrame(rows, "doc_id long, n_tok long"), dict(rows)


# --------------------------------------------------------------------
# pack_chunked
# --------------------------------------------------------------------


def _model_chunked(tok_by_id, seq_len):
    out = {}
    off = 0
    for i in sorted(tok_by_id):
        t = tok_by_id[i]
        first = off // seq_len
        last = (off + max(t, 1) - 1) // seq_len
        out[i] = (off, first, last, int(last > first))
        off += t
    return out


@pytest.mark.parametrize("n_buckets", [1, 4, 16])
def test_pack_chunked_matches_global_cumsum(spark, n_buckets):
    df, toks = _docs(spark)
    got = {
        r["doc_id"]: (
            r["global_offset"], r["first_seq"], r["last_seq"], r["spans_boundary"]
        )
        for r in pack_chunked(df, "n_tok", "doc_id", SEQ_LEN, n_buckets=n_buckets)
        .collect()
    }
    assert got == _model_chunked(toks, SEQ_LEN)


def test_pack_chunked_explicit_bucket_col(spark):
    # caller-supplied deterministic bucket (the metadata-driven scale
    # path that skips the min/max pass) gives the same layout
    df, toks = _docs(spark)
    df = df.withColumn("day", (F.col("doc_id") / 50).cast("long"))
    got = {
        r["doc_id"]: r["global_offset"]
        for r in pack_chunked(df, "n_tok", "doc_id", SEQ_LEN, bucket_col="day")
        .collect()
    }
    model = _model_chunked(toks, SEQ_LEN)
    assert got == {i: m[0] for i, m in model.items()}


def test_pack_chunked_empty(spark):
    df = spark.createDataFrame([], "doc_id long, n_tok long")
    assert pack_chunked(df, "n_tok", "doc_id", SEQ_LEN).count() == 0


def test_pack_chunked_no_single_partition_window(spark):
    # the scale property: the window is keyed on the range bucket, so the
    # physical plan must NOT contain an empty-key window sort
    df, _ = _docs(spark)
    plan = pack_chunked(df, "n_tok", "doc_id", SEQ_LEN, n_buckets=8)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # an un-partitioned window renders as "Window [...], [order...]" with
    # SinglePartition exchange feeding it
    assert "SinglePartition" not in plan


# --------------------------------------------------------------------
# pack_greedy
# --------------------------------------------------------------------


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_pack_greedy_invariants(spark, parts):
    df, toks = _docs(spark)
    packed = pack_greedy(df, "n_tok", "doc_id", SEQ_LEN, num_partitions=parts).collect()
    # every doc packed exactly once
    assert sorted(r["doc_id"] for r in packed) == sorted(toks)
    by_seq: dict[int, int] = {}
    for r in packed:
        assert r["n_tok"] == toks[r["doc_id"]]
        by_seq[r["seq_id"]] = by_seq.get(r["seq_id"], 0) + r["n_tok"]
        # seq_fill is the occupancy before this doc
        assert 0 <= r["seq_fill"] <= SEQ_LEN
        assert r["oversized"] == (1 if toks[r["doc_id"]] > SEQ_LEN else 0)
    for sid, total in by_seq.items():
        docs_in = [r for r in packed if r["seq_id"] == sid]
        if any(r["oversized"] for r in docs_in):
            # an oversized doc owns its sequence
            assert len(docs_in) == 1
        else:
            assert total <= SEQ_LEN


def test_pack_greedy_fill_is_prefix_sum_within_seq(spark):
    df, _ = _docs(spark)
    packed = pack_greedy(df, "n_tok", "doc_id", SEQ_LEN, num_partitions=2).collect()
    seqs: dict[int, list] = {}
    for r in packed:
        seqs.setdefault(r["seq_id"], []).append(r)
    for rows in seqs.values():
        rows.sort(key=lambda r: r["seq_fill"])
        acc = 0
        for r in rows:
            assert r["seq_fill"] == acc
            acc += r["n_tok"]


def test_pack_stats(spark):
    df, toks = _docs(spark)
    packed = pack_greedy(df, "n_tok", "doc_id", SEQ_LEN, num_partitions=4)
    s = pack_stats(packed, SEQ_LEN, "n_tok").first()
    total, biggest = sum(toks.values()), max(toks.values())
    assert s["total_tokens"] == total
    # a sequence holds at most max(seq_len, biggest_doc) tokens
    assert s["n_sequences"] >= total // max(SEQ_LEN, biggest)
    assert 0 < s["mean_fill"] <= biggest / SEQ_LEN


def test_pack_rejects_bad_seq_len(spark):
    df, _ = _docs(spark, n=5)
    with pytest.raises(ValueError):
        pack_chunked(df, "n_tok", "doc_id", 0)
    with pytest.raises(ValueError):
        pack_greedy(df, "n_tok", "doc_id", -1)


# --------------------------------------------------------------------
# decontamination / PII / repetition
# --------------------------------------------------------------------


def _text_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "quick brown fox is here"),          # shares "quick brown fox"
        (2, "completely unrelated words entirely"),
        (3, "the quick brown fox jumps again and again"),
        (4, "short"),                            # < n words -> no grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams(spark):
    df = _text_df(spark).select(word_ngrams(F.col("text"), 3).alias("g"))
    g0 = df.collect()[0]["g"]
    assert g0[0] == "the quick brown" and g0[-1] == "the lazy dog"
    assert df.collect()[4]["g"] == []


def test_contamination_flags_overlap_only(spark):
    df = _text_df(spark)
    bench = df.filter("doc_id = 0")
    cand = df.filter("doc_id != 0")
    got = {r["doc_id"]: r["n_matched"] for r in contamination(cand, bench, n=3).collect()}
    # doc1 shares exactly "quick brown fox"; doc3 shares 3 distinct grams
    assert got[1] == 1
    assert got[3] == 3
    assert 2 not in got and 4 not in got


def test_scrub_pii_all_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.co.uk ip 192.168.0.1 ssn 123-45-6789 "
             "tel 555-123-4567 plain 12345")],
        "id long, s string",
    )
    out = df.select(scrub_pii(F.col("s")).alias("s")).first()["s"]
    assert out == "mail <EMAIL> ip <IP> ssn <SSN> tel <PHONE> plain 12345"


def test_repetition_signals_vs_python(spark):
    from collections import Counter

    df = _text_df(spark)
    got = {r["doc_id"]: r for r in add_repetition_signals(df).collect()}
    for doc_id, text in [(r["doc_id"], r["text"]) for r in df.collect()]:
        ws = text.lower().split()
        bg = [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        r = got[doc_id]
        assert r["total_words"] == len(ws)
        assert r["distinct_words"] == len(set(ws))
        assert r["top_word_count"] == max(Counter(ws).values())
        assert r["top_bigram_count"] == (max(Counter(bg).values()) if bg else 0)
