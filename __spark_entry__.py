"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable built through the qsvspark public
API; ``oracle_sql()`` gives the DuckDB-equivalent SQL. Column names are
aliased identically on both sides; float aggregates are made hash-stable
by integer-cents tricks or fixed rounding; timestamps are exported as
epoch micros (Spark ``unix_micros`` == DuckDB ``epoch_us``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qsvspark import Q  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference README-style chain over events —
    filter by event_type, hourly timeline aggregate with sum, ordered."""
    sf = "/root/testdata/sf0.001"
    return (
        Q(_t(spark, sf, "events"))
        .isin("event_type", ["click", "error", "purchase"])
        .timeline("ts", "1h", agg="sum", agg_column="value")
        .df
    )


# ---------------------------------------------------------------------
# queries — one per operator
# ---------------------------------------------------------------------

def q_select(spark, sf):
    return Q(_t(spark, sf, "lineitem")).select("l_orderkey,l_linenumber,l_returnflag").df


def q_select_range(spark, sf):
    # MIXED colspec: bare 1-based index + index range in one spec —
    # covers both the range resolver and mixed-token parsing (this entry
    # absorbed the former select_mixed query to fit the driver's 50-query
    # CORRECTNESS recording budget, VERDICT r2 #1)
    return Q(_t(spark, sf, "nation")).select("3,1:2").df


def q_renamecol(spark, sf):
    return Q(_t(spark, sf, "nation")).renamecol("n_name", "nation_name").df


def q_isin_string(spark, sf):
    return (
        Q(_t(spark, sf, "events"))
        .isin("event_type", ["click", "error"])
        .select("event_id,event_type,user_id")
        .df
    )


def q_isin_numeric(spark, sf):
    # int column vs string values — string-compare semantics, but the
    # canonical-int rewrite keeps it pushdown-eligible
    return (
        Q(_t(spark, sf, "lineitem"))
        .isin("l_linenumber", ["1", "7"])
        .select("l_orderkey,l_linenumber")
        .df
    )


def q_contains(spark, sf):
    return (
        Q(_t(spark, sf, "documents"))
        .contains("text", "spark")
        .select("doc_id,source")
        .df
    )


def q_contains_ci(spark, sf):
    return (
        Q(_t(spark, sf, "customer"))
        .contains("c_mktsegment", "AUTO", ignorecase=True)
        .select("c_custkey,c_mktsegment")
        .df
    )


def q_grep(spark, sf):
    # any-column regex over nation — matches n_name NATION_1/_1x AND the
    # int key columns rendered as strings (grep's any-column semantics)
    return Q(_t(spark, sf, "nation")).grep("1$").df


def q_grep_invert(spark, sf):
    return Q(_t(spark, sf, "nation")).grep("1", invert=True).df


def q_sed(spark, sf):
    return (
        Q(_t(spark, sf, "customer"))
        .select("c_custkey,c_name")
        .sed("[0-9]", "#", column="c_name")
        .df
    )


def q_sort_head(spark, sf):
    return (
        Q(_t(spark, sf, "orders"))
        .sort("o_totalprice,o_orderkey", desc=True)
        .head(25)
        .select("o_orderkey,o_totalprice")
        .df
    )


def q_tail(spark, sf):
    return Q(_t(spark, sf, "region")).sort("r_regionkey").tail(3).df


def q_uniq(spark, sf):
    return (
        Q(_t(spark, sf, "lineitem"))
        .select("l_returnflag,l_linestatus")
        .uniq(stable=False)
        .df
    )


def q_count(spark, sf):
    return Q(_t(spark, sf, "orders")).select("o_orderstatus").count().df


def q_pivot(spark, sf):
    # integer-cents trick for a hash-stable double sum
    li = _t(spark, sf, "lineitem").withColumn(
        "qty_cents", F.round(F.col("l_quantity") * 100).cast("long")
    )
    return Q(li).pivot(
        rows="l_returnflag", cols="l_linestatus", values="qty_cents", agg="sum"
    ).df


def q_pivot_mean(spark, sf):
    out = Q(_t(spark, sf, "lineitem")).pivot(
        rows="l_returnflag", cols="l_linestatus", values="l_quantity", agg="mean"
    ).df
    return out.select(
        "l_returnflag", "l_linestatus", F.round("l_quantity_mean", 4).alias("qty_mean")
    )


def q_timeline(spark, sf):
    return Q(_t(spark, sf, "events")).timeline("ts", "1h").df


def q_timeline_sum(spark, sf):
    ev = _t(spark, sf, "events").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    out = Q(ev).timeline("ts", "1d", agg="sum", agg_column="value_cents").df
    return out.select(
        "timeline_1d", "count", F.col("sum_value_cents").cast("long").alias("sum_cents")
    )


def q_timeslice(spark, sf):
    return (
        Q(_t(spark, sf, "events"))
        .timeslice("ts", start="2024-01-03 00:00:00", end="2024-01-05 12:00:00")
        .select("event_id,event_type")
        .df
    )


def q_timeround(spark, sf):
    ev = Q(_t(spark, sf, "events")).timeround("ts", "h", output="hour_bucket").df
    return ev.select("event_id", "hour_bucket")


def q_changetz(spark, sf):
    # deterministic subset (not limit) so the DuckDB oracle sees the same
    # rows; Tokyo has no DST, so the oracle is a pure +9h shift
    ev = _t(spark, sf, "events").filter(F.col("event_id") < 500).select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str")
    )
    return Q(ev).changetz(
        "ts_str", from_tz="UTC", to_tz="Asia/Tokyo",
        input_format="%Y-%m-%d %H:%M:%S", output_format="%Y-%m-%d %H:%M:%S",
    ).df


def q_convert(spark, sf):
    # props is a JSON text cell; prettify (json→json) then extract length
    ev = _t(spark, sf, "events").select("event_id", "props")
    return Q(ev).convert("props", "json", "json").df


def q_convert_xml(spark, sf):
    # json→xml: flat sorted <k>v</k> rendering — exactly reproducible in
    # SQL for the flat props payload, so this pandas-UDF op IS oracle-checked
    ev = _t(spark, sf, "events").select("event_id", "props")
    return Q(ev).convert("props", "json", "xml").df


def q_timeline_avg(spark, sf):
    out = Q(_t(spark, sf, "events")).timeline("ts", "6h", agg="avg", agg_column="value").df
    return out.select("timeline_6h", "count", F.round("avg_value", 4).alias("avg_r"))


def q_pivot_median(spark, sf):
    out = Q(_t(spark, sf, "lineitem")).pivot(
        rows="l_returnflag", cols="l_linestatus", values="l_quantity", agg="median"
    ).df
    return out.select(
        "l_returnflag", "l_linestatus", F.round("l_quantity_median", 4).alias("qty_med")
    )


def q_pivot_std(spark, sf):
    out = Q(_t(spark, sf, "lineitem")).pivot(
        rows="l_returnflag", cols="l_linestatus", values="l_quantity", agg="std"
    ).df
    return out.select(
        "l_returnflag", "l_linestatus", F.round("l_quantity_std", 4).alias("qty_std")
    )


def q_sed_all(spark, sf):
    # all-columns sed (every column incl. ints cast to string, replace-all)
    # CHAINED with a case-insensitive any-column grep — one oracle-checked
    # query covering both code paths (absorbed the former grep_ci entry to
    # fit the driver's 50-query CORRECTNESS recording budget)
    return (
        Q(_t(spark, sf, "nation"))
        .sed("[AEIOU]", "@")
        .grep("n@t@@n_1", ignorecase=True)
        .df
    )


def q_isin_empty(spark, sf):
    # reference semantics: empty value list → empty result (isin.rs:22-25)
    return (
        Q(_t(spark, sf, "events"))
        .isin("event_type", [])
        .select("event_id,event_type")
        .df
    )


def q_join(spark, sf):
    # quilt join-stage equivalent: equi join, single key (broadcast dim)
    orders = Q(_t(spark, sf, "orders"))
    cust = Q(_t(spark, sf, "customer")).renamecol("c_custkey", "o_custkey")
    return (
        orders.join(cust, on="o_custkey", how="inner", broadcast_small=True)
        .select("o_orderkey,o_custkey,c_name,c_mktsegment")
        .df
    )


def q_join_left(spark, sf):
    cust = Q(_t(spark, sf, "customer")).renamecol("c_nationkey", "n_nationkey")
    nat = Q(_t(spark, sf, "nation"))
    return (
        cust.join(nat, on="n_nationkey", how="left", broadcast_small=True)
        .select("c_custkey,n_nationkey,n_name")
        .df
    )


def q_concat(spark, sf):
    r = Q(_t(spark, sf, "region"))
    return r.concat(r).df


def q_stats(spark, sf):
    out = Q(_t(spark, sf, "orders")).select("o_orderkey").stats()
    return out.select(
        "column", "dtype", "count", "null_count",
        F.round("mean", 4).alias("mean_r"),
        F.round("std", 4).alias("std_r"),
        "min", "max",
        F.round("p25", 4).alias("p25_r"),
        F.round("p50", 4).alias("p50_r"),
        F.round("p75", 4).alias("p75_r"),
    )


# --- training-data extensions (SURVEY.md §2 additions) ---------------

def q_text_tokens(spark, sf):
    from qsvspark.functions import add_token_counts

    return add_token_counts(_t(spark, sf, "documents")).select(
        "doc_id",
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
    )


def q_text_fingerprint(spark, sf):
    from qsvspark.functions import add_fingerprint

    return add_fingerprint(_t(spark, sf, "documents")).select("doc_id", "fingerprint")


def q_text_quality(spark, sf):
    from qsvspark.functions import add_quality

    out = add_quality(_t(spark, sf, "documents"))
    return out.select(
        "doc_id",
        F.col("q_n_words").cast("long").alias("q_n_words"),
        F.col("q_stopword_hits").cast("long").alias("q_stopword_hits"),
        F.round("q_punct_ratio", 4).alias("punct_r"),
        F.round("q_score", 4).alias("score_r"),
    )


def q_lang_id(spark, sf):
    from qsvspark.functions import add_lang_id

    return add_lang_id(_t(spark, sf, "documents")).select("doc_id", "lang_pred")


def q_seq_pack(spark, sf):
    # GPT-style concat-and-chunk sequence packing over documents (word
    # count as token count, 256-token sequences). The Spark side is a
    # distributed prefix sum (bucketed window — NO single-partition
    # Window.orderBy); the oracle is the equivalent global window cumsum.
    # Tokenization is the LIBRARY tokenizer (_ws_tokens: trim + \s+) so
    # the oracle pins its actual semantics, not a single-space split
    # that only agrees on strictly single-space fixture text (ADVICE r4).
    from qsvspark.functions import pack_chunked
    from qsvspark.functions.text import _ws_tokens

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.size(_ws_tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    out = pack_chunked(docs, "n_tok", "doc_id", seq_len=256, n_buckets=16)
    return out.select(
        "doc_id", "n_tok", "global_offset", "first_seq", "last_seq", "spans_boundary"
    )


def q_pack_sequences(spark, sf):
    # The materialized sequence table — the north-star deliverable
    # (VERDICT r4 #4): concat-and-chunk layout turned into PHYSICAL
    # fixed-length token arrays, one row per sequence. Tokens are
    # engine-portable ints (per-word UTF8 byte length via the library
    # tokenizer), so the DuckDB oracle reproduces every array
    # value-for-value. Plan shape: distributed prefix sum + one bounded
    # explode + one keyed groupBy — no single-partition stage, no
    # Python. Sequence assembly itself is codegen (slice/sort/flatten).
    from qsvspark.functions import materialize_chunked_sequences, pack_chunked
    from qsvspark.functions.text import _ws_tokens

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.transform(_ws_tokens(F.col("text")), F.octet_length).alias("tokens"),
    ).withColumn("n_tok", F.size("tokens").cast("long"))
    layout = pack_chunked(docs, "n_tok", "doc_id", seq_len=64, n_buckets=16)
    seqs = materialize_chunked_sequences(layout, seq_len=64)
    return seqs.select(
        "seq_id",
        F.concat_ws(",", F.col("tokens").cast("array<string>")).alias("tokens_csv"),
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_tokens",
    )


def q_contamination(spark, sf):
    # benchmark decontamination: docs with doc_id % 97 == 0 act as the
    # held-out eval set; candidates matching any word 3-gram are flagged
    # with their distinct-match count. Broadcast membership probe.
    from qsvspark.functions import contamination

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    cand = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination(cand, bench, n=3).select("doc_id", "n_matched")


def q_pii_scrub(spark, sf):
    # native-regex PII redaction. The fixture docs carry no PII, so the
    # query synthesizes a deterministic PII-bearing prefix (email, IPv4,
    # SSN, phone) from doc fields and scrubs it — both engines build and
    # scrub the identical string, verified byte-for-byte by the hash.
    from qsvspark.functions import scrub_pii

    d = F.col("doc_id")
    raw = F.concat(
        F.lit("contact "), F.col("source"), F.lit("_"), d.cast("string"),
        F.lit("@example.com ip 10.0."), (d % 256).cast("string"),
        F.lit("."), F.pmod(d * 7, F.lit(256)).cast("string"),
        F.lit(" ssn 123-45-"), F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" tel 555-123-"), F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" "), F.col("text"),
    )
    return _t(spark, sf, "documents").select(
        "doc_id", scrub_pii(raw).alias("scrubbed")
    )


def q_text_repetition(spark, sf):
    # Gopher-style repetition signals; mode counts computed row-locally
    # as longest-equal-run over the sorted array (no corpus shuffle).
    from qsvspark.functions import add_repetition_signals

    return add_repetition_signals(_t(spark, sf, "documents")).select(
        "doc_id", "total_words", "distinct_words",
        "top_word_count", "top_bigram_count",
    )


def q_line_dups(spark, sf):
    # Gopher duplicate-line signals. The fixture docs are single-line, so
    # the query synthesizes deterministic multi-line text (newline after
    # every 5th word) and injects a guaranteed duplicate line — a repeat
    # of the first line — on every third doc; both engines build the
    # identical string, so the value hash pins the whole signal chain.
    from qsvspark.functions import add_line_dup_signals

    docs = _t(spark, sf, "documents")
    mt = F.regexp_replace(F.col("text"), r"((?:\S+\s+){4}\S+)\s+", "$1\n")
    withdup = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(mt, F.lit("\n"), F.substring_index(mt, "\n", 1)),
    ).otherwise(mt)
    return add_line_dup_signals(
        docs.select("doc_id", withdup.alias("mtext")), "mtext"
    ).select(
        "doc_id", "total_lines", "distinct_lines", "dup_line_chars",
        "dup_line_frac", "dup_line_char_frac",
    )


def q_vocab_topk(spark, sf):
    # corpus vocabulary head: partial-aggregated token histogram +
    # TakeOrderedAndProject; ties broken by token so the cut is stable
    from qsvspark.functions import vocab_topk

    return vocab_topk(_t(spark, sf, "documents"), k=20)


def q_span_pairs(spark, sf):
    # exact duplicated-span pairs (Lee et al. exact-substring flavor):
    # distinct shared 5-word spans per doc pair, boilerplate grams
    # capped at doc-frequency 50 before pair expansion
    from qsvspark.functions import shared_span_pairs

    return shared_span_pairs(_t(spark, sf, "documents"), k=5, max_df=50)


def q_semdedup(spark, sf):
    # SemDeDup: within-cluster cosine >= 0.45 drops the higher id; the
    # cluster assignment reuses the deterministic IVF centroids so the
    # generated oracle embeds identical literals. The registered path is
    # the BLAS per-cluster matmul (the 100-TB variant, 6x the join path
    # at sf0.1); pytest pins expr == blas verdict equality.
    from qsvspark.functions import semantic_dedup

    return semantic_dedup(
        _t(spark, sf, "embeddings"), _ivf_centroids(sf), threshold=0.45,
        method="blas",
    )


def q_dedup_exact(spark, sf):
    from qsvspark.functions import dedup_exact

    return dedup_exact(_t(spark, sf, "documents")).select("doc_id")


def q_minhash_pairs(spark, sf):
    # md5_60 hash family: the DuckDB oracle reproduces the ENTIRE
    # shingle → minhash → band → bucket-join pipeline value-for-value
    from qsvspark.functions import minhash_lsh_pairs

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return minhash_lsh_pairs(docs, num_hashes=16, bands=4, k=5, hash_fn="md5_60")


def q_dedup_groups(spark, sf):
    # pairs -> duplicate GROUPS: connected components (iterative
    # min-label propagation) over the md5_60 minhash pair graph; the
    # oracle computes the same closure with a recursive CTE
    from qsvspark.functions import connected_components, minhash_lsh_pairs

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=4, k=5, hash_fn="md5_60")
    return connected_components(pairs)


def q_simhash(spark, sf):
    from qsvspark.functions import simhash

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return simhash(docs, bits=60, hash_fn="md5_60").select("doc_id", "simhash")


def q_ngram_jaccard(spark, sf):
    from qsvspark.functions import ngram_jaccard

    docs = _t(spark, sf, "documents")
    pairs = docs.select(F.col("doc_id").alias("id_a")).filter("id_a < 50").withColumn(
        "id_b", F.col("id_a") + 1
    )
    return ngram_jaccard(pairs, docs, n=3)


def q_embedding_near_dups(spark, sf):
    from qsvspark.functions import embedding_near_dups

    out = embedding_near_dups(_t(spark, sf, "embeddings"), threshold=0.45)
    # the pair set is the semantic content; the raw cosine differs between
    # float32 (DuckDB) and double (Spark) in the 4th decimal
    return out.select("id_a", "id_b")


def q_embedding_near_dups_lsh(spark, sf):
    # the SCALE path for embedding dedup: banded hyperplane-LSH buckets
    # generate candidates (no all-pairs join), exact cosine verifies
    from qsvspark.functions import embedding_near_dups_lsh

    out = embedding_near_dups_lsh(
        _t(spark, sf, "embeddings"), threshold=0.45, dim=64, bits=16, bands=8,
        seed=42,
    )
    return out.select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))


def q_similarity_topk(spark, sf):
    from qsvspark.functions import brute_force_topk

    qv = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    out = brute_force_topk(_t(spark, sf, "embeddings"), qv, k=10)
    return out.select("vec_id", F.round("cos", 3).alias("cos_r"))


_QV_SQL = "[" + ", ".join(
    "1.0" if i % 7 == 0 else "0.1" for i in range(64)
) + "]::FLOAT[]"

# 60-bit cross-engine hash (== qsvspark.functions.dedup.hash60)
def _h60(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


_NORM = r"lower(regexp_replace(trim(text), '\s+', ' ', 'g'))"


def _minhash_oracle() -> str:
    """DuckDB replica of minhash_lsh_pairs(num_hashes=16, bands=4, k=5,
    hash_fn='md5_60'): shingle → 16 minhashes → 4 band buckets →
    bucket self-join → distinct candidate pairs."""
    hashes = ", ".join(
        "list_min(list_transform(sh, s -> "
        + _h60(f"s || '|{j}'")
        + f")) AS h{j}"
        for j in range(16)
    )
    band_cols = ", ".join(
        "concat_ws('-', "
        + ", ".join(f"CAST(h{b * 4 + r} AS VARCHAR)" for r in range(4))
        + f") AS b{b}"
        for b in range(4)
    )
    banded = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, b{b} AS bucket FROM sig" for b in range(4)
    )
    return (
        f"WITH n AS (SELECT doc_id, {_NORM} AS t FROM documents WHERE doc_id < 200),"
        " s AS (SELECT doc_id, list_distinct(list_transform("
        "   range(1, greatest(length(t) - 4, 1) + 1), i -> substr(t, i, 5))) AS sh FROM n),"
        f" hs AS (SELECT doc_id, {hashes} FROM s),"
        f" sig AS (SELECT doc_id, {band_cols} FROM hs),"
        f" b AS ({banded})"
        " SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b"
        " FROM b l JOIN b r ON l.band = r.band AND l.bucket = r.bucket"
        " AND l.doc_id < r.doc_id"
    )


def _simhash_oracle() -> str:
    """DuckDB replica of simhash(bits=60, hash_fn='md5_60')."""
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> "
        f"CASE WHEN (h & {1 << b}) != 0 THEN 1 ELSE -1 END)) > 0"
        f" THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(60)
    )
    return (
        f"WITH n AS (SELECT doc_id, {_NORM} AS t FROM documents WHERE doc_id < 200),"
        f" w AS (SELECT doc_id, list_transform(string_split(t, ' '),"
        f"  w -> {_h60('w')}) AS hs FROM n)"
        f" SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM w"
    )


_TOK_SQL = (
    "SELECT printf('%s/part-%04d/doc-%012d', source, doc_id % 64, doc_id) AS doc_id,"
    " CAST(16 + (n_chars % 497) AS INT) AS n_tok, source, doc_id AS rid"
    " FROM documents"
)


# --- multimodal oracles: synth_media derives every value from media_id
# via the md5-60 family, so DuckDB rebuilds payload bytes + metadata
# exactly (qsvspark/functions/multimodal.py:media_hash) -----------------

def _mm_h(tag: str, extra: str | None = None) -> str:
    parts = ["'mm'", "'42'", "CAST(i AS VARCHAR)", f"'{tag}'"]
    if extra:
        parts.append(extra)
    return _h60(f"concat_ws('|', {', '.join(parts)})")


_MEDIA_SQL = (
    "SELECT CAST(i AS BIGINT) AS media_id,"
    f" (['image','audio','video'])[CAST({_mm_h('kind')} % 3 AS INT) + 1] AS kind,"
    f" list_transform(range(0, 64), j ->"
    f" CAST({_mm_h('b', 'CAST(j AS VARCHAR)')} % 256 AS INT)) AS b,"
    f" CAST({_mm_h('w')} % 1920 + 1 AS INT) AS w,"
    f" CAST({_mm_h('h')} % 1080 + 1 AS INT) AS h,"
    f" CAST({_mm_h('nf')} % 300 + 1 AS INT) AS nf"
    " FROM range(0, 500) t(i)"
)


def _multimodal_oracle() -> str:
    """DuckDB replica of extract_features(synth_media(500, 42)): the
    byte-level features recomputed from the generator formula (numpy
    histogram bin = byte // 16; mean = sum/64, exact in float64)."""
    return (
        f"WITH m AS ({_MEDIA_SQL})"
        " SELECT media_id, kind, CAST(64 AS INT) AS n_bytes,"
        " round(list_sum(b) / 64.0, 4) AS byte_mean_r,"
        " array_to_string(list_transform(range(0, 16),"
        " k -> CAST(len(list_filter(b, x -> x // 16 = k)) AS VARCHAR)), ',')"
        " AS byte_hist_str,"
        " round(CAST(w AS DOUBLE) / h, 4) AS aspect_r"
        " FROM m"
    )


def _frame_sample_oracle() -> str:
    """DuckDB replica of sample_frames(synth_media(500, 42), every_n=10)."""
    fp = _h60("concat_ws('|', 'fp', CAST(media_id AS VARCHAR), CAST(fn AS VARCHAR))")
    return (
        f"WITH m AS ({_MEDIA_SQL}),"
        " v AS (SELECT media_id, unnest(list_filter(range(0, nf),"
        " x -> x % 10 = 0)) AS fn FROM m WHERE kind = 'video')"
        f" SELECT media_id, CAST(fn AS INT) AS frame_no, {fp} AS frame_fingerprint"
        " FROM v"
    )


# --- LSH oracles: the hyperplane LSH is deterministic (seeded planes),
# and every float op in qsvspark.functions.similarity/dedup is a
# SEQUENTIAL left fold (F.aggregate) — replicated here as explicit
# left-associated addition chains, so signatures, hamming probes, band
# buckets, and the exact-cosine verify reproduce bit-for-bit ------------

def _chain(terms: list[str]) -> str:
    # ((t0 + t1) + t2)... == Spark's aggregate fold (0.0 + t0 == t0)
    return "(" + " + ".join(terms) + ")"


def _sig_sql(planes: list[list[float]], vec: str = "embedding") -> str:
    """Signature expression replica: bit b set iff dot(vec, plane_b) > 0.
    The embedding is promoted float→double BEFORE the multiply (Spark
    zip_with with a double literal promotes the float side)."""
    terms = []
    for b, plane in enumerate(planes):
        dot = _chain(
            [f"CAST({vec}[{i + 1}] AS DOUBLE) * {p!r}" for i, p in enumerate(plane)]
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _pair_cos_sql(va: str, vb: str, dim: int = 64) -> str:
    """cosine(a, b) replica for two float vectors: zip_with multiplies in
    FLOAT then casts to double ((x*y).cast('double') in dedup._dot)."""
    dot = _chain([f"CAST({va}[{k}] * {vb}[{k}] AS DOUBLE)" for k in range(1, dim + 1)])
    na = "sqrt(" + _chain(
        [f"CAST({va}[{k}] * {va}[{k}] AS DOUBLE)" for k in range(1, dim + 1)]
    ) + ")"
    nb = "sqrt(" + _chain(
        [f"CAST({vb}[{k}] * {vb}[{k}] AS DOUBLE)" for k in range(1, dim + 1)]
    ) + ")"
    return f"round({dot} / ({na} * {nb}), 6)"


def _ann_oracle(k: int = 10, bits: int = 12, probe_hamming: int = 4,
                seed: int = 42, dim: int = 64) -> str:
    from qsvspark.functions.similarity import _hyperplanes, query_signature

    qv = [1.0 if i % 7 == 0 else 0.1 for i in range(dim)]
    planes = _hyperplanes(dim, bits, seed)
    sig = _sig_sql(planes)
    qsig = query_signature(qv, planes)

    dot_q = _chain(
        [f"CAST(embedding[{i + 1}] AS DOUBLE) * {q!r}" for i, q in enumerate(qv)]
    )
    # norm(embedding): float*float multiply happens in FLOAT, THEN casts
    # to double — (x*x).cast('double') in dedup._norm
    norm_a = "sqrt(" + _chain(
        [f"CAST(embedding[{i + 1}] * embedding[{i + 1}] AS DOUBLE)" for i in range(dim)]
    ) + ")"
    nq_sum = 0.0
    for q in qv:  # sequential fold, IEEE-identical to Spark's aggregate
        nq_sum += q * q
    norm_q = f"sqrt({nq_sum!r})"
    cos6 = f"round({dot_q} / ({norm_a} * {norm_q}), 6)"
    return (
        f"WITH s AS (SELECT vec_id, embedding, {sig} AS sig FROM embeddings),"
        f" cand AS (SELECT vec_id, embedding FROM s"
        f" WHERE bit_count(xor(sig, CAST({qsig} AS BIGINT))) <= {probe_hamming})"
        f" SELECT vec_id, round({cos6}, 3) AS cos_r FROM cand"
        f" ORDER BY {cos6} DESC, vec_id LIMIT {k}"
    )


def _near_dups_lsh_oracle(threshold: float = 0.45, bits: int = 16,
                          bands: int = 8, seed: int = 42, dim: int = 64) -> str:
    """DuckDB replica of embedding_near_dups_lsh: signature → band
    buckets ((sig >> b*r) & mask) → bucket self-join candidates → exact
    cosine verify at the threshold."""
    from qsvspark.functions.similarity import _hyperplanes

    r = bits // bands
    mask = (1 << r) - 1
    planes = _hyperplanes(dim, bits, seed)
    sig = _sig_sql(planes)
    banded = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, (sig >> {b * r}) & {mask} AS bucket FROM s"
        for b in range(bands)
    )
    cos6 = _pair_cos_sql("va", "vb", dim)
    return (
        f"WITH s AS (SELECT vec_id, {sig} AS sig FROM embeddings),"
        f" b AS ({banded}),"
        " cand AS (SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b"
        " FROM b l JOIN b r ON l.band = r.band AND l.bucket = r.bucket"
        " AND l.vec_id < r.vec_id),"
        " v AS (SELECT c.id_a, c.id_b, ea.embedding AS va, eb.embedding AS vb"
        " FROM cand c JOIN embeddings ea ON ea.vec_id = c.id_a"
        " JOIN embeddings eb ON eb.vec_id = c.id_b)"
        f" SELECT id_a, id_b, round({cos6}, 4) AS cos_r FROM v"
        f" WHERE {cos6} >= {threshold}"
    )


def q_similarity_ann(spark, sf):
    from qsvspark.functions import lsh_ann_topk

    qv = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    out = lsh_ann_topk(_t(spark, sf, "embeddings"), qv, k=10, bits=12, probe_hamming=4)
    return out.select("vec_id", F.round("cos", 3).alias("cos_r"))


# --- IVF ANN: centroids are trained ONCE per sf_dir by a deterministic
# pyarrow+numpy Lloyd pass (qsvspark/functions/similarity.py:_lloyd) so
# the Spark query and the generated DuckDB oracle embed IDENTICAL
# centroid literals. The driver's value comparison runs at sf0.01
# (TESTDATA.md); the oracle trains on that path (env-overridable).
_IVF_N, _IVF_SAMPLE, _IVF_NPROBE = 8, 128, 3
_IVF_CACHE: dict[str, list[list[float]]] = {}


def _ivf_centroids(sf_dir: str) -> list[list[float]]:
    if sf_dir not in _IVF_CACHE:
        from qsvspark.functions.similarity import train_ivf_centroids_from_parquet

        _IVF_CACHE[sf_dir] = train_ivf_centroids_from_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            n_centroids=_IVF_N, sample_n=_IVF_SAMPLE,
        )
    return _IVF_CACHE[sf_dir]


def q_similarity_ivf(spark, sf):
    from qsvspark.functions import ivf_topk

    qv = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    out = ivf_topk(
        _t(spark, sf, "embeddings"), qv, _ivf_centroids(sf), k=10, nprobe=_IVF_NPROBE
    )
    return out.select("vec_id", F.round("cos", 3).alias("cos_r"))


def _ivf_oracle(k: int = 10) -> str:
    """DuckDB replica of ivf_topk: per-centroid round-6 cosines →
    first-index argmax (list_indexof, 1-based like Spark array_position)
    → probed-cell filter → exact rerank on the query vector."""
    from qsvspark.functions.similarity import probed_centroids

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    cents = _ivf_centroids(sf_dir)
    qv = [1.0 if i % 7 == 0 else 0.1 for i in range(64)]
    probe = probed_centroids(qv, cents, _IVF_NPROBE)
    c_sql = ["[" + ", ".join(repr(v) for v in c) + "]::FLOAT[]" for c in cents]
    sims = "[" + ", ".join(
        f"round(list_cosine_similarity(embedding, {c}), 6)" for c in c_sql
    ) + "]"
    cos6 = f"round(list_cosine_similarity(embedding, {_QV_SQL}), 6)"
    probe_in = ", ".join(str(p + 1) for p in probe)
    return (
        f"SELECT vec_id, round(CAST({cos6} AS DOUBLE), 3) AS cos_r FROM embeddings"
        f" WHERE list_indexof({sims}, list_aggregate({sims}, 'max')) IN ({probe_in})"
        f" ORDER BY {cos6} DESC, vec_id LIMIT {k}"
    )


def _semdedup_oracle(threshold: float = 0.45) -> str:
    """DuckDB replica of semantic_dedup over the same baked centroid
    literals as the IVF oracle: 1-based list_indexof argmax → 0-based
    cluster, within-cluster lower-id round-6 cosine >= threshold drops
    the higher id."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    cents = _ivf_centroids(sf_dir)
    c_sql = ["[" + ", ".join(repr(v) for v in c) + "]::FLOAT[]" for c in cents]
    sims = "[" + ", ".join(
        f"round(list_cosine_similarity(embedding, {c}), 6)" for c in c_sql
    ) + "]"
    return (
        f"WITH assigned AS (SELECT vec_id, embedding,"
        f" CAST(list_indexof({sims}, list_aggregate({sims}, 'max')) - 1 AS INT)"
        f" AS cluster FROM embeddings),"
        f" dropped AS (SELECT DISTINCT b.vec_id FROM assigned a"
        f" JOIN assigned b ON a.cluster = b.cluster AND a.vec_id < b.vec_id"
        f" WHERE round(list_cosine_similarity(a.embedding, b.embedding), 6)"
        f" >= {threshold})"
        f" SELECT vec_id, cluster,"
        f" vec_id NOT IN (SELECT vec_id FROM dropped) AS kept FROM assigned"
    )


def q_pipeline_parse(spark, sf):
    """North-star parse stage (Arrow-vectorized grok UDF) over a
    documents-derived tokens table; tokens serialized to a string so the
    oracle value-hash proves per-row token-array equality."""
    from qsvspark.pipeline.northstar import parse_stage
    from qsvspark.pipeline.tokens import tokens_from_documents

    tok = tokens_from_documents(_t(spark, sf, "documents"))
    out = parse_stage(tok, "arrow")
    return out.select(
        "doc_id", "parsed_source", "shard", "seq", "n_tok",
        F.concat_ws(",", F.col("tokens")).alias("tokens_str"),
    )


def q_pipeline_quarantine(spark, sf):
    """Dead-letter classification (quarantine_stage) over a
    deterministically-dirtied tokens table: rid % 97 → corrupt doc_id
    (unparseable), rid % 89 → an unknown source embedded consistently
    (enrich miss), rid % 83 → the source column disagrees with the
    doc_id (mismatch). Every mutation is a cross-engine expression, so
    the DuckDB oracle replicates the full parse → enrich → classify
    pipeline value-for-value."""
    from qsvspark.pipeline.northstar import (
        enrich_stage, parse_stage, quarantine_stage,
    )
    from qsvspark.pipeline.tokens import doc_source_dim

    docs = _t(spark, sf, "documents")
    base = docs.select(F.col("doc_id").alias("rid"), "source")
    rid = F.col("rid")
    eff_src = F.when(rid % 89 == 0, F.lit("src9999")).otherwise(F.col("source"))
    did = F.format_string(
        "%s/part-%04d/doc-%012d", eff_src, F.pmod(rid, F.lit(64)).cast("int"), rid
    )
    did = F.when(
        rid % 97 == 0, F.concat(F.lit("corrupt-"), rid.cast("string"))
    ).otherwise(did)
    src_col = F.when(
        (rid % 83 == 0) & (rid % 89 != 0),
        F.when(eff_src == "src0", F.lit("src1")).otherwise(F.lit("src0")),
    ).otherwise(eff_src)
    dirty = base.select(did.alias("doc_id"), src_col.alias("source"))
    out = quarantine_stage(
        enrich_stage(parse_stage(dirty, "arrow"), doc_source_dim(docs))
    )
    return out.select("doc_id", "source", "sink", "error_reason")


def q_pipeline_aggregate(spark, sf):
    """North-star DAG: parse (Arrow grok UDF) → broadcast enrich →
    aggregate, over the documents-derived tokens table (route's write
    stage is exercised by tests/bench; a query() must stay read-only).
    Fully oracle-checked: per-sink seq counts, uniq doc counts, token
    sums — the north rule's per-sink aggregate equality."""
    from qsvspark.pipeline.northstar import aggregate_stage, enrich_stage, parse_stage
    from qsvspark.pipeline.tokens import doc_source_dim, tokens_from_documents

    docs = _t(spark, sf, "documents")
    tok = tokens_from_documents(docs)
    return aggregate_stage(enrich_stage(parse_stage(tok, "arrow"), doc_source_dim(docs)))


def q_pipeline_aggregate_salted(spark, sf):
    """Same aggregate through the two-level SALTED path (heavy-hitter
    spreading) — shares pipeline_aggregate's oracle, so the driver gate
    itself proves salting is exactly count/distinct/sum-preserving."""
    from qsvspark.pipeline.northstar import (
        aggregate_stage_salted, enrich_stage, parse_stage,
    )
    from qsvspark.pipeline.tokens import doc_source_dim, tokens_from_documents

    docs = _t(spark, sf, "documents")
    tok = tokens_from_documents(docs)
    return aggregate_stage_salted(
        enrich_stage(parse_stage(tok, "arrow"), doc_source_dim(docs)), salt_buckets=8
    )


def q_multimodal_features(spark, sf):
    # byte_hist serialized (the driver canonicalizer can't sort array
    # cells); floats rounded engine-side — fully value-oracle-checked
    # because synth_media derives everything from media_id via md5-60
    from qsvspark.functions.multimodal import extract_features, synth_media

    out = extract_features(synth_media(spark, 500, seed=42))
    return out.select(
        "media_id", "kind", "n_bytes",
        F.round("byte_mean", 4).alias("byte_mean_r"),
        F.concat_ws(",", F.col("byte_hist").cast("array<string>")).alias("byte_hist_str"),
        F.round("aspect_ratio", 4).alias("aspect_r"),
    )


def q_frame_sample(spark, sf):
    from qsvspark.functions.multimodal import sample_frames, synth_media

    return sample_frames(synth_media(spark, 500, seed=42), every_n=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "select": q_select,
        "select_range": q_select_range,
        "renamecol": q_renamecol,
        "isin_string": q_isin_string,
        "isin_numeric": q_isin_numeric,
        "contains": q_contains,
        "grep": q_grep,
        "sed": q_sed,
        "sort_head": q_sort_head,
        "tail": q_tail,
        "uniq": q_uniq,
        "count": q_count,
        "pivot": q_pivot,
        "timeline": q_timeline,
        "timeslice": q_timeslice,
        "timeround": q_timeround,
        "changetz": q_changetz,
        "convert": q_convert,
        # r4 retirements from the 50-slot driver budget (each operator's
        # base entry stays green; the variants remain pytest-verified):
        # convert_xml, timeline_avg, pivot_median, pivot_std made room
        # for seq_pack / contamination / pii_scrub / text_repetition.
        # sed_all was retired in r3 in favor of pipeline_quarantine.
        # r5: isin_empty (pinned by tests/test_ops_core.py
        # test_empty_values_empty_result; isin_string/isin_numeric stay
        # oracle-checked) made room for pack_sequences — the
        # materialized sequence table, full value oracle. Later in r5,
        # contains_ci / grep_invert / pivot_mean / timeline_sum (each a
        # flag/aggregator variant of a still-oracle-checked base op,
        # pinned by tests/test_functions.py
        # TestRetiredRegistryVariants) made room for line_dups /
        # vocab_topk / span_pairs / semdedup — four new training-data
        # operators, each with a full value oracle.
        "pipeline_quarantine": q_pipeline_quarantine,
        "pack_sequences": q_pack_sequences,
        "join": q_join,
        # join_left retired late in r5 for dedup_groups (pinned by
        # TestRetiredRegistryVariants; join stays oracle-checked)
        "concat": q_concat,
        "stats": q_stats,
        "seq_pack": q_seq_pack,
        "contamination": q_contamination,
        "pii_scrub": q_pii_scrub,
        "text_repetition": q_text_repetition,
        "text_tokens": q_text_tokens,
        "text_fingerprint": q_text_fingerprint,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        # multimodal entries sit well inside the driver's 50-query
        # recording budget (they were registered last and fell off the
        # r1/r2 CORRECTNESS artifacts — VERDICT r2 "what's wrong" #2)
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
        "line_dups": q_line_dups,
        "vocab_topk": q_vocab_topk,
        "span_pairs": q_span_pairs,
        "semdedup": q_semdedup,
        "dedup_exact": q_dedup_exact,
        "minhash_pairs": q_minhash_pairs,
        "dedup_groups": q_dedup_groups,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_near_dups_lsh": q_embedding_near_dups_lsh,
        "similarity_topk": q_similarity_topk,
        "similarity_ann": q_similarity_ann,
        "similarity_ivf": q_similarity_ivf,
        "pipeline_parse": q_pipeline_parse,
        "pipeline_aggregate": q_pipeline_aggregate,
        "pipeline_aggregate_salted": q_pipeline_aggregate_salted,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "select": "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem",
        "select_range": "SELECT n_regionkey, n_nationkey, n_name FROM nation",
        "renamecol": "SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation",
        "isin_string": (
            "SELECT event_id, event_type, user_id FROM events "
            "WHERE event_type IN ('click','error')"
        ),
        "isin_numeric": (
            "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber IN (1, 7)"
        ),
        "contains": (
            "SELECT doc_id, source FROM documents WHERE contains(text, 'spark')"
        ),
        # (r5) contains_ci / grep_invert / pivot_mean / timeline_sum
        # oracles retired with their registry slots — see queries().
        "grep": (
            "SELECT * FROM nation WHERE "
            "coalesce(regexp_matches(CAST(n_nationkey AS VARCHAR), '1$'), false) OR "
            "coalesce(regexp_matches(n_name, '1$'), false) OR "
            "coalesce(regexp_matches(CAST(n_regionkey AS VARCHAR), '1$'), false)"
        ),
        "sed": (
            "SELECT c_custkey, regexp_replace(c_name, '[0-9]', '#', 'g') AS c_name "
            "FROM customer"
        ),
        "sort_head": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 25"
        ),
        "tail": (
            "SELECT * FROM region ORDER BY r_regionkey DESC LIMIT 3"
        ),
        "uniq": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "count": (
            'SELECT o_orderstatus, COUNT(*) AS "count" FROM orders GROUP BY o_orderstatus'
        ),
        # outer CAST: DuckDB SUM(BIGINT) widens to HUGEINT, Spark stays long
        "pivot": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents_sum "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "timeline": (
            "SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') "
            'AS timeline_1h, COUNT(*) AS "count" FROM events GROUP BY 1'
        ),
        "timeslice": (
            "SELECT event_id, event_type FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' "
            "AND ts <= TIMESTAMP '2024-01-05 12:00:00'"
        ),
        "timeround": (
            "SELECT event_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') "
            "AS hour_bucket FROM events"
        ),
        # changetz: fixed-format path; Tokyo has no DST → exact +9h oracle.
        # (the "auto"-parse + ambiguous-DST policy paths have no SQL
        # equivalent and are covered by pytest golden tests instead)
        "changetz": (
            "SELECT event_id, strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d %H:%M:%S')"
            " AS ts_str FROM events WHERE event_id < 500"
        ),
        # convert json→json prettify: the flat single-key props payload
        # makes Python's indent-2 sorted rendering SQL-constructible
        "convert": (
            "SELECT event_id, '{' || chr(10) || '  \"k\": ' ||"
            " CAST(props::JSON->>'k' AS VARCHAR) || chr(10) || '}' AS props"
            " FROM events"
        ),
        # (r4) convert_xml / timeline_avg / pivot_median / pivot_std
        # oracles retired with their registry slots — see queries().
        # seq_pack / contamination / text_repetition tokenize with the
        # LIBRARY tokenizer semantics (trim + \s+), not single-space
        # split — ADVICE r4: single-space only agreed because fixture
        # text happens to be strictly single-space separated.
        "seq_pack": (
            "WITH t AS (SELECT doc_id,"
            r" CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)"
            " AS n_tok FROM documents),"
            " c AS (SELECT doc_id, n_tok,"
            " CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
            " AS global_offset FROM t)"
            " SELECT doc_id, n_tok, global_offset,"
            " CAST(global_offset // 256 AS BIGINT) AS first_seq,"
            " CAST((global_offset + greatest(n_tok, 1) - 1) // 256 AS BIGINT)"
            " AS last_seq,"
            " CAST((global_offset + greatest(n_tok, 1) - 1) // 256"
            " > global_offset // 256 AS INT) AS spans_boundary"
            " FROM c"
        ),
        "contamination": (
            r"WITH w AS (SELECT doc_id,"
            r" string_split_regex(trim(lower(text)), '\s+') AS ws"
            " FROM documents),"
            " bench AS (SELECT DISTINCT unnest(list_transform("
            " generate_series(1, len(ws) - 2),"
            " i -> array_to_string(ws[i:i+2], ' '))) AS g"
            " FROM w WHERE doc_id % 97 = 0),"
            " cand AS (SELECT DISTINCT doc_id, unnest(list_transform("
            " generate_series(1, len(ws) - 2),"
            " i -> array_to_string(ws[i:i+2], ' '))) AS g"
            " FROM w WHERE doc_id % 97 <> 0)"
            " SELECT cand.doc_id, CAST(count(*) AS BIGINT) AS n_matched"
            " FROM cand JOIN bench USING (g) GROUP BY cand.doc_id"
        ),
        "pii_scrub": (
            "WITH raw AS (SELECT doc_id,"
            " 'contact ' || source || '_' || CAST(doc_id AS VARCHAR)"
            " || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
            " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
            " || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
            " || ' tel 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
            " || ' ' || text AS s FROM documents)"
            # the chain mirrors functions/text.py:PII_PATTERNS order
            # exactly: email, IP, SSN, then the two r5 phone forms
            # (parenthesized area code, international +CC) BEFORE the
            # bare NNN-NNN-NNNN rule
            " SELECT doc_id, regexp_replace(regexp_replace(regexp_replace("
            " regexp_replace(regexp_replace(regexp_replace(s,"
            r" '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),"
            r" '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),"
            " '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),"
            r" '\([0-9]{3}\)[-. ]?[0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),"
            r" '\+[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{3,4}[-. ][0-9]{3,4}',"
            " '<PHONE>', 'g'),"
            r" '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g')"
            " AS scrubbed FROM raw"
        ),
        "text_repetition": (
            r"WITH w AS (SELECT doc_id,"
            r" string_split_regex(trim(lower(text)), '\s+') AS ws"
            " FROM documents),"
            " wc AS (SELECT doc_id, t, count(*) AS c"
            " FROM (SELECT doc_id, unnest(ws) AS t FROM w) GROUP BY 1, 2),"
            " wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_words,"
            " CAST(count(*) AS BIGINT) AS distinct_words,"
            " CAST(max(c) AS BIGINT) AS top_word_count FROM wc GROUP BY 1),"
            " bc AS (SELECT doc_id, g, count(*) AS c FROM"
            " (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),"
            " i -> array_to_string(ws[i:i+1], ' '))) AS g FROM w) GROUP BY 1, 2),"
            " ba AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_count"
            " FROM bc GROUP BY 1)"
            " SELECT wa.doc_id, total_words, distinct_words, top_word_count,"
            " coalesce(ba.top_bigram_count, 0) AS top_bigram_count"
            " FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id"
        ),
        "pipeline_quarantine": (
            r"WITH base AS (SELECT doc_id AS rid, source FROM documents),"
            r" eff AS (SELECT rid,"
            r" CASE WHEN rid % 89 = 0 THEN 'src9999' ELSE source END AS eff_src"
            r" FROM base),"
            r" dirty AS (SELECT"
            r" CASE WHEN rid % 97 = 0 THEN 'corrupt-' || CAST(rid AS VARCHAR)"
            r" ELSE printf('%s/part-%04d/doc-%012d', eff_src, rid % 64, rid)"
            r" END AS doc_id,"
            r" CASE WHEN rid % 83 = 0 AND rid % 89 <> 0 THEN"
            r" (CASE WHEN eff_src = 'src0' THEN 'src1' ELSE 'src0' END)"
            r" ELSE eff_src END AS source FROM eff),"
            r" dim AS (SELECT DISTINCT source, 'sink_' ||"
            r" (CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 4) AS sink"
            r" FROM documents),"
            r" parsed AS (SELECT d.doc_id, d.source,"
            r" NULLIF(regexp_extract(d.doc_id,"
            r" '^(src\d+)/part-(\d+)/doc-(\d+)$', 1), '') AS parsed_source,"
            r" m.sink AS sink0 FROM dirty d LEFT JOIN dim m USING (source)),"
            r" classified AS (SELECT *,"
            r" CASE WHEN parsed_source IS NULL THEN 'unparseable_doc_id'"
            r" WHEN parsed_source <> source THEN 'source_mismatch'"
            r" WHEN sink0 IS NULL THEN 'unknown_source' END AS error_reason"
            r" FROM parsed)"
            r" SELECT doc_id, source,"
            r" CASE WHEN error_reason IS NOT NULL THEN 'sink_quarantine'"
            r" ELSE sink0 END AS sink, error_reason FROM classified"
        ),
        # (r5) isin_empty oracle retired with its registry slot.
        "pack_sequences": (
            # the full materialized-sequence oracle: per-word byte-length
            # tokens (strlen = UTF8 octet_length), global cumsum offsets,
            # explode token positions, regroup by position // seq_len;
            # n_docs counts every doc whose [first_seq..last_seq] span
            # covers the sequence — the exact chunked-layout contract
            r"WITH t AS (SELECT doc_id,"
            r" list_transform(string_split_regex(trim(text), '\s+'),"
            r" w -> CAST(strlen(w) AS INT)) AS toks FROM documents),"
            " c AS (SELECT doc_id, toks,"
            " CAST(len(toks) AS BIGINT) AS n_tok,"
            " CAST(coalesce(sum(len(toks)) OVER (ORDER BY doc_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
            " AS off FROM t),"
            " pos AS (SELECT doc_id,"
            " off + unnest(generate_series(1, len(toks))) - 1 AS p,"
            " toks[unnest(generate_series(1, len(toks)))] AS tok FROM c),"
            " seqs AS (SELECT CAST(p // 64 AS BIGINT) AS seq_id,"
            " string_agg(CAST(tok AS VARCHAR), ',' ORDER BY p) AS tokens_csv,"
            " CAST(count(*) AS BIGINT) AS n_tokens FROM pos GROUP BY 1),"
            " span AS (SELECT doc_id,"
            " unnest(generate_series(off // 64,"
            " (off + greatest(n_tok, 1) - 1) // 64)) AS seq_id FROM c),"
            " nd AS (SELECT CAST(seq_id AS BIGINT) AS seq_id,"
            " CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs"
            " FROM span GROUP BY 1)"
            " SELECT seqs.seq_id, tokens_csv, n_docs, n_tokens"
            " FROM seqs JOIN nd USING (seq_id)"
        ),
        "minhash_pairs": _minhash_oracle(),
        # connected components over the same pair graph: DuckDB computes
        # the transitive closure with a recursive CTE (UNION dedups, so
        # the fixpoint terminates), then min-label per source — exactly
        # the label the Spark iterative propagation converges to
        "dedup_groups": (
            "WITH RECURSIVE pairs AS (" + _minhash_oracle() + "),"
            " cc_edges AS ("
            " SELECT id_a AS src, id_b AS dst FROM pairs"
            " UNION SELECT id_b, id_a FROM pairs),"
            " reach(src, dst) AS ("
            " SELECT src, src FROM cc_edges"
            " UNION"
            " SELECT r.src, e.dst FROM reach r JOIN cc_edges e ON r.dst = e.src)"
            " SELECT src AS id, CAST(min(dst) AS BIGINT) AS group_id"
            " FROM reach GROUP BY src"
        ),
        "simhash": _simhash_oracle(),
        "pipeline_parse": (
            f"WITH tok AS ({_TOK_SQL})"
            r" SELECT doc_id,"
            r" regexp_extract(doc_id, '^(src\d+)/part-(\d+)/doc-(\d+)$', 1) AS parsed_source,"
            r" CAST(regexp_extract(doc_id, '^(src\d+)/part-(\d+)/doc-(\d+)$', 2) AS INT) AS shard,"
            r" CAST(regexp_extract(doc_id, '^(src\d+)/part-(\d+)/doc-(\d+)$', 3) AS BIGINT) AS seq,"
            r" n_tok,"
            r" array_to_string(list_transform(range(0, n_tok),"
            r" i -> CAST((rid * 31 + i * 2654435761) % 50257 AS INT)), ',') AS tokens_str"
            r" FROM tok"
        ),
        "pipeline_aggregate": (
            f"WITH tok AS ({_TOK_SQL}),"
            r" dim AS (SELECT DISTINCT source, 'sink_' ||"
            r" (CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 4) AS sink FROM documents),"
            r" routed AS (SELECT t.*, d.sink FROM tok t LEFT JOIN dim d USING (source))"
            r" SELECT sink, source, CAST((n_tok // 64) * 64 AS INT) AS n_tok_bucket,"
            r" COUNT(*) AS seq_count, COUNT(DISTINCT doc_id) AS uniq_docs,"
            r" CAST(SUM(n_tok) AS BIGINT) AS tok_sum"
            r" FROM routed GROUP BY 1, 2, 3"
        ),
        "pipeline_aggregate_salted": (
            f"WITH tok AS ({_TOK_SQL}),"
            r" dim AS (SELECT DISTINCT source, 'sink_' ||"
            r" (CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 4) AS sink FROM documents),"
            r" routed AS (SELECT t.*, d.sink FROM tok t LEFT JOIN dim d USING (source))"
            r" SELECT sink, source, CAST((n_tok // 64) * 64 AS INT) AS n_tok_bucket,"
            r" COUNT(*) AS seq_count, COUNT(DISTINCT doc_id) AS uniq_docs,"
            r" CAST(SUM(n_tok) AS BIGINT) AS tok_sum"
            r" FROM routed GROUP BY 1, 2, 3"
        ),
        "join": (
            "SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        # (r5) join_left oracle retired with its registry slot.
        "concat": "SELECT * FROM region UNION ALL SELECT * FROM region",
        "text_tokens": (
            r"SELECT doc_id, "
            r"CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens, "
            r"CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)"
            r" AS n_bpe_tokens FROM documents"
        ),
        "text_fingerprint": (
            r"SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))"
            r" AS fingerprint FROM documents"
        ),
        "text_quality": (
            r"WITH q AS (SELECT doc_id,"
            r" len(string_split_regex(trim(text), '\s+')) AS nw,"
            r" len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE / length(text) AS pr,"
            r" len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),"
            r" ['the','and','of','to','in','is','that','for','with','as'])) AS ns"
            r" FROM documents)"
            r" SELECT doc_id, CAST(nw AS BIGINT) AS q_n_words,"
            r" CAST(ns AS BIGINT) AS q_stopword_hits,"
            r" round(round(pr, 6), 4) AS punct_r,"
            r" round(round(least(nw/100.0, 1.0)*0.4 + (1-least(round(pr,6)*5, 1.0))*0.3"
            r" + least(ns/5.0, 1.0)*0.3, 6), 4) AS score_r FROM q"
        ),
        "lang_id": (
            r"WITH w AS (SELECT doc_id,"
            r" list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS ws FROM documents),"
            r" s AS (SELECT doc_id,"
            r" len(list_intersect(ws, ['the','and','of','to','in','is','that','for','with','as'])) AS s_en,"
            r" len(list_intersect(ws, ['der','die','das','und','ist','nicht','mit','ein','zu','den'])) AS s_de,"
            r" len(list_intersect(ws, ['le','la','les','et','est','pas','pour','que','une','dans'])) AS s_fr,"
            r" len(list_intersect(ws, ['el','la','los','que','de','no','es','por','con','para'])) AS s_es"
            r" FROM w)"
            r" SELECT doc_id, CASE"
            r" WHEN s_en > 0 AND s_en = greatest(s_en,s_de,s_fr,s_es) THEN 'en'"
            r" WHEN s_de > 0 AND s_de = greatest(s_en,s_de,s_fr,s_es) THEN 'de'"
            r" WHEN s_fr > 0 AND s_fr = greatest(s_en,s_de,s_fr,s_es) THEN 'fr'"
            r" WHEN s_es > 0 AND s_es = greatest(s_en,s_de,s_fr,s_es) THEN 'es'"
            r" ELSE 'unknown' END AS lang_pred FROM s"
        ),
        "dedup_exact": (
            r"SELECT MIN(doc_id) AS doc_id FROM documents"
            r" GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))"
        ),
        # line_dups synthesizes the identical multi-line string in both
        # engines (newline after every 5th word; doc_id%3==0 repeats the
        # first line), then replicates add_line_dup_signals with list ops
        "line_dups": (
            r"WITH m AS (SELECT doc_id, regexp_replace(text,"
            r" '((?:\S+\s+){4}\S+)\s+', '\1' || chr(10), 'g') AS mt"
            r" FROM documents),"
            r" s AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0"
            r" THEN mt || chr(10) || string_split(mt, chr(10))[1]"
            r" ELSE mt END AS t FROM m),"
            r" l AS (SELECT doc_id, list_filter(list_transform("
            r" string_split(t, chr(10)), x -> trim(x)), x -> len(x) > 0) AS ls"
            r" FROM s),"
            r" c AS (SELECT doc_id,"
            r" CAST(len(ls) AS BIGINT) AS total_lines,"
            r" CAST(len(list_distinct(ls)) AS BIGINT) AS distinct_lines,"
            r" CAST(coalesce(list_sum(list_transform(ls, x -> len(x))), 0)"
            r" AS BIGINT) AS all_chars,"
            r" CAST(coalesce(list_sum(list_transform(list_distinct(ls),"
            r" x -> len(x))), 0) AS BIGINT) AS distinct_chars FROM l)"
            r" SELECT doc_id, total_lines, distinct_lines,"
            r" all_chars - distinct_chars AS dup_line_chars,"
            r" round(CASE WHEN total_lines > 0 THEN"
            r" (total_lines - distinct_lines) / total_lines ELSE 0.0 END, 6)"
            r" AS dup_line_frac,"
            r" round(CASE WHEN all_chars > 0 THEN"
            r" (all_chars - distinct_chars) / all_chars ELSE 0.0 END, 6)"
            r" AS dup_line_char_frac FROM c"
        ),
        "vocab_topk": (
            r"SELECT t AS token, CAST(count(*) AS BIGINT) AS cnt FROM"
            r" (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t"
            r" FROM documents)"
            r" GROUP BY t ORDER BY cnt DESC, token LIMIT 20"
        ),
        # span_pairs counts the gram STRINGS the Spark side counts as
        # xxhash64 lanes — a cross-doc hash collision would surface here
        # as a value mismatch (accepted ~2^-64 bound)
        "span_pairs": (
            r"WITH w AS (SELECT doc_id,"
            r" string_split_regex(trim(lower(text)), '\s+') AS ws"
            r" FROM documents),"
            r" g AS (SELECT DISTINCT doc_id, unnest(list_transform("
            r" generate_series(1, len(ws) - 4),"
            r" i -> array_to_string(ws[i:i+4], ' '))) AS gram FROM w),"
            r" keep AS (SELECT doc_id, gram FROM g QUALIFY"
            r" count(*) OVER (PARTITION BY gram) BETWEEN 2 AND 50)"
            r" SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            r" CAST(count(*) AS BIGINT) AS n_spans"
            r" FROM keep a JOIN keep b"
            r" ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2"
        ),
        "semdedup": _semdedup_oracle(),
        "ngram_jaccard": (
            r"WITH g AS (SELECT doc_id, list_distinct(list_transform("
            r" range(0, greatest(len(w) - 3, 0) + 1),"
            r" i -> concat_ws(' ', w[i+1], w[i+2], w[i+3]))) AS grams"
            r" FROM (SELECT doc_id, string_split("
            r" lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS w FROM documents))"
            r" SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            r" round(CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0"
            r" THEN len(list_intersect(a.grams, b.grams))::DOUBLE"
            r" / len(list_distinct(list_concat(a.grams, b.grams))) ELSE 0.0 END, 6) AS jaccard"
            r" FROM g a JOIN g b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id < 50"
        ),
        "embedding_near_dups": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b"
            " FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id"
            " WHERE round(list_cosine_similarity(a.embedding, b.embedding), 6) >= 0.45"
        ),
        "similarity_topk": (
            f"SELECT vec_id, round(CAST(round(list_cosine_similarity(embedding, {_QV_SQL}), 6) AS DOUBLE), 3)"
            f" AS cos_r FROM embeddings"
            f" ORDER BY round(list_cosine_similarity(embedding, {_QV_SQL}), 6) DESC, vec_id"
            f" LIMIT 10"
        ),
        # the LSH probe is approximate vs brute force, but DETERMINISTIC
        # given its seed — the oracle replays the signature/probe/rerank
        # pipeline value-for-value (recall vs brute force is separately
        # asserted in pytest)
        "similarity_ann": _ann_oracle(),
        "similarity_ivf": _ivf_oracle(),
        "embedding_near_dups_lsh": _near_dups_lsh_oracle(),
        "multimodal_features": _multimodal_oracle(),
        "frame_sample": _frame_sample_oracle(),
        "stats": (
            "SELECT 'o_orderkey' AS \"column\", 'bigint' AS dtype, "
            "COUNT(o_orderkey) AS \"count\", 0 AS null_count, "
            "ROUND(AVG(o_orderkey), 4) AS mean_r, "
            "ROUND(STDDEV_SAMP(o_orderkey), 4) AS std_r, "
            "CAST(MIN(o_orderkey) AS VARCHAR) AS min, "
            "CAST(MAX(o_orderkey) AS VARCHAR) AS max, "
            "ROUND(QUANTILE_CONT(o_orderkey, 0.25), 4) AS p25_r, "
            "ROUND(QUANTILE_CONT(o_orderkey, 0.50), 4) AS p50_r, "
            "ROUND(QUANTILE_CONT(o_orderkey, 0.75), 4) AS p75_r "
            "FROM orders"
        ),
    }
