"""Structured Streaming ingest: micro-batch drain, exactly-once resume,
and batch-parity of the routed output."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qsvspark.pipeline import synth_tokens
from qsvspark.pipeline.tokens import source_dim
from qsvspark.pipeline.northstar import enrich_stage, parse_stage
from qsvspark.streaming import routed_stream, run_available_now


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    # two "arriving" file batches
    synth_tokens(spark, 3000, seed=11, num_partitions=2).write.parquet(
        os.path.join(inp, "batch1")
    )
    synth_tokens(spark, 2000, seed=12, num_partitions=2).write.parquet(
        os.path.join(inp, "batch2")
    )
    return inp, out, ckpt


class TestStreamingIngest:
    def test_drain_and_batch_parity(self, spark, stream_dirs):
        inp, out, ckpt = stream_dirs
        dim = source_dim(spark)
        q = run_available_now(
            routed_stream(spark, inp + "/*/", dim), out, ckpt
        )
        q.awaitTermination(120)
        routed = spark.read.parquet(out)
        assert routed.count() == 5000
        # identical rows to the batch pipeline over the same input
        batch = enrich_stage(
            parse_stage(spark.read.parquet(inp + "/*/"), "arrow"), dim
        ).select(*routed.columns)
        assert routed.exceptAll(batch).count() == 0
        assert batch.exceptAll(routed).count() == 0
        # routed layout: one directory per sink
        sinks = {d for d in os.listdir(out) if d.startswith("sink=")}
        assert len(sinks) == 4

    def test_restart_skips_committed_files(self, spark, stream_dirs):
        inp, out, ckpt = stream_dirs
        dim = source_dim(spark)
        q = run_available_now(routed_stream(spark, inp + "/*/", dim), out, ckpt)
        q.awaitTermination(120)
        # same checkpoint, no new files → no new rows (exactly-once)
        assert spark.read.parquet(out).count() == 5000

    def test_new_files_are_picked_up(self, spark, stream_dirs):
        inp, out, ckpt = stream_dirs
        synth_tokens(spark, 1000, seed=13, num_partitions=1).write.parquet(
            os.path.join(inp, "batch3")
        )
        dim = source_dim(spark)
        q = run_available_now(routed_stream(spark, inp + "/*/", dim), out, ckpt)
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == 6000
        # per-sink counts still match a direct batch aggregate
        direct = {
            r["sink"]: r["n"]
            for r in enrich_stage(
                parse_stage(spark.read.parquet(inp + "/*/"), "native"), dim
            ).groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        streamed = {
            r["sink"]: r["n"]
            for r in spark.read.parquet(out)
            .groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert streamed == direct


class TestStatefulDedup:
    def _drain(self, spark, inp, out, ckpt):
        from qsvspark.streaming import dedup_stream_exact
        from qsvspark.streaming.ingest import TOKENS_DDL

        stream = spark.readStream.schema(TOKENS_DDL).format("parquet").load(inp + "/*/")
        q = (
            dedup_stream_exact(stream, key_cols=["doc_id"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_cross_batch_dedup_with_restart(self, spark, tmp_path):
        """applyInPandasWithState keep-first across micro-batches AND
        across restarts (state persisted in the checkpoint): batch1 has
        3 distinct ids ×2 copies, batch2 repeats one id, a post-restart
        batch3 repeats another + adds a new one."""
        inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

        def write_batch(name, ids):
            df = spark.createDataFrame(
                [(f"doc-{i}", [1, 2], 2, "src00") for i in ids],
                "doc_id string, tokens array<int>, n_tok int, source string",
            )
            df.coalesce(1).write.parquet(os.path.join(inp, name))

        write_batch("batch1", [0, 0, 1, 1, 2, 2])
        write_batch("batch2", [2])
        self._drain(spark, inp, out, ckpt)
        got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
        assert got == ["doc-0", "doc-1", "doc-2"]

        write_batch("batch3", [1, 3])
        self._drain(spark, inp, out, ckpt)  # restart, same checkpoint
        got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
        assert got == ["doc-0", "doc-1", "doc-2", "doc-3"]
