"""Checkpoint-resume evidence for the CUSTOM Python stream source
(`sources/pysource.py::SyntheticEventsStreamReader`) — the
wrap-a-message-queue template, where resume is the whole point.

The file-source twin lives in tests/test_streaming_recovery.py; this
covers the failure class ADVICE r7 flagged for the Python reader: a
fresh reader instance starts with a driver-local cursor at 0, so
without the monotone guard in ``partitions()``/``commit()`` a restart
from an existing checkpoint reports offsets BELOW the committed
frontier and re-emits already-committed row ranges. The guard walks
the cursor to the engine-supplied high-water mark when the engine
replans the last uncommitted batch; this test proves the end-to-end
property: crash after a written-but-uncommitted batch, resume from the
same checkpoint, land every row exactly once.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_to_cassandra_spark.sources.pysource import (
    register_synthetic_stream_source,
)
from oracle_to_cassandra_spark.streaming.recovery import (
    idempotent_batch_writer,
)

TOTAL_ROWS = 4000
ROWS_PER_BATCH = 1000


class PlantedCrash(RuntimeError):
    pass


def _stream(spark):
    try:
        register_synthetic_stream_source(spark)
    except Exception:
        pass  # already registered in this session
    return (
        spark.readStream.format("synthetic_events_stream")
        .option("totalRows", str(TOTAL_ROWS))
        .option("rowsPerBatch", str(ROWS_PER_BATCH))
        .load()
    )


def _drain(spark, out_dir: str, ckpt: str, on_batch=None) -> None:
    """Default-trigger drain loop (NOT availableNow: this reader
    reveals its backlog one micro-batch per poll, and availableNow
    would snapshot only the first batch — see run_stream_to_memory)."""
    writer = idempotent_batch_writer(out_dir)

    def _write(batch_df, batch_id):
        writer(batch_df, batch_id)
        if on_batch is not None:
            on_batch(batch_df, batch_id)

    q = (
        _stream(spark)
        .writeStream.outputMode("append")
        .foreachBatch(_write)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def _digest(df):
    return df.agg(
        F.count("*").alias("n"),
        F.count_distinct("rid").alias("n_distinct"),
        F.sum("rid").alias("rid_sum"),
    ).first()


def test_pysource_crash_resume_exactly_once(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # --- run 1: batch 1's sink write succeeds, its checkpoint commit
    # does not (the hook raises AFTER the idempotent write) — the
    # worst-case redelivery window for a queue-backed source ---
    def crash_after_write(batch_df, batch_id):
        if batch_id == 1:
            raise PlantedCrash("planted crash after batch 1's write")

    with pytest.raises(Exception, match="planted crash"):
        _drain(spark, out_dir, ckpt, on_batch=crash_after_write)

    partial = spark.read.option("basePath", out_dir).parquet(out_dir)
    n_partial = partial.count()
    assert 0 < n_partial < TOTAL_ROWS, "crash did not land mid-stream"

    # --- run 2: FRESH reader instance (driver cursor back at 0),
    # same checkpoint. The engine replans batch 1 from checkpointed
    # offsets; the monotone guard must walk the new reader's cursor to
    # that frontier instead of re-announcing rows [0, 2000) ---
    _drain(spark, out_dir, ckpt)

    got = spark.read.option("basePath", out_dir).parquet(out_dir)
    d = _digest(got)
    assert d["n"] == TOTAL_ROWS, f"lost or duplicated rows: {d['n']}"
    assert d["n_distinct"] == TOTAL_ROWS
    assert d["rid_sum"] == TOTAL_ROWS * (TOTAL_ROWS - 1) // 2


def test_pysource_restart_after_completion_emits_nothing(spark, tmp_path):
    """A restart from a checkpoint whose stream already drained must
    not re-emit: the committed frontier (4000) outranks the fresh
    reader's 0-based cursor even though latestOffset would otherwise
    start re-walking 1000/2000/... from scratch."""
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _drain(spark, out_dir, ckpt)
    first = _digest(
        spark.read.option("basePath", out_dir).parquet(out_dir)
    )
    assert first["n"] == TOTAL_ROWS

    seen: list[int] = []
    _drain(spark, out_dir, ckpt, on_batch=lambda df, bid: seen.append(bid))

    second = _digest(
        spark.read.option("basePath", out_dir).parquet(out_dir)
    )
    assert (first["n"], first["n_distinct"], first["rid_sum"]) == (
        second["n"], second["n_distinct"], second["rid_sum"]
    )
    # any replayed batch must be the engine's redelivery of the LAST
    # planned batch (idempotent rewrite), never an earlier row range
    for bid in seen:
        assert bid >= 3, f"restart re-emitted committed batch {bid}"
