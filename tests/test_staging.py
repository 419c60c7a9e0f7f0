"""staging.stage(): localCheckpoint by default, reliable checkpoint
when a checkpoint directory is configured (the 100 TB durability
path — VERDICT r5 item 2)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from oracle_to_cassandra_spark.staging import stage


def _set_jvm_checkpoint_dir_none(spark):
    """Restore the 'no checkpoint dir' state on the shared context.

    PySpark has no public unset; the scala side is a plain Option var,
    so reset it directly — the session is shared across the test run
    and later plan-shape tests rely on the localCheckpoint default.
    """
    jsc = spark.sparkContext._jsc.sc()
    none = spark.sparkContext._jvm.scala.Option.apply(None)
    getattr(jsc, "checkpointDir_$eq")(none)


def test_stage_defaults_to_local_checkpoint(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = stage(df, eager=True)
    assert out.count() == 100
    # staged subtree reads back as an existing RDD, not a range scan
    assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()


def test_stage_uses_reliable_checkpoint_when_dir_configured(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        df = spark.range(50).withColumn("x", F.col("id") + 1)
        out = stage(df, eager=True)
        assert out.count() == 50
        # reliable checkpoint writes RDD blocks under the configured dir
        written = [
            os.path.join(r, f)
            for r, _, files in os.walk(ckpt)
            for f in files
            if f.startswith("part-")
        ]
        assert written, "no checkpoint blocks written to the reliable dir"
    finally:
        _set_jvm_checkpoint_dir_none(spark)
    assert spark.sparkContext.getCheckpointDir() is None


def test_stage_honors_checkpoint_dir_conf(spark, tmp_path):
    """Deployments can opt in purely via --conf spark.checkpoint.dir.

    A core conf can't be set through RuntimeConfig after launch, so
    simulate a submit-time --conf by writing the live SparkConf."""
    ckpt = str(tmp_path / "conf_ckpt")
    jconf = spark.sparkContext._jsc.sc().conf()
    jconf.set("spark.checkpoint.dir", ckpt)
    # stage() probes the (submit-time-immutable) core conf once per
    # context and caches a negative result (r13 — the probe clones
    # the whole SparkConf over py4j); mutating the live conf here
    # simulates a fresh submit, so drop the cached negative too
    import oracle_to_cassandra_spark.staging as _staging

    _staging._NO_CONF_DIR.clear()
    try:
        out = stage(spark.range(10), eager=True)
        assert out.count() == 10
        written = [f for _, _, files in os.walk(ckpt) for f in files]
        assert written, "conf-configured checkpoint dir unused"
    finally:
        jconf.remove("spark.checkpoint.dir")
        _set_jvm_checkpoint_dir_none(spark)


def test_stage_lazy_adds_no_job(spark):
    """eager=False must not trigger the checkpoint job at stage() time
    (materialization happens inside the first consuming job).

    Narrow plan on purpose: under AQE, a plan WITH an exchange
    executes its shuffle map stages as soon as the lazy checkpoint
    resolves the physical RDD — that's AQE stage materialization, not
    the checkpoint job itself."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = spark.range(1000).select((F.col("id") * 3).alias("x")).filter("x % 2 = 0")
    staged = stage(df)  # no action yet
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "lazy stage() launched a job"
    assert staged.count() == 500


def test_reliable_stage_materializes_marked_ancestors(spark, tmp_path):
    """A stage BELOW another stage must actually be written on the
    reliable path: ``DataFrame.checkpoint(eager=False)`` neither
    persists nor — with ``checkpointAllMarkedAncestors`` at its false
    default — checkpoints marked ancestors of a closer marked RDD, so
    a lazily-marked iterative-loop input (CC's edge list under the
    per-round labels) would silently re-execute its full upstream
    every round. ``stage()`` therefore forces eager on this path (r13
    ADVICE item 1); each eager checkpoint writes its own rdd-N dir, so
    two nested stages must leave TWO materialized checkpoint RDDs."""
    ckpt = str(tmp_path / "nested_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        a = stage(spark.range(32).select((F.col("id") * 2).alias("x")))
        b = stage(a.select((F.col("x") + 1).alias("y")))
        assert b.count() == 32
        rdd_dirs = {
            r
            for r, _, files in os.walk(ckpt)
            for f in files
            if f.startswith("part-")
        }
        assert len(rdd_dirs) >= 2, (
            "nested reliable stages materialized fewer than 2 checkpoint "
            "RDDs — a marked ancestor was never written (the lazy-mark "
            "double-execution regression)"
        )
    finally:
        _set_jvm_checkpoint_dir_none(spark)


def test_cc_pipeline_identical_under_reliable_checkpoint(spark, tmp_path):
    """End-to-end durability check: the CC-based dedup pipeline (every
    stage() call inside MinHash→LSH→Jaccard→CC) must produce identical
    results whether staging runs through localCheckpoint (default) or
    reliable checkpoint (dir configured)."""
    import __spark_entry__ as E
    from tests.conftest import SF_DIR

    q = E.queries()["dedup_cluster_assignment"]
    local_rows = sorted(map(tuple, q(spark, SF_DIR).collect()))
    spark.sparkContext.setCheckpointDir(str(tmp_path / "cc_ckpt"))
    try:
        reliable_rows = sorted(map(tuple, q(spark, SF_DIR).collect()))
    finally:
        _set_jvm_checkpoint_dir_none(spark)
    assert local_rows == reliable_rows
    assert len(local_rows) > 0
