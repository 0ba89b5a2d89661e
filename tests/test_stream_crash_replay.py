"""END-TO-END crash/replay drill for the additive-IVM replay protocol:
a real Structured Streaming query, a real checkpoint directory, a
handler that CRASHES mid-batch after its store append, and a restart
against the same checkpoint — Spark genuinely redelivers the failed
batch (at-least-once), and the bid high-water mark must make the
redelivered append a no-op so the sum view is exact.

test_ivm_replay.py proves the store primitive under simulated windows;
this file proves the composition with Spark's actual redelivery
machinery, including that batch ids really do repeat across restarts.
"""

import os

from pyspark.sql import functions as F

from gravitydb_spark.transaction import DatasetStore


def _fold(df):
    return df.groupBy("k").agg(F.sum("n").cast("long").alias("n"))


def _run_stream(spark, stage, ckpt, handler, schema):
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_crash_after_append_is_not_double_counted(spark, tmp_path):
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    base = 1_700_000_000
    for b, rows in enumerate([[("a", 1), ("b", 2)], [("a", 10)]]):
        df = spark.createDataFrame(rows, "k string, n long")
        tmp = str(tmp_path / f"tmp{b}")
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(stage, f"batch-{b}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (base + 60 * b, base + 60 * b))

    store = DatasetStore(str(tmp_path / "view"))
    ckpt = str(tmp_path / "ckpt")
    crash_flag = str(tmp_path / "crash_once")
    open(crash_flag, "w").write("1")

    def handler(batch_df, bid):
        part = _fold(batch_df)
        if store.append_once(part, bid) is None:
            return  # redelivered batch — already applied
        store.compact(spark, min_deltas=2, transform=_fold)
        # CRASH exactly once, on batch 1, AFTER the append committed
        # but BEFORE the stream checkpoint commits the batch
        if int(bid) == 1 and os.path.exists(crash_flag):
            os.unlink(crash_flag)
            raise RuntimeError("injected crash after store append")

    try:
        _run_stream(
            spark, stage, ckpt, handler, "k string, n long"
        )
        raised = False
    except Exception:
        raised = True
    assert raised, "the injected crash must fail the first run"

    # restart against the SAME checkpoint: Spark redelivers batch 1
    _run_stream(spark, stage, ckpt, handler, "k string, n long")

    view = {r["k"]: r["n"] for r in _fold(store.load(spark)).collect()}
    assert view == {"a": 11, "b": 2}, view
    # and the redelivery really happened as a no-op, not as a skip of
    # the data: the store holds exactly the two batches' content with
    # the mark at the last applied bid
    assert store._meta()["bid_hwm"] == "1"


def test_crash_before_append_replays_and_applies(spark, tmp_path):
    """The complementary window: crash BEFORE the append — the replayed
    batch must still apply (the mark only skips batches whose append
    committed)."""
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    df = spark.createDataFrame([("a", 5)], "k string, n long")
    tmp = str(tmp_path / "tmp0")
    df.coalesce(1).write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), os.path.join(stage, "batch-0.parquet"))

    store = DatasetStore(str(tmp_path / "view"))
    ckpt = str(tmp_path / "ckpt")
    crash_flag = str(tmp_path / "crash_once")
    open(crash_flag, "w").write("1")

    def handler(batch_df, bid):
        if os.path.exists(crash_flag):
            os.unlink(crash_flag)
            raise RuntimeError("injected crash before store append")
        store.append_once(_fold(batch_df), bid)

    try:
        _run_stream(spark, stage, ckpt, handler, "k string, n long")
    except Exception:
        pass
    _run_stream(spark, stage, ckpt, handler, "k string, n long")
    view = {r["k"]: r["n"] for r in _fold(store.load(spark)).collect()}
    assert view == {"a": 5}, view
