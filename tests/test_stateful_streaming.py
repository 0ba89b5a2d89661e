"""applyInPandasWithState sessionizer driven through a real stream."""

from pyspark.sql import functions as F

from gravitydb_spark.streaming.stateful import stream_sessionize


def test_stream_sessionize(spark, tmp_path):
    # user 1: two sessions separated by a 2h gap; user 2: one session
    rows = [
        (1, 1000), (1, 1600), (1, 2200),          # session A: 3 events
        (1, 2200 + 7200), (1, 2200 + 7300),       # session B (still open)
        (2, 5000), (2, 5100),                     # session C (still open)
        (2, 5100 + 7200),                         # closes C, opens D
    ]
    src = str(tmp_path / "events_stream")
    spark.createDataFrame(rows, "user_id long, sec long").write.parquet(src)

    stream = spark.readStream.schema("user_id long, sec long").parquet(src)
    sessions = stream_sessionize(stream)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in spark.sql("select * from sessions_out").collect()
    }
    assert got == {(1, 1000, 2200, 3), (2, 5000, 5100, 2)}
