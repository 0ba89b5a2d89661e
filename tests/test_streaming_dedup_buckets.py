"""Streaming dedup (bounded-state) + bucketed storage (shuffle-free joins)."""

from pyspark.sql import functions as F

from gravitydb_spark import PropertyGraph
from gravitydb_spark.streaming import stream_dedup_exact


def test_stream_dedup_exact(spark, tmp_path, sf_dir):
    # feed the documents table through as a stream with a synthetic ts
    static = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")))
    )
    src = str(tmp_path / "docs_stream")
    static.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(static.schema).parquet(src)
    deduped = stream_dedup_exact(stream, ts_col="ts")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("docs_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select count(*) n, count(distinct content_hash) d from docs_dedup").first()
    expected = static.select(F.countDistinct("text")).first()[0]
    assert got["n"] == got["d"] == expected


def test_bucketed_save_no_exchange_on_bucketed_side(spark, cocktail_graph, tmp_path):
    cocktail_graph.save_bucketed("bt", buckets=4)
    g2 = PropertyGraph.load_bucketed(spark, "bt")
    assert g2.edges.count() == cocktail_graph.edges.count()

    # a groupBy on the bucket key must not need an exchange above the scan
    plan = (
        g2.edges.groupBy("src")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:2000]


def test_dataset_store_delta_log_and_compaction(spark, tmp_path):
    """DatasetStore: append publishes deltas on the publication log,
    load unions them, compact folds the log to one snapshot with
    two-phase byte deletion (reader grace), orphan dirs stay invisible."""
    import os

    from gravitydb_spark.transaction import DatasetStore

    store = DatasetStore(str(tmp_path / "idx"))
    assert store.load(spark) is None
    store.append(spark.createDataFrame([(0, "a")], "band int, bk string"))
    store.append(spark.createDataFrame([(1, "b")], "band int, bk string"))
    # an orphan dir (crashed append: written, never logged) is invisible
    os.makedirs(os.path.join(store.path, "snap-77"))
    assert len(store.snapshots()) == 2
    assert sorted(r["bk"] for r in store.load(spark).collect()) == ["a", "b"]

    assert store.compact(spark, min_deltas=3) is False  # below threshold
    store.append(spark.createDataFrame([(2, "c")], "band int, bk string"))
    assert store.compact(spark, min_deltas=3) is True
    assert len(store.snapshots()) == 1
    assert sorted(r["bk"] for r in store.load(spark).collect()) == ["a", "b", "c"]
    # two-phase: old delta bytes parked, dropped on the NEXT compact
    assert os.path.exists(os.path.join(store.path, store.GC_PENDING))
    old_delta = os.path.join(store.path, "snap-0")
    assert os.path.isdir(old_delta)
    store.compact(spark, min_deltas=99)  # no fold, but pass-2 GC runs
    assert not os.path.isdir(old_delta)


def test_upkeep_rejects_near_dup_admitted_in_earlier_batch(spark, tmp_path):
    """The index-upkeep property itself: doc 3 (batch 1) duplicates doc 1
    (admitted in batch 0, absent from the seed corpus) and MUST be
    rejected — the static-index variant (stream_incremental_dedup) would
    admit it. Batch mapping: batch = (doc_id % 6) DIV 2."""
    from gravitydb_spark.pipeline_queries import stream_dedup_index_upkeep

    text_a = "the quick brown fox jumps over the lazy dog near the river bank"
    text_b = "completely different words about spark shuffles and parquet files here"
    seed = "unrelated seed corpus document talking about cocktails gin and vermouth"
    rows = [
        (2, seed, "en", "seed", len(seed)),
        (1, text_a, "en", "web", len(text_a)),   # batch 0 — novel, admitted
        (3, text_a, "en", "web", len(text_a)),   # batch 1 — dup of doc 1: REJECTED
        (5, text_b, "en", "web", len(text_b)),   # batch 2 — novel, admitted
    ]
    sf = str(tmp_path / "sf_upkeep")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    got = {
        (r["doc_id"], r["batch"])
        for r in stream_dedup_index_upkeep(spark, sf).collect()
    }
    assert got == {(1, 0), (5, 2)}


def test_upkeep_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a completed batch must
    not duplicate admitted rows (per-batch overwrite partition +
    _SUCCESS check), and a PARTIAL replay (crash after the index append,
    before the output write) must reproduce the original admission
    decisions — the bid-tagged probe exclusion (r5 ADVICE): without it
    the batch self-hits its own appended keys and the replayed admitted
    set collapses to empty."""
    import os

    from pyspark.sql import functions as F

    from gravitydb_spark.transaction import DatasetStore

    out_dir = str(tmp_path / "admitted")
    store = DatasetStore(str(tmp_path / "idx"))
    store.append(
        spark.createDataFrame([(0, "seed", -1)], "band int, bk string, bid long")
    )

    def handle_like(batch_df, batch_id):
        # the same shape as stream_dedup_index_upkeep.handle, minus the
        # minhash plumbing (seeded keys come in as columns)
        bdir = os.path.join(out_dir, f"b={int(batch_id)}")
        if os.path.exists(os.path.join(bdir, "_SUCCESS")):
            return
        keyed = batch_df
        idx = store.load(spark).filter(F.col("bid") != int(batch_id))
        hits = keyed.join(idx, ["band", "bk"], "left_semi").select("doc_id").distinct()
        admitted = keyed.select("doc_id").distinct().join(hits, "doc_id", "left_anti")
        store.append(
            keyed.join(admitted, "doc_id", "left_semi")
            .select("band", "bk")
            .distinct()
            .withColumn("bid", F.lit(int(batch_id)).cast("long"))
        )
        admitted.write.mode("overwrite").parquet(bdir)

    b0 = spark.createDataFrame(
        [(1, 0, "k1"), (3, 0, "seed")], "doc_id long, band int, bk string"
    )
    handle_like(b0, 0)
    handle_like(b0, 0)  # replay of a COMPLETED batch: no-op
    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1]  # doc 3 hit the seed; doc 1 admitted exactly once
    # the replay appended no extra index delta either
    assert len(store.snapshots()) == 2

    # partial replay: batch 1 admits the novel doc 5, its keys reach the
    # index (bid=1), then the output write "crashes" (we skip it) — the
    # replay must still ADMIT doc 5, because the probe excludes bid=1
    b1 = spark.createDataFrame([(5, 0, "k9")], "doc_id long, band int, bk string")
    store.append(  # the crashed run's index append, tagged with its bid
        b1.select("band", "bk").withColumn("bid", F.lit(1).cast("long"))
    )
    handle_like(b1, 1)  # the replay
    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 5]  # original decision reproduced, not self-hit
    # and batch 1's keys DO reject a later near-dup (bid filter only
    # excludes the probing batch's own deltas)
    b2 = spark.createDataFrame([(7, 0, "k9")], "doc_id long, band int, bk string")
    handle_like(b2, 2)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 5]  # doc 7 rejected by batch 1's k9


def test_upkeep_index_probe_is_partition_pruned(spark, tmp_path):
    """The 100 TB posture of stream_dedup_index_upkeep (r5 VERDICT
    directive #1): the index store partitions by the bucket column, and
    a probe that loads with a bucket predicate carries it as a
    PartitionFilter on EVERY delta scan (compacted or not) — the
    micro-batch never reads the full index."""
    from pyspark.sql import functions as F

    from gravitydb_spark.transaction import DatasetStore

    store = DatasetStore(str(tmp_path / "idx"), partition_cols=("bkb",))
    rows = [(0, f"k{i}", -1, i % 8) for i in range(64)]
    store.append(
        spark.createDataFrame(rows, "band int, bk string, bid long, bkb int")
    )
    store.append(  # second delta: the uncompacted-log case
        spark.createDataFrame(
            [(0, "x1", 0, 1), (0, "x5", 0, 5)],
            "band int, bk string, bid long, bkb int",
        )
    )
    probe = store.load(spark, where=F.col("bkb").isin([1, 5]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scans = [seg for seg in plan.split("FileScan parquet")[1:]]
    assert len(scans) == 2, plan[:3000]  # one scan per delta
    for seg in scans:
        pf = seg.split("PartitionFilters: [", 1)
        assert len(pf) == 2, seg[:1000]
        assert "bkb" in pf[1].split("]", 1)[0], seg[:1000]
    # the predicate actually prunes: only the two matching buckets survive
    got = {r["bk"] for r in probe.collect()}
    expect = {f"k{i}" for i in range(64) if i % 8 in (1, 5)} | {"x1", "x5"}
    assert got == expect
    # compaction preserves the partitioned layout — re-probe still pruned
    assert store.compact(spark, min_deltas=2) is True
    probe2 = store.load(spark, where=F.col("bkb").isin([5]))
    plan2 = probe2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan2 and "bkb" in plan2.split(
        "PartitionFilters: [", 1
    )[1].split("]", 1)[0], plan2[:3000]
    assert {r["bk"] for r in probe2.collect()} == {
        f"k{i}" for i in range(64) if i % 8 == 5
    } | {"x5"}


def test_dataset_store_compact_transform_folds_by_key(spark, tmp_path):
    """compact(transform=) turns the store into an incrementally
    maintained view: partial-aggregate deltas fold by key, stored rows
    shrink to view size, and read-time union semantics are unchanged."""
    from pyspark.sql import functions as F

    from gravitydb_spark.transaction import DatasetStore

    store = DatasetStore(str(tmp_path / "view"))
    store.append(spark.createDataFrame([("a", 1), ("b", 2)], "k string, n long"))
    store.append(spark.createDataFrame([("a", 10), ("c", 5)], "k string, n long"))

    def merge(df):
        return df.groupBy("k").agg(F.sum("n").cast("long").alias("n"))

    assert store.compact(spark, min_deltas=2, transform=merge) is True
    assert len(store.snapshots()) == 1
    rows = {r["k"]: r["n"] for r in store.load(spark).collect()}
    assert rows == {"a": 11, "b": 2, "c": 5}
    # further deltas + read-time merge still correct
    store.append(spark.createDataFrame([("a", 100)], "k string, n long"))
    rows = {r["k"]: r["n"] for r in merge(store.load(spark)).collect()}
    assert rows == {"a": 111, "b": 2, "c": 5}


def test_upkeep_bloom_prefilter_prunes_store_reads(spark, tmp_path):
    """r10 VERDICT #7: the Bloom membership sketch serves as the dedup
    index's probe pre-filter — a batch key missing any Bloom position is
    definitely absent and skips the store read. On a batch of mostly
    NOVEL content the surviving 'maybe' set (true dups + the 2^-7-budget
    false positives) must be far smaller than the key set, and the
    pruned bucket list no larger than the unfiltered one — while the
    admission decisions stay exactly the no-Bloom ones (the oracle
    pins that; here the known-answer fixture does)."""
    from gravitydb_spark import pipeline_queries as pq

    text_a = "the quick brown fox jumps over the lazy dog near the river bank"
    text_b = "completely different words about spark shuffles and parquet files here"
    filler = [
        (
            100 + 2 * i + 1,  # odd ids -> stream side, batch (id%6)//2
            f"novel document number {i} with plenty of distinct filler "
            f"words alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}",
            "en",
            "web",
            60,
        )
        for i in range(30)
    ]
    seed = "unrelated seed corpus document talking about cocktails gin and vermouth"
    rows = [
        (2, seed, "en", "seed", len(seed)),
        (1, text_a, "en", "web", len(text_a)),
        (3, text_a, "en", "web", len(text_a)),  # dup of doc 1: rejected
        (5, text_b, "en", "web", len(text_b)),
    ] + filler
    sf = str(tmp_path / "sf_bloom_upkeep")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    pq._upkeep_probe.clear()
    pq._upkeep_probe["enabled"] = True
    try:
        got = {
            (r["doc_id"], r["batch"])
            for r in pq.stream_dedup_index_upkeep(spark, sf).collect()
        }
    finally:
        pq._upkeep_probe.pop("enabled", None)

    # admissions unchanged by the pre-filter: doc 3 still rejected
    assert (1, 0) in got and (5, 2) in got
    assert not any(d == 3 for d, _ in got)
    batches = {k: v for k, v in pq._upkeep_probe.items() if isinstance(k, int)}
    assert len(batches) == 3
    for bid, d in batches.items():
        # pruning is real: maybe << keys on mostly-novel batches, and the
        # probed bucket list never exceeds the unfiltered one
        assert d["maybe"] < d["keys"], (bid, d)
        assert d["bkbs_pruned"] <= d["bkbs_all"], (bid, d)
    # the duplicate's batch must keep its true-positive maybe keys
    assert batches[1]["maybe"] >= 1
