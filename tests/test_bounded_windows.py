"""Skew-bounded per-user window variants (r5 VERDICT directive #4):
``bounded=True`` partitions ordered per-user windows by (user, day) with
a small cross-bucket merge — the celebrity-user mitigation SCALE.md §4g
names — and must be HASH-IDENTICAL to the unbounded plan."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gravitydb_spark.relational_queries import (
    events_sessionize,
    events_transition_matrix,
)

SF01 = "/root/testdata/sf0.1"


def _rows(df, keys):
    return sorted(tuple(r) for r in df.select(*keys).collect())


def test_sessionize_bounded_equivalent_at_sf01(spark):
    a = _rows(
        events_sessionize(spark, SF01),
        ["user_id", "n_sessions", "n_events"],
    )
    b = _rows(
        events_sessionize(spark, SF01, bounded=True),
        ["user_id", "n_sessions", "n_events"],
    )
    assert a == b and len(a) > 0


def test_transition_bounded_equivalent_at_sf01(spark):
    cols = ["from_type", "to_type", "n", "p"]
    a = _rows(events_transition_matrix(spark, SF01), cols)
    b = _rows(events_transition_matrix(spark, SF01, bounded=True), cols)
    assert a == b and len(a) > 0


def test_bounded_plans_partition_by_user_and_day(spark):
    for fn in (events_sessionize, events_transition_matrix):
        p = (
            fn(spark, SF01, bounded=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the big ordered window keys on (user_id, day) — the splittable
        # shape; only the tiny bucket-summary merge keys on user alone
        import re

        assert re.search(r"hashpartitioning\(user_id#\d+L?, day#", p), p[:2000]


def test_bounded_equivalent_on_celebrity_skew(spark, tmp_path, sf_dir):
    """One user holding the whole stream — the case bounded= exists for:
    results still identical, and the window state per task is bounded by
    a day of history instead of the user's lifetime."""
    sf = str(tmp_path / "skew_sf")
    os.makedirs(sf)
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("user_id", F.lit(0).cast("long"))
        .write.parquet(f"{sf}/events.parquet")
    )
    assert _rows(
        events_sessionize(spark, sf), ["user_id", "n_sessions", "n_events"]
    ) == _rows(
        events_sessionize(spark, sf, bounded=True),
        ["user_id", "n_sessions", "n_events"],
    )
    cols = ["from_type", "to_type", "n", "p"]
    assert _rows(events_transition_matrix(spark, sf), cols) == _rows(
        events_transition_matrix(spark, sf, bounded=True), cols
    )
