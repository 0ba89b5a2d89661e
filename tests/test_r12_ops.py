"""Round-12 operators and guards.

Covers the r11 ADVICE closures and the r12 VERDICT directives as they
land:
- _maybe_broadcast's debug-mode bound assertion (ADVICE #4): a stale or
  wrong caller-supplied row bound must fail loudly under
  GRAVITYSPARK_DEBUG_BCAST=1 instead of silently reintroducing the
  driver-OOM hint.
"""

import os

import pytest
import pyspark.sql.functions as F

from gravitydb_spark.registry import REGISTRY, queries

queries()  # populate REGISTRY (lazy module loading)


def test_maybe_broadcast_debug_guard(spark):
    from gravitydb_spark import graph_queries as gq

    df = spark.range(100).select(F.col("id"))
    os.environ["GRAVITYSPARK_DEBUG_BCAST"] = "1"
    try:
        # correct bound: passes and returns a hinted frame
        out = gq._maybe_broadcast(df, 100)
        assert out.count() == 100
        # stale bound (claims fewer rows than the frame has): asserts
        with pytest.raises(AssertionError, match="bound violated"):
            gq._maybe_broadcast(df, 10)
    finally:
        os.environ.pop("GRAVITYSPARK_DEBUG_BCAST", None)
    # guard off: no count job, no assert, hint applied below the limit
    assert gq._maybe_broadcast(df, 10).count() == 100
