"""Capture the IN-LOOP plans of iterative operators (r13 deliverable).

The registered iterative queries return unions of lineage-cut frames, so
their final `.explain()` shows only `Scan ExistingRDD` nodes — the join
strategy the optimization round changes lives in the per-round frames
that get localCheckpoint()ed inside the loops. This tool hooks
DataFrame.localCheckpoint and writes the formatted plan of every frame
at mark time (capped) into ONE file per query:

    plans/r13/<name>_rounds_<suffix>.txt

Run at sf0.001 by default — plan SHAPE (join strategy, exchange count)
is what the optimization claims are about and is SF-independent here
(hints are count-gated far above these sizes).

Usage: python tools/opt_round_plans.py --suffix before|after name...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)
MAX_MARKS = 30


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="+")
    p.add_argument("--sf", default="/root/testdata/sf0.001")
    p.add_argument("--suffix", required=True)
    p.add_argument("--plans-dir", default=PLANS_DIR)
    args = p.parse_args()
    plans_dir = args.plans_dir

    # Spark 4: runtime frames are the CLASSIC subclass, which overrides
    # localCheckpoint — patch that class, not the abstract parent
    from pyspark.sql.classic.dataframe import DataFrame

    from gravitydb_spark.registry import queries
    from gravitydb_spark.session import get_spark

    qs = queries()
    spark = get_spark(app_name="opt_round_plans")
    from gravitydb_spark.graph_queries import tpch_graph

    tpch_graph(spark, args.sf).db_info()
    os.makedirs(plans_dir, exist_ok=True)

    orig = DataFrame.localCheckpoint
    state = {"f": None, "n": 0}

    def patched(self, eager=True):
        if state["f"] is not None and state["n"] < MAX_MARKS:
            state["n"] += 1
            plan = spark._jvm.PythonSQLUtils.explainString(
                self._jdf.queryExecution(), "formatted"
            )
            state["f"].write(
                f"==== localCheckpoint mark #{state['n']}"
                f" (eager={eager}) ====\n{plan}\n"
            )
            state["f"].flush()
        return orig(self, eager)

    DataFrame.localCheckpoint = patched
    try:
        for name in args.names:
            path = os.path.join(
                plans_dir, f"{name}_rounds_{args.suffix}.txt"
            )
            with open(path, "w") as f:
                state["f"], state["n"] = f, 0
                qs[name](spark, args.sf).count()
                state["f"] = None
            print(f"ROUNDS {name}: wrote {path}", flush=True)
    finally:
        DataFrame.localCheckpoint = orig
    spark.stop()


if __name__ == "__main__":
    main()
