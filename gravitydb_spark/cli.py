"""CLI — the reference's ``gravitydb`` git-style command surface
(backend_filestore/src/cli_helpers.rs:59-248) over the Spark engine.

EP2 compat: ``query-db`` accepts the same serde-JSON query wire format
(e.g. ``{"V":{"Property":{"Specific":"<hash>"}}}``) so serialized
reference queries replay unchanged (cli_helpers.rs:271-277).

Usage:
    python -m gravitydb_spark.cli init --db /path/to/graph
    python -m gravitydb_spark.cli create-node --db DB --type T [--value V] [--id ID]
    python -m gravitydb_spark.cli create-edge --db DB --from ID --to ID --type T
    python -m gravitydb_spark.cli delete-node --db DB --id ID
    python -m gravitydb_spark.cli property-id --type T [--value V]
    python -m gravitydb_spark.cli query-db --db DB [--input FILE|-]
    python -m gravitydb_spark.cli db-info --db DB
"""

from __future__ import annotations

import argparse
import json
import sys

from .graph import PropertyGraph
from .hashing import prop_hash
from .plans.compiler import execute
from .ql import query_from_json
from .schema import Prop
from .session import get_spark


def _load(spark, db: str) -> PropertyGraph:
    return PropertyGraph.load(spark, db)


def _save_over(spark, g: PropertyGraph, db: str) -> None:
    """Write-to-temp-then-swap: the new tables are lazy transforms over the
    parquet being replaced, so an in-place overwrite would read-after-delete."""
    import os
    import shutil

    tmp = db.rstrip("/") + ".tmp"
    g.save(tmp)
    shutil.rmtree(db)
    os.rename(tmp, db)


def cmd_init(args) -> int:
    spark = get_spark("gravitydb_cli")
    PropertyGraph.empty(spark).save(args.db)
    print(f"initialized empty graph at {args.db}")
    return 0


def cmd_create_node(args) -> int:
    spark = get_spark("gravitydb_cli")
    g = _load(spark, args.db)
    item = (args.id, Prop(args.type, args.value))
    if args.get_or_create:
        g2, ids = g.get_or_create_nodes([item])
    else:
        g2, ids = g.create_nodes([item])
    if g2 is not g:
        _save_over(spark, g2, args.db)
    print(ids[0])
    return 0


def cmd_create_edge(args) -> int:
    spark = get_spark("gravitydb_cli")
    g = _load(spark, args.db)
    g2, ids = g.create_edges(
        [(getattr(args, "from"), args.to, Prop(args.type, args.value))]
    )
    _save_over(spark, g2, args.db)
    print(ids[0])
    return 0


def cmd_delete_node(args) -> int:
    spark = get_spark("gravitydb_cli")
    g = _load(spark, args.db).delete_nodes([args.id]).gc()
    _save_over(spark, g, args.db)
    return 0


def cmd_property_id(args) -> int:
    print(prop_hash(args.type, args.value))
    return 0


def cmd_query_db(args) -> int:
    raw = (
        sys.stdin.read()
        if args.input in (None, "-")
        else open(args.input, encoding="utf-8").read()
    )
    query = query_from_json(json.loads(raw))
    spark = get_spark("gravitydb_cli")
    res = execute(_load(spark, args.db), query)
    out = {
        "vertices": sorted(r["id"] for r in res.vertices.collect()),
        "edges": sorted(r["id"] for r in res.edges.collect()),
        "paths": [
            {
                "start": r["start"],
                "path": [[s["v"], s["e"]] for s in (r["path"] or [])],
                "end": r["end"],
            }
            for r in res.paths.collect()
        ],
        "variables": res.variables,
    }
    json.dump(out, sys.stdout, indent=2)
    print()
    return 0


def cmd_db_info(args) -> int:
    spark = get_spark("gravitydb_cli")
    json.dump(_load(spark, args.db).db_info(), sys.stdout, indent=2)
    print()
    return 0


def cmd_repl(args) -> int:
    """EP3 analog: the reference embeds a Lua REPL (lua.rs:368-449); here
    Python *is* the scripting surface — drop into an interactive session
    with the db and the query builders pre-bound."""
    import code

    from . import ql
    from .plans.compiler import execute as _execute

    spark = get_spark("gravitydb_cli")
    db = _load(spark, args.db)
    ns = {
        "spark": spark,
        "db": db,
        "execute": lambda q: _execute(db, q),
        "Prop": Prop,
        **{n: getattr(ql, n) for n in ql.__all__},
    }
    code.interact(
        banner="gravitydb_spark repl — db, execute(q), Prop, vq_all(), "
        "eq_all(), pq_from_id(), ... are bound",
        local=ns,
    )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gravitydb_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("init")
    sp.add_argument("--db", required=True)
    sp.set_defaults(fn=cmd_init)

    sp = sub.add_parser("create-node")
    sp.add_argument("--db", required=True)
    sp.add_argument("--type", required=True)
    sp.add_argument("--value")
    sp.add_argument("--id")
    sp.add_argument(
        "--get-or-create",
        action="store_true",
        help="return the existing node with identical property content "
        "instead of erroring (cli_helpers.rs:137-160)",
    )
    sp.set_defaults(fn=cmd_create_node)

    sp = sub.add_parser("create-edge")
    sp.add_argument("--db", required=True)
    sp.add_argument("--from", required=True)
    sp.add_argument("--to", required=True)
    sp.add_argument("--type", required=True)
    sp.add_argument("--value")
    sp.set_defaults(fn=cmd_create_edge)

    sp = sub.add_parser("delete-node")
    sp.add_argument("--db", required=True)
    sp.add_argument("--id", required=True)
    sp.set_defaults(fn=cmd_delete_node)

    sp = sub.add_parser("property-id")
    sp.add_argument("--type", required=True)
    sp.add_argument("--value")
    sp.set_defaults(fn=cmd_property_id)

    sp = sub.add_parser("query-db")
    sp.add_argument("--db", required=True)
    sp.add_argument("--input")
    sp.set_defaults(fn=cmd_query_db)

    sp = sub.add_parser("db-info")
    sp.add_argument("--db", required=True)
    sp.set_defaults(fn=cmd_db_info)

    sp = sub.add_parser("repl")
    sp.add_argument("--db", required=True)
    sp.set_defaults(fn=cmd_repl)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
