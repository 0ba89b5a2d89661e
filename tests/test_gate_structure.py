"""The driver's correctness gate records only the first 50 entries of
``queries()`` (CORRECTNESS_r01/r02 = exactly the head-50 of registration
order). These tests pin the consolidation contract from
gravitydb_spark/gate_queries.py:

- the head-50 is exactly GATE_ORDER (compound families + irreducible
  standalones), every entry with a DuckDB oracle;
- every registered fine-grained query is either in the head-50 itself or a
  member of a compound that is;
- a compound query is a pure tagged union: its per-tag row counts equal
  its members' row counts (checked on one cheap family).
"""

from __future__ import annotations

import pytest

from gravitydb_spark import gate_queries  # noqa: F401  (fills GATE_ORDER)
from gravitydb_spark.registry import GATE_ORDER, REGISTRY, oracle_sql, queries

SF_DIR = "/root/testdata/sf0.001"

# compound -> member mapping comes from the single authoritative source
# (recorded by gate_queries._compound at registration time)
COMPOUND_MEMBERS = gate_queries.COMPOUND_MEMBERS


def test_head50_is_gate_order():
    names = list(queries())
    assert len(GATE_ORDER) == 50, f"GATE_ORDER has {len(GATE_ORDER)} slots, want 50"
    assert names[:50] == GATE_ORDER
    assert len(names) == len(set(names))


def test_every_gate_entry_has_oracle():
    oracles = oracle_sql()
    missing = [n for n in GATE_ORDER if not oracles.get(n)]
    assert not missing, f"gate entries without oracle: {missing}"


def test_every_query_visible_to_gate():
    """No registered query may be invisible: it's in the head-50 or a
    member of a compound that is."""
    covered = set(GATE_ORDER)
    for comp, members in COMPOUND_MEMBERS.items():
        assert comp in GATE_ORDER, f"compound {comp} fell out of the gate"
        covered.update(members)
    uncovered = [n for n in REGISTRY if n not in covered]
    assert not uncovered, f"queries invisible to the driver gate: {uncovered}"


def test_compound_members_registered():
    for comp, members in COMPOUND_MEMBERS.items():
        for m in members:
            assert m in REGISTRY, f"{comp} member {m} not registered"


@pytest.mark.parametrize("comp", ["g_set_ops", "window_funcs"])
def test_compound_is_tagged_union(spark, comp):
    """Per-tag row counts of a compound equal its members' row counts."""
    comp_counts = {
        r["op"]: r["n"]
        for r in REGISTRY[comp]
        .fn(spark, SF_DIR)
        .groupBy("op")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    members = COMPOUND_MEMBERS[comp]
    assert len(comp_counts) == len(members)
    member_counts = sorted(
        REGISTRY[m].fn(spark, SF_DIR).count() for m in members
    )
    assert sorted(comp_counts.values()) == member_counts


def test_coverage_md_compound_table_current():
    """COVERAGE.md's compound→members table is regenerated from
    gate_queries.COMPOUND_MEMBERS (the single source); a new compound
    member that isn't reflected there fails here instead of shipping a
    stale operator inventory (r10: the table had drifted two rounds)."""
    import pathlib

    text = (
        pathlib.Path(__file__).parent.parent / "COVERAGE.md"
    ).read_text()
    # scope the member check to the compound's OWN table row (r10 ADVICE:
    # a member mentioned anywhere in the file used to pass the check even
    # when its compound's row was stale)
    rows = {
        comp: "\n".join(
            ln for ln in text.splitlines() if f"| `{comp}` |" in ln
        )
        for comp in COMPOUND_MEMBERS
    }
    missing = [
        f"{comp}:{m}"
        for comp, members in COMPOUND_MEMBERS.items()
        for m in members
        if not rows[comp] or m not in rows[comp]
    ]
    assert not missing, f"COVERAGE.md compound table stale: {missing[:10]}"
