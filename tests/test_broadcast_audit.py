"""Broadcast-hint hygiene at 100 TB.

A hard ``F.broadcast`` hint bypasses AQE's size check: on a table that grows
with scale factor (customer = 150k x SF, part = 200k x SF, supplier =
10k x SF) the hint that is convenient at sf0.1 OOMs the driver at sf100.
Two guards:

1. Source audit — the TPC-H and textops plan files may only hint true fixed
   dimensions (nation/region, 1-row scalar frames).
2. Plan audit — with the hints gone, AQE / file-size stats must STILL pick a
   broadcast hash join for the small sides at test scale, so dropping the
   hints costs nothing where they were correct.
"""

import os
import re

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

_PLANS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "us_equity_datalake_spark", "plans")

# fixed-size frames only: nation (25 rows), region (5), and 1-row scalar
# aggregates (total revenue, top-supplier max, avg-quantity threshold)
_ALLOWED = {"nation", "region", "total", "top", "threshold"}


def test_no_forced_broadcast_on_scale_proportional_tables():
    pat = re.compile(
        r"F\.broadcast\(\s*(?:load_table\(spark,\s*\"(nation|region)\"|([A-Za-z_][A-Za-z0-9_]*))"
    )
    for fname in ("tpch.py", "tpch2.py", "textops.py"):
        src = open(os.path.join(_PLANS, fname)).read()
        hinted = [lt or name for lt, name in pat.findall(src)]
        bad = [h for h in hinted if h not in _ALLOWED]
        assert not bad, f"{fname}: forced broadcast on scale-proportional frames {bad}"


@pytest.mark.parametrize("query,small_side_col", [
    ("tpch_q3_shipping_priority", "c_custkey"),     # customer, hint removed
    ("tpch_q14_promo_revenue", "p_partkey"),        # part, hint removed
    ("tpch_q5_local_supplier_volume", "s_suppkey"), # supplier, hint removed
])
def test_aqe_still_broadcasts_small_sides(spark, query, small_side_col):
    """Without the hard hint the planner must still choose BroadcastHashJoin
    for the (at this SF genuinely small) side — via file-size statistics at
    planning time or AQE promotion at runtime."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()[query](spark, SF_DIR)
    df.collect()  # finalize the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:3000]
    # and the probe side still reaches the scan as a broadcast build relation
    assert small_side_col in plan
