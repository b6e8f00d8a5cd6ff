#!/usr/bin/env python
"""Physical-plan audit: one row per driver query with the plan features
that matter at 100 TB — shuffle exchange count, broadcast joins,
whole-stage-codegen spans, Python (Arrow) crossings, and whether the
parquet scan prunes columns. Prints a markdown table (paste into
PLANS.md).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    import __spark_entry__ as ent
    from reflexiv_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in sorted(ent.queries().items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            rows.append((name, f"error: {e}"[:60], "", "", "", ""))
            continue
        n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
        n_bc = len(re.findall(r"Broadcast(Hash|NestedLoop)Join", plan))
        n_wscg = len(set(re.findall(r"\*\((\d+)\)", plan)))
        n_py = len(re.findall(r"(MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas)", plan))
        schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", plan))
        pruned = all(len(s.split(",")) <= 4 for s in schemas) if schemas else True
        rows.append((name, n_ex, n_bc, n_wscg, n_py, "yes" if pruned else "CHECK"))
    print("| query | shuffles | bcast joins | codegen spans | py crossings | scan pruned |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")


if __name__ == "__main__":
    main()
