"""Plan auditor CLI: build every registry query against a given sf dir and
flag scale red flags in the executed plan. The checks and allowlists live in
``gdelt_2_0_event_database_pipeline_spark.plans.audit`` and are enforced
per-query by ``tests/test_plan_audit.py``; this CLI is the ad-hoc runner.

Usage: python tools/plan_audit.py [sf_dir]   (exit 1 if any unexpected flag)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.plans.audit import audit_plan  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402


def audit(sf_dir: str) -> int:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name, qd in QUERIES.items():
        try:
            plan = qd.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        issues = audit_plan(name, plan)
        if issues:
            print(f"FLAG  {name}: {', '.join(issues)}")
            bad += 1
        else:
            print(f"ok    {name}")
    print(f"\n{len(QUERIES) - bad} clean, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
