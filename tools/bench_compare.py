"""Mechanical >2x bench adjudication (r11 verdict item 1).

Wall time alone cannot distinguish a plan regression from container noise
— r10 (q_join_outer_agg 6.8x) and r11 (q_join_semi 3.73x) each needed a
manual fresh-session probe to settle. Bytes shuffled, bytes spilled, and
task counts are DETERMINISTIC for a fixed plan + fixed data, so they
adjudicate automatically:

  wall ratio > threshold AND metrics unchanged  -> NOISE (auto-settled)
  wall ratio > threshold AND metrics moved      -> INVESTIGATE (real change)
  metrics moved but wall flat                   -> WATCH (plan changed
                                                   cheaply; still a diff)

Usage:
  python tools/bench_compare.py BENCH_prev.json BENCH_cur.json [--threshold 2.0]

Exits 1 only on INVESTIGATE findings. Queries without exec_metrics in
either file (pre-r12 benches) fall back to wall-only and are labeled
"no_metrics" — the old manual regime, explicitly marked.
"""

from __future__ import annotations

import argparse
import json


# below these floors, relative comparisons are meaningless (a 0.1 MB
# shuffle doubling is reabsorbed by batch-size jitter; tiny task-count
# deltas come from AQE coalescing at runtime)
MB_FLOOR = 1.0
TASK_FLOOR = 16
REL_TOL = 0.15


def _moved(prev: float, cur: float, floor: float) -> bool:
    if max(prev, cur) < floor:
        return False
    base = max(prev, floor)
    return abs(cur - prev) / base > REL_TOL


def metrics_moved(p: dict, c: dict) -> list[str]:
    out = []
    for key, floor in (
        ("shuffle_read_mb", MB_FLOOR),
        ("shuffle_write_mb", MB_FLOOR),
        ("spill_mb", MB_FLOOR),
        ("tasks", TASK_FLOOR),
    ):
        pv, cv = float(p.get(key, 0) or 0), float(c.get(key, 0) or 0)
        if _moved(pv, cv, floor):
            out.append(f"{key} {pv:g}->{cv:g}")
    return out


def compare(prev: dict, cur: dict, threshold: float) -> dict:
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    pm = dict(prev.get("exec_metrics", {}))
    cm = dict(cur.get("exec_metrics", {}))
    # steady-state rows replace cold rows for the comparable number,
    # matching gen_baseline_table.py's cell rule — and their metrics too
    # (cold metrics include the session's one-time bootstrap work)
    # build_<query> rows (r14+) join the comparison under their own keys —
    # index construction and steady serving are adjudicated as separate
    # families (a build-cost move never reads as a serving regression)
    for src, dst, met, mdst in (
        (prev.get("steady", {}), pq, prev.get("steady_exec_metrics", {}), pm),
        (cur.get("steady", {}), cq, cur.get("steady_exec_metrics", {}), cm),
        (prev.get("builds", {}), pq, prev.get("build_exec_metrics", {}), pm),
        (cur.get("builds", {}), cq, cur.get("build_exec_metrics", {}), cm),
    ):
        for q, t in src.items():
            if t is not None and t >= 0:
                dst[q] = t
                if met.get(q):
                    mdst[q] = met[q]
    noise, investigate, watch, no_metrics = [], [], [], []
    for q in sorted(set(pq) & set(cq)):
        p, c = pq[q], cq[q]
        if p <= 0 or c <= 0:
            continue
        ratio = c / p
        hot = ratio > threshold or ratio < 1.0 / threshold
        have = q in pm and q in cm and pm[q] and cm[q]
        if hot and not have:
            no_metrics.append({"query": q, "ratio": round(ratio, 2)})
            continue
        if not have:
            continue
        moved = metrics_moved(pm[q], cm[q])
        row = {"query": q, "ratio": round(ratio, 2), "moved": moved,
               "prev_sec": p, "cur_sec": c}
        if hot and moved:
            investigate.append(row)
        elif hot:
            noise.append(row)
        elif moved:
            watch.append(row)
    return {
        "threshold": threshold,
        "noise": noise,
        "investigate": investigate,
        "watch": watch,
        "no_metrics": no_metrics,
        "n_common": len(set(pq) & set(cq)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("cur")
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()
    res = compare(
        json.load(open(args.prev)), json.load(open(args.cur)), args.threshold
    )
    for row in res["noise"]:
        print(f"NOISE        {row['query']}: wall {row['ratio']}x, "
              f"shuffle/spill/tasks unchanged -> container noise, auto-settled")
    for row in res["watch"]:
        print(f"WATCH        {row['query']}: wall flat but {', '.join(row['moved'])}")
    for row in res["no_metrics"]:
        print(f"NO-METRICS   {row['query']}: wall {row['ratio']}x, no exec "
              f"metrics on one side (pre-r12 bench) -> manual probe needed")
    for row in res["investigate"]:
        print(f"INVESTIGATE  {row['query']}: wall {row['ratio']}x AND "
              f"{', '.join(row['moved'])}")
    print(json.dumps(res))
    return 1 if res["investigate"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
