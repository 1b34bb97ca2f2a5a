"""Maintain BASELINE.md's per-query yardstick table mechanically.

The >2x-per-query regression discipline only works if EVERY registry
query has a table row (r9 verdict item 5: queries added r7-r9 lived only
in prose notes). This tool syncs the table with the live registry and a
bench JSON:

  # add rows for any registry query missing from the table, filling the
  # newest existing column from a bench run where available:
  python tools/gen_baseline_table.py --fill bench_out.json

  # append a new round column from a closing bench run:
  python tools/gen_baseline_table.py --add-column r10 --from bench_out.json

Rows are never reordered or re-measured; history cells are preserved
verbatim. Unknown-in-bench cells stay em-dash.

Steady-vs-cold (r10 verdict item 3): for queries in the bench run's
``steady`` map (session-memoized index/codebook bootstraps), the CELL
records the steady second-run time — the comparable, deployment-shaped
number — so the mechanical >2x round-over-round check compares
like-with-like. The cold first-touch number remains in the round's
BENCH_r{N}.json / bench_out.json ``queries`` map (see the footnote under
the table in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASELINE = os.path.join(REPO, "BASELINE.md")


def load_registry() -> list[str]:
    from gdelt_2_0_event_database_pipeline_spark.plans import QUERIES

    return list(QUERIES)


def row_keys(bench: dict) -> list[str]:
    """Registry queries plus the bench's non-registry tracked rows
    (etl_* stages, build_* index-construction rows)."""
    extra = sorted(q for q in bench if q.startswith(("etl_", "build_")))
    return load_registry() + extra


def parse_table(src: str):
    """(pre, header_cols, rows as {query: [cells]}, row_order, post)."""
    m = re.search(
        r"^(\| query \|[^\n]*\|)\n(\|[-| ]+\|)\n((?:\| (?:q|etl_|build_)\w+ \|[^\n]*\n)+)",
        src,
        re.M,
    )
    if not m:
        raise SystemExit("per-query table not found in BASELINE.md")
    header = [c.strip() for c in m.group(1).strip("|").split("|")]
    rows, order = {}, []
    for line in m.group(3).strip("\n").split("\n"):
        cells = [c.strip() for c in line.strip("|").split("|")]
        rows[cells[0]] = cells[1:]
        order.append(cells[0])
    return src[: m.start()], header, rows, order, src[m.end(3) :]


def render(pre, header, rows, order, post) -> str:
    out = [
        "| " + " | ".join(header) + " |",
        "|" + "---|" * len(header),
    ]
    for q in order:
        out.append("| " + q + " | " + " | ".join(rows[q]) + " |")
    return pre + "\n".join(out) + "\n" + post


def load_bench(path: str) -> dict:
    """Per-query seconds with steady-state values substituted for the
    session-memoized queries (the bench `steady` map): the table cell must
    be the comparable number, not bootstrap-inclusive cold time."""
    d = json.load(open(path))
    eff = dict(d["queries"])
    for q, t in d.get("steady", {}).items():
        if t is not None and t >= 0:
            eff[q] = t
    eff.update(d.get("etl_stages", {}))  # stage rows share the table
    # build_<query> rows (r14+): index-construction cost as first-class
    # tracked rows, adjudicated separately from the steady serve rows
    eff.update({q: t for q, t in d.get("builds", {}).items() if t >= 0})
    return eff


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fill", metavar="BENCH_JSON",
                    help="add missing registry rows; fill the newest column "
                         "from this bench run where it has the query")
    ap.add_argument("--add-column", metavar="NAME")
    ap.add_argument("--refresh-column", metavar="NAME",
                    help="overwrite an EXISTING column's cells from --from "
                         "(late-round re-bench after new registrations)")
    ap.add_argument("--from", dest="src_json", metavar="BENCH_JSON")
    args = ap.parse_args()

    src = open(BASELINE).read()
    pre, header, rows, order, post = parse_table(src)
    ncols = len(header) - 1

    if args.fill:
        bench = load_bench(args.fill)
        added = 0
        for q in row_keys(bench):
            if q not in rows:
                cells = ["—"] * ncols
                if q in bench:
                    cells[-1] = f"{bench[q]:.3f}"
                rows[q] = cells
                order.append(q)
                added += 1
        print(f"added {added} rows ({len(order)} total)")

    if args.refresh_column:
        if not args.src_json:
            raise SystemExit("--refresh-column needs --from BENCH_JSON")
        col = f"{args.refresh_column} sec"
        if col not in header:
            raise SystemExit(f"no column {col!r} to refresh")
        i = header.index(col) - 1
        bench = load_bench(args.src_json)
        for q in row_keys(bench):
            if q not in rows:
                rows[q] = ["—"] * ncols
                order.append(q)
            if q in bench:
                rows[q][i] = f"{bench[q]:.3f}"
        print(f"column {args.refresh_column}: refreshed from {args.src_json}")

    if args.add_column:
        if not args.src_json:
            raise SystemExit("--add-column needs --from BENCH_JSON")
        bench = load_bench(args.src_json)
        header.append(f"{args.add_column} sec")
        for q in order:
            rows[q].append(f"{bench[q]:.3f}" if q in bench else "—")
        for q in row_keys(bench):
            if q not in rows:
                rows[q] = ["—"] * (len(header) - 2) + (
                    [f"{bench[q]:.3f}"] if q in bench else ["—"]
                )
                order.append(q)
        print(f"column {args.add_column}: {sum(1 for q in order if rows[q][-1] != '—')} filled")

    open(BASELINE, "w").write(render(pre, header, rows, order, post))
    print(f"BASELINE.md table: {len(order)} rows x {len(header) - 1} columns")


if __name__ == "__main__":
    main()
