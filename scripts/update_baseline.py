#!/usr/bin/env python3
"""Rewrite BASELINE.md's per-query table from a Bench JSON line.

Usage: update_baseline.py <bench.log> <round-label>
Adds/updates the round column as the per-query seconds from the bench
run and recomputes baseline = min(previous baseline, new value).
Queries absent from the table are appended with the new value as their
baseline. The table is matched by its header row; everything else in
the file is left untouched.
"""
import json
import re
import sys

bench_log, label = sys.argv[1], sys.argv[2]

# Floor-regime tagging (r13 verdict #8 — make the additive-floor
# adjudication machine-readable): a round cell gets an 'f'-tag (the
# Latin small f with hook) when the reading is >=2x the best-ever
# baseline AND the delta is additive-small (<=0.25s — the r11 signature
# of the box's per-job floor) AND, when two PlanDump files are supplied
# via --plandump <current> <previous>, the query's plan line is
# UNCHANGED between them. Tagged rows read as "floor noise, plan
# unchanged" in every later regression scan; Bench.scala excludes the
# same class from worst_vs_baseline_adj.
FLOOR_DELTA = 0.25
FLOOR_MARK = "ƒ"  # f-with-hook: distinct from the footnote glyphs

plan_same = None
if "--plandump" in sys.argv:
    i = sys.argv.index("--plandump")
    def plan_lines(path):
        out = {}
        try:
            with open(path) as f:
                for l in f:
                    m = re.match(r"PLAN (\S+)\s+(.*)", l.strip())
                    if m:
                        out[m.group(1)] = m.group(2)
        except FileNotFoundError:
            pass
        return out
    cur, prev = plan_lines(sys.argv[i + 1]), plan_lines(sys.argv[i + 2])
    plan_same = lambda q: q in cur and q in prev and cur[q] == prev[q]

def floor_tag(name, newv, pb):
    """'f' when the (newv vs pb) reading is the additive-floor class."""
    if newv is None or pb is None or pb <= 0:
        return ""
    if newv / pb >= 2.0 and newv - pb <= FLOOR_DELTA and (
            plan_same is None or plan_same(name)):
        return FLOOR_MARK
    return ""

with open(bench_log) as f:
    # LAST matching line: a log holding several runs must yield the newest.
    # Key on '"queries"' too — the bench also prints a compact summary line
    # (for the driver's 2,000-char tail capture) that has no per-query map.
    metric_lines = [l for l in f if '"metric"' in l and '"queries"' in l]
if not metric_lines:
    sys.exit("ERROR: no bench JSON line with the per-query map (containing "
             f"both '\"metric\"' and '\"queries\"') in {bench_log} — the "
             "compact tail-capture summary line alone is not enough "
             "— did the bench run fail before printing its result?")
bench = json.loads(metric_lines[-1][metric_lines[-1].index('{'):])
queries = bench["queries"]

path = "BASELINE.md"
with open(path) as f:
    lines = f.read().split("\n")

header_i = None
for i, l in enumerate(lines):
    if l.startswith("| query |"):
        header_i = i
        break
assert header_i is not None, "table header not found"

header = [c.strip() for c in lines[header_i].strip("|").split("|")]
have_label = label in header
if not have_label:
    header = header[:-1] + [label, header[-1]]

rows = []
i = header_i + 2
seen = set()
while i < len(lines) and lines[i].startswith("|"):
    cells = [c.strip() for c in lines[i].strip("|").split("|")]
    name = cells[0].strip("`")
    old = dict(zip([c.strip() for c in lines[header_i].strip("|").split("|")], cells))
    newv = queries.get(name)

    def pb_peek(old, header):
        m = re.fullmatch(r"([0-9.]+)[†‡*]?", old.get(header[-1], ""))
        return float(m.group(1)) if m else None
    vals = []
    for col in header[1:-1]:
        if col == label:
            vals.append(f"{newv:.2f}{floor_tag(name, newv, pb_peek(old, header))}"
                        if newv is not None else "—")
        else:
            vals.append(old.get(col, "—"))
    prev_base = old.get(header[-1], "—")
    # a trailing footnote marker (e.g. '2.01†' — the multimodal baseline
    # reset) is part of the format: parse the number, keep the marker.
    # ONLY the known footnote glyphs qualify — any other suffix (bold
    # markdown, a hand note) must still hit the refuse-to-overwrite guard
    marker = ""
    base_num = prev_base
    m = re.fullmatch(r"([0-9.]+)([†‡*])", prev_base)
    if m:
        base_num, marker = m.group(1), m.group(2)
    if base_num in ("—", "-", ""):
        pb = None
    else:
        try:
            pb = float(base_num)
        except ValueError:
            # an unparsable NON-EMPTY cell (bold markdown, a note) holds
            # history we must not silently reset to the new run's value —
            # fail loudly so the cell gets cleaned up by hand
            sys.exit(f"ERROR: baseline cell for {name!r} is {prev_base!r} — "
                     "not a number and not '—'; refusing to overwrite history")
    if newv is not None and pb is not None:
        base = min(pb, newv)
        if base != pb:
            # the footnote described the superseded measurement (e.g. a
            # baseline-reset note) — it must not annotate the new number
            marker = ""
    elif newv is not None:
        base = newv
    else:
        base = pb
    vals.append(f"{base:.2f}{marker}" if base is not None else "—")
    rows.append((name, vals))
    seen.add(name)
    i += 1

for name in sorted(queries):
    if name not in seen:
        vals = []
        for col in header[1:-1]:
            vals.append(f"{queries[name]:.2f}" if col == label else "—")
        vals.append(f"{queries[name]:.2f}")
        rows.append((name, vals))

table = ["| " + " | ".join(header) + " |",
         "|" + "---|" * len(header)]
for name, vals in rows:
    table.append("| " + " | ".join([name] + vals) + " |")

out = lines[:header_i] + table + lines[i:]
with open(path, "w") as f:
    f.write("\n".join(out))
total = bench["value"]
print(f"updated {len(rows)} rows; bench total {total}s / {len(queries)} queries")
