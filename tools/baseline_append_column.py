#!/usr/bin/env python3
"""Append a per-round column to BASELINE.md's per-query anchor table.

Usage: python3 tools/baseline_append_column.py <bench_json> <label>

Reads the canonical bench JSON (e.g. BENCH_SELF.json), finds the
anchor table (header row starting with '| Query |'), appends one
column labeled <label> filled from the JSON's per-query seconds
(2 decimals, em-dash when the row's query is absent from the JSON),
and adds NEW rows (alphabetical, em-dash in all historical columns)
for queries present in the JSON but missing from the table. The
'**total**' row gets the JSON total + query count.

Writes BASELINE.md in place; prints a one-line summary.
"""
import json
import re
import sys


def main() -> None:
    bench_path, label = sys.argv[1], sys.argv[2]
    bench = json.load(open(bench_path))
    qsecs = {k: float(v) for k, v in bench["queries"].items()}
    total = float(bench["value"])

    lines = open("BASELINE.md").read().split("\n")
    # the anchor table is the LAST '| Query |' table in the file (an
    # e-suite forensics table earlier in the doc shares the header)
    hdr = max(i for i, l in enumerate(lines) if l.startswith("| Query |"))
    sep = hdr + 1
    ncols = lines[hdr].count("|") - 1  # existing columns incl. Query

    lines[hdr] = lines[hdr].rstrip() + f" {label} |"
    lines[sep] = lines[sep].rstrip() + "---|"

    i = sep + 1
    seen = set()
    while i < len(lines) and lines[i].startswith("|"):
        cells = [c.strip() for c in lines[i].split("|")[1:-1]]
        name = cells[0]
        if name == "**total**":
            lines[i] = lines[i].rstrip() + f" **{total:.1f}** ({len(qsecs)} queries) |"
        else:
            seen.add(name)
            v = qsecs.get(name)
            lines[i] = lines[i].rstrip() + (f" {v:.2f} |" if v is not None else " — |")
        i += 1
    end = i

    new_rows = []
    for name in sorted(set(qsecs) - seen):
        dashes = " — |" * (ncols - 1)
        new_rows.append(f"| {name} |{dashes} {qsecs[name]:.2f} |")
    lines[end:end] = new_rows

    open("BASELINE.md", "w").write("\n".join(lines))
    print(f"appended column {label}: {len(seen)} existing rows, "
          f"{len(new_rows)} new rows, total {total:.1f}s over {len(qsecs)} queries")


if __name__ == "__main__":
    main()
