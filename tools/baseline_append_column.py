#!/usr/bin/env python3
"""Append a per-round column to BASELINE.md's per-query anchor table.

Usage: python3 tools/baseline_append_column.py <bench_json> <label>

Reads the canonical bench JSON (e.g. BENCH_SELF.json), finds the
anchor table (header row starting with '| Query |'), appends one
column labeled <label> filled from the JSON's per-query seconds
(2 decimals, em-dash when the row's query is absent from the JSON),
and adds NEW rows (em-dash in all historical columns) for queries
present in the JSON but missing from the table; the non-total body
rows are re-sorted alphabetically so late additions land in order
rather than at the bottom. The '**total**' row gets the JSON total +
query count and keeps its position.

Writes BASELINE.md in place; prints a one-line summary.
"""
import json
import sys


def main() -> None:
    bench_path, label = sys.argv[1], sys.argv[2]
    bench = json.load(open(bench_path))
    qsecs = {k: float(v) for k, v in bench["queries"].items()}
    total = float(bench["value"])

    lines = open("BASELINE.md").read().split("\n")
    # the anchor table is the LAST '| Query |' table in the file (an
    # e-suite forensics table earlier in the doc shares the header)
    headers = [i for i, l in enumerate(lines) if l.startswith("| Query |")]
    if not headers:
        sys.exit("baseline_append_column: no '| Query |' anchor table "
                 "found in BASELINE.md — nothing to append to")
    hdr = max(headers)
    sep = hdr + 1
    ncols = lines[hdr].count("|") - 1  # existing columns incl. Query

    lines[hdr] = lines[hdr].rstrip() + f" {label} |"
    lines[sep] = lines[sep].rstrip() + "---|"

    i = sep + 1
    seen = set()
    body = []  # (name, rendered-row) for non-total rows
    total_row = None  # (index-within-body, rendered-row)
    while i < len(lines) and lines[i].startswith("|"):
        cells = [c.strip() for c in lines[i].split("|")[1:-1]]
        if not cells:
            sys.exit(f"baseline_append_column: malformed table row at "
                     f"BASELINE.md line {i + 1}: {lines[i]!r}")
        name = cells[0]
        if name == "**total**":
            total_row = (len(body),
                         lines[i].rstrip() + f" **{total:.1f}** ({len(qsecs)} queries) |")
        else:
            seen.add(name)
            v = qsecs.get(name)
            body.append((name,
                         lines[i].rstrip() + (f" {v:.2f} |" if v is not None else " — |")))
        i += 1
    end = i

    new_rows = []
    for name in sorted(set(qsecs) - seen):
        dashes = " — |" * (ncols - 1)
        new_rows.append((name, f"| {name} |{dashes} {qsecs[name]:.2f} |"))
    body = sorted(body + new_rows, key=lambda r: r[0])

    rendered = [r for _, r in body]
    if total_row is not None:
        rendered.insert(total_row[0], total_row[1])
    lines[sep + 1:end] = rendered

    open("BASELINE.md", "w").write("\n".join(lines))
    print(f"appended column {label}: {len(seen)} existing rows, "
          f"{len(new_rows)} new rows, total {total:.1f}s over {len(qsecs)} queries")


if __name__ == "__main__":
    main()
