"""Splice re-measured rows into a benchmark-grid JSONL file.

Usage: python benches/splice.py GRID.jsonl NEW_ROWS.jsonl

Replaces rows in GRID whose "id" appears in NEW_ROWS (in place, preserving
order); appends NEW_ROWS ids the grid doesn't have yet. Used when a
dispatch-gate change invalidates a subset of rows: re-measure only those
ids (`benches/run.py --ids ...`) and splice, instead of re-running the
whole grid.
"""

import json
import sys


def main():
    grid_path, new_path = sys.argv[1], sys.argv[2]
    new = {}
    with open(new_path) as f:
        for line in f:
            line = line.strip()
            if line:
                rec = json.loads(line)
                new[rec["id"]] = rec
    out, replaced = [], 0
    with open(grid_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec["id"] in new:
                out.append(new.pop(rec["id"]))
                replaced += 1
            else:
                out.append(rec)
    out.extend(new.values())
    with open(grid_path, "w") as f:
        for rec in out:
            f.write(json.dumps(rec) + "\n")
    print(f"replaced {replaced}, appended {len(new)} rows in {grid_path}")


if __name__ == "__main__":
    main()
