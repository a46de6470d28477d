"""Compare two benchmark-grid JSONL files row by row.

Usage:
    python benches/compare.py OLD.jsonl NEW.jsonl [--top K] [--csv]

Prints per-id speedup (old_ns / new_ns), worst regressions and best
improvements, plus aggregate stats. Error rows (records with an "error"
key) are listed separately so grid completeness stays auditable.
"""

from __future__ import annotations

import argparse
import json


def load(path: str):
    rows, errors = {}, {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if "error" in rec:
                errors[rec["id"]] = rec["error"]
            else:
                rows[rec["id"]] = rec
    return rows, errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--csv", action="store_true")
    args = ap.parse_args()

    old, old_err = load(args.old)
    new, new_err = load(args.new)

    both = sorted(set(old) & set(new))
    speedups = []
    for bid in both:
        o, n = old[bid]["ns_per_poly"], new[bid]["ns_per_poly"]
        # significance: a delta is real only if the two rows' measured
        # [min, max] spreads do not overlap (rows without dispersion fields
        # — pre-round-5 grids — get a conservative ±8% half-spread, half of
        # the documented ±15% cross-process wobble)
        o_hi = old[bid].get("ns_per_poly_max", o * 1.08)
        n_hi = new[bid].get("ns_per_poly_max", n * 1.08)
        if n > o_hi:
            sig = "regression"
        elif n_hi < o:
            sig = "improvement"
        else:
            sig = "noise"
        speedups.append((o / n, bid, o, n, sig))

    if args.csv:
        print("id,old_ns,new_ns,speedup,significance")
        for s, bid, o, n, sig in sorted(speedups, key=lambda t: t[1]):
            print(f"{bid},{o},{n},{s:.3f},{sig}")
        return

    speedups.sort(reverse=True)
    print(f"{len(both)} shared ids; "
          f"{len(set(new) - set(old))} new-only, {len(set(old) - set(new))} old-only")
    if speedups:
        import statistics

        vals = [s for s, *_ in speedups]
        n_sig = sum(1 for t in speedups if t[4] != "noise")
        print(f"speedup: median {statistics.median(vals):.3f}x, "
              f"mean {statistics.fmean(vals):.3f}x, "
              f"min {min(vals):.3f}x, max {max(vals):.3f}x; "
              f"{n_sig} beyond measured spread, {len(vals) - n_sig} within noise")
        print(f"\ntop {args.top} improvements (* = beyond spread):")
        for s, bid, o, n, sig in speedups[: args.top]:
            mark = "*" if sig == "improvement" else " "
            print(f" {mark}{s:6.2f}x  {bid}: {o:.0f} -> {n:.0f} ns/poly")
        regress = [t for t in speedups if t[4] == "regression"]
        print(f"\nregressions beyond measured spread: {len(regress)}")
        for s, bid, o, n, _sig in sorted(regress)[: args.top]:
            print(f"  {s:6.2f}x  {bid}: {o:.0f} -> {n:.0f} ns/poly")
    for name, errs in (("old", old_err), ("new", new_err)):
        if errs:
            print(f"\n{name} error rows ({len(errs)}):")
            for bid, msg in errs.items():
                print(f"  {bid}: {msg[:80]}")


if __name__ == "__main__":
    main()
