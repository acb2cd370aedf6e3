#!/usr/bin/env python3
"""Render SCALE.md's interleaved-vs-iso e2e pair table FROM a committed
BENCH_FULL_r{N}.json artifact (VERDICT r5 ask #8: the table must match
the artifact byte-for-byte, not a hand-copied builder-side run).

Usage: python3 tools/pair_table.py BENCH_FULL_r06.json
Prints the markdown table (with per-rep iso times when the artifact
carries a "reps" map, and the trimmed mean when the artifact carries
"_iso_tmean" keys — r7 ask #1) to stdout; paste into SCALE.md verbatim.
"""
import json
import sys


def main(path: str) -> None:
    with open(path) as f:
        data = json.load(f)
    q = data["queries"]
    reps = data.get("reps", {})
    cells = sorted(
        k for k in q if k.startswith("e2e_") and "_iso" not in k)
    has_tmean = any(k.endswith("_iso_tmean") for k in q)
    header = ["cell", "interleaved", "iso (median)"]
    if has_tmean:
        header.append("iso (trimmed mean)")
    if reps:
        header.append("iso reps (run order)")
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))

    def fmt(v, present=True):
        # a key that is absent was never run (e.g. interleaved-only
        # artifact) — render "—"; a PRESENT key with null value errored
        if not present:
            return "—"
        return "error" if v is None else f"{v:.1f}"

    for c in cells:
        iso_key = c + "_iso"
        row = [f"`{c}`", fmt(q[c]),
               fmt(q.get(iso_key), present=iso_key in q)]
        if has_tmean:
            tk = c + "_iso_tmean"
            row.append(fmt(q.get(tk), present=tk in q))
        if reps:
            rr = reps.get(c + "_iso", [])
            row.append(", ".join(
                f"{r:.1f}" if isinstance(r, (int, float)) else "error"
                for r in rr))
        print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main(sys.argv[1])
