#!/usr/bin/env python
"""Summarise a jax.profiler trace dir: top device ops by self time.

Usage: python scripts/parse_profile.py /tmp/prof_dir [--top 30]

Reads the newest ``*.xplane.pb`` under ``<dir>/plugins/profile/*/`` with the
tensorboard profile plugin's converter and prints one line per op (self-time
totals across the captured steps), plus per-category rollups — the quick
"where do the milliseconds go" view used for the round-3 perf passes.
"""

import argparse
import glob
import json
import os
import sys


def find_xplane(trace_dir: str) -> str:
    pats = sorted(
        glob.glob(os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")),
        key=os.path.getmtime,
    )
    if not pats:
        raise SystemExit(f"no xplane.pb under {trace_dir}/plugins/profile/*/")
    return pats[-1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplane = find_xplane(args.trace_dir)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats^", {"tqx": "out:json"}
    )
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)["table"]
    cols = [c["label"] for c in table["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in table["rows"]]

    def col(name):
        return cols.index(name)

    # column labels vary slightly across plugin versions; resolve leniently
    def find_col(*cands):
        for c in cands:
            if c in cols:
                return cols.index(c)
        raise SystemExit(f"none of {cands} in {cols}")

    i_name = find_col("Operation", "Op name", "Name")
    i_self = find_col(
        "Total self time (us)", "Self time (us)", "Total self-time (us)"
    )
    i_cat = find_col("Type", "Category", "Op type")

    rows = [r for r in rows if r[i_self]]
    rows.sort(key=lambda r: -float(r[i_self]))
    total = sum(float(r[i_self]) for r in rows)
    print(f"total device self time: {total/1e3:.2f} ms (all captured steps)")
    print(f"{'self_ms':>9} {'%':>5}  {'category':<18} op")
    for r in rows[: args.top]:
        ms = float(r[i_self]) / 1e3
        print(f"{ms:9.3f} {100*float(r[i_self])/total:5.1f}  {str(r[i_cat]):<18} {str(r[i_name])[:90]}")

    cats = {}
    for r in rows:
        cats[r[i_cat]] = cats.get(r[i_cat], 0.0) + float(r[i_self])
    print("\nby category:")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{v/1e3:9.3f} {100*v/total:5.1f}  {k}")


if __name__ == "__main__":
    main()
