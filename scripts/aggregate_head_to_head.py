#!/usr/bin/env python
"""Aggregate the hard-benchmark head-to-head eval CSVs into a per-step
mean +/- range AUC table (one row per implementation x step x attacker).

Reads ``docs/hard_head_to_head/{jax,ref}_hard_s{seed}_eval_{step}.csv``
(written by the two eval CLIs: ours and the torch reference's
``authentication_eval/eval_gim_on_authentication.py:195-252`` run via
``scripts/ref_shims``) and prints a markdown table.

Usage: python scripts/aggregate_head_to_head.py [--dir docs/hard_head_to_head]
"""

import argparse
import csv
import glob
import os
import re
from collections import defaultdict


def load(dir_path):
    # rows[(impl, step, attacker)] -> list of (auc, acc) across seeds
    rows = defaultdict(list)
    pat = re.compile(r"(jax|ref)_hard_s(\d+)_eval_(\d+)\.csv$")
    for path in sorted(glob.glob(os.path.join(dir_path, "*.csv"))):
        m = pat.search(os.path.basename(path))
        if not m:
            continue
        impl, _seed, step = m.group(1), int(m.group(2)), int(m.group(3))
        with open(path) as f:
            for r in csv.DictReader(f):
                rows[(impl, step, r["im_type"])].append(
                    (float(r["auc"]), float(r["acc"]))
                )
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "hard_head_to_head"))
    args = p.parse_args()
    rows = load(args.dir)
    steps = sorted({k[1] for k in rows})
    attackers = ("gim", "replay", "rnd_src")
    print("| step | impl | " + " | ".join(
        f"{a} AUC mean (min..max, n) " for a in attackers) + "|")
    print("|---|---|" + "---|" * len(attackers))
    for step in steps:
        for impl in ("ref", "jax"):
            cells = []
            for a in attackers:
                vals = [auc for auc, _ in rows.get((impl, step, a), [])]
                if not vals:
                    cells.append("—")
                    continue
                mean = sum(vals) / len(vals)
                cells.append(
                    f"{mean:.3f} ({min(vals):.3f}..{max(vals):.3f}, n={len(vals)})"
                )
            print(f"| {step} | {impl} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
