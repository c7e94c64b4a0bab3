#!/usr/bin/env python
"""Aggregate a calibration-eval sweep (scripts/eval_calibration_grid.sh)
into one markdown table per attacker: score-distribution drift vs the
fixed threshold-0 operating point vs the calibrated one.

Usage: python scripts/aggregate_calibration.py [docs/flag_cal] [--im gim]
"""

import glob
import os
import re
import sys

import pandas as pd


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    root = argv[0] if argv else "docs/flag_cal"
    im_types = ["gim", "replay", "rnd_src"]
    if "--im" in argv:
        im_types = [argv[argv.index("--im") + 1]]

    frames = []
    for f in sorted(glob.glob(os.path.join(root, "cal_eval_*.csv"))):
        step = int(re.search(r"(\d+)\.csv$", f).group(1))
        df = pd.read_csv(f, index_col=0)
        df["step"] = step
        frames.append(df)
    if not frames:
        raise SystemExit(f"no cal_eval_*.csv under {root}")
    allrows = pd.concat(frames, ignore_index=True)

    out = []
    for im in im_types:
        sub = allrows[(allrows.au_type == "gim") & (allrows.im_type == im)]
        if sub.empty:
            continue
        out.append(f"\n### attacker: {im}\n")
        out.append(
            "| step | AUC | real mean±std | fake mean±std | acc_real@0 "
            "| acc@0 | th_cal | acc_real@cal | acc@cal | acc@balanced |"
        )
        out.append("|---|---|---|---|---|---|---|---|---|---|")
        for _, r in sub.sort_values("step").iterrows():
            out.append(
                f"| {int(r.step)} | {r.auc:.3f} "
                f"| {r.score_real_mean:+.2f}±{r.score_real_std:.2f} "
                f"| {r.score_fake_mean:+.2f}±{r.score_fake_std:.2f} "
                f"| {r.acc_on_real:.3f} | {r.acc:.3f} "
                f"| {r.th_cal:+.3f} | {r.acc_on_real_cal:.3f} "
                f"| {r.acc_cal:.3f} | {r.acc_balanced:.3f} |"
            )
    print("\n".join(out))


if __name__ == "__main__":
    main()
