#!/usr/bin/env python
"""Paper figure: game value vs n/m for several observation dimensions d.

Parity with ``plots/plot_game_value_of_n_over_m_for_diff_d.py``; adds an
``--out`` flag to save the figure (headless-friendly) instead of show().
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import matplotlib as mpl
import matplotlib.pyplot as plt

from optimalstrategiesagainstgenerativeattacks_tpu.theory import game_value_as_func_of_n


def plot_game_value_of_n_div_m_for_diff_d(m, n_max, d_list, k, linewidth, out=None):
    for d in d_list:
        n_array, v = game_value_as_func_of_n(m=m, n_max=n_max, d=d, k=k)
        plt.plot(n_array, v, label=f"d = {d}", linewidth=linewidth)
    plt.xlabel("n/m")
    plt.ylabel("Game Value")
    plt.legend(loc="lower right")
    plt.grid(color="k", alpha=0.2, axis="both", which="both")
    if out:
        plt.savefig(out, bbox_inches="tight")
        print(f"saved {out}")
    else:
        plt.show()


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=1)
    parser.add_argument("--n_max", type=int, default=100)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--d_list", type=int, nargs="+", default=[1, 2, 5, 10, 20, 100])
    parser.add_argument("--out", default=None, help="save figure to this path instead of showing")
    return parser.parse_args()


if __name__ == "__main__":
    mpl.rcParams["font.size"] = 16.0
    args = get_args()
    plot_game_value_of_n_div_m_for_diff_d(
        m=args.m, n_max=args.n_max, d_list=args.d_list, k=args.k, linewidth=2.0,
        out=args.out,
    )
