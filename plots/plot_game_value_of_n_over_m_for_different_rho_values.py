#!/usr/bin/env python
"""Paper figure: asymptotic game value vs n/m (= 1/delta) for several rho.

Parity with the reference's ``plots/plot_game_value_of_n_over_m_for
different_rho_values.py`` (whose filename contains a space — README.md:34;
renamed sanely here).  Adds ``--out`` for headless saving.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import matplotlib as mpl
import matplotlib.pyplot as plt
import numpy as np

from optimalstrategiesagainstgenerativeattacks_tpu.theory import game_value_rho_delta


def plot_game_value_of_inv_delta_for_diff_rho(
    game_value_func, inv_delta_max, d, rho_list, linewidth=2.0, out=None
):
    for rho in rho_list:
        inv_delta_array = np.arange(1, inv_delta_max + 1)
        v = np.array(
            [game_value_func(d=d, rho=rho, delta=1.0 / i) for i in inv_delta_array]
        )
        plt.plot(inv_delta_array, v, label=rf"$\rho$ = {rho}", linewidth=linewidth)
    plt.xlabel("n/m")
    plt.ylabel("Game Value")
    plt.title(f"d = {d}")
    plt.legend(loc="lower right")
    plt.grid(color="k", alpha=0.2, axis="both", which="both")
    if out:
        plt.savefig(out, bbox_inches="tight")
        print(f"saved {out}")
    else:
        plt.show()


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=100, help="The dimension of observations")
    parser.add_argument("--max_n_over_m", type=int, default=100, help="Max value of x-axis in plot")
    parser.add_argument("--rho_list", type=float, nargs="+", default=(0.1, 1, 2, 5, 10),
                        help="List of rho values for which the game value will be plotted")
    parser.add_argument("--out", default=None, help="save figure to this path instead of showing")
    return parser.parse_args()


if __name__ == "__main__":
    mpl.rcParams["font.size"] = 16.0
    args = get_args()
    plot_game_value_of_inv_delta_for_diff_rho(
        game_value_func=game_value_rho_delta, inv_delta_max=args.max_n_over_m,
        d=args.d, rho_list=args.rho_list, out=args.out,
    )
