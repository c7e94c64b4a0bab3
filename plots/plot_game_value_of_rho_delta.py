#!/usr/bin/env python
"""Paper figure: rho-delta game-value heatmap (nash / ml_attacker / diff).

Parity with ``plots/plot_game_value_of_rho_delta.py``; vectorised over the
grid (the reference double-loops over a 1000x1000 grid) and adds ``--out``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import matplotlib as mpl
import matplotlib.pyplot as plt
import numpy as np

from optimalstrategiesagainstgenerativeattacks_tpu.theory import (
    game_value_diff_ml_vs_opt_rho_delta,
    game_value_rho_delta,
    ml_attacker_game_value_rho_delta,
)

EPS = 1e-6
GAME_VALUE_FUNCTIONS = {
    "nash_game_value": game_value_rho_delta,
    "ml_attacker_game_value": ml_attacker_game_value_rho_delta,
    "game_value_diff_ml_vs_opt": game_value_diff_ml_vs_opt_rho_delta,
}


def plot_game_value_of_rho_delta(
    game_value_func, d, rho_log_range=(-4, 4), delta_range=(EPS, 1),
    value_range=(0.5, 1.0), n_points=1000, out=None,
):
    rho, delta = np.meshgrid(
        np.logspace(rho_log_range[0], rho_log_range[1], num=n_points, endpoint=True),
        np.linspace(delta_range[0], delta_range[1], num=n_points, endpoint=True),
    )
    vec = np.vectorize(lambda r, dl: game_value_func(d=d, rho=r, delta=dl))
    v = vec(rho, delta)[:-1, :-1]
    plt.pcolor(rho, delta, v, vmin=value_range[0], vmax=value_range[1])
    plt.colorbar()
    plt.xscale("log")
    plt.xlabel(r"$\rho$")
    plt.ylabel(r"$\delta$")
    plt.title(f"d = {d}")
    if out:
        plt.savefig(out, bbox_inches="tight")
        print(f"saved {out}")
    else:
        plt.show()


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=100, help="The dimension of observations")
    parser.add_argument("--plot_type", default="nash_game_value",
                        help='"nash_game_value" | "ml_attacker_game_value" | "game_value_diff_ml_vs_opt"')
    parser.add_argument("--n_points", type=int, default=1000)
    parser.add_argument("--out", default=None, help="save figure to this path instead of showing")
    return parser.parse_args()


if __name__ == "__main__":
    mpl.rcParams["font.size"] = 16.0
    args = get_args()
    plot_game_value_of_rho_delta(
        game_value_func=GAME_VALUE_FUNCTIONS[args.plot_type],
        d=args.d,
        value_range=(0.0, 0.5) if args.plot_type == "game_value_diff_ml_vs_opt" else (0.5, 1.0),
        n_points=args.n_points,
        out=args.out,
    )
