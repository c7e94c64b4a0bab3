"""Golden-value tests for the closed-form game values (BASELINE.md anchors)."""

import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.theory import (
    game_value_as_func_of_n,
    game_value_diff_ml_vs_opt_rho_delta,
    game_value_mnk,
    game_value_rho_delta,
    ml_attacker_game_value_rho_delta,
)


def test_game_value_mnk_readme_example():
    # README.md:24-27 example; value verified by executing the reference module
    assert game_value_mnk(m=1, n=5, d=10, k=10) == pytest.approx(0.921131, abs=1e-5)


def test_game_value_mnk_n10():
    assert game_value_mnk(m=1, n=10, d=10, k=10) == pytest.approx(0.967061, abs=1e-5)


def test_game_value_trivial_when_n_leq_m():
    assert game_value_mnk(m=5, n=5, d=10, k=10) == 0.5
    assert game_value_mnk(m=6, n=5, d=10, k=10) == 0.5


def test_game_value_monotone_in_n():
    n_array, v = game_value_as_func_of_n(m=1, n_max=20, d=10, k=10)
    assert n_array[0] == 1 and n_array[-1] == 20
    assert np.all(np.diff(v) >= -1e-12)
    assert v[0] == 0.5  # n == m


def test_game_value_rho_delta_anchor():
    assert game_value_rho_delta(d=100, rho=1.0, delta=0.2) == pytest.approx(
        0.964053, abs=1e-5
    )
    assert game_value_rho_delta(d=100, rho=1.0, delta=1.0) == 0.5


def test_ml_attacker_value_anchor():
    assert ml_attacker_game_value_rho_delta(d=100, rho=1.0, delta=0.2) == pytest.approx(
        0.983580, abs=1e-5
    )


def test_ml_attacker_weaker_than_optimal():
    # the authenticator does at least as well against the ML attacker
    for d in (1, 2, 5, 10, 100):
        for delta in (0.1, 0.2, 0.5):
            diff = game_value_diff_ml_vs_opt_rho_delta(d=d, rho=1.0, delta=delta)
            assert diff >= -1e-12
