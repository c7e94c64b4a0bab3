"""End-to-end tests for the Gaussian game training slice.

Covers the full stack: jitted alternating step, losses + optional R1
penalty, chunked scan, 8-device CPU mesh data parallelism, checkpointing
and resume, and (the theory oracle, SURVEY §4) convergence of the trained
authenticator accuracy towards the closed-form game value.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.models import gaussian as gmodels
from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import create_mesh
from optimalstrategiesagainstgenerativeattacks_tpu.theory import game_value_mnk
from optimalstrategiesagainstgenerativeattacks_tpu.train import gaussian as gtrain
from optimalstrategiesagainstgenerativeattacks_tpu.train.checkpoints import (
    CheckpointIO,
    get_latest_ckpt,
)
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import GaussianGameConfig


def _setup(cfg):
    au = gmodels.get_au(cfg.src_dim)
    im = gmodels.get_im(cfg.src_dim)
    state, opt_au, opt_im = gtrain.create_state(cfg, au, im, jax.random.PRNGKey(cfg.seed))
    return au, im, state, opt_au, opt_im


def test_single_step_changes_both_players():
    cfg = GaussianGameConfig(batch_size=64, n_iters=1, src_dim=2, m=1, n=5, k=5)
    au, im, state, opt_au, opt_im = _setup(cfg)
    step_fn = jax.jit(gtrain.make_train_step(cfg, au, im, opt_au, opt_im))
    new_state, metrics = step_fn(state)
    assert int(new_state.step) == 0
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # both players' params moved
    moved_au = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params_au, new_state.params_au)
    moved_im = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params_im, new_state.params_im)
    assert max(jax.tree.leaves(moved_au)) > 0
    assert max(jax.tree.leaves(moved_im)) > 0


def test_r1_penalty_active_when_reg_param_set():
    cfg = GaussianGameConfig(batch_size=32, src_dim=2, m=1, n=4, k=4, reg_param=5.0)
    au, im, state, opt_au, opt_im = _setup(cfg)
    step_fn = jax.jit(gtrain.make_train_step(cfg, au, im, opt_au, opt_im))
    _, metrics = step_fn(state)
    assert float(metrics["au_reg"]) > 0.0


def test_scan_chunk_matches_sequential_steps():
    cfg = GaussianGameConfig(batch_size=32, src_dim=1, m=1, n=3, k=3)
    au, im, state, opt_au, opt_im = _setup(cfg)
    step_fn = jax.jit(gtrain.make_train_step(cfg, au, im, opt_au, opt_im))
    s_seq = state
    for _ in range(4):
        s_seq, _ = step_fn(s_seq)
    train4 = gtrain.make_train_fn(cfg, au, im, opt_au, opt_im, n_steps=4)
    s_scan, metrics = train4(state)
    assert metrics["im_loss"].shape == (4,)
    assert int(s_scan.step) == int(s_seq.step) == 3
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s_seq.params_au)[0]),
        np.asarray(jax.tree.leaves(s_scan.params_au)[0]),
        rtol=2e-4, atol=1e-6,
    )


def test_train_step_on_8_device_mesh():
    mesh = create_mesh()  # 8 CPU devices from conftest
    assert mesh.devices.size == 8
    cfg = GaussianGameConfig(batch_size=64, src_dim=2, m=1, n=4, k=4)
    au, im, state, opt_au, opt_im = _setup(cfg)
    train2 = gtrain.make_train_fn(cfg, au, im, opt_au, opt_im, mesh=mesh, n_steps=2)
    new_state, metrics = train2(state)
    assert metrics["au_acc"].shape == (2,)
    assert all(np.isfinite(np.asarray(v)).all() for v in metrics.values())


def test_checkpoint_save_load_roundtrip(tmp_path):
    cfg = GaussianGameConfig(batch_size=16, src_dim=1, m=1, n=3, k=3)
    au, im, state, opt_au, opt_im = _setup(cfg)
    step_fn = jax.jit(gtrain.make_train_step(cfg, au, im, opt_au, opt_im))
    state, _ = step_fn(state)
    state, _ = step_fn(state)

    cio = CheckpointIO(str(tmp_path / "ckpts"))
    path = cio.save(state, int(state.step))
    assert path.endswith("model_00000001")
    assert get_latest_ckpt(str(tmp_path / "ckpts")) == path

    _, _, fresh, _, _ = _setup(cfg)
    restored, gstep, _ = cio.load(path, fresh)
    assert gstep == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params_au)[0]),
        np.asarray(jax.tree.leaves(state.params_au)[0]),
    )
    # training continues from the restored state
    cont, _ = step_fn(gtrain.GameState(**{f: getattr(restored, f) for f in (
        "step", "params_au", "params_im", "spectral_au", "spectral_im",
        "opt_au", "opt_im", "rng")}))
    assert int(cont.step) == 2


def test_full_training_entry_with_logger(tmp_path):
    cfg = GaussianGameConfig(
        outdir=str(tmp_path), batch_size=32, src_dim=1, m=1, n=3, k=3,
        n_iters=20, log_every=5, save_stats_every=5, save_every=10,
    )
    state = gtrain.train_gim_gaussian(cfg, progress=False)
    assert int(state.step) == 19
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpts"))
    assert get_latest_ckpt(os.path.join(str(tmp_path), "ckpts")).endswith("model_00000019")


@pytest.mark.slow
def test_gaussian_game_converges_to_theory_value():
    """Acceptance test (SURVEY §7 stage 4): trained au accuracy approx
    equals the closed-form Nash value within tolerance."""
    m, n, k, d = 1, 5, 10, 1
    v_theory = game_value_mnk(m=m, n=n, d=d, k=k)
    cfg = GaussianGameConfig(
        batch_size=1024, src_dim=d, m=m, n=n, k=k,
        prior_sigma=10.0, src_sigma=1.0, au_lr=1e-3, im_lr=1e-3, seed=1,
    )
    au, im, state, opt_au, opt_im = _setup(cfg)
    train_chunk = gtrain.make_train_fn(cfg, au, im, opt_au, opt_im, n_steps=100)
    accs = []
    for _ in range(30):
        state, metrics = train_chunk(state)
        accs.append(float(np.asarray(metrics["au_acc"]).mean()))
    converged = float(np.mean(accs[-5:]))
    # theory value for (1, 5, 10, 1) is ~0.73; the learned game should land nearby
    assert abs(converged - v_theory) < 0.08, (converged, v_theory)
