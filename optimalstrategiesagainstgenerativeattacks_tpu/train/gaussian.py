"""Gaussian GIM game: jitted alternating train step + training loop.

Replaces the reference's trainer-module/loop pair
(``training/gim_gaussian_trainer.py``, ``training/gim_gaussian_training.py``)
with the TPU-native design (SURVEY §7):

  * Batches are synthesised *inside* the compiled step from the threaded
    PRNG key (mu ~ N(0, prior_sigma^2 I); real/leaked/si ~ N(mu, src^2 I)),
    mirroring the reference's on-the-fly synthesis (:72-87) — there is no
    host data path at all.
  * One ``train_step`` performs the impersonator update (authenticator
    frozen) and then the authenticator update on the detached fake,
    exactly matching the reference ordering (:91-97).  Per-sample losses
    are meaned inside the step (equivalent to the DataParallel
    gather+mean).
  * ``make_train_fn`` wraps K steps in ``lax.scan`` so the host only syncs
    at the logging cadence; stacked per-step metrics preserve the
    reference's every-step scalar logging contract.
  * Under a Mesh, the synthesised batch is sharding-constrained over the
    ``data`` axis; XLA emits the ICI all-reduces for the grads.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import (
    batch_sharding,
    constrain_data,
)
from optimalstrategiesagainstgenerativeattacks_tpu.train.losses import (
    bce_with_logits,
    gan_accuracy,
)
from optimalstrategiesagainstgenerativeattacks_tpu.train.state import GameState
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import GaussianGameConfig

METRIC_KEYS = (
    "im_loss",
    "au_loss",
    "au_loss_on_real",
    "au_loss_on_fake",
    "au_reg",
    "au_out_on_real",
    "au_out_on_fake",
    "au_acc",
    "au_acc_on_real",
    "au_acc_on_fake",
    # im/real distance stats (reference :117-148)
    "im_l1_dist_from_leaked_sample_mean",
    "im_l1_dist_from_gt_sample_mean",
    "im_l1_dist_from_gt_std",
    "real_l1_dist_from_gt_sample_mean",
    "real_l1_dist_from_gt_std",
)


def create_state(
    cfg: GaussianGameConfig, au, im, rng: jax.Array
) -> Tuple[GameState, optax.GradientTransformation, optax.GradientTransformation]:
    """Initialise params and optimizers (Adam with torch-default betas,
    ``gim_gaussian_trainer.py:48-49``)."""
    k_au, k_im, k_state = jax.random.split(rng, 3)
    d = cfg.src_dim
    test = jnp.zeros((1, cfg.n, d))
    si = jnp.zeros((1, cfg.k, d))
    leaked = jnp.zeros((1, cfg.m, d))
    au_vars = au.init(k_au, test, si)
    im_vars = im.init({"params": k_im, "noise": k_im}, leaked, cfg.n)

    opt_au = optax.adam(cfg.au_lr)
    opt_im = optax.adam(cfg.im_lr)
    state = GameState(
        step=jnp.asarray(-1, jnp.int32),
        params_au=au_vars["params"],
        params_im=im_vars["params"],
        spectral_au=au_vars.get("spectral", {}),
        spectral_im=im_vars.get("spectral", {}),
        opt_au=opt_au.init(au_vars["params"]),
        opt_im=opt_im.init(im_vars["params"]),
        rng=k_state,
    )
    return state, opt_au, opt_im


def _synth_batch(cfg: GaussianGameConfig, rng: jax.Array, mesh):
    """mu ~ N(0, prior^2 I); real/leaked/si ~ N(mu, src^2 I)."""
    b, d = cfg.batch_size, cfg.src_dim
    k_mu, k_r, k_l, k_s = jax.random.split(rng, 4)
    mu = cfg.prior_sigma * jax.random.normal(k_mu, (b, d))
    mu = constrain_data(mu, mesh)

    def draw(key, s):
        x = mu[:, None, :] + cfg.src_sigma * jax.random.normal(key, (b, s, d))
        return constrain_data(x, mesh)

    return {
        "mu": mu,
        "sigma": jnp.full((b, d), cfg.src_sigma),
        "real_sample": draw(k_r, cfg.n),
        "leaked_sample": draw(k_l, cfg.m),
        "si_sample": draw(k_s, cfg.k),
    }


def make_train_step(
    cfg: GaussianGameConfig, au, im, opt_au, opt_im, mesh=None
) -> Callable[[GameState], Tuple[GameState, Dict[str, jnp.ndarray]]]:
    """Build the (unjitted) single train step: im update then au update."""

    def train_step(state: GameState):
        step = state.step + 1
        rng, k_batch, k_noise = jax.random.split(jax.random.fold_in(state.rng, step), 3)
        batch = _synth_batch(cfg, k_batch, mesh)
        real, leaked, si = (
            batch["real_sample"],
            batch["leaked_sample"],
            batch["si_sample"],
        )

        # ---- impersonator step (au frozen) — reference :21-30, trainer :112-117
        def im_loss_fn(params_im):
            fake = im.apply(
                {"params": params_im},
                leaked,
                cfg.n,
                cfg.remove_noise_mean,
                rngs={"noise": k_noise},
            )
            auth_out = au.apply({"params": state.params_au}, fake, si)
            loss = bce_with_logits(auth_out, 1.0).mean()
            return loss, fake

        (im_loss, fake), im_grads = jax.value_and_grad(im_loss_fn, has_aux=True)(
            state.params_im
        )
        im_updates, new_opt_im = opt_im.update(im_grads, state.opt_im, state.params_im)
        new_params_im = optax.apply_updates(state.params_im, im_updates)

        # ---- authenticator step on the detached fake — reference :33-47, trainer :84-110
        fake = jax.lax.stop_gradient(fake)

        def au_loss_fn(params_au):
            def score_real(r, s):
                return au.apply({"params": params_au}, r, s)

            if cfg.reg_param > 0:
                # R1 shares the loss's forward (torch parity: compute_grad2
                # double-backwards through the graph that produced d_real)
                out_on_real, score_vjp = jax.vjp(score_real, real, si)
                g_r, g_s = score_vjp(jnp.ones_like(out_on_real))
                b = real.shape[0]
                reg = cfg.reg_param * (
                    jnp.square(g_r.astype(jnp.float32)).reshape(b, -1).sum(axis=1)
                    + jnp.square(g_s.astype(jnp.float32)).reshape(b, -1).sum(axis=1)
                )
                loss_on_real = bce_with_logits(out_on_real, 1.0)
            else:
                out_on_real = score_real(real, si)
                loss_on_real = bce_with_logits(out_on_real, 1.0)
                reg = jnp.zeros_like(loss_on_real)
            out_on_fake = au.apply({"params": params_au}, fake, si)
            loss_on_fake = bce_with_logits(out_on_fake, 0.0)
            loss = (loss_on_real + loss_on_fake + reg).mean()
            aux = (loss_on_real, loss_on_fake, reg, out_on_real, out_on_fake)
            return loss, aux

        (au_loss, aux), au_grads = jax.value_and_grad(au_loss_fn, has_aux=True)(
            state.params_au
        )
        loss_on_real, loss_on_fake, reg, out_on_real, out_on_fake = aux
        au_updates, new_opt_au = opt_au.update(au_grads, state.opt_au, state.params_au)
        new_params_au = optax.apply_updates(state.params_au, au_updates)

        acc, acc_on_real, acc_on_fake = gan_accuracy(out_on_real, out_on_fake)

        def l1(a, b):
            return jnp.abs(a - b).mean()

        from optimalstrategiesagainstgenerativeattacks_tpu.ops.stats import custom_std

        metrics = {
            "im_loss": im_loss,
            "au_loss": au_loss,
            "au_loss_on_real": loss_on_real.mean(),
            "au_loss_on_fake": loss_on_fake.mean(),
            "au_reg": reg.mean(),
            "au_out_on_real": out_on_real.mean(),
            "au_out_on_fake": out_on_fake.mean(),
            "au_acc": acc,
            "au_acc_on_real": acc_on_real,
            "au_acc_on_fake": acc_on_fake,
            "im_l1_dist_from_leaked_sample_mean": l1(
                fake.mean(axis=1), leaked.mean(axis=1)
            ),
            "im_l1_dist_from_gt_sample_mean": l1(fake.mean(axis=1), batch["mu"]),
            "im_l1_dist_from_gt_std": l1(custom_std(fake), batch["sigma"]),
            "real_l1_dist_from_gt_sample_mean": l1(real.mean(axis=1), batch["mu"]),
            "real_l1_dist_from_gt_std": l1(custom_std(real), batch["sigma"]),
        }

        new_state = state.replace(
            step=step,
            params_au=new_params_au,
            params_im=new_params_im,
            opt_au=new_opt_au,
            opt_im=new_opt_im,
            rng=rng,
        )
        return new_state, metrics

    return train_step


def make_train_fn(cfg, au, im, opt_au, opt_im, mesh=None, n_steps: int = 1):
    """Jitted scan over ``n_steps`` train steps; returns stacked metrics."""
    step_fn = make_train_step(cfg, au, im, opt_au, opt_im, mesh)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_many(state):
        def body(s, _):
            return step_fn(s)

        return jax.lax.scan(body, state, None, length=n_steps)

    return train_many


def train_gim_gaussian(cfg: GaussianGameConfig, au=None, im=None, logger=None, mesh=None,
                       checkpoint_io=None, progress: bool = True):
    """Full training entry (reference ``train_gim_gaussian:154-232``).

    Builds models (if not given), optionally resumes, runs the chunked
    training loop with every-step scalar logging, periodic distance stats,
    and step-keyed checkpoints; saves on KeyboardInterrupt.
    """
    import os

    from optimalstrategiesagainstgenerativeattacks_tpu.models import gaussian as gmodels
    from optimalstrategiesagainstgenerativeattacks_tpu.train.checkpoints import (
        CheckpointIO,
        resolve_ckpt_path as _resolve_ckpt_path,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.train.logger import Logger
    from optimalstrategiesagainstgenerativeattacks_tpu.train.state import num_parameters

    au = au if au is not None else gmodels.get_au(
        cfg.src_dim, stat_type=cfg.au_stat, hidden_scale=cfg.au_hidden_scale
    )
    im = im if im is not None else gmodels.get_im(cfg.src_dim)
    logger = logger or Logger(
        log_dir=os.path.join(cfg.outdir, "logs"),
        img_dir=os.path.join(cfg.outdir, "imgs"),
        tensorboard_dir=os.path.join(cfg.outdir, "tb"),
    )
    checkpoint_io = checkpoint_io or CheckpointIO(os.path.join(cfg.outdir, "ckpts"))

    rng = jax.random.PRNGKey(cfg.seed)
    state, opt_au, opt_im = create_state(cfg, au, im, rng)
    print(f"Authenticator has {num_parameters(state.params_au)} parameters")
    print(f"impersonator has {num_parameters(state.params_im)} parameters")

    if cfg.pretrained:
        loaded, _, _ = checkpoint_io.load(
            _resolve_ckpt_path(cfg.pretrained, cfg.outdir), state
        )
        state = state.replace(params_au=loaded.params_au, params_im=loaded.params_im)
    if cfg.resume_from_ckpt:
        state, gstep, _ = checkpoint_io.load(
            _resolve_ckpt_path(cfg.resume_from_ckpt, cfg.outdir), state
        )
        print(f"Resuming training from iteration {gstep}")

    chunk = max(1, min(cfg.log_every, cfg.save_stats_every))
    train_many = make_train_fn(cfg, au, im, opt_au, opt_im, mesh, n_steps=chunk)

    start_step = int(state.step) + 1
    n_remaining = cfg.n_iters - start_step
    n_chunks = max(0, n_remaining // chunk)

    def log_chunk(first_step: int, metrics):
        host = {k: list(map(float, v)) for k, v in jax.device_get(metrics).items()}
        for i in range(chunk):
            gs = first_step + i
            logger.add_scalar("train_losses", "im_loss", host["im_loss"][i], gs)
            logger.add_scalar("train_losses", "au_loss", host["au_loss"][i], gs)
            logger.add_scalar("train_losses", "au_loss_on_real", host["au_loss_on_real"][i], gs)
            logger.add_scalar("train_losses", "au_loss_on_fake", host["au_loss_on_fake"][i], gs)
            logger.add_scalar("train_losses", "au_reg", host["au_reg"][i], gs)
            logger.add_scalar("train_au_out", "au_out_on_real", host["au_out_on_real"][i], gs)
            logger.add_scalar("train_au_out", "au_out_on_fake", host["au_out_on_fake"][i], gs)
            logger.add_scalar("train_accuracy", "au_acc", host["au_acc"][i], gs)
            logger.add_scalar("train_accuracy", "au_acc_on_real", host["au_acc_on_real"][i], gs)
            logger.add_scalar("train_accuracy", "au_acc_on_fake", host["au_acc_on_fake"][i], gs)
            if gs % cfg.save_stats_every == 0:
                logger.add_scalar("im_distances", "l1_dist_from_leaked_sample_mean",
                                  host["im_l1_dist_from_leaked_sample_mean"][i], gs)
                logger.add_scalar("im_distances", "l1_dist_from_gt_sample_mean",
                                  host["im_l1_dist_from_gt_sample_mean"][i], gs)
                logger.add_scalar("im_distances", "l1_dist_from_gt_std",
                                  host["im_l1_dist_from_gt_std"][i], gs)
                logger.add_scalar("real_distances", "l1_dist_from_gt_sample_mean",
                                  host["real_l1_dist_from_gt_sample_mean"][i], gs)
                logger.add_scalar("real_distances", "l1_dist_from_gt_std",
                                  host["real_l1_dist_from_gt_std"][i], gs)

    iterator = range(n_chunks)
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, total=n_chunks, desc="Training (x%d steps)" % chunk)
        except ImportError:
            pass

    try:
        for ci in iterator:
            first_step = start_step + ci * chunk
            state, metrics = train_many(state)
            log_chunk(first_step, metrics)
            gs = first_step + chunk - 1
            if (first_step // cfg.save_every) != ((gs + 1) // cfg.save_every) or (
                first_step == 0 and cfg.save_every <= chunk
            ):
                checkpoint_io.save(state, int(state.step))
    except KeyboardInterrupt:
        print("\nKeyboardInterrupt\nSaving checkpoint...\n")
        checkpoint_io.save(state, int(state.step))
        return state
    checkpoint_io.save(state, int(state.step))
    return state
