"""Image GIM game: jitted alternating train step, eval, sampling, loop.

Replaces ``training/gim_img_trainer.py`` + ``training/gim_img_training.py``
with the TPU-native design (SURVEY §7):

  * One jitted ``train_step(state, batch)``: impersonator update (gated on
    ``(step+1) % n_au_steps == 0`` via ``lax.cond``, matching
    ``gim_img_training.py:225-232``) followed by the authenticator update
    on the detached fake.  Per-sample losses are meaned in-step.
  * The authenticator's six encoder passes (src/env x si/real/fake,
    ``gim_img_trainer.py:104-111``) are fused into ONE pass of each
    encoder over the concatenated image batch — bigger MXU batches, one
    spectral-norm power iteration per step.
  * Batches arrive uint8 NHWC (1 byte/pixel over PCIe) and are normalised
    to [-1, 1] on device.
  * LR schedules are optax piecewise-constant (MultiStepLR parity,
    per-iteration stepping, resume-safe via the Adam step count); the
    impersonator optimizer uses ``optax.multi_transform`` to give the
    env-noise mapper its own LR (the reference's 6 param groups,
    ``gim_img_trainer.py:51-58``).
  * Spectral-norm u/v vectors update once per player per step (the
    reference updates them on every torch forward in train mode — several
    times per step; one power iteration per step converges to the same
    sigma and costs less).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import normalize_uint8
from optimalstrategiesagainstgenerativeattacks_tpu.ops.packing import stack_same_shape
from optimalstrategiesagainstgenerativeattacks_tpu.ops.spectral import (
    compute_sigmas,
    power_iterate,
)
from optimalstrategiesagainstgenerativeattacks_tpu.ops.stats import custom_std
from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import constrain_data
from optimalstrategiesagainstgenerativeattacks_tpu.train.losses import (
    bce_with_logits,
    gan_accuracy,
)
from optimalstrategiesagainstgenerativeattacks_tpu.train.state import GameState
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import ImageGameConfig


########################################################################################################################
# Optimizers / schedules
########################################################################################################################


def make_lr_schedule(base_lr: float, milestones, gamma: float):
    """MultiStepLR parity (``gim_img_trainer.py:175-177``), stepped per iteration."""
    if not milestones:
        return optax.constant_schedule(base_lr)
    return optax.piecewise_constant_schedule(
        base_lr, {int(mi): gamma for mi in milestones}
    )


def make_optimizers(cfg: ImageGameConfig):
    au_sched = make_lr_schedule(cfg.au_lr, cfg.milestones, cfg.lr_gamma)
    im_sched = make_lr_schedule(cfg.im_lr, cfg.milestones, cfg.lr_gamma)
    noise_sched = make_lr_schedule(cfg.env_noise_mapping_lr, cfg.milestones, cfg.lr_gamma)

    def adam(sched, lr_value):
        # constant LRs are hyperparameter-injected (live in the optimizer
        # STATE, not the HLO), so experiments that differ only in LR reuse
        # the same compiled program — load-bearing with the slow remote
        # compile server. Milestone schedules stay baked in.
        if not cfg.milestones and cfg.inject_lr:
            opt = optax.inject_hyperparams(optax.adam)(
                learning_rate=lr_value, b1=cfg.beta1, b2=cfg.beta2
            )
        else:
            opt = optax.adam(sched, b1=cfg.beta1, b2=cfg.beta2)
        # one flat moment vector per player/param-group: the Adam update
        # compiles to a few fused kernels instead of ~7k per-leaf ones
        if cfg.flatten_opt:
            return optax.flatten(opt)
        # middle road: stack same-shape leaves (layout-preserving, exact)
        if cfg.stack_opt:
            return stack_same_shape(opt)
        return opt

    opt_au = adam(au_sched, cfg.au_lr)

    def im_labels(params):
        return {k: ("noise" if k == "env_noise_mapper" else "main") for k in params}

    opt_im = optax.multi_transform(
        {
            "main": adam(im_sched, cfg.im_lr),
            "noise": adam(noise_sched, cfg.env_noise_mapping_lr),
        },
        im_labels,
    )
    return opt_au, opt_im, (au_sched, im_sched, noise_sched)


def create_state(cfg: ImageGameConfig, au, im, rng: jax.Array):
    """Initialise both players + optimizers; returns (state, opt_au, opt_im, scheds)."""
    k_au, k_im, k_state = jax.random.split(rng, 3)
    h = w = cfg.img_size
    c = cfg.img_channels
    test = jnp.zeros((1, cfg.n, h, w, c))
    si = jnp.zeros((1, cfg.k, h, w, c))
    leaked = jnp.zeros((1, cfg.m, h, w, c))

    au_vars = jax.jit(lambda k: au.init(k, test, si))(k_au)
    im_vars = jax.jit(
        lambda k: im.init({"params": k, "noise": k}, leaked, cfg.n)
    )(k_im)

    opt_au, opt_im, scheds = make_optimizers(cfg)
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
    return state, opt_au, opt_im, scheds


########################################################################################################################
# Forward helpers
########################################################################################################################


def _batch_prep_fn(cfg: ImageGameConfig, mesh=None):
    """uint8 batch -> normalised images in the game's COMPUTE dtype.

    Normalisation runs in f32 (exact), then casts once.  Casting here
    instead of inside the first conv is bit-identical for every conv input
    (each SN conv casts to the compute dtype anyway) but keeps the image
    batches' dtypes uniform: a bf16 fake concatenated with f32 real/si in
    ``encode_flat`` promotes the whole image-space chain — activations AND
    cotangents — to f32 (profiled ~4 ms/step flagship, ~9 ms vox, round 3).
    The R1 penalty is also unaffected: the cast's vjp converts the bf16
    image cotangent to f32 exactly, so the squared-gradient sum sees the
    same values.
    """
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def prep(x):
        return constrain_data(normalize_uint8(x).astype(dt), mesh)

    return prep


def _au_variables(params_au, spectral_au, sigmas_au=None):
    variables = {"params": params_au, "spectral": spectral_au}
    if sigmas_au is not None:
        variables["sigmas"] = sigmas_au
    return variables


def _au_forward_pair(au, params_au, spectral_au, test, si, sigmas_au=None):
    """Fused eval-mode authenticator score of (test, si): one pass of each
    encoder over [si; test], then the discriminator head."""
    b = test.shape[0]
    n, k = test.shape[1], si.shape[1]
    img_shape = test.shape[2:]
    flat = jnp.concatenate(
        [si.reshape(b * k, *img_shape), test.reshape(b * n, *img_shape)], axis=0
    )
    variables = _au_variables(params_au, spectral_au, sigmas_au)
    src, env = au.apply(variables, flat, False, method=au.encode_flat)
    si_src, test_src = src[: b * k].reshape(b, k, -1), src[b * k :].reshape(b, n, -1)
    si_env, test_env = env[: b * k].reshape(b, k, -1), env[b * k :].reshape(b, n, -1)
    return au.apply(variables, test_src, test_env, si_src, si_env, method=au.discriminate)


def _au_outputs(au, params_au, spectral_au, real, fake, si, sigmas_au=None):
    """Fused authenticator forward: one pass of each encoder over
    [si; real; fake], then two discriminator-head calls.

    Spectral-norm state updates are hoisted out of the loss (see
    ``ops/spectral.py``); callers advance ``spectral_au`` themselves via
    ``power_iterate`` and pass precomputed ``sigmas_au``.

    Returns (out_real, out_fake)."""
    b = real.shape[0]
    n, k = real.shape[1], si.shape[1]
    img_shape = real.shape[2:]
    flat = jnp.concatenate(
        [
            si.reshape(b * k, *img_shape),
            real.reshape(b * n, *img_shape),
            fake.reshape(b * n, *img_shape),
        ],
        axis=0,
    )
    variables = _au_variables(params_au, spectral_au, sigmas_au)
    src, env = au.apply(variables, flat, False, method=au.encode_flat)

    def split(x):
        si_e = x[: b * k].reshape(b, k, -1)
        real_e = x[b * k : b * (k + n)].reshape(b, n, -1)
        fake_e = x[b * (k + n) :].reshape(b, n, -1)
        return si_e, real_e, fake_e

    si_src, real_src, fake_src = split(src)
    si_env, real_env, fake_env = split(env)
    out_real = au.apply(variables, real_src, real_env, si_src, si_env, method=au.discriminate)
    out_fake = au.apply(variables, fake_src, fake_env, si_src, si_env, method=au.discriminate)
    return out_real, out_fake


def _make_au_loss_fn(cfg: ImageGameConfig, au, new_spec_au):
    """Per-(sub)batch authenticator loss closure shared by the microbatched
    update paths.  Same math as the inline ``au_loss_fn`` in the
    full-batch paths (R1 shares the loss forward via ``jax.vjp``)."""

    def au_loss_fn(p_au, fake, real, si):
        sigmas_au = compute_sigmas(p_au, new_spec_au)
        if cfg.reg_param > 0:
            def fused(r, s):
                return _au_outputs(au, p_au, new_spec_au, r, fake, s, sigmas_au)

            (out_real, out_fake), score_vjp = jax.vjp(fused, real, si)
            g_real, g_si = score_vjp(
                (jnp.ones_like(out_real), jnp.zeros_like(out_fake))
            )
            b = real.shape[0]
            reg = cfg.reg_param * (
                jnp.square(g_real.astype(jnp.float32)).reshape(b, -1).sum(axis=1)
                + jnp.square(g_si.astype(jnp.float32)).reshape(b, -1).sum(axis=1)
            )
        else:
            out_real, out_fake = _au_outputs(
                au, p_au, new_spec_au, real, fake, si, sigmas_au
            )
            reg = None
        loss_on_real = bce_with_logits(out_real, 1.0)
        loss_on_fake = bce_with_logits(out_fake, 0.0)
        if reg is None:
            reg = jnp.zeros_like(loss_on_real)
        loss = (loss_on_real + loss_on_fake + reg).mean()
        return loss, (loss_on_real, loss_on_fake, reg, out_real, out_fake)

    return au_loss_fn


_AU_METRIC_ORDER = (
    "au_loss", "au_loss_on_real", "au_loss_on_fake", "au_reg",
    "au_out_on_real", "au_out_on_fake", "au_acc", "au_acc_on_real",
    "au_acc_on_fake",
)


def _au_microbatch_grads(cfg: ImageGameConfig, au, params_au, new_spec_au,
                         fake, real, si):
    """Gradients + metrics of the authenticator loss with the batch split
    into ``cfg.au_microbatch`` sequential chunks (``lax.scan`` over full
    fwd+bwd per chunk, gradients accumulated).

    Exact semantics: per-sample losses are meaned per chunk and chunk
    gradients averaged, which equals the full-batch mean for equal chunk
    sizes (floating-point reassociation aside).  Activation memory scales
    1/c while FLOPs stay algorithmic — unlike encoder remat, which buys
    the same HBM headroom by recomputing forwards (~11% step time at the
    vox config).  The per-chunk re-read of the parameters and the extra
    ``compute_sigmas`` evaluations are HBM-trivial next to the activations.
    """
    _, c = cfg.resolved_hbm_policy()
    b = real.shape[0]
    if b % c != 0:
        raise ValueError(f"au_microbatch={c} must divide the batch size {b}")
    au_loss_fn = _make_au_loss_fn(cfg, au, new_spec_au)
    grad_fn = jax.value_and_grad(au_loss_fn, has_aux=True)

    def chunked(x):
        return x.reshape(c, b // c, *x.shape[1:])

    def body(g_acc, xs):
        f, r, s = xs
        (loss, aux), g = grad_fn(params_au, f, r, s)
        loss_on_real, loss_on_fake, reg, out_real, out_fake = aux
        acc, acc_on_real, acc_on_fake = gan_accuracy(out_real, out_fake)
        ms = jnp.stack(
            [
                loss, loss_on_real.mean(), loss_on_fake.mean(), reg.mean(),
                out_real.mean(), out_fake.mean(), acc, acc_on_real,
                acc_on_fake,
            ]
        ).astype(jnp.float32)
        return jax.tree.map(jnp.add, g_acc, g), ms

    grads_sum, ms = jax.lax.scan(
        body,
        jax.tree.map(jnp.zeros_like, params_au),
        (chunked(fake), chunked(real), chunked(si)),
    )
    grads = jax.tree.map(lambda g: g / c, grads_sum)
    m = ms.mean(axis=0)
    metrics = {k: m[i] for i, k in enumerate(_AU_METRIC_ORDER)}
    return grads, metrics


def _au_microbatch_update(cfg: ImageGameConfig, au, opt_au, mv_dtype,
                          params_au, spectral_au, opt_au_state,
                          fake, real, si):
    """Microbatched authenticator update: ``_au_microbatch_grads`` then ONE
    optimizer step.  Returns (new_params_au, new_spec_au, new_opt, metrics)."""
    new_spec_au = power_iterate(params_au, spectral_au, matvec_dtype=mv_dtype)
    grads, metrics = _au_microbatch_grads(
        cfg, au, params_au, new_spec_au, fake, real, si
    )
    updates, new_opt = opt_au.update(grads, opt_au_state, params_au)
    new_params_au = optax.apply_updates(params_au, updates)
    return new_params_au, new_spec_au, new_opt, metrics


########################################################################################################################
# Train / eval steps
########################################################################################################################

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
    "im_trained",
)


def make_split_train_step(cfg: ImageGameConfig, au, im, opt_au, opt_im, mesh=None):
    """Two-phase variant of the train step: the impersonator update and the
    authenticator update compile as SEPARATE XLA programs.

    Same math and the same (state, metrics, fake) contract as
    ``make_train_step``; exists because the monolithic flagship-config
    program can exceed the TPU compile server's memory.  All intermediate
    tensors stay on device between the phases.
    """
    # spectral power-iteration matvecs follow the game's compute dtype:
    # halves the dominant kernel-group HBM read in bf16 games, f32 keeps
    # the per-module parity exact (guard: tests/test_spectral.py)
    mv_dtype = (
        jnp.bfloat16
        if (cfg.compute_dtype == "bfloat16" and cfg.bf16_spectral)
        else None
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def im_phase(params_im, spectral_im, opt_im_state, params_au, spectral_au,
                 rng_in, step, leaked, si):
        rng, k_noise = jax.random.split(jax.random.fold_in(rng_in, step))
        # the frozen authenticator's sigmas are constants for this phase
        sigmas_au = jax.lax.stop_gradient(compute_sigmas(params_au, spectral_au))

        def im_fwd(p_im, s_im):
            variables = {
                "params": p_im,
                "spectral": s_im,
                "sigmas": compute_sigmas(p_im, s_im),
            }
            fake = im.apply(
                variables, leaked, cfg.n, cfg.remove_noise_mean, False,
                rngs={"noise": k_noise},
            )
            auth_out = _au_forward_pair(au, params_au, spectral_au, fake, si, sigmas_au)
            loss = bce_with_logits(auth_out, 1.0).mean()
            return loss, fake

        def train_branch(_):
            new_spec = power_iterate(params_im, spectral_im, matvec_dtype=mv_dtype)
            (loss, fake), grads = jax.value_and_grad(
                lambda p: im_fwd(p, new_spec), has_aux=True
            )(params_im)
            updates, new_opt = opt_im.update(grads, opt_im_state, params_im)
            return optax.apply_updates(params_im, updates), new_spec, new_opt, loss, fake, jnp.float32(1.0)

        def eval_branch(_):
            loss, fake = im_fwd(params_im, spectral_im)
            return params_im, spectral_im, opt_im_state, loss, fake, jnp.float32(0.0)

        if cfg.n_au_steps == 1:
            out = train_branch(None)
        else:
            out = jax.lax.cond(
                ((step + 1) % cfg.n_au_steps) == 0, train_branch, eval_branch, None
            )
        new_params_im, new_spec_im, new_opt_im, im_loss, fake, im_trained = out
        return new_params_im, new_spec_im, new_opt_im, im_loss, jax.lax.stop_gradient(fake), im_trained, rng

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def au_phase_microbatched(params_au, spectral_au, opt_au_state, fake, real, si):
        new_params_au, new_spec_au, new_opt, metrics = _au_microbatch_update(
            cfg, au, opt_au, mv_dtype,
            params_au, spectral_au, opt_au_state, fake, real, si,
        )
        return new_params_au, new_spec_au, new_opt, metrics

    # NOTE: the full-batch phase keeps the name ``au_phase`` — the jit name
    # lands in the HLO module name and thus the persistent compile-cache
    # key; renaming it would orphan every cached flagship program.
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def au_phase(params_au, spectral_au, opt_au_state, fake, real, si):
        new_spec_au = power_iterate(params_au, spectral_au, matvec_dtype=mv_dtype)

        def au_loss_fn(p_au):
            sigmas_au = compute_sigmas(p_au, new_spec_au)
            if cfg.reg_param > 0:
                # R1 shares the loss's forward (torch parity: compute_grad2
                # double-backwards through the graph that produced d_real,
                # ``gim_img_trainer.py:121-124`` — it never re-runs the
                # authenticator). jax.vjp gives the scores AND the
                # input-gradients from one fused pass; the old
                # grad2_penalty closure re-encoded [si; real] a second
                # time (~2/3 of an extra encoder pass per au step).
                def fused(r, s):
                    return _au_outputs(au, p_au, new_spec_au, r, fake, s, sigmas_au)

                (out_real, out_fake), score_vjp = jax.vjp(fused, real, si)
                g_real, g_si = score_vjp(
                    (jnp.ones_like(out_real), jnp.zeros_like(out_fake))
                )
                b = real.shape[0]
                reg = cfg.reg_param * (
                    jnp.square(g_real.astype(jnp.float32)).reshape(b, -1).sum(axis=1)
                    + jnp.square(g_si.astype(jnp.float32)).reshape(b, -1).sum(axis=1)
                )
            else:
                out_real, out_fake = _au_outputs(
                    au, p_au, new_spec_au, real, fake, si, sigmas_au
                )
                reg = None
            loss_on_real = bce_with_logits(out_real, 1.0)
            loss_on_fake = bce_with_logits(out_fake, 0.0)
            if reg is None:
                reg = jnp.zeros_like(loss_on_real)
            loss = (loss_on_real + loss_on_fake + reg).mean()
            return loss, (loss_on_real, loss_on_fake, reg, out_real, out_fake)

        (au_loss, aux), grads = jax.value_and_grad(au_loss_fn, has_aux=True)(params_au)
        loss_on_real, loss_on_fake, reg, out_real, out_fake = aux
        updates, new_opt = opt_au.update(grads, opt_au_state, params_au)
        new_params_au = optax.apply_updates(params_au, updates)
        acc, acc_on_real, acc_on_fake = gan_accuracy(out_real, out_fake)
        metrics = {
            "au_loss": au_loss,
            "au_loss_on_real": loss_on_real.mean(),
            "au_loss_on_fake": loss_on_fake.mean(),
            "au_reg": reg.mean(),
            "au_out_on_real": out_real.mean(),
            "au_out_on_fake": out_fake.mean(),
            "au_acc": acc,
            "au_acc_on_real": acc_on_real,
            "au_acc_on_fake": acc_on_fake,
        }
        return new_params_au, new_spec_au, new_opt, metrics

    if cfg.resolved_hbm_policy()[1] > 1:
        au_phase = au_phase_microbatched

    _prep = _batch_prep_fn(cfg, mesh)

    @jax.jit
    def prep(batch):
        return tuple(
            _prep(batch[k])
            for k in ("real_sample", "leaked_sample", "si_sample")
        )

    def _spec(tree):
        return jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)

    def train_step(state: GameState, batch):
        step = state.step + 1
        real, leaked, si = prep(batch)
        im_args = (
            state.params_im, state.spectral_im, state.opt_im,
            state.params_au, state.spectral_au, state.rng, step, leaked, si,
        )
        if train_step.arg_specs is None:
            train_step.arg_specs = {"im_phase": _spec(im_args)}
        (new_params_im, new_spec_im, new_opt_im, im_loss, fake, im_trained, rng) = im_phase(
            *im_args
        )
        au_args = (state.params_au, state.spectral_au, state.opt_au, fake, real, si)
        if "au_phase" not in train_step.arg_specs:
            train_step.arg_specs["au_phase"] = _spec(au_args)
        new_params_au, new_spec_au, new_opt_au, metrics = au_phase(*au_args)
        metrics = dict(metrics)
        metrics["im_loss"] = im_loss
        metrics["im_trained"] = im_trained
        new_state = state.replace(
            step=step,
            params_au=new_params_au,
            params_im=new_params_im,
            spectral_au=new_spec_au,
            spectral_im=new_spec_im,
            opt_au=new_opt_au,
            opt_im=new_opt_im,
            rng=rng,
        )
        return new_state, metrics, fake

    # introspection hooks for perf tooling (scripts/perf_step.py): the two
    # jitted phases plus the arg shape/dtype specs captured on first call,
    # so FLOPs can be read off the lowered computations without recompiling
    train_step.phases = {"im_phase": im_phase, "au_phase": au_phase}
    train_step.arg_specs = None
    return train_step


def build_models(cfg: ImageGameConfig):
    """(au, im) model pair from a config — the single place the perf knobs
    (encoder-pair unroll, AdaIN scan, split generator input) are threaded."""
    from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    remat, _ = cfg.resolved_hbm_policy()
    au = imodels.get_au(
        img_size=cfg.img_size, img_channels=cfg.img_channels, style_dim=cfg.style_dim,
        dtype=dtype, unroll_encoder_pair=cfg.unroll_encoder_pair,
        remat_encoders=remat, remat_depth=cfg.remat_depth,
    )
    im = imodels.get_im(
        img_size=cfg.img_size, img_channels=cfg.img_channels, style_dim=cfg.style_dim,
        use_img_att=cfg.use_img_att, num_env_noise_layers=cfg.num_env_noise_layers,
        dtype=dtype, scan_adain_blocks=cfg.scan_adain_blocks,
        adain_im2col=cfg.adain_im2col,
        adain_scan_unroll=cfg.adain_scan_unroll,
        unroll_encoder_pair=cfg.unroll_encoder_pair,
        split_gen_input=cfg.split_gen_input,
        remat_encoders=remat, remat_depth=cfg.remat_depth,
    )
    return au, im


def make_train_step_fn(cfg: ImageGameConfig, au, im, opt_au, opt_im, mesh=None):
    """Build the PURE (unjitted) single-step train function.

    ``make_train_step`` wraps it in ``jax.jit`` with donated state for
    normal training; ``train/multiseed.py`` instead ``jax.vmap``s it over a
    stacked seed axis to train many independent games in one program."""
    mv_dtype = (
        jnp.bfloat16
        if (cfg.compute_dtype == "bfloat16" and cfg.bf16_spectral)
        else None
    )

    _prep = _batch_prep_fn(cfg, mesh)

    def train_step(state: GameState, batch):
        step = state.step + 1
        rng, k_noise = jax.random.split(jax.random.fold_in(state.rng, step))
        real = _prep(batch["real_sample"])
        leaked = _prep(batch["leaked_sample"])
        si = _prep(batch["si_sample"])

        # ---- impersonator: train when (step+1) % n_au_steps == 0 (:225-232)
        sigmas_au_frozen = jax.lax.stop_gradient(
            compute_sigmas(state.params_au, state.spectral_au)
        )

        def im_fwd(params_im, spectral_im):
            variables = {
                "params": params_im,
                "spectral": spectral_im,
                "sigmas": compute_sigmas(params_im, spectral_im),
            }
            fake = im.apply(
                variables, leaked, cfg.n, cfg.remove_noise_mean, False,
                rngs={"noise": k_noise},
            )
            auth_out = _au_forward_pair(
                au, state.params_au, state.spectral_au, fake, si, sigmas_au_frozen
            )
            loss = bce_with_logits(auth_out, 1.0).mean()
            return loss, fake

        def im_train_branch(_):
            new_spec = power_iterate(state.params_im, state.spectral_im, matvec_dtype=mv_dtype)

            def loss_fn(params_im):
                return im_fwd(params_im, new_spec)

            (loss, fake), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params_im
            )
            updates, new_opt = opt_im.update(grads, state.opt_im, state.params_im)
            new_params = optax.apply_updates(state.params_im, updates)
            return new_params, new_spec, new_opt, loss, fake, jnp.float32(1.0)

        def im_eval_branch(_):
            loss, fake = im_fwd(state.params_im, state.spectral_im)
            return (
                state.params_im,
                state.spectral_im,
                state.opt_im,
                loss,
                fake,
                jnp.float32(0.0),
            )

        if cfg.n_au_steps == 1:
            # static specialisation for the default schedule: no cond, half
            # the generator-side compile
            new_params_im, new_spectral_im, new_opt_im, im_loss, fake, im_trained = (
                im_train_branch(None)
            )
        else:
            do_im_train = ((step + 1) % cfg.n_au_steps) == 0
            new_params_im, new_spectral_im, new_opt_im, im_loss, fake, im_trained = (
                jax.lax.cond(do_im_train, im_train_branch, im_eval_branch, operand=None)
            )

        # ---- authenticator on the detached fake (:237-239, detach :166)
        fake = jax.lax.stop_gradient(fake)
        if cfg.resolved_hbm_policy()[1] > 1:
            new_params_au, new_spectral_au, new_opt_au, au_metrics = (
                _au_microbatch_update(
                    cfg, au, opt_au, mv_dtype,
                    state.params_au, state.spectral_au, state.opt_au,
                    fake, real, si,
                )
            )
            metrics = dict(au_metrics)
            metrics["im_loss"] = im_loss
            metrics["im_trained"] = im_trained
            return state.replace(
                step=step,
                params_au=new_params_au,
                params_im=new_params_im,
                spectral_au=new_spectral_au,
                spectral_im=new_spectral_im,
                opt_au=new_opt_au,
                opt_im=new_opt_im,
                rng=rng,
            ), metrics, fake
        new_spectral_au = power_iterate(state.params_au, state.spectral_au, matvec_dtype=mv_dtype)

        def au_loss_fn(params_au):
            sigmas_au = compute_sigmas(params_au, new_spectral_au)
            if cfg.reg_param > 0:
                # R1 shares the loss's forward via jax.vjp (see the split
                # step's au_phase for the torch-parity rationale)
                def fused(r, s):
                    return _au_outputs(
                        au, params_au, new_spectral_au, r, fake, s, sigmas_au
                    )

                (out_real, out_fake), score_vjp = jax.vjp(fused, real, si)
                g_real, g_si = score_vjp(
                    (jnp.ones_like(out_real), jnp.zeros_like(out_fake))
                )
                b = real.shape[0]
                reg = cfg.reg_param * (
                    jnp.square(g_real.astype(jnp.float32)).reshape(b, -1).sum(axis=1)
                    + jnp.square(g_si.astype(jnp.float32)).reshape(b, -1).sum(axis=1)
                )
            else:
                out_real, out_fake = _au_outputs(
                    au, params_au, new_spectral_au, real, fake, si, sigmas_au
                )
                reg = None
            loss_on_real = bce_with_logits(out_real, 1.0)
            loss_on_fake = bce_with_logits(out_fake, 0.0)
            if reg is None:
                reg = jnp.zeros_like(loss_on_real)
            loss = (loss_on_real + loss_on_fake + reg).mean()
            aux = (loss_on_real, loss_on_fake, reg, out_real, out_fake)
            return loss, aux

        (au_loss, aux), au_grads = jax.value_and_grad(au_loss_fn, has_aux=True)(
            state.params_au
        )
        loss_on_real, loss_on_fake, reg, out_real, out_fake = aux
        au_updates, new_opt_au = opt_au.update(au_grads, state.opt_au, state.params_au)
        new_params_au = optax.apply_updates(state.params_au, au_updates)

        acc, acc_on_real, acc_on_fake = gan_accuracy(out_real, out_fake)
        metrics = {
            "im_loss": im_loss,
            "au_loss": au_loss,
            "au_loss_on_real": loss_on_real.mean(),
            "au_loss_on_fake": loss_on_fake.mean(),
            "au_reg": reg.mean(),
            "au_out_on_real": out_real.mean(),
            "au_out_on_fake": out_fake.mean(),
            "au_acc": acc,
            "au_acc_on_real": acc_on_real,
            "au_acc_on_fake": acc_on_fake,
            "im_trained": im_trained,
        }
        new_state = state.replace(
            step=step,
            params_au=new_params_au,
            params_im=new_params_im,
            spectral_au=new_spectral_au,
            spectral_im=new_spectral_im,
            opt_au=new_opt_au,
            opt_im=new_opt_im,
            rng=rng,
        )
        return new_state, metrics, fake

    return train_step


def make_train_step(cfg: ImageGameConfig, au, im, opt_au, opt_im, mesh=None):
    """Build the single-step train function (jit with donated state)."""
    return jax.jit(
        make_train_step_fn(cfg, au, im, opt_au, opt_im, mesh),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: ImageGameConfig, au, im, mesh=None):
    """No-grad eval step (``gim_img_training.py:76-95``): im + au forwards
    in eval mode (no SN updates, no param changes)."""

    _prep = _batch_prep_fn(cfg, mesh)

    def eval_step(state: GameState, batch, rng):
        real = _prep(batch["real_sample"])
        leaked = _prep(batch["leaked_sample"])
        si = _prep(batch["si_sample"])

        sigmas_im = compute_sigmas(state.params_im, state.spectral_im)
        sigmas_au = compute_sigmas(state.params_au, state.spectral_au)
        fake = im.apply(
            {"params": state.params_im, "spectral": state.spectral_im,
             "sigmas": sigmas_im},
            leaked, cfg.n, cfg.remove_noise_mean, False, rngs={"noise": rng},
        )
        im_out = _au_forward_pair(
            au, state.params_au, state.spectral_au, fake, si, sigmas_au
        )
        im_loss = bce_with_logits(im_out, 1.0).mean()

        out_real, out_fake = _au_outputs(
            au, state.params_au, state.spectral_au, real, fake, si, sigmas_au
        )
        loss_on_real = bce_with_logits(out_real, 1.0)
        loss_on_fake = bce_with_logits(out_fake, 0.0)
        acc, acc_on_real, acc_on_fake = gan_accuracy(out_real, out_fake)
        return {
            "im_loss": im_loss,
            "au_loss": (loss_on_real + loss_on_fake).mean(),
            "au_loss_on_real": loss_on_real.mean(),
            "au_loss_on_fake": loss_on_fake.mean(),
            "au_out_on_real": out_real.mean(),
            "au_out_on_fake": out_fake.mean(),
            "au_acc": acc,
            "au_acc_on_real": acc_on_real,
            "au_acc_on_fake": acc_on_fake,
        }

    return jax.jit(eval_step)


def make_sample_fn(cfg: ImageGameConfig, im):
    """impersonator_sample (``gim_img_trainer.py:151-155``): no-grad generation."""

    def sample(state: GameState, leaked, rng):
        leaked = normalize_uint8(leaked)
        return im.apply(
            {"params": state.params_im, "spectral": state.spectral_im},
            leaked, cfg.n, cfg.remove_noise_mean, False, rngs={"noise": rng},
        )

    return jax.jit(sample)


def make_diag_fn(cfg: ImageGameConfig, au, mesh=None):
    """Encoder-statistic diagnostics (``gim_img_training.py:301-340``)."""

    _prep = _batch_prep_fn(cfg, mesh)

    def diag(state: GameState, batch, fake):
        real = _prep(batch["real_sample"])
        si = _prep(batch["si_sample"])
        variables = {"params": state.params_au, "spectral": state.spectral_au}

        def enc(sample, method):
            return au.apply(variables, sample, False, method=method)

        real_src = enc(real, au.src_encode_sample)
        si_src = enc(si, au.src_encode_sample)
        fake_src = enc(fake, au.src_encode_sample)
        real_env = enc(real, au.env_encode_sample)
        si_env = enc(si, au.env_encode_sample)
        fake_env = enc(fake, au.env_encode_sample)

        return {
            "au_src_mean_abs_real_minus_si": jnp.abs(
                real_src.mean(1) - si_src.mean(1)
            ).mean(),
            "au_src_mean_abs_fake_minus_si": jnp.abs(
                fake_src.mean(1) - si_src.mean(1)
            ).mean(),
            "au_env_mean_abs_real_minus_si": jnp.abs(
                real_env.mean(1) - si_env.mean(1)
            ).mean(),
            "au_env_mean_abs_fake_minus_si": jnp.abs(
                fake_env.mean(1) - si_env.mean(1)
            ).mean(),
            "au_src_std_real": custom_std(real_src).mean(),
            "au_src_std_si": custom_std(si_src).mean(),
            "au_src_std_fake": custom_std(fake_src).mean(),
            "au_env_std_real": custom_std(real_env).mean(),
            "au_env_std_si": custom_std(si_env).mean(),
            "au_env_std_fake": custom_std(fake_env).mean(),
        }

    return jax.jit(diag)


########################################################################################################################
# Loop
########################################################################################################################


def _to_01(img_sample: np.ndarray) -> np.ndarray:
    """[-1,1] -> [0,1] with clamp (``save_imgs``, ``gim_img_training.py:23-31``)."""
    return (np.clip(np.asarray(img_sample, np.float32), -1, 1) + 1.0) / 2.0


def sample_and_save_imgs(logger, sample_fn, state, ds, ds_prefix, indices, rng, dbg=False):
    """Dump leaked/impersonator (+real/si in dbg) grids for chosen episodes
    (``gim_img_training.py:34-73``)."""
    gs = int(state.step)
    for j, idx in enumerate(indices):
        data = ds[idx]
        leaked = data["leaked_sample"][None]  # [1, m, H, W, C] uint8
        fake = sample_fn(state, jnp.asarray(leaked), jax.random.fold_in(rng, j))
        cat = f"{ds_prefix} imgs_{idx:04d}"
        logger.add_imgs(_to_01(np.asarray(leaked[0], np.float32) / 127.5 - 1.0), cat, "leaked", gs)
        logger.add_imgs(_to_01(np.asarray(fake[0])), cat, "impersonator", gs)
        if dbg:
            logger.add_imgs(_to_01(data["real_sample"] / 127.5 - 1.0), cat, "real", gs)
            logger.add_imgs(_to_01(data["si_sample"] / 127.5 - 1.0), cat, "si", gs)


def run_eval(eval_step, state, ds, logger, batch_size, rng, num_workers=0):
    """Eval over the val set (``gim_img_training.py:98-154``), logging means."""
    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        EpisodicBatchLoader,
    )

    loader = EpisodicBatchLoader(
        ds, batch_size=batch_size, shuffle=False, drop_last=True, num_workers=num_workers
    )
    sums: Dict[str, float] = {}
    count = 0
    for i, batch in enumerate(loader):
        metrics = eval_step(state, batch, jax.random.fold_in(rng, i))
        metrics = jax.device_get(metrics)
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
    if count == 0:
        return {}
    means = {k: v / count for k, v in sums.items()}
    gs = int(state.step)
    # one tag convention everywhere: category/key, underscores (the
    # reference mixes 'train_losses' with 'train losses'; we normalise,
    # SURVEY §5, locked by tests/test_logger.py::test_scalar_tag_taxonomy)
    logger.add_scalar("eval_losses", "dis_loss", means["au_loss"], gs)
    logger.add_scalar("eval_losses", "dis_loss_on_real", means["au_loss_on_real"], gs)
    logger.add_scalar("eval_losses", "dis_loss_on_fake", means["au_loss_on_fake"], gs)
    logger.add_scalar("eval_au_out", "au_out_on_real", means["au_out_on_real"], gs)
    logger.add_scalar("eval_au_out", "au_out_on_fake", means["au_out_on_fake"], gs)
    logger.add_scalar("eval_accuracy", "dis_acc", means["au_acc"], gs)
    logger.add_scalar("eval_accuracy", "dis_acc_on_real", means["au_acc_on_real"], gs)
    logger.add_scalar("eval_accuracy", "dis_acc_on_fake", means["au_acc_on_fake"], gs)
    logger.add_scalar("eval_losses", "gen_loss", means["im_loss"], gs)
    return means


def train_gim_imgs(
    cfg: ImageGameConfig,
    train_ds,
    val_ds,
    au=None,
    im=None,
    logger=None,
    mesh=None,
    checkpoint_io=None,
    progress: bool = True,
):
    """Full image-game training entry (``train_gim_imgs:357-447``)."""
    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        EpisodicBatchLoader,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.data.prefetch import device_prefetch
    from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels
    from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import (
        adjust_batch_size,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.train.checkpoints import (
        CheckpointIO,
        resolve_ckpt_path as _resolve_ckpt_path,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.train.logger import Logger
    from optimalstrategiesagainstgenerativeattacks_tpu.train.state import num_parameters

    if au is None or im is None:
        built_au, built_im = build_models(cfg)
        au = au if au is not None else built_au
        im = im if im is not None else built_im
    logger = logger or Logger(
        log_dir=os.path.join(cfg.outdir, "logs"),
        img_dir=os.path.join(cfg.outdir, "imgs"),
        tensorboard_dir=os.path.join(cfg.outdir, "tb"),
    )
    checkpoint_io = checkpoint_io or CheckpointIO(os.path.join(cfg.outdir, "ckpts"))

    rng = jax.random.PRNGKey(cfg.seed)
    state, opt_au, opt_im, scheds = create_state(cfg, au, im, rng)
    au_sched, im_sched, noise_sched = scheds
    print(f"Authenticator has {num_parameters(state.params_au)} parameters")
    print(f"impersonator has {num_parameters(state.params_im)} parameters")

    if cfg.pretrained:
        loaded, _, _ = checkpoint_io.load(
            _resolve_ckpt_path(cfg.pretrained, cfg.outdir), state
        )
        state = state.replace(
            params_au=loaded.params_au, params_im=loaded.params_im,
            spectral_au=loaded.spectral_au, spectral_im=loaded.spectral_im,
        )
    last_epoch = 0
    if cfg.resume_from_ckpt:
        state, gstep, last_epoch = checkpoint_io.load(
            _resolve_ckpt_path(cfg.resume_from_ckpt, cfg.outdir), state
        )
        print(f"Resuming training from iteration {gstep}")

    # 'auto' goes straight to the split step for large configs: the
    # monolithic flagship program (style 512) is SIGKILLed by the remote
    # TPU compile server even after the scan/vmap HLO reductions
    use_split = cfg.split_step == "always" or (
        cfg.split_step == "auto" and cfg.style_dim >= 256
    )
    if use_split:
        train_step = make_split_train_step(cfg, au, im, opt_au, opt_im, mesh)
    else:
        train_step = make_train_step(cfg, au, im, opt_au, opt_im, mesh)
    split_fallback_allowed = cfg.split_step == "auto" and not use_split
    eval_step = make_eval_step(cfg, au, im, mesh)
    sample_fn = make_sample_fn(cfg, im)
    diag_fn = make_diag_fn(cfg, au, mesh)

    n_devices = mesh.devices.size if mesh is not None else 1
    train_bs = adjust_batch_size(len(train_ds), cfg.batch_size, n_devices)
    val_bs = adjust_batch_size(len(val_ds), cfg.batch_size, n_devices)
    train_eval_indices = list(range(0, len(train_ds), max(1, len(train_ds) // 10)))
    val_eval_indices = list(range(0, len(val_ds), max(1, len(val_ds) // 10)))

    # device-resident sampling when possible: the whole uniform-count
    # dataset is staged into HBM once and batches are assembled by a jitted
    # on-device gather — zero image bytes cross the (slow) host link per
    # step (data/device_sampler.py). Multi-device runs keep the host
    # loader (its batches shard over the mesh's data axis in the
    # prefetcher).
    single_device = mesh is None or getattr(mesh, "size", 1) == 1
    if cfg.device_data == "on" and not single_device:
        raise ValueError(
            "device_data='on' is single-device only; multi-device runs "
            "shard host-loader batches over the mesh's data axis"
        )
    use_device_data = cfg.device_data != "off" and single_device
    loader = None
    if use_device_data:
        cache = None
        if hasattr(train_ds, "stacked_cache"):
            cache = train_ds.stacked_cache()
        if cache is not None:
            from optimalstrategiesagainstgenerativeattacks_tpu.data.device_sampler import (
                DeviceEpisodicLoader,
            )

            loader = DeviceEpisodicLoader(
                train_ds, batch_size=train_bs, seed=cfg.seed
            )
            print(
                f"device-resident dataset: {cache.nbytes / 1e6:.0f} MB uint8 "
                f"staged to HBM ({cache.shape[0]} classes x {cache.shape[1]})"
            )
        elif cfg.device_data == "on":
            raise ValueError(
                "device_data='on' but the dataset has no uniform stacked "
                "cache (unequal images per class?)"
            )
    if loader is None:
        loader = EpisodicBatchLoader(
            train_ds, batch_size=train_bs, shuffle=True, drop_last=True,
            num_workers=cfg.num_workers, seed=cfg.seed,
        )

    sample_rng = jax.random.PRNGKey(cfg.seed + 17)
    # Per-step metrics accumulate into a DEVICE-side [log_every, K] buffer
    # (one small fixed-shape dispatch per step) and are fetched as ONE
    # transfer at flush time.  Anything else is ruinous on this platform:
    # per-scalar fetches and many-operand stacks pay a ~0.25 s tunnel cost
    # per argument (measured: a 100-operand jnp.stack flush took ~27 s).
    n_keys = len(METRIC_KEYS)
    log_buf = jnp.zeros((max(cfg.log_every, 1), n_keys), jnp.float32)
    buf_count = 0

    @jax.jit
    def record_metrics(buf, idx, metrics):
        vec = jnp.stack([metrics[k].astype(jnp.float32) for k in METRIC_KEYS])
        return jax.lax.dynamic_update_slice(buf, vec[None], (idx, 0))

    # throughput as a first-class metric (the reference only has tqdm bars;
    # BASELINE.md's north star is train steps/sec/chip)
    import time as _time

    perf = {"t_last": None, "steps": 0}

    def log_throughput(gs: int):
        now = _time.perf_counter()
        if perf["t_last"] is not None and perf["steps"] > 0:
            sps = perf["steps"] / (now - perf["t_last"])
            logger.add_scalar("perf", "train_steps_per_sec", sps, gs)
            logger.add_scalar(
                "perf", "train_images_per_sec",
                sps * cfg.batch_size * (cfg.m + cfg.n + cfg.k), gs,
            )
        perf["t_last"] = now
        perf["steps"] = 0

    def flush_log(gs: int):
        nonlocal buf_count
        if buf_count == 0:
            return
        arr = np.asarray(jax.device_get(log_buf))[:buf_count]  # one transfer
        host = {k: arr[:, i].tolist() for i, k in enumerate(METRIC_KEYS)}
        buf_count = 0
        logger.add_scalar("lr", "au", float(au_sched(gs)), gs)
        logger.add_scalar("lr", "im", float(im_sched(gs)), gs)
        logger.add_scalar("lr", "im_lm", float(noise_sched(gs)), gs)
        mean = lambda k: float(np.mean(host[k]))
        logger.add_scalar("train_losses", "dis_loss", mean("au_loss"), gs)
        logger.add_scalar("train_losses", "dis_loss_on_real", mean("au_loss_on_real"), gs)
        logger.add_scalar("train_losses", "dis_loss_on_fake", mean("au_loss_on_fake"), gs)
        logger.add_scalar("train_losses", "dis_reg", mean("au_reg"), gs)
        logger.add_scalar("train_au_out", "au_out_on_real", mean("au_out_on_real"), gs)
        logger.add_scalar("train_au_out", "au_out_on_fake", mean("au_out_on_fake"), gs)
        logger.add_scalar("train_accuracy", "dis_acc", mean("au_acc"), gs)
        logger.add_scalar("train_accuracy", "dis_acc_on_real", mean("au_acc_on_real"), gs)
        logger.add_scalar("train_accuracy", "dis_acc_on_fake", mean("au_acc_on_fake"), gs)
        # gen loss: only over steps where the impersonator actually trained
        im_losses = [l for l, t in zip(host["im_loss"], host["im_trained"]) if t > 0]
        if im_losses:
            logger.add_scalar("train_losses", "gen_loss", float(np.mean(im_losses)), gs)

    epoch_iter = range(last_epoch, cfg.n_epochs)
    if progress:
        try:
            from tqdm import tqdm

            epoch_iter = tqdm(epoch_iter, desc="Epochs")
        except ImportError:
            pass

    # host-side mirror of state.step: reading the device scalar every
    # iteration (int(state.step)) costs ~2.6 s/step through the axon
    # transfer tunnel — a 500x slowdown.  state.step stays authoritative
    # for checkpoint/resume.
    host_step = int(state.step)

    def run_epoch(ep):
        nonlocal state, train_step, split_fallback_allowed, host_step
        nonlocal log_buf, buf_count
        loader.set_epoch(ep)
        num_iters = 50 if cfg.dbg else len(loader)
        if type(loader).__name__ == "DeviceEpisodicLoader":
            batch_iter = iter(loader)  # batches are already device-resident
        else:
            batch_iter = device_prefetch(iter(loader), mesh, depth=cfg.prefetch_depth)
        for batch_idx, batch in enumerate(batch_iter):
                if batch_idx >= num_iters:
                    break
                try:
                    state, metrics, fake = train_step(state, batch)
                except jax.errors.JaxRuntimeError as e:
                    # the monolithic program can exceed the TPU compile
                    # server's memory; retry with the two-phase split step
                    if not (split_fallback_allowed and "compile" in str(e).lower()):
                        raise
                    print("monolithic step failed to compile; falling back to split step")
                    train_step = make_split_train_step(cfg, au, im, opt_au, opt_im, mesh)
                    split_fallback_allowed = False
                    state, metrics, fake = train_step(state, batch)
                # rows [0:buf_count] are ALWAYS exactly the steps since the
                # last flush: write at buf_count (never modulo-wrapped), and
                # if the buffer is somehow full before the cadence-aligned
                # flush fires (e.g. a resume left gs and the write counter
                # misaligned), flush now instead of overwriting row 0 and
                # mixing stale rows into the next window.
                if buf_count >= cfg.log_every:
                    flush_log(host_step)
                log_buf = record_metrics(log_buf, np.int32(buf_count), metrics)
                buf_count += 1
                perf["steps"] += 1
                host_step += 1
                gs = host_step

                if cfg.profile_dir is not None:
                    if gs == cfg.profile_start:
                        jax.profiler.start_trace(cfg.profile_dir)
                    elif gs == cfg.profile_start + 5:
                        jax.block_until_ready(metrics)
                        jax.profiler.stop_trace()

                if gs % cfg.log_every == 0:
                    flush_log(gs)
                    log_throughput(gs)
                if gs % cfg.log_enc_every == 0:
                    d = jax.device_get(diag_fn(state, batch, fake))
                    logger.add_scalar("train-au_src_mean", "abs[real-si]", float(d["au_src_mean_abs_real_minus_si"]), gs)
                    logger.add_scalar("train-au_src_mean", "abs[fake-si]", float(d["au_src_mean_abs_fake_minus_si"]), gs)
                    logger.add_scalar("train-au_env_mean", "abs[real-si]", float(d["au_env_mean_abs_real_minus_si"]), gs)
                    logger.add_scalar("train-au_env_mean", "abs[fake-si]", float(d["au_env_mean_abs_fake_minus_si"]), gs)
                    logger.add_scalar("train-au_src_std", "real", float(d["au_src_std_real"]), gs)
                    logger.add_scalar("train-au_src_std", "si", float(d["au_src_std_si"]), gs)
                    logger.add_scalar("train-au_src_std", "fake", float(d["au_src_std_fake"]), gs)
                    logger.add_scalar("train-au_env_std", "real", float(d["au_env_std_real"]), gs)
                    logger.add_scalar("train-au_env_std", "si", float(d["au_env_std_si"]), gs)
                    logger.add_scalar("train-au_env_std", "fake", float(d["au_env_std_fake"]), gs)
                if gs % cfg.save_every == 0:
                    checkpoint_io.save(state, gs, last_epoch=ep)
                if gs % cfg.save_imgs_every == 0:
                    sample_and_save_imgs(logger, sample_fn, state, train_ds, "train",
                                         train_eval_indices, sample_rng, cfg.dbg)
                    sample_and_save_imgs(logger, sample_fn, state, val_ds, "val",
                                         val_eval_indices, sample_rng, cfg.dbg)
                if gs % cfg.eval_every == 0:
                    run_eval(eval_step, state, val_ds, logger, val_bs,
                             jax.random.fold_in(sample_rng, gs))

    # interrupt/permission handling parity (``train_gim_imgs:432-447``):
    # KeyboardInterrupt -> save + stop; PermissionError -> save + continue.
    # Every save records the true epoch position so a resume replays the
    # data schedule from the right epoch (not epoch 0).
    cur_epoch = last_epoch
    try:
        for ep in epoch_iter:
            cur_epoch = ep
            try:
                run_epoch(ep)
            except PermissionError as pe:
                print(f"\nPermissionError\n{pe}\nSaving checkpoint...\n")
                checkpoint_io.save(state, int(state.step), last_epoch=ep)
                continue
        cur_epoch = cfg.n_epochs
    except KeyboardInterrupt:
        print("\nKeyboardInterrupt\nSaving checkpoint...\n")
        checkpoint_io.save(state, int(state.step), last_epoch=cur_epoch)
        return state
    checkpoint_io.save(state, int(state.step), last_epoch=cur_epoch)
    return state
