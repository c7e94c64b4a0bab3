#!/usr/bin/env python
"""Measure the flagship image train step on the real chip: ms/step, images/s,
FLOPs/step and MFU, with honest value-fetch sync (``jax.block_until_ready``
does not wait for execution on the axon platform).

Usage: python scripts/perf_step.py [--steps 30] [--style 512] [--img 32]
       [--channels 1] [--batch 128] [--profile-dir DIR] [--reg 0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e peak: 197 TFLOP/s bf16, 394 int8 (public spec)
V5E_PEAK_BF16 = 197e12


def _print_memory_analysis(name, compiled):
    """Compiled-program HBM footprint (argument/output/temp/peak), when the
    backend exposes it — the number that decides remat/microbatch policy
    for the big-image R1 games (the chip has 16 GB)."""
    try:
        ma = compiled.memory_analysis()
        if ma is None:
            return
        gb = 1 / 1e9
        print(
            f"  {name} memory: args {ma.argument_size_in_bytes * gb:.2f} GB, "
            f"out {ma.output_size_in_bytes * gb:.2f} GB, "
            f"temp {ma.temp_size_in_bytes * gb:.2f} GB, "
            f"peak {getattr(ma, 'peak_memory_in_bytes', 0) * gb:.2f} GB",
            flush=True,
        )
    except Exception as e:
        print(f"  {name} memory_analysis unavailable: {e}", flush=True)


def compute_flops(args, cfg, itrain, imodels):
    """FLOPs/step via ``eval_shape`` + ``Lowered.cost_analysis`` — traces the
    two phases without compiling or executing anything (run with
    ``--flops-cpu``; the axon backend's lowered cost analysis returns None)."""
    import jax
    import jax.numpy as jnp

    au, im = itrain.build_models(cfg)
    state = jax.eval_shape(
        lambda k: itrain.create_state(cfg, au, im, k)[0], jax.random.PRNGKey(0)
    )
    opt_au, opt_im, _ = itrain.make_optimizers(cfg)
    step_fn = itrain.make_split_train_step(cfg, au, im, opt_au, opt_im)
    batch = {
        key: jax.ShapeDtypeStruct(
            (cfg.batch_size, s, cfg.img_size, cfg.img_size, cfg.img_channels),
            jnp.uint8,
        )
        for key, s in (
            ("real_sample", cfg.n), ("leaked_sample", cfg.m), ("si_sample", cfg.k),
        )
    }
    jax.eval_shape(step_fn, state, batch)  # populates step_fn.arg_specs
    total = 0.0
    for name, phase in step_fn.phases.items():
        ca = phase.lower(*step_fn.arg_specs[name]).cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        total += float(ca.get("flops", 0.0))
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--style", type=int, default=512)
    p.add_argument("--img", type=int, default=32)
    p.add_argument("--channels", type=int, default=1)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--m", type=int, default=1)
    p.add_argument("--n", type=int, default=5)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--reg", type=float, default=0.0)
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--monolithic", action="store_true")
    p.add_argument("--no-scan", action="store_true",
                   help="unroll the AdaIN res blocks instead of nn.scan")
    p.add_argument("--im2col", action="store_true",
                   help="lower the AdaIN res-stage convs as dense matmuls")
    p.add_argument("--scan-unroll", type=int, default=1,
                   help="lax.scan unroll factor for the AdaIN res stack")
    p.add_argument("--flatten", action="store_true",
                   help="optax.flatten the optimizers (measured slower r3)")
    p.add_argument("--stack-opt", action="store_true",
                   help="shape-grouped leaf stacking for the Adam updates")
    p.add_argument("--unroll-pair", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="unroll the src/env encoder pair (full-width convs "
                        "instead of group-2; same params/ckpts). Default on "
                        "— measured 160.5->149.65 ms flagship, 512.5->477.7 "
                        "ms vox (round 3); --no-unroll-pair for the vmapped "
                        "group-2 A/B arm")
    p.add_argument("--bf16-matvec", action="store_true",
                   help="spectral power-iteration matvecs in bf16")
    p.add_argument("--split-gen", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="feed img2img the (env, leaked) channel pair — exact "
                        "kernel-slice split of the entry convs, same params; "
                        "XLA then drops the leaked channels' input-gradient "
                        "conv. --no-split-gen for the concat A/B arm")
    p.add_argument("--remat", default="auto", choices=["auto", "on", "off"],
                   help="rematerialise encoder blocks in backward passes "
                        "(auto: off — superseded as the big-image HBM "
                        "policy by au-microbatching, round-4 A/B — unless "
                        "microbatching cannot divide the batch)")
    p.add_argument("--remat-depth", type=int, default=-1,
                   help="with remat on, rematerialise only the first N "
                        "encoder blocks (-1 = all)")
    p.add_argument("--au-microbatch", type=int, default=0,
                   help="sequential batch chunks for the authenticator "
                        "update (grad accumulation; exact). 0 = auto (the "
                        "shipped ImageGameConfig.resolved_hbm_policy: chunks "
                        "of >= 8 episodes capped at c=16 for img >= 64, "
                        "c = min(8, batch//16) for img < 64 at batch >= 64); "
                        "1 forces the full-batch A/B arm")
    p.add_argument("--compile-only", action="store_true",
                   help="lower+compile the phases (warms the persistent "
                        "cache via the remote compile server) and exit "
                        "without touching the chip")
    p.add_argument("--flops-cpu", action="store_true",
                   help="only print FLOPs/step, traced on the CPU backend")
    args = p.parse_args()

    import jax

    if args.flops_cpu:
        jax.config.update("jax_platforms", "cpu")

    from optimalstrategiesagainstgenerativeattacks_tpu.utils.runtime import (
        enable_compile_cache,
    )

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels
    from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import ImageGameConfig

    cfg = ImageGameConfig(
        batch_size=args.batch, m=args.m, n=args.n, k=args.k, img_size=args.img,
        img_channels=args.channels, style_dim=args.style, reg_param=args.reg,
        compute_dtype="bfloat16", inject_lr=True,
        scan_adain_blocks=not args.no_scan,
        adain_im2col=args.im2col,
        adain_scan_unroll=args.scan_unroll,
        flatten_opt=args.flatten,
        stack_opt=args.stack_opt,
        unroll_encoder_pair=args.unroll_pair,
        bf16_spectral=args.bf16_matvec,
        split_gen_input=args.split_gen,
        remat_encoders=args.remat,
        remat_depth=args.remat_depth,
        au_microbatch=args.au_microbatch,
    )
    if args.flops_cpu:
        flops = compute_flops(args, cfg, itrain, imodels)
        print(json.dumps({"tflops_per_step": round(flops / 1e12, 4),
                          "config": f"B{cfg.batch_size} img{cfg.img_size} "
                                    f"style{cfg.style_dim}"}))
        return
    au, im = itrain.build_models(cfg)
    if args.compile_only:
        state = jax.eval_shape(
            lambda k: itrain.create_state(cfg, au, im, k)[0], jax.random.PRNGKey(0)
        )
        opt_au, opt_im, _ = itrain.make_optimizers(cfg)
        step_fn = itrain.make_split_train_step(cfg, au, im, opt_au, opt_im)
        batch = {
            key: jax.ShapeDtypeStruct(
                (cfg.batch_size, s, cfg.img_size, cfg.img_size, cfg.img_channels),
                jnp.uint8,
            )
            for key, s in (
                ("real_sample", cfg.n), ("leaked_sample", cfg.m),
                ("si_sample", cfg.k),
            )
        }
        jax.eval_shape(step_fn, state, batch)
        for name, phase in step_fn.phases.items():
            t1 = time.perf_counter()
            compiled = phase.lower(*step_fn.arg_specs[name]).compile()
            print(f"compiled {name} in {time.perf_counter() - t1:.1f}s", flush=True)
            _print_memory_analysis(name, compiled)
        return
    state, opt_au, opt_im, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(0))
    if args.monolithic:
        step_fn = itrain.make_train_step(cfg, au, im, opt_au, opt_im)
    else:
        step_fn = itrain.make_split_train_step(cfg, au, im, opt_au, opt_im)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        return {
            key: r.integers(
                0, 255,
                (cfg.batch_size, s, cfg.img_size, cfg.img_size, cfg.img_channels),
                dtype=np.uint8,
            )
            for key, s in (
                ("real_sample", cfg.n), ("leaked_sample", cfg.m), ("si_sample", cfg.k),
            )
        }

    # device-resident batches: time the chip, not the dev tunnel (whose
    # bandwidth varies 10x day-to-day; see bench.py)
    batches = [jax.device_put(make_batch(i)) for i in range(4)]

    t0 = time.perf_counter()
    state, metrics, _ = step_fn(state, batches[0])
    print(f"first step (compile) done in {time.perf_counter() - t0:.1f}s "
          f"au_loss={float(metrics['au_loss']):.4f}", flush=True)
    for name, phase in getattr(step_fn, "phases", {}).items():
        try:
            _print_memory_analysis(
                name, phase.lower(*step_fn.arg_specs[name]).compile()
            )
        except Exception:
            pass
    for i in range(1, 3):
        state, metrics, _ = step_fn(state, batches[i % 4])
    float(metrics["au_loss"])

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
        for i in range(5):
            state, metrics, _ = step_fn(state, batches[i % 4])
        float(metrics["au_loss"])
        jax.profiler.stop_trace()

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics, _ = step_fn(state, batches[i % 4])
    float(metrics["au_loss"])
    dt = (time.perf_counter() - t0) / args.steps

    # FLOPs from the lowered phases' cost analysis (no recompile)
    flops = None
    try:
        total = 0.0
        for name, phase in getattr(step_fn, "phases", {}).items():
            lowered = phase.lower(*step_fn.arg_specs[name])
            ca = lowered.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            total += float(ca.get("flops", 0.0))
        flops = total or None
    except Exception as e:  # cost analysis is best-effort on this backend
        print(f"cost_analysis unavailable: {e}")

    out = {
        "ms_per_step": round(dt * 1e3, 2),
        "steps_per_sec": round(1.0 / dt, 3),
        "images_per_sec": round((cfg.m + cfg.n + cfg.k) * cfg.batch_size / dt, 0),
        "config": f"B{cfg.batch_size} img{cfg.img_size}x{cfg.img_channels} "
                  f"style{cfg.style_dim} m{cfg.m}n{cfg.n}k{cfg.k} reg{cfg.reg_param}",
    }
    if flops:
        out["tflops_per_step"] = round(flops / 1e12, 3)
        out["mfu_vs_v5e_bf16_peak"] = round(flops / dt / V5E_PEAK_BF16, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
