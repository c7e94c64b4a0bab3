#!/usr/bin/env python
"""Benchmark: GIM image-game train steps/sec on one chip (flagship config).

Runs the full alternating G/D train step (impersonator update + authenticator
update, spectral-norm power iterations, bf16 compute) on the Omniglot paper
configuration — img 32x32x1, style_dim 512, B=128, m=1, n=5, k=5
(``train_gim_on_imgs.py`` defaults / SURVEY §6) — with synthetic uint8
batches so the number isolates device throughput.

Prints ONE JSON line:
  {"metric": "gim_train_steps_per_sec_per_chip", "value": N,
   "unit": "steps/sec", "vs_baseline": N / baseline}

Baseline: the reference PyTorch implementation measured on this host
(torch is CPU-only in this image; the reference repo ships no published
throughput numbers — SURVEY §6). The measured value is stored in
``bench_baseline.json`` with methodology; if absent, a conservative
constant is used.
"""

import json
import os
import time

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
# measured via the reference's GIMImgTrainer + im/au_train_step on this host's
# CPU (see bench_baseline.json for methodology); fallback if the file is gone
DEFAULT_BASELINE_STEPS_PER_SEC = 0.05


def load_baseline() -> float:
    try:
        with open(BASELINE_FILE) as f:
            return float(json.load(f)["torch_cpu_steps_per_sec"])
    except Exception:
        return DEFAULT_BASELINE_STEPS_PER_SEC


def main():
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.runtime import (
        enable_compile_cache,
    )

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels
    from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import ImageGameConfig

    def build(inject_lr: bool):
        cfg = ImageGameConfig(
            batch_size=128, m=1, n=5, k=5, img_size=32, img_channels=1,
            style_dim=512, compute_dtype="bfloat16", inject_lr=inject_lr,
        )
        dtype = jnp.bfloat16
        au = imodels.get_au(cfg.img_size, cfg.img_channels, cfg.style_dim, dtype=dtype)
        im = imodels.get_im(cfg.img_size, cfg.img_channels, cfg.style_dim, dtype=dtype)
        state, opt_au, opt_im, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(0))
        # the two-phase split step: numerically identical to the monolithic
        # one, but each phase is a half-size XLA program — the monolithic
        # flagship program exceeds the remote TPU compile server's memory
        # (SIGKILL) and takes ~45 min to compile when it survives
        step_fn = itrain.make_split_train_step(cfg, au, im, opt_au, opt_im)
        return cfg, state, step_fn

    cfg, state, step_fn = build(inject_lr=True)

    rng = np.random.default_rng(0)

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

    batches = [make_batch(i) for i in range(4)]

    # warmup / compile (persistent-cached across runs); the remote compile
    # server is load-sensitive — if it kills the injected-LR variant, fall
    # back to baked-LR programs (possibly already cached)
    try:
        state, metrics, _ = step_fn(state, batches[0])
        float(metrics["au_loss"])
    except jax.errors.JaxRuntimeError as e:
        if "compile" not in str(e).lower():
            raise
        cfg, state, step_fn = build(inject_lr=False)
        state, metrics, _ = step_fn(state, batches[0])
        float(metrics["au_loss"])
    for i in range(1, 3):
        state, metrics, _ = step_fn(state, batches[i % len(batches)])
    float(metrics["au_loss"])

    # async chain of steps closed by an actual VALUE FETCH (training runs
    # the same way: dispatch ahead, sync at the logging cadence).
    # jax.block_until_ready does NOT wait for execution on the axon
    # platform (async tunnel), so only fetching a result measures honestly.
    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics, _ = step_fn(state, batches[i % len(batches)])
    float(metrics["au_loss"])
    steps_per_sec = n_steps / (time.perf_counter() - t0)
    baseline = load_baseline()
    # absolute yardsticks alongside the torch-CPU provenance ratio:
    # FLOPs/step from `scripts/perf_step.py --flops-cpu` (XLA cost analysis
    # of both split-step phases at this exact config); v5e bf16 peak 197e12
    TFLOPS_PER_STEP = 14.592
    print(
        json.dumps(
            {
                "metric": "gim_train_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 3),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / baseline, 2),
                "ms_per_step": round(1e3 / steps_per_sec, 1),
                "images_per_sec": round(
                    steps_per_sec * cfg.batch_size * (cfg.m + cfg.n + cfg.k), 0
                ),
                "tflops_per_step": TFLOPS_PER_STEP,
                "mfu_vs_v5e_bf16_peak": round(
                    TFLOPS_PER_STEP * 1e12 * steps_per_sec / 197e12, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
