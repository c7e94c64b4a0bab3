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


# Fallback only (tagged in the JSON as "constant_fallback"): the measured
# value for the flagship config as of round 2.  The real number is derived
# below from XLA cost analysis so model changes can't silently stale it.
FALLBACK_TFLOPS_PER_STEP = 14.592


def derive_tflops_per_step(cfg) -> tuple:
    """(tflops_per_step, provenance). Traces both split-step phases on a CPU
    backend subprocess (``scripts/perf_step.py --flops-cpu`` — the axon
    backend's lowered cost analysis returns nothing) and caches the result
    keyed on the config plus a hash of the model/step/op sources."""
    import hashlib
    import subprocess
    import sys

    repo = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(repo, "optimalstrategiesagainstgenerativeattacks_tpu")
    h = hashlib.sha256()
    for rel in (
        "models/image.py", "train/image.py", "train/losses.py",
        "nn/blocks.py", "nn/stats.py",
        "ops/spectral.py", "ops/stats.py", "ops/image_ops.py",
    ):
        with open(os.path.join(pkg, rel), "rb") as f:
            h.update(f.read())
    key = (
        f"B{cfg.batch_size}_img{cfg.img_size}x{cfg.img_channels}"
        f"_style{cfg.style_dim}_m{cfg.m}n{cfg.n}k{cfg.k}_reg{cfg.reg_param}"
        f"_src{h.hexdigest()[:12]}"
    )
    cache_path = os.path.join(repo, ".bench_flops_cache.json")
    try:
        with open(cache_path) as f:
            cache = json.load(f)
    except Exception:
        cache = {}
    if key in cache:
        return float(cache[key]), "xla_cost_analysis"
    try:
        proc = subprocess.run(
            [
                sys.executable, os.path.join(repo, "scripts", "perf_step.py"),
                "--flops-cpu", "--batch", str(cfg.batch_size),
                "--img", str(cfg.img_size), "--channels", str(cfg.img_channels),
                "--style", str(cfg.style_dim), "--m", str(cfg.m),
                "--n", str(cfg.n), "--k", str(cfg.k), "--reg", str(cfg.reg_param),
                # algorithmic FLOPs: remat recompute must not inflate MFU,
                # and the microbatch lax.scan must not DEFLATE it (XLA cost
                # analysis counts a while body once, not x trip-count) —
                # trace the full-batch, no-remat program
                "--remat", "off", "--au-microbatch", "1",
            ],
            capture_output=True, text=True, timeout=1200,
        )
        tflops = json.loads(proc.stdout.strip().splitlines()[-1])["tflops_per_step"]
        cache[key] = tflops
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        return float(tflops), "xla_cost_analysis"
    except Exception:
        return FALLBACK_TFLOPS_PER_STEP, "constant_fallback"


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

    def build(inject_lr: bool, img_size: int = 32, img_channels: int = 1,
              reg_param: float = 0.0):
        cfg = ImageGameConfig(
            batch_size=128, m=1, n=5, k=5, img_size=img_size,
            img_channels=img_channels, style_dim=512,
            compute_dtype="bfloat16", inject_lr=inject_lr,
            reg_param=reg_param,
        )
        au, im = itrain.build_models(cfg)
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

    # Pre-commit the batches to the device: the metric is per-chip training
    # throughput, and on this dev host the host<->device path is an HTTP
    # tunnel whose bandwidth varies by 10x day-to-day (measured 8-11 MB/s,
    # round 3) — timing host-resident batches would benchmark the tunnel,
    # not the chip. Production hosts feed via local PCIe; the input
    # pipeline is benchmarked separately (bench_input_pipeline.py).
    batches = [jax.device_put(make_batch(i)) for i in range(4)]

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
    # absolute yardsticks alongside the torch-CPU provenance ratio: FLOPs
    # per step derived from XLA cost analysis of both split-step phases at
    # this exact config (cached on a source+config hash); v5e bf16 peak
    # 197e12 (public spec)
    tflops_per_step, flops_provenance = derive_tflops_per_step(cfg)

    # free the flagship's HBM before the vox arm: its params + opt state +
    # device-resident batches alongside the vox R1 grad-of-grad activations
    # exceed the chip's HBM (measured RESOURCE_EXHAUSTED, round 3)
    del state, metrics, step_fn, batches

    # second tracked config: the VoxCeleb2 shape (64x64x3, reg_param=10 —
    # exercises the R1 grad-of-grad path). Compile-cached; best-effort so a
    # compile-server hiccup can't take down the primary metric.
    vox = None
    try:
        vcfg, vstate, vstep = build(inject_lr=True, img_size=64,
                                    img_channels=3, reg_param=10.0)

        def vox_batch(seed):
            r = np.random.default_rng(seed)
            return {
                key: r.integers(
                    0, 255,
                    (vcfg.batch_size, s, vcfg.img_size, vcfg.img_size,
                     vcfg.img_channels),
                    dtype=np.uint8,
                )
                for key, s in (
                    ("real_sample", vcfg.n), ("leaked_sample", vcfg.m),
                    ("si_sample", vcfg.k),
                )
            }

        # device-resident for the same tunnel-independence reason as above
        # (17 MB/step of uint8 at vox shapes is 1.5-2 s through a slow
        # tunnel — 3x the step's compute time)
        vbatches = [jax.device_put(vox_batch(100 + i)) for i in range(4)]
        vstate, vmetrics, _ = vstep(vstate, vbatches[0])
        float(vmetrics["au_loss"])
        for i in range(1, 3):
            vstate, vmetrics, _ = vstep(vstate, vbatches[i % 4])
        float(vmetrics["au_loss"])
        vn = 20
        t0 = time.perf_counter()
        for i in range(vn):
            vstate, vmetrics, _ = vstep(vstate, vbatches[i % 4])
        float(vmetrics["au_loss"])
        v_sps = vn / (time.perf_counter() - t0)
        v_tflops, v_prov = derive_tflops_per_step(vcfg)
        vox = {
            "steps_per_sec": round(v_sps, 3),
            "ms_per_step": round(1e3 / v_sps, 1),
            "images_per_sec": round(
                v_sps * vcfg.batch_size * (vcfg.m + vcfg.n + vcfg.k), 0
            ),
            "tflops_per_step": v_tflops,
            "tflops_provenance": v_prov,
            "mfu_vs_v5e_bf16_peak": round(v_tflops * 1e12 * v_sps / 197e12, 3),
        }
    except Exception as e:
        # stdout must stay one JSON line; the full traceback goes to stderr,
        # but the artifact must RECORD the partial failure rather than
        # silently dropping the key (VERDICT r3 item 1)
        import traceback

        traceback.print_exc()
        vox = {"error": f"{type(e).__name__}: {e}"[:500]}

    # third tracked workload family: the synthetic Gaussian game at the
    # reference protocol (d=10, m=1, n=5, k=10, B=4096, lr 1e-4 —
    # /root/reference/train_gim_on_gaussians.py defaults with --src_dim 10
    # --n 5; the adjudicated-convergence config in STATUS.md).  The
    # production loop scans chunks of steps inside one XLA program; bench
    # the same shape (100-step chunks, value-fetched per chunk).
    gauss = None
    try:
        from optimalstrategiesagainstgenerativeattacks_tpu.models import (
            gaussian as gmodels,
        )
        from optimalstrategiesagainstgenerativeattacks_tpu.train import (
            gaussian as gtrain,
        )
        from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
            GaussianGameConfig,
        )

        gcfg = GaussianGameConfig(batch_size=4096, m=1, n=5, k=10, src_dim=10)
        gau = gmodels.get_au(gcfg.src_dim)
        gim = gmodels.get_im(gcfg.src_dim)
        gstate, gopt_au, gopt_im = gtrain.create_state(
            gcfg, gau, gim, jax.random.PRNGKey(0)
        )
        chunk = 100
        gfn = gtrain.make_train_fn(gcfg, gau, gim, gopt_au, gopt_im,
                                   n_steps=chunk)
        gstate, gmetrics = gfn(gstate)  # compile + warm
        float(gmetrics["au_loss"][-1])
        gstate, gmetrics = gfn(gstate)
        float(gmetrics["au_loss"][-1])
        gn_chunks = 10
        t0 = time.perf_counter()
        for _ in range(gn_chunks):
            gstate, gmetrics = gfn(gstate)
        float(gmetrics["au_loss"][-1])
        g_sps = gn_chunks * chunk / (time.perf_counter() - t0)
        gauss = {
            "steps_per_sec": round(g_sps, 1),
            "batch_size": gcfg.batch_size,
            "episodes_per_sec": round(g_sps * gcfg.batch_size, 0),
        }
    except Exception as e:
        import traceback

        traceback.print_exc()
        gauss = {"error": f"{type(e).__name__}: {e}"[:500]}

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
                "tflops_per_step": tflops_per_step,
                "tflops_provenance": flops_provenance,
                "mfu_vs_v5e_bf16_peak": round(
                    tflops_per_step * 1e12 * steps_per_sec / 197e12, 3
                ),
                **({"vox_64x3_reg10": vox} if vox is not None else {}),
                **({"gaussian_d10": gauss} if gauss is not None else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
