#!/usr/bin/env python
"""AOT-validate GSPMD partitioning of the PRODUCTION-shape train steps.

``__graft_entry__.dryrun_multichip`` executes one real step on tiny shapes;
this script closes the remaining gap (VERDICT r4 item 2): partitioning
decisions are shape- and layout-dependent (the ``flatten_opt`` episode:
a layout change moved dp x tp divergence from 6e-8 to 1.8e-2,
``utils/config.py``), so the FULL-shape programs must be shown to lower
and partition on a mesh — without timing or executing anything.

For each tracked config (flagship: B=128, 32x32x1, style 512; vox: B=128,
64x64x3, style 512, reg_param=10 with its auto au_microbatch=16), this
builds the shipped SPLIT train step (the production program for both,
``split_step='auto'`` at style>=256), constructs ShapeDtypeStruct arg
specs carrying the production shardings (batch over ``data``; large
param matrices tensor-sharded over ``model`` as in ``dryrun_multichip``;
spectral/opt state replicated), and runs ``jit.lower(...).compile()`` for
both phases on the mesh.  A successful compile IS the assertion: GSPMD
either partitions the full-shape program or raises.

Run on a virtual CPU mesh (no TPU pod needed):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/aot_mesh_compile.py

The reference's multi-device unit is ``nn.DataParallel`` over local GPUs
(``training/gim_img_training.py:407-411``); this validates the mesh
equivalent at the same model scale.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu(n_devices: int) -> None:
    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={n_devices}"
    )
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] += (
            f" --xla_force_host_platform_device_count={n_devices}"
        )
    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS; only the config flag
    # (set before backend init) wins on this host
    jax.config.update("jax_platforms", "cpu")


def aot_compile_config(cfg, mesh, verbose: bool = True) -> dict:
    """Lower+compile both split-step phases of ``cfg`` on ``mesh``.

    Returns {phase_name: {seconds, generated_code_size_bytes}}.  Raises if
    GSPMD cannot partition the production-shape program.
    """
    import jax
    import jax.numpy as jnp

    from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import (
        batch_sharding,
        param_shardings,
        replicated_sharding,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain

    au, im = itrain.build_models(cfg)
    state, opt_au, opt_im, _ = itrain.create_state(
        cfg, au, im, jax.random.PRNGKey(0)
    )
    step_fn = itrain.make_split_train_step(cfg, au, im, opt_au, opt_im, mesh)

    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    au_shard = param_shardings(state.params_au, mesh, min_size=128)
    im_shard = param_shardings(state.params_im, mesh, min_size=128)

    def spec(tree, shardings):
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            tree,
            shardings,
        )

    def spec_rep(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep), tree
        )

    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    hw = (cfg.img_size, cfg.img_size, cfg.img_channels)

    def img(s):
        return jax.ShapeDtypeStruct((cfg.batch_size, s) + hw, dt, sharding=data)

    step_spec = jax.ShapeDtypeStruct((), jnp.int32, sharding=rep)
    rng_spec = jax.ShapeDtypeStruct(state.rng.shape, state.rng.dtype, sharding=rep)

    im_args = (
        spec(state.params_im, im_shard), spec_rep(state.spectral_im),
        spec_rep(state.opt_im), spec(state.params_au, au_shard),
        spec_rep(state.spectral_au), rng_spec, step_spec,
        img(cfg.m), img(cfg.k),
    )
    au_args = (
        spec(state.params_au, au_shard), spec_rep(state.spectral_au),
        spec_rep(state.opt_au), img(cfg.n), img(cfg.n), img(cfg.k),
    )

    results = {}
    for name, phase, args in (
        ("im_phase", step_fn.phases["im_phase"], im_args),
        ("au_phase", step_fn.phases["au_phase"], au_args),
    ):
        t0 = time.perf_counter()
        compiled = phase.lower(*args).compile()
        dt_s = time.perf_counter() - t0
        try:
            size = int(compiled.memory_analysis().generated_code_size_in_bytes)
        except Exception:
            size = -1
        results[name] = {"seconds": round(dt_s, 1),
                         "generated_code_size_bytes": size}
        if verbose:
            print(f"  {name}: compiled+partitioned in {dt_s:.1f}s "
                  f"(code {size} B)", flush=True)
    return results


def tracked_configs():
    """The two BENCH-tracked production configs, full shape."""
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
        ImageGameConfig,
    )

    return {
        "flagship": ImageGameConfig(
            batch_size=128, m=1, n=5, k=5, img_size=32, img_channels=1,
            style_dim=512, compute_dtype="bfloat16",
        ),
        "vox": ImageGameConfig(
            batch_size=128, m=1, n=5, k=5, img_size=64, img_channels=3,
            style_dim=512, compute_dtype="bfloat16", reg_param=10.0,
        ),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-devices", type=int, default=8)
    p.add_argument("--model-parallel", type=int, default=2)
    p.add_argument("--configs", default="flagship,vox",
                   help="comma list from {flagship, vox}")
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    _force_cpu(args.n_devices)
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.runtime import (
        enable_compile_cache,
    )

    enable_compile_cache()
    import jax

    from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import create_mesh

    devices = jax.devices()[: args.n_devices]
    mesh = create_mesh(devices, model_parallel=args.model_parallel)
    print(f"mesh: {dict(mesh.shape)} over {len(devices)} {devices[0].platform} "
          "devices", flush=True)

    tracked = tracked_configs()
    out = {"mesh": {k: int(v) for k, v in mesh.shape.items()}}
    for name in args.configs.split(","):
        cfg = tracked[name.strip()]
        remat, mb = cfg.resolved_hbm_policy()
        print(f"== {name}: B={cfg.batch_size} img={cfg.img_size}x"
              f"{cfg.img_channels} style={cfg.style_dim} reg={cfg.reg_param} "
              f"au_microbatch={mb} remat={remat}", flush=True)
        out[name] = aot_compile_config(cfg, mesh)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
