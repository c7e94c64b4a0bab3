"""Production-shape GSPMD partitioning validation (VERDICT r4 item 2).

``dryrun_multichip`` executes a toy-shape step; partitioning decisions are
shape- and layout-dependent (the ``flatten_opt`` episode moved dp x tp
divergence from 6e-8 to 1.8e-2 via a layout change), so these tests AOT
lower+compile the FULL-shape flagship and vox split-step phases on the
8-device CPU mesh.  Compile success == GSPMD partitioned the production
program; nothing is executed.  Slow-marked: cold compiles take minutes on
one CPU core (persistent-cached thereafter).
"""

import importlib.util
import os

import jax
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_aot():
    spec = importlib.util.spec_from_file_location(
        "aot_mesh_compile", os.path.join(_REPO, "scripts", "aot_mesh_compile.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.parametrize("name", ["flagship", "vox"])
def test_production_shape_program_partitions_on_mesh(name):
    from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import (
        create_mesh,
    )

    aot = _load_aot()
    mesh = create_mesh(jax.devices()[:8], model_parallel=2)
    cfg = aot.tracked_configs()[name]
    res = aot.aot_compile_config(cfg, mesh, verbose=False)
    assert set(res) == {"im_phase", "au_phase"}
    for phase, stats in res.items():
        assert stats["seconds"] > 0, phase
