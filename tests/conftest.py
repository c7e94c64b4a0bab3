"""Test harness: force an 8-device CPU mesh (the JAX analogue of the
reference's DataParallelMock, SURVEY §4) so every multi-device code path is
exercised without TPU hardware."""

import os

# hard override: the session env pins JAX_PLATFORMS=axon (the TPU tunnel);
# tests must run on the 8-device CPU host mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)
import pytest  # noqa: E402

# The env var alone is overridden by the axon TPU plugin; the config flag
# set before backend initialisation wins.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on CPU, so cache
# compiled executables across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/osga_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


def pytest_configure(config):
    """Run flax init/apply under jit in tests.

    Eager op-by-op dispatch is pathologically slow on this host; wrapping
    each init/apply in a zero-arg jit turns every test into a single XLA
    program that lands in the persistent compilation cache, making repeat
    runs fast.  Behaviour is unchanged (jit of init/apply is supported flax
    usage).
    """
    from flax import linen as nn

    orig_init = nn.Module.init
    orig_apply = nn.Module.apply

    def jit_init(self, *args, **kwargs):
        return jax.jit(lambda: orig_init(self, *args, **kwargs))()

    def jit_apply(self, *args, **kwargs):
        return jax.jit(lambda: orig_apply(self, *args, **kwargs))()

    nn.Module.init = jit_init
    nn.Module.apply = jit_apply
