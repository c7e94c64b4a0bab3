"""Weight initialisers matching the reference's torch init distributions.

GAN training dynamics are sensitive to init scale, so the TPU build
reproduces the reference's init *distributions* (not bitwise values):

  * torch Conv2d/Linear default: kaiming-uniform(a=sqrt(5)) on the kernel
    -> Uniform(+-1/sqrt(fan_in)); bias Uniform(+-1/sqrt(fan_in)).
  * ``weights_init('kaiming')`` (``model_blocks.py:18-38``):
    kaiming-normal(a=0.2), zero bias.  Plus gaussian / xavier / orthogonal
    variants with the same gains as the reference.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax.nn import initializers as jinit

# torch default kernel init: Uniform(+-1/sqrt(fan_in)); Var = 1/(3 fan_in).
torch_kernel_init = jinit.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    """torch default bias init: Uniform(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_normal(a: float = 0.2) -> Callable:
    """torch kaiming_normal_(a): N(0, 2/((1+a^2) fan_in))."""
    return jinit.variance_scaling(2.0 / (1.0 + a * a), "fan_in", "normal")


def weights_init(init_type: str = "kaiming") -> Callable:
    """Kernel-init factory mirroring ``model_blocks.weights_init``.

    'default' returns the torch default (matching reference behaviour where
    'default' leaves torch's own init in place).  All non-default variants
    are paired with zero bias by callers.
    """
    if init_type == "gaussian":
        return jinit.normal(stddev=0.02)
    if init_type == "xavier":
        # torch xavier_normal_(gain=sqrt(2)): N(0, 2 * 2/(fan_in+fan_out))
        return jinit.variance_scaling(2.0, "fan_avg", "normal")
    if init_type == "kaiming":
        return kaiming_normal(a=0.2)
    if init_type == "orthogonal":
        return jinit.orthogonal(scale=math.sqrt(2))
    if init_type == "default":
        return torch_kernel_init
    raise ValueError(f"Unsupported initialization: {init_type}")


zeros_init = jinit.zeros
ones_init = jinit.ones


def uniform_pm1(key, shape, dtype=jnp.float32):
    """Uniform(-1, 1) — used by the ArcFace head kernel before renorm."""
    return jax.random.uniform(key, shape, dtype, minval=-1.0, maxval=1.0)
