from optimalstrategiesagainstgenerativeattacks_tpu.ops.stats import (
    custom_std,
    mean_stat,
    std_stat,
    logvar_stat,
)
from optimalstrategiesagainstgenerativeattacks_tpu.ops.adain import ada_in, instance_norm
from optimalstrategiesagainstgenerativeattacks_tpu.ops.image_ops import (
    upscale2d,
    blur3x3,
    avg_pool2d,
    adaptive_max_pool,
)

__all__ = [
    "custom_std",
    "mean_stat",
    "std_stat",
    "logvar_stat",
    "ada_in",
    "instance_norm",
    "upscale2d",
    "blur3x3",
    "avg_pool2d",
    "adaptive_max_pool",
]
