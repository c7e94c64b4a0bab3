from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import (
    save_args,
    load_args,
    GaussianGameConfig,
    ImageGameConfig,
)

__all__ = ["save_args", "load_args", "GaussianGameConfig", "ImageGameConfig"]
