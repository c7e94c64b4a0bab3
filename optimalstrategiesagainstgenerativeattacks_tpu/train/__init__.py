from optimalstrategiesagainstgenerativeattacks_tpu.train import (
    checkpoints,
    logger,
    losses,
    state,
)

__all__ = ["checkpoints", "logger", "losses", "state"]
