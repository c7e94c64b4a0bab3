from optimalstrategiesagainstgenerativeattacks_tpu.nn import blocks, init, stats

__all__ = ["blocks", "init", "stats"]
