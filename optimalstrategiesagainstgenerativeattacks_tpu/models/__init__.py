from optimalstrategiesagainstgenerativeattacks_tpu.models import gaussian, image

__all__ = ["gaussian", "image"]
