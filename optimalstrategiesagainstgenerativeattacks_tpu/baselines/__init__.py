from optimalstrategiesagainstgenerativeattacks_tpu.baselines import arcface, siamese

__all__ = ["arcface", "siamese"]
