from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
    ImgGIMDataSet,
    OmniglotGIMDataSet,
    ArcfaceDataSet,
    EpisodicBatchLoader,
    load_image,
)
from optimalstrategiesagainstgenerativeattacks_tpu.data.prefetch import device_prefetch

__all__ = [
    "ImgGIMDataSet",
    "OmniglotGIMDataSet",
    "ArcfaceDataSet",
    "EpisodicBatchLoader",
    "load_image",
    "device_prefetch",
]
