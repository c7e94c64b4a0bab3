"""Minimal torchvision stand-in so the unmodified reference code can run.

torchvision is not installed in this image. The reference
(`/root/reference/training/logger.py:4-5`) imports `torchvision` and
`torchvision.transforms` at module scope but the gaussian training path never
calls into them (only `Logger.add_scalar` is used).  The image path uses
`torchvision.utils.make_grid` (logger.py:46) and
`transforms.RandomHorizontalFlip` / `transforms.ToTensor`
(data_handling/img_datasets.py:43-46,284-303) — implemented here with plain
torch so the reference can be trained head-to-head on this host.
"""

import torch

from . import transforms, utils  # noqa: F401

__version__ = "0.0-shim"
