#!/usr/bin/env python
"""Run the torch reference image trainer with a chosen RNG seed.

The reference hardcodes torch.manual_seed(1) at import
(/root/reference/train_gim_on_imgs.py:6) and samples episodes with the
unseeded stdlib `random` (img_datasets.py:82,169); this wrapper re-seeds
torch / random / numpy AFTER import so multi-seed head-to-head controls
are possible.  Usage:

    PYTHONPATH=/root/repo/scripts/ref_shims python run_ref_img_seed.py <seed> <ref args...>
"""

import os
import random
import sys

import numpy as np
import torch

seed = int(sys.argv[1])
sys.argv = [sys.argv[0]] + sys.argv[2:]
sys.path.insert(0, "/root/reference")

import train_gim_on_imgs as ref  # noqa: E402  (applies manual_seed(1))
from training.utils import save_args  # noqa: E402

torch.manual_seed(seed)
random.seed(seed)
np.random.seed(seed)

args = ref.get_args()
os.makedirs(args.outdir, exist_ok=True)
save_args(args=args, outdir=args.outdir)
ref.main(args)
