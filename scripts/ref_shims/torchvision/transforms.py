"""Plain-torch implementations of the three transforms the reference uses
(`data_handling/img_datasets.py:43-46,301` in /root/reference)."""

import random

import numpy as np
import torch


class Compose:
    def __init__(self, fns):
        self.fns = list(fns)

    def __call__(self, x):
        for fn in self.fns:
            x = fn(x)
        return x


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if random.random() < self.p:
            return img.transpose(0)  # PIL FLIP_LEFT_RIGHT == 0
        return img


class ToTensor:
    """PIL image -> float CHW tensor scaled from [0,255] to [0,1]."""

    def __call__(self, img):
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        return t.to(torch.float32) / 255.0
