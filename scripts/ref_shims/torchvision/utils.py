"""Plain-torch make_grid/save_image so the reference Logger.add_imgs works
(`training/logger.py:49-50` in /root/reference)."""

import numpy as np
import torch


def make_grid(imgs, nrow=8, padding=2):
    imgs = torch.as_tensor(imgs).detach().cpu()
    if imgs.dim() == 3:
        imgs = imgs.unsqueeze(0)
    b, c, h, w = imgs.shape
    ncol = min(nrow, b)
    nrows = (b + ncol - 1) // ncol
    grid = imgs.new_zeros((c, padding + nrows * (h + padding), padding + ncol * (w + padding)))
    for i in range(b):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[:, y:y + h, x:x + w] = imgs[i]
    return grid


def save_image(tensor, outfile, nrow=8):
    from PIL import Image

    grid = tensor if tensor.dim() == 3 else make_grid(tensor, nrow=nrow)
    arr = grid.clamp(0, 1).mul(255).round().to(torch.uint8).permute(1, 2, 0).numpy()
    if arr.shape[2] == 1:
        arr = arr[:, :, 0]
    Image.fromarray(arr).save(outfile)
