"""Auto-imported (via PYTHONPATH) compat shim for running the unmodified
torch-1.2-era reference under modern torch.

torch 1.2 allowed InstanceNorm over 1x1 spatial inputs (var=0 -> output 0);
modern torch raises in train mode.  The reference EnvDecoder starts from a
[B, style, 1, 1] tensor (`/root/reference/models/gim_img_models.py:88-94`,
first ResBlockUp applies InstanceNorm before upsampling,
`models/model_blocks.py:763`), so restore the 1.2 behaviour.
"""

try:
    import torch.nn.functional as F

    F._verify_spatial_size = lambda size: None
except Exception:  # torch absent or internals moved — shim is best-effort
    pass
