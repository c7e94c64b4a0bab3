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

# sklearn >= 1.0 returns a plain python float from roc_auc_score; the
# reference calls .item() on it (authentication_score.py:94-97)
try:
    import numpy as _np
    import sklearn.metrics as _skm

    _orig_roc_auc = _skm.roc_auc_score

    def _roc_auc_score(*args, **kwargs):
        return _np.float64(_orig_roc_auc(*args, **kwargs))

    _skm.roc_auc_score = _roc_auc_score
except Exception:
    pass

# pandas >= 2.0 removed DataFrame.append; the reference eval builds its
# results table with it (eval_gim_on_authentication.py:248)
try:
    import pandas as _pd

    if not hasattr(_pd.DataFrame, "append"):
        def _df_append(self, other, ignore_index=False, **kwargs):
            if isinstance(other, dict):
                other = _pd.DataFrame([other])
            return _pd.concat([self, other], ignore_index=ignore_index)

        _pd.DataFrame.append = _df_append
except Exception:
    pass
