"""Learning-dynamics smoke test: on a separable synthetic task the
authenticator should beat chance within a few hundred steps."""

import jax
import numpy as np
import pytest

from optimalstrategiesagainstgenerativeattacks_tpu.models import image as imodels
from optimalstrategiesagainstgenerativeattacks_tpu.train import image as itrain
from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import ImageGameConfig


@pytest.mark.slow
def test_authenticator_learns_brightness_identity():
    """Classes = brightness bands. Real/si share a band; an UNTRAINED
    impersonator can't match it, so a learning authenticator should push
    well past chance accuracy."""
    cfg = ImageGameConfig(
        batch_size=8, m=1, n=2, k=2, img_size=16, img_channels=1, style_dim=16,
        compute_dtype="float32", au_lr=5e-4, im_lr=1e-6, env_noise_mapping_lr=1e-7,
    )
    au = imodels.get_au(cfg.img_size, cfg.img_channels, cfg.style_dim)
    im = imodels.get_im(cfg.img_size, cfg.img_channels, cfg.style_dim)
    state, oa, oi, _ = itrain.create_state(cfg, au, im, jax.random.PRNGKey(0))
    step_fn = itrain.make_train_step(cfg, au, im, oa, oi)

    rng = np.random.default_rng(0)

    def make_batch():
        base = rng.integers(0, 7, cfg.batch_size)[:, None, None, None, None] * 36

        def draw(s):
            noise = rng.integers(0, 36, (cfg.batch_size, s, 16, 16, 1))
            return (base + noise).astype(np.uint8)

        return {
            "real_sample": draw(cfg.n),
            "leaked_sample": draw(cfg.m),
            "si_sample": draw(cfg.k),
        }

    accs = []
    for i in range(150):
        state, metrics, _ = step_fn(state, make_batch())
        accs.append(metrics["au_acc"])
    accs = [float(a) for a in jax.device_get(accs)]
    early = float(np.mean(accs[:30]))
    late = float(np.mean(accs[-40:]))
    assert late > 0.7, (early, late)
    assert late > early - 0.05
