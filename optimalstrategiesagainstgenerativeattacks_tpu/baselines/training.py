"""Training loops for the baseline authenticators (ArcFace, Siamese).

The reference ships baseline *models* and eval loading only — no training
scripts (``eval_gim_on_authentication.py:109-128`` loads externally-trained
checkpoints; SURVEY C8).  This framework adds runnable TPU training for
both, producing checkpoints the eval CLI can load:

  * ArcFace: classification with the angular-margin head over
    ``ArcfaceDataSet`` (one class per identity); checkpoint payload
    ``{"arcface": variables}`` + args.json with num_layers/dropout/
    img_size/img_channels/emb_dim/th.
  * Siamese: binary same/different-source classification over pairs drawn
    from the episodic dataset; payload ``{"model": variables}``.  Two pair
    recipes: on-device batch-hard mining (default — hardest positive inside
    the episode, hardest negative across episodes, scored by the model's own
    classifier head) and the simpler random-pair recipe (``mining="random"``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import normalize_uint8
from optimalstrategiesagainstgenerativeattacks_tpu.train.losses import bce_with_logits


########################################################################################################################
# ArcFace
########################################################################################################################


def make_arcface_train_step(model, optimizer):
    @jax.jit
    def train_step(variables, opt_state, batch, rng):
        imgs = normalize_uint8(batch["image"])
        labels = batch["label"]

        def loss_fn(params):
            (emb, logits), muts = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                imgs, labels, True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, (acc, muts["batch_stats"])

        (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, new_opt = optimizer.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        return (
            {"params": new_params, "batch_stats": new_bs},
            new_opt,
            {"loss": loss, "acc": acc},
        )

    return train_step


def train_arcface(cfg: Dict[str, Any], ds, progress: bool = True):
    """cfg keys: outdir, num_layers, dropout, img_size, img_channels, emb_dim,
    th, lr, batch_size, n_epochs, save_every, seed."""
    import orbax.checkpoint as ocp

    from optimalstrategiesagainstgenerativeattacks_tpu.baselines.arcface import (
        ArcFace,
        Backbone,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import save_args

    os.makedirs(cfg["outdir"], exist_ok=True)
    save_args(cfg, cfg["outdir"])
    emb_model = Backbone(
        num_layers=cfg["num_layers"], drop_ratio=cfg["dropout"], mode="ir_se",
        img_size=cfg["img_size"], img_channels=cfg["img_channels"],
        emb_dim=cfg["emb_dim"],
    )
    model = ArcFace(
        emb_model=emb_model, embedding_size=cfg["emb_dim"],
        n_classes=ds.n_classes, th=cfg["th"],
    )
    rng = jax.random.PRNGKey(cfg.get("seed", 1))
    dummy = jnp.zeros((1, cfg["img_size"], cfg["img_size"], cfg["img_channels"]))
    variables = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, dummy, jnp.zeros((1,), jnp.int32))
    )(rng)
    variables = dict(variables)

    optimizer = optax.adam(cfg["lr"])
    opt_state = optimizer.init(variables["params"])
    train_step = make_arcface_train_step(model, optimizer)

    ckptr = ocp.PyTreeCheckpointer()
    n = len(ds)
    bs = cfg["batch_size"]
    order_rng = np.random.default_rng(cfg.get("seed", 1))
    step = 0
    epoch_iter = range(cfg["n_epochs"])
    if progress:
        try:
            from tqdm import tqdm

            epoch_iter = tqdm(epoch_iter, desc="ArcFace epochs")
        except ImportError:
            pass
    metrics = {}
    for ep in epoch_iter:
        order = order_rng.permutation(n)
        for start in range(0, n - bs + 1, bs):
            idx = order[start : start + bs]
            imgs, labels = zip(*(ds[int(i)] for i in idx))
            batch = {
                "image": np.stack(imgs), "label": np.asarray(labels, np.int32),
            }
            variables, opt_state, metrics = train_step(
                variables, opt_state, batch, jax.random.fold_in(rng, step)
            )
            step += 1
            if step % cfg.get("save_every", 1000) == 0:
                _save_arcface(ckptr, cfg["outdir"], step, variables)
    _save_arcface(ckptr, cfg["outdir"], step, variables)
    return variables, metrics


def _save_arcface(ckptr, outdir, step, variables):
    path = os.path.join(outdir, "ckpts", f"model_{step:08d}")
    ckptr.save(path, {"arcface": jax.device_get(variables)}, force=True)


########################################################################################################################
# Siamese
########################################################################################################################


def make_siamese_train_step(model, optimizer):
    @jax.jit
    def train_step(variables, opt_state, x1, x2, targets):
        x1 = normalize_uint8(x1)
        x2 = normalize_uint8(x2)

        def loss_fn(params):
            logits, muts = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x1, x2, True, mutable=["batch_stats"],
            )
            per = (
                jnp.maximum(logits.squeeze(-1), 0)
                - logits.squeeze(-1) * targets
                + jnp.log1p(jnp.exp(-jnp.abs(logits.squeeze(-1))))
            )
            acc = (((logits.squeeze(-1) >= 0) == (targets > 0.5))).mean()
            return per.mean(), (acc, muts["batch_stats"])

        (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, new_opt = optimizer.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        return (
            {"params": new_params, "batch_stats": new_bs},
            new_opt,
            {"loss": loss, "acc": acc},
        )

    return train_step


def make_siamese_batchhard_step(model, optimizer):
    """Batch-hard mined verification step (the default recipe).

    Upgrade over the random-pair recipe the round-1 demo used: embed the
    whole episode pool once, score every pair with the model's own
    ``classify(|e1-e2|)`` head, and train each anchor against its hardest
    positive (lowest same-source logit inside its episode) and hardest
    negative (highest logit across episodes).  Mining runs on-device inside
    the jitted step (one encoder pass + one [N,N] pair-logit matrix; N =
    batch_size * (n+k+m) stays small), so the recipe costs no extra host
    work and no extra encoder passes.
    """

    @jax.jit
    def train_step(variables, opt_state, pool):
        b, s = pool.shape[:2]
        if b < 2:
            # with a single episode the ~same mask is all False and argmax
            # over -inf picks index 0 — a same-episode pair trained as a
            # negative.  Mining needs cross-episode candidates.
            raise ValueError(
                "batch-hard mining needs batch_size >= 2 episodes per step"
            )
        n = b * s
        imgs = normalize_uint8(pool).reshape((n,) + pool.shape[2:])
        episode = jnp.repeat(jnp.arange(b), s)
        same = episode[:, None] == episode[None, :]
        eye = jnp.eye(n, dtype=bool)
        neg_inf = jnp.asarray(-1e30, jnp.float32)

        def loss_fn(params):
            emb, muts = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                imgs, True, method="encode", mutable=["batch_stats"],
            )
            logits = model.apply(
                {"params": params}, emb[:, None, :], emb[None, :, :],
                method="classify",
            )[..., 0].astype(jnp.float32)                      # [N, N]
            sel = jax.lax.stop_gradient(logits)
            # hardest positive: same episode, not self, minimal logit
            pos_idx = jnp.argmin(
                jnp.where(same & ~eye, sel, -neg_inf), axis=1)
            # hardest negative: other episode, maximal logit
            neg_idx = jnp.argmax(jnp.where(~same, sel, neg_inf), axis=1)
            rows = jnp.arange(n)
            pos_logit = logits[rows, pos_idx]
            neg_logit = logits[rows, neg_idx]
            loss = 0.5 * (
                bce_with_logits(pos_logit[:, None], 1.0)
                + bce_with_logits(neg_logit[:, None], 0.0)
            ).mean()
            acc = 0.5 * ((pos_logit >= 0).mean() + (neg_logit < 0).mean())
            return loss, (acc, muts["batch_stats"])

        (loss, (acc, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, new_opt = optimizer.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        return (
            {"params": new_params, "batch_stats": new_bs},
            new_opt,
            {"loss": loss, "acc": acc},
        )

    return train_step


def _siamese_pairs(batch, rng: np.random.Generator, pairs_per_episode: int = 2):
    """Same/different-source pairs for the verification loss.

    Positives are drawn from the FULL episode pool (real + si + leaked
    images of one source) — the eval protocol compares *test vs
    registration* images, so training must see si-style pairings, not just
    real-vs-real; negatives pair pool images across different episodes.
    ``pairs_per_episode`` positive and negative pairs per episode.
    """
    pool = np.concatenate(
        [batch["real_sample"], batch["si_sample"], batch["leaked_sample"]], axis=1
    )  # [B, n+k+m, H, W, C] uint8
    b, n = pool.shape[:2]
    x1, x2, y = [], [], []
    for i in range(b):
        for _ in range(pairs_per_episode):
            a, c = rng.choice(n, 2, replace=False)
            x1.append(pool[i, a]); x2.append(pool[i, c]); y.append(1.0)
            j = (i + 1 + int(rng.integers(b - 1))) % b
            x1.append(pool[i, a]); x2.append(pool[j, int(rng.integers(n))]); y.append(0.0)
    return np.stack(x1), np.stack(x2), np.asarray(y, np.float32)


def train_siamese(cfg: Dict[str, Any], ds, progress: bool = True):
    """cfg keys: outdir, img_size, img_channels, lr, batch_size, n_epochs,
    save_every, seed."""
    import orbax.checkpoint as ocp

    from optimalstrategiesagainstgenerativeattacks_tpu.baselines.siamese import (
        ProtonetEmbeddingNet,
        SiameseNet,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        EpisodicBatchLoader,
    )
    from optimalstrategiesagainstgenerativeattacks_tpu.utils.config import save_args

    os.makedirs(cfg["outdir"], exist_ok=True)
    save_args(cfg, cfg["outdir"])
    encoder = ProtonetEmbeddingNet(cfg["img_channels"], cfg["img_size"])
    model = SiameseNet(embedding_net=encoder, embedding_dim=encoder.embedding_dim)

    rng = jax.random.PRNGKey(cfg.get("seed", 1))
    dummy = jnp.zeros((1, cfg["img_size"], cfg["img_size"], cfg["img_channels"]))
    variables = dict(jax.jit(lambda k: model.init(k, dummy, dummy))(rng))
    optimizer = optax.adam(cfg["lr"])
    opt_state = optimizer.init(variables["params"])
    mining = cfg.get("mining", "batch_hard")
    if mining == "batch_hard":
        train_step = make_siamese_batchhard_step(model, optimizer)
    elif mining == "random":
        train_step = make_siamese_train_step(model, optimizer)
    else:
        raise ValueError(f"unknown mining mode {mining!r}")

    ckptr = ocp.PyTreeCheckpointer()
    loader = EpisodicBatchLoader(
        ds, batch_size=cfg["batch_size"], shuffle=True,
        num_workers=cfg.get("num_workers", 0), seed=cfg.get("seed", 1),
    )
    pair_rng = np.random.default_rng(cfg.get("seed", 1))
    step = 0
    epoch_iter = range(cfg["n_epochs"])
    if progress:
        try:
            from tqdm import tqdm

            epoch_iter = tqdm(epoch_iter, desc="Siamese epochs")
        except ImportError:
            pass
    metrics = {}
    for ep in epoch_iter:
        loader.set_epoch(ep)
        for batch in loader:
            if mining == "batch_hard":
                pool = np.concatenate(
                    [batch["real_sample"], batch["si_sample"],
                     batch["leaked_sample"]], axis=1)
                variables, opt_state, metrics = train_step(
                    variables, opt_state, pool)
            else:
                x1, x2, y = _siamese_pairs(batch, pair_rng)
                variables, opt_state, metrics = train_step(
                    variables, opt_state, x1, x2, y)
            step += 1
            if step % cfg.get("save_every", 1000) == 0:
                _save_siamese(ckptr, cfg["outdir"], step, variables)
    _save_siamese(ckptr, cfg["outdir"], step, variables)
    return variables, metrics


def _save_siamese(ckptr, outdir, step, variables):
    path = os.path.join(outdir, "ckpts", f"model_{step:08d}")
    ckptr.save(path, {"model": jax.device_get(variables)}, force=True)
