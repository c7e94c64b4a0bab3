"""Batched authentication-game rollout and scoring.

Protocol parity with ``authentication_eval/authentication_score.py``
(score real vs si, generate fake from leaked, score fake vs si; accuracy =
0.5 * (acc_on_real + acc_on_fake), `comp_acc:31-42`; AUC over the
concatenated score vectors, `:94-96`) with a TPU-shaped execution plan:

  * **Shape-stable batching.** Every device call sees exactly
    ``batch_size`` episodes: the final partial batch is padded by
    wrapping the epoch around, and the padding's scores are dropped on the
    host.  One XLA program per model per grid — a remainder batch would
    otherwise trigger a fresh *remote* compile of the flagship
    authenticator (minutes on this platform).
  * **uint8 feeding.** Batches cross host->device as uint8 and are
    shifted to [-1, 1] by a tiny jitted kernel on device (4x less
    transfer volume than float32 through the axon tunnel); agents then
    operate on device-resident float arrays.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Tuple

import numpy as np


def write_results(file_path, acc, acc_on_fake, acc_on_real, print_to_stdout=False):
    s = (
        f"accuracy: {acc}\naccuracy on fake: {acc_on_fake}\n"
        f"accuracy on real: {acc_on_real}\n"
    )
    os.makedirs(os.path.dirname(file_path), exist_ok=True)
    with open(file_path, "w") as f:
        f.write(s)
    if print_to_stdout:
        print(s)


def comp_acc(pred_on_real: np.ndarray, pred_on_fake: np.ndarray):
    """(acc, acc_on_fake, acc_on_real) from 1-d prediction vectors."""
    pred_on_real = np.asarray(pred_on_real).reshape(-1)
    pred_on_fake = np.asarray(pred_on_fake).reshape(-1)
    assert pred_on_real.shape[0] == pred_on_fake.shape[0]
    acc_on_real = pred_on_real.astype(np.float64).mean()
    acc_on_fake = (pred_on_fake == 0).astype(np.float64).mean()
    acc = 0.5 * (acc_on_real + acc_on_fake)
    return float(acc), float(acc_on_fake), float(acc_on_real)


def real_quantile_threshold(score_real: np.ndarray, accept_frac: float) -> float:
    """Deployable calibration: the threshold that accepts ``accept_frac`` of
    the REAL scores (no attacker knowledge needed — an operator can compute
    it from enrollment data alone).

    Motivation (round-3 100k-step flagship run, docs/flag100k_hard/): late
    in training the authenticator's whole score distribution drifts across
    zero — ranking stays good (AUC 0.87-0.89) but the reference's fixed
    threshold-0 operating point (``agents.py:16-26``) degrades
    ``acc_on_real`` to 0.45. Re-anchoring the threshold to the real-score
    quantile restores the operating point without touching AUC.
    """
    score_real = np.asarray(score_real, np.float64).reshape(-1)
    return float(np.quantile(score_real, 1.0 - accept_frac))


def balanced_threshold(score_real: np.ndarray, score_fake: np.ndarray) -> float:
    """Oracle calibration (analysis only): the threshold maximising balanced
    accuracy 0.5*(TPR + TNR) over the pooled real/fake scores."""
    sr = np.sort(np.asarray(score_real, np.float64).reshape(-1))
    sf = np.sort(np.asarray(score_fake, np.float64).reshape(-1))
    cand = np.unique(np.concatenate([sr, sf]))
    # midpoints between consecutive candidates + outer sentinels
    th = np.concatenate([[cand[0] - 1.0], (cand[:-1] + cand[1:]) / 2.0,
                         [cand[-1] + 1.0]])
    # sort-based sweep, O(N log N): searchsorted(x, th, 'left') counts x < th,
    # so TPR = P(sr >= th) and TNR = P(sf < th) without the O(N^2) matrices.
    tpr = 1.0 - np.searchsorted(sr, th, side="left") / sr.size
    tnr = np.searchsorted(sf, th, side="left") / sf.size
    return float(th[np.argmax(0.5 * (tpr + tnr))])


def acc_at_threshold(score_real: np.ndarray, score_fake: np.ndarray, th: float):
    """(acc, acc_on_fake, acc_on_real) of the >= th operating point."""
    sr = np.asarray(score_real, np.float64).reshape(-1)
    sf = np.asarray(score_fake, np.float64).reshape(-1)
    return comp_acc((sr >= th).astype(np.int64), (sf >= th).astype(np.int64))


def _pad_to(arr: np.ndarray, size: int) -> np.ndarray:
    """Grow axis 0 to ``size`` by cyclic repetition of whole items."""
    if arr.shape[0] == size:
        return arr
    reps = -(-size // arr.shape[0])
    return np.concatenate([arr] * reps, axis=0)[:size]


@dataclass
class _GameTally:
    """Per-side (real/fake) score + prediction accumulator."""

    scores: List[np.ndarray] = field(default_factory=list)
    preds: List[np.ndarray] = field(default_factory=list)

    def add(self, score, pred, n_valid: int):
        self.scores.append(np.asarray(score).reshape(-1)[:n_valid])
        self.preds.append(np.asarray(pred).reshape(-1)[:n_valid])

    def cat(self) -> Tuple[np.ndarray, np.ndarray]:
        return np.concatenate(self.scores), np.concatenate(self.preds)


def _device_batches(
    ds, batch_size: int, num_workers: int, seed: int, max_iters: int
) -> Iterator[Tuple[Dict, int]]:
    """Yield (device-resident [-1,1] float batch, n_valid) at a fixed shape."""
    import jax

    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        EpisodicBatchLoader,
        normalize_uint8,
    )

    to_model_space = jax.jit(normalize_uint8)
    loader = EpisodicBatchLoader(
        ds, batch_size=batch_size, shuffle=True, drop_last=False,
        num_workers=num_workers, seed=seed,
    )
    for i, raw in enumerate(loader):
        if i >= max_iters:
            return
        n_valid = raw["real_sample"].shape[0]
        batch = {
            key: to_model_space(_pad_to(raw[key], batch_size))
            for key in ("real_sample", "leaked_sample", "si_sample")
        }
        yield batch, n_valid


def eval_authenticator_and_impersonator(
    ds,
    batch_size: int,
    authenticator,
    impersonator,
    num_workers: int = 0,
    dbg: bool = False,
    seed: int = 0,
    return_scores: bool = False,
):
    """Full-game rollout over the dataset -> (acc, acc_on_fake, acc_on_real, auc)
    [+ (score_real, score_fake) when ``return_scores``].

    Fast path: when the agents expose jitted ``device_fn``s (the GIM /
    baseline closures in ``eval/authentication.py`` do), scores accumulate
    as device arrays and the GIM attacker's fake never leaves the device —
    the whole grid pays ONE bulk fetch at the end instead of four tunnel
    round trips per batch (each ~0.25 s on the axon platform).
    """
    from sklearn.metrics import roc_auc_score

    max_iters = 1000 if dbg else len(ds)
    # OSGA_EVAL_NO_FASTPATH=1 forces the per-batch-fetch path (A/B timing)
    no_fast = os.environ.get("OSGA_EVAL_NO_FASTPATH", "") == "1"
    au_dev = None if no_fast else getattr(authenticator.au_model_func, "device_fn", None)
    im_dev = None if no_fast else getattr(impersonator.im_model_func, "device_fn", None)
    on_real, on_fake = _GameTally(), _GameTally()
    if au_dev is not None:
        import jax

        dev_real, dev_fake, valids = [], [], []
        for batch, n_valid in _device_batches(ds, batch_size, num_workers, seed, max_iters):
            real, si = batch["real_sample"], batch["si_sample"]
            n = real.shape[1]
            dev_real.append(au_dev(real, si))
            if im_dev is not None:
                fake = im_dev(batch["leaked_sample"], n)
            else:
                fake = impersonator.act(leaked_sample=batch["leaked_sample"], n=n)
            dev_fake.append(au_dev(fake, si))
            valids.append(n_valid)
        host_real, host_fake = jax.device_get((dev_real, dev_fake))  # one fetch
        th = authenticator.th
        for sr, sf, n_valid in zip(host_real, host_fake, valids):
            sr = np.asarray(sr, np.float32).reshape(-1)[:n_valid]
            sf = np.asarray(sf, np.float32).reshape(-1)[:n_valid]
            on_real.add(sr, (sr >= th).astype(np.int64), n_valid)
            on_fake.add(sf, (sf >= th).astype(np.int64), n_valid)
    else:
        for batch, n_valid in _device_batches(ds, batch_size, num_workers, seed, max_iters):
            real, si = batch["real_sample"], batch["si_sample"]
            n = real.shape[1]
            on_real.add(*authenticator.act(test_sample=real, si_sample=si), n_valid)
            fake = impersonator.act(leaked_sample=batch["leaked_sample"], n=n)
            on_fake.add(*authenticator.act(test_sample=fake, si_sample=si), n_valid)

    score_real, pred_real = on_real.cat()
    score_fake, pred_fake = on_fake.cat()
    acc, acc_on_fake, acc_on_real = comp_acc(pred_real, pred_fake)
    labels = np.concatenate([np.ones_like(score_real), np.zeros_like(score_fake)])
    auc = float(roc_auc_score(y_true=labels, y_score=np.concatenate([score_real, score_fake])))
    if return_scores:
        return acc, acc_on_fake, acc_on_real, auc, (score_real, score_fake)
    return acc, acc_on_fake, acc_on_real, auc


def eval_dis_on_multiple_im(
    ds, batch_size: int, authenticator, impersonator_dict: Dict, num_workers: int = 0,
):
    """Sweep one authenticator over several impersonators (:100-121)."""
    results = {}
    for im_key, im_agent in impersonator_dict.items():
        print(f"\nEvaluating on impersonator: {im_key}\n")
        acc, acc_on_fake, acc_on_real, auc = eval_authenticator_and_impersonator(
            ds=ds, batch_size=batch_size, authenticator=authenticator,
            impersonator=im_agent, num_workers=num_workers,
        )
        results[im_key] = {
            "acc": acc, "acc_on_fake": acc_on_fake, "acc_on_real": acc_on_real, "auc": auc,
        }
    return results
