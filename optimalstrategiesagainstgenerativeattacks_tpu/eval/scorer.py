"""Batched authentication-game rollout and scoring.

Parity with ``authentication_eval/authentication_score.py``: per batch,
score the real sample against the registration sample, generate the fake
from the leaked sample, score it too; accuracy = 0.5 * (acc_on_real +
acc_on_fake); AUC via sklearn on the concatenated score vectors.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

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


def eval_authenticator_and_impersonator(
    ds,
    batch_size: int,
    authenticator,
    impersonator,
    num_workers: int = 0,
    dbg: bool = False,
    seed: int = 0,
):
    """Full-game rollout over the dataset -> (acc, acc_on_fake, acc_on_real, auc).

    Batches arrive uint8 and are normalised to [-1, 1] before the agents.
    """
    from sklearn.metrics import roc_auc_score

    from optimalstrategiesagainstgenerativeattacks_tpu.data.episodic import (
        EpisodicBatchLoader,
    )

    loader = EpisodicBatchLoader(
        ds, batch_size=batch_size, shuffle=True, drop_last=False,
        num_workers=num_workers, seed=seed,
    )
    max_iters = 1000 if dbg else len(loader)

    out_on_real_list, out_on_fake_list = [], []
    pred_on_real_list, pred_on_fake_list = [], []
    for batch_idx, batch in enumerate(loader):
        if batch_idx >= max_iters:
            break
        real = batch["real_sample"].astype(np.float32) / 127.5 - 1.0
        leaked = batch["leaked_sample"].astype(np.float32) / 127.5 - 1.0
        si = batch["si_sample"].astype(np.float32) / 127.5 - 1.0
        n = real.shape[1]

        out_on_real, pred_on_real = authenticator.act(test_sample=real, si_sample=si)
        fake = impersonator.act(leaked_sample=leaked, n=n)
        out_on_fake, pred_on_fake = authenticator.act(test_sample=fake, si_sample=si)

        out_on_real_list.append(np.asarray(out_on_real).reshape(-1))
        out_on_fake_list.append(np.asarray(out_on_fake).reshape(-1))
        pred_on_real_list.append(np.asarray(pred_on_real).reshape(-1))
        pred_on_fake_list.append(np.asarray(pred_on_fake).reshape(-1))

    out_on_real = np.concatenate(out_on_real_list)
    out_on_fake = np.concatenate(out_on_fake_list)
    pred_on_real = np.concatenate(pred_on_real_list)
    pred_on_fake = np.concatenate(pred_on_fake_list)

    acc, acc_on_fake, acc_on_real = comp_acc(pred_on_real, pred_on_fake)
    y_true = np.concatenate([np.ones_like(out_on_real), np.zeros_like(out_on_fake)])
    y_score = np.concatenate([out_on_real, out_on_fake])
    auc = float(roc_auc_score(y_true=y_true, y_score=y_score))
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
