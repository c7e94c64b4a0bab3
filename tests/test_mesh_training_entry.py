"""Loop-level multi-device coverage (VERDICT r3 item 7): the FULL training
entry (`train_gim_on_imgs.py` main) on the forced 8-device CPU mesh — host
loader -> shard_batch -> prefetch -> split step -> checkpoint -> resume ->
eval grid.  The step-level sharding-equivalence tests live in
tests/test_image_training.py; this covers the glue between them."""

import os
import sys

import jax
import numpy as np
import pytest


def _write_omniglot_ds(root, n_alpha=6, n_chars=4, per_class=10, img=16,
                       val_alpha=2, seed=0):
    # val must hold >= 8 classes: the in-loop eval batch is shrunk to a
    # multiple of the 8-device mesh and len(val) < 8 would round it to 0
    from PIL import Image

    rng = np.random.default_rng(seed)
    for a in range(n_alpha):
        split = "val" if a < val_alpha else "train"
        for c in range(n_chars):
            d = os.path.join(root, split, f"A{a}", f"c{c}")
            os.makedirs(d)
            base = rng.integers(40, 215, (img, img))
            for i in range(per_class):
                arr = np.clip(
                    base + rng.integers(-40, 40, (img, img)), 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{i:03d}.png"))


@pytest.mark.slow
def test_full_training_entry_on_mesh(tmp_path, monkeypatch, capfd):
    assert len(jax.devices()) == 8  # conftest forces the CPU host mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train_gim_on_imgs as cli

    root = str(tmp_path / "ds")
    _write_omniglot_ds(root)
    out = str(tmp_path / "exp")
    # 16 train classes x 10 examples -> 160 episodes -> 20 steps/epoch at B=8
    base_argv = [
        "train_gim_on_imgs.py", "--dataset_root", root, "-o", out,
        "--batch_size", "8", "--ds_n_examples_per_cls", "10",
        "--img_size", "16", "--style_dim", "32",
        "--m", "1", "--n", "2", "--k", "2",
        "--au_lr", "1e-4", "--im_lr", "1e-4",
        "--save_every", "50", "--eval_every", "61", "--save_imgs_every", "97",
        "--log_every", "20", "--log_enc_every", "67", "--num_workers", "0",
        "--compute_dtype", "float32", "--split_step", "always",
        "--device_data", "off",  # force host loader -> shard_batch -> prefetch
    ]
    monkeypatch.setattr(sys, "argv", base_argv + ["--n_epochs", "8"])
    cli.main()
    outtext = capfd.readouterr().out
    assert "using mesh" in outtext  # the dp mesh really was wired
    ckpts = os.path.join(out, "ckpts")
    # 120 steps -> saves at 50 and 100 (+ final at 119 with the epoch)
    assert os.path.isdir(os.path.join(ckpts, "model_00000050"))
    assert os.path.isdir(os.path.join(ckpts, "model_00000100"))

    # resume from a mid-run checkpoint (step 100, epoch 6) and run 4 more
    # epochs through the same sharded loop
    monkeypatch.setattr(
        sys, "argv",
        base_argv + ["--n_epochs", "12", "-r", "ckpts/model_00000100"],
    )
    cli.main()
    outtext = capfd.readouterr().out
    assert "Resuming training from iteration 100" in outtext
    steps = sorted(
        int(d.split("_")[1]) for d in os.listdir(ckpts) if d.startswith("model_")
    )
    assert steps[-1] >= 150  # continued well past the resume point

    # eval grid from the trained experiment dir (args.json round-trip)
    from optimalstrategiesagainstgenerativeattacks_tpu.eval.authentication import (
        CSV_COLS,
        eval_authentication_task,
        get_dataset,
    )

    ds = get_dataset(
        dataset_root=root, split="val", dataset_type="omniglot",
        example_cnt_per_class=3, img_channels=1, img_size=16, m=1, n=2, k=2,
    )
    csv_path = str(tmp_path / "grid.csv")
    df = eval_authentication_task(
        ds=ds, m=1, n=2, k=2, batch_size=4, num_workers=0,
        gim_exp_dir=out, csv_file_path=csv_path,
    )
    assert list(df.columns) == list(CSV_COLS)
    assert set(df["im_type"]) == {"gim", "replay", "rnd_src"}
    assert df["auc"].between(0, 1).all()
