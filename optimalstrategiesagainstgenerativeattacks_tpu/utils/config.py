"""Config system: typed dataclass configs with an ``args.json`` round-trip.

The reference snapshots argparse namespaces to ``<outdir>/args.json`` at
launch (``training/utils.py:142-157``) and reloads them at eval time to
rebuild the exact model (``eval_gim_on_authentication.py:182-192``).  That
round-trip is part of the public contract, so configs here serialise to the
same flat-JSON shape with the same key names; the back-compat shim mapping
``target_img_size`` -> ``img_size`` is honoured on load.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


def save_args(args, outdir: str) -> str:
    """Snapshot a config (dataclass, dict, or argparse namespace) to args.json."""
    os.makedirs(outdir, exist_ok=True)
    json_path = os.path.join(outdir, "args.json")
    if dataclasses.is_dataclass(args) and not isinstance(args, type):
        payload = dataclasses.asdict(args)
    elif isinstance(args, dict):
        payload = args
    else:
        payload = dict(args.__dict__)
    with open(json_path, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    return json_path


def load_args(outdir: str) -> dict:
    """Load the args.json snapshot; applies the target_img_size back-compat shim."""
    json_path = os.path.join(outdir, "args.json")
    with open(json_path, "r") as f:
        args_dict = json.load(f)
    if "img_size" not in args_dict and "target_img_size" in args_dict:
        args_dict["img_size"] = args_dict["target_img_size"]
    return args_dict


def _filter_fields(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass
class GaussianGameConfig:
    """Hyperparameters of the synthetic Gaussian GIM game.

    Defaults mirror the reference CLI (``train_gim_on_gaussians.py:53-89``).
    """

    outdir: str = "./gim_gaussians_outdir/"
    resume_from_ckpt: Optional[str] = None
    pretrained: Optional[str] = None
    n_iters: int = 500_000
    batch_size: int = 4096
    m: int = 1
    n: int = 10
    k: int = 10
    prior_sigma: float = 10.0
    src_sigma: float = 1.0
    src_dim: int = 1
    au_lr: float = 1e-4
    im_lr: float = 1e-4
    reg_param: float = 0.0
    remove_noise_mean: bool = True
    save_every: int = 100_000
    eval_every: int = 1000
    save_stats_every: int = 100
    seed: int = 1
    # TPU-native extras
    log_every: int = 100          # device->host metric sync cadence
    compute_dtype: str = "float32"
    au_stat: str = "mean_std"     # 'mean_std' (reference) | 'mean_std_fc'
    au_hidden_scale: int = 1      # widens the dis head (reference = 1)

    @classmethod
    def from_dict(cls, d: dict) -> "GaussianGameConfig":
        return cls(**_filter_fields(cls, d))


@dataclass
class ImageGameConfig:
    """Hyperparameters of the image GIM game (Omniglot / VoxCeleb2).

    Defaults are the Omniglot paper hparams, mirroring the reference CLI
    (``train_gim_on_imgs.py:107-162``).  VoxCeleb2 paper hparams per the
    reference help text: img 64x64x3, au_lr=1e-4, im_lr=1e-4,
    env_noise_mapping_lr=1e-6, reg_param=10.
    """

    outdir: str = "./gim_imgs_outdir/"
    dataset_root: str = ""
    dataset_type: str = "omniglot"  # omniglot | voxceleb2
    ckpt_dir_name: str = "ckpts"
    resume_from_ckpt: Optional[str] = None
    pretrained: Optional[str] = None
    n_epochs: int = 100_000
    batch_size: int = 128
    num_workers: int = 4
    ds_n_examples_per_cls: int = 100
    m: int = 1
    n: int = 5
    k: int = 5
    img_channels: int = 1
    img_size: int = 32
    style_dim: int = 512
    num_env_noise_layers: int = 4
    au_lr: float = 1e-6
    im_lr: float = 1e-5
    beta1: float = 0.0
    beta2: float = 0.99
    env_noise_mapping_lr: float = 1e-7
    lr_gamma: float = 0.3
    milestones: List[int] = field(default_factory=list)
    reg_param: float = 0.0
    remove_noise_mean: bool = True
    use_img_att: bool = False
    save_every: int = 10_000
    eval_every: int = 500
    save_imgs_every: int = 500
    n_au_steps: int = 1
    dbg: bool = False
    seed: int = 1
    # TPU-native extras
    log_every: int = 100          # tb_log_every in the reference loop
    log_enc_every: int = 500      # tb_log_enc_every
    compute_dtype: str = "bfloat16"
    prefetch_depth: int = 2
    # device-resident episodic sampling (data/device_sampler.py): stage the
    # whole uniform-count dataset into HBM once and assemble every batch
    # with a jitted on-device gather — zero image bytes cross the host link
    # per step. 'auto' uses it single-device whenever the dataset has a
    # uniform stacked cache; 'on' requires it; 'off' keeps the host loader.
    device_data: str = "auto"
    # nn.scan over the 5 AdaIN res blocks: one traced body (small HLO, fast
    # remote compile). False unrolls them — bigger program, lets XLA
    # pipeline across blocks
    scan_adain_blocks: bool = True
    # lower the res-stage 3x3 convs as im2col dense matmuls (the 4x4x512
    # maps underfill lax.conv's sublane tiling); identical params/ckpts
    adain_im2col: bool = False
    # lax.scan unroll factor for the AdaIN res stack (>1 repeats the single
    # traced body in the loop HLO so XLA can pipeline across blocks);
    # exact identity (tests), bigger program
    adain_scan_unroll: int = 1
    # feed the img2img entry convs the (env_img, leaked) channel pair
    # instead of their concatenation (exact algebra on sliced kernels,
    # identical params/ckpts): XLA drops the leaked channels' MXU-hostile
    # input-gradient conv. See models.image.GIMFaceImpersonator
    split_gen_input: bool = True
    # apply the src/env encoder twins as two full-width passes over sliced
    # stacked params instead of one vmapped (group-2 conv) pass; identical
    # params/ckpts, bigger HLO. Default ON: measured on-chip (round 3)
    # 160.5 -> 149.65 ms/step flagship and 512.5 -> 477.7 ms/step vox —
    # the vmapped group-2 convs carry a (2, C) minor tile that wastes MXU
    # lanes at small C. See models/image.py EncoderPair
    unroll_encoder_pair: bool = True
    # 'auto': monolithic jitted step, falling back to the two-phase split
    # step if the compile server rejects the large program; 'always'/'never'
    split_step: str = "auto"
    # write a jax.profiler trace of steps [profile_start, profile_start+5)
    # under this dir (tensorboard-profile viewable); None disables
    profile_dir: Optional[str] = None
    profile_start: int = 10
    # hyperparameter-inject constant LRs into optimizer state (HLO becomes
    # LR-agnostic -> compile-cache hits across LR choices)
    inject_lr: bool = True
    # optax.flatten the Adam transforms: moments live as ONE flat vector per
    # player/param-group. Measured round 3 and REJECTED: 179.2 vs 161.8
    # ms/step at flagship (the ravel/unravel copies cost more than the
    # per-leaf kernels they replace). Also changes the opt-state checkpoint
    # layout. Kept as a knob for the record.
    flatten_opt: bool = False
    # run the spectral-norm power-iteration matvecs in the compute dtype
    # (halves the kernel-group HBM read in bf16 games); off by default:
    # measured a wash in isolation (161.0 vs 161.8 ms/step flagship, round 3)
    bf16_spectral: bool = False
    # rematerialise the encoder blocks in backward passes (identical math;
    # stored activations shrink to one tensor per block at the cost of one
    # extra block forward in backprop).  Round-4 on-chip A/B at the tracked
    # vox config (64x64x3, B128, reg 10; temp GB by XLA memory_analysis,
    # ms/step on the chip):
    #   no-remat, full batch:   au 15.12 GB (runtime OOM)   466.9 ms (r3)
    #   remat_depth=2:          au 14.57 GB (still OOM)        —    (r3)
    #   full remat:             au 11.70 GB                 520.9 ms
    #   au_microbatch=2:        au  8.71 / im 8.30 GB       448.8 ms
    #   au_microbatch=8:        au  2.48 GB                 408.9 ms
    #   au_microbatch=16:       au  1.47 GB                 398.9 ms  <- best
    #   au_microbatch=32:       au  1.18 GB                 478.7 ms  (knee)
    # Gradient accumulation both out-memories AND out-runs remat (its
    # chunks are sequential anyway on one chip; remat pays ~11% recompute,
    # and the smaller R1 grad-of-grad working set schedules far better),
    # so 'auto' now resolves OFF and the big-image HBM policy is
    # au_microbatch (see resolved_hbm_policy) — remat re-engages
    # automatically only when microbatching cannot divide the batch.
    # 'on'/'off' force it.
    remat_encoders: str = "auto"
    # with remat on, rematerialise only the first N encoder blocks
    # (-1 = all).  Depth 2 measured insufficient at the vox config (see
    # the ledger above); kept for other geometries.
    remat_depth: int = -1
    # split the authenticator update's batch into this many sequential
    # chunks (lax.scan: full fwd+bwd per chunk, gradients accumulated, one
    # optimizer step). Exact semantics — chunk-mean averaging equals the
    # full-batch mean for equal chunks; activation memory scales 1/c at
    # algorithmic FLOPs, unlike encoder remat which recomputes forwards.
    # Must divide batch_size.  0 = AUTO (resolved_hbm_policy): chunking is
    # a measured WIN on both tracked configs, not just an OOM guard — the
    # smaller working set schedules better.  img >= 64: chunks >= 8
    # episodes, cap c=16 (398.9 ms vs remat's 520.9 at the vox config);
    # img < 64 at batch >= 64: chunks >= 16 episodes, cap c=8 (flagship
    # 145.0 ms vs 148.8 unchunked, knee at c=16: 147.5); else 1.
    au_microbatch: int = 0
    # stack same-(shape,dtype) param leaves before the Adam elementwise ops
    # (one kernel per shape group instead of per leaf; singleton groups
    # pass through copy-free). Exact semantics; changes the opt-state
    # checkpoint layout. See ops/packing.py
    stack_opt: bool = False

    def resolved_hbm_policy(self) -> tuple:
        """(remat_on: bool, au_microbatch: int) after 'auto' resolution.

        The round-4 on-chip sweep (see the ``remat_encoders`` field
        comment) made gradient accumulation the default big-image HBM
        policy: at img_size >= 64, ``au_microbatch='auto'`` resolves to
        the largest divisor of batch_size keeping chunks >= 8 episodes,
        capped at 16 — the measured optimum (398.9 vs remat's 520.9
        ms/step at the vox config, au_phase temp 1.47 vs 11.7 GB).  Remat
        stays as the automatic fallback when the batch cannot be chunked,
        and can be forced with ``remat_encoders='on'``.
        """
        mb = self.au_microbatch
        if mb == 0:
            mb = 1
            if self.img_size >= 64:
                # big-image R1 games: knee at 8-episode chunks (c=16@B128:
                # 398.9 ms vs 408.9@c8, 478.7@c32)
                min_chunk, cap = 8, 16
            elif self.batch_size >= 64:
                # small images: knee at 16-32-episode chunks (c=4/c=8@B128:
                # 145.0 ms vs 148.8 unchunked, 147.5@c16); engage only at
                # batch sizes near the measured regime
                min_chunk, cap = 16, 8
            else:
                min_chunk, cap = self.batch_size + 1, 1  # no chunking
            target = min(cap, max(1, self.batch_size // min_chunk))
            for c in range(target, 0, -1):
                if self.batch_size % c == 0:
                    mb = c
                    break
        if self.remat_encoders == "on":
            remat = True
        elif self.remat_encoders == "off":
            remat = False
        else:  # 'auto'
            remat = self.img_size >= 64 and mb == 1
        return remat, mb

    @classmethod
    def from_dict(cls, d: dict) -> "ImageGameConfig":
        if "img_size" not in d and "target_img_size" in d:
            d = dict(d)
            d["img_size"] = d["target_img_size"]
        return cls(**_filter_fields(cls, d))
