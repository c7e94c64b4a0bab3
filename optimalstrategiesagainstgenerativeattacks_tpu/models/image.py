"""Image GIM game models: encoders, decoders, impersonator, authenticator.

Capability parity with ``models/gim_img_models.py``, NHWC / TPU-first:

  * Episodic tensors are ``[B, S, H, W, C]``; the per-image encoders run on
    the flattened ``[B*S, H, W, C]`` batch so each step sees a handful of
    large conv batches rather than many small ones.
  * ``update_sn`` threads the spectral-norm power-iteration update through
    every SN conv (see ``nn/blocks.py``).
  * The impersonator draws its environment noise from the functional
    ``noise`` RNG stream.

Channel schedules and attention locations match the reference formulas
exactly (``gim_img_models.py:29-33, 71-76, 110-114, 174-180``).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from optimalstrategiesagainstgenerativeattacks_tpu.nn.blocks import (
    AdaResBlock2,
    AdaResBlockUp2,
    ImgAttention,
    InstanceNorm,
    MLP,
    ResBlockDown,
    ResBlockUp,
    SelfAttention,
)
from optimalstrategiesagainstgenerativeattacks_tpu.nn.init import kaiming_normal, zeros_init
from optimalstrategiesagainstgenerativeattacks_tpu.nn.stats import MeanStdFcStat
from optimalstrategiesagainstgenerativeattacks_tpu.ops.image_ops import (
    adaptive_max_pool,
    leaky_relu,
)

Dtype = Any


def _down_channel_schedule(img_size: int, img_channels: int, style_dim: int,
                           min_n_channels: int = 64) -> Tuple[int, list, int]:
    """(n_down_blocks, channel_sizes, att_loc) per ``gim_img_models.py:29-33``."""
    n_down = int(math.log2(img_size)) - 2
    min_c = int(max(min_n_channels, style_dim / (2 ** (n_down - 1))))
    channels = [img_channels] + [
        min(style_dim, int(min_c * (2 ** i))) for i in range(n_down)
    ]
    att_loc = int(math.ceil(n_down / 2))
    return n_down, channels, att_loc


class Encoder(nn.Module):
    """Spectral-norm ResBlockDown stack with midpoint self-attention
    (``Encoder:19-57``): per-image -> [B, style_dim] embedding via global
    max pool, optional output LeakyReLU."""

    img_size: int
    img_channels: int
    style_dim: int = 512
    min_n_channels: int = 64
    use_out_lrelu: bool = True
    dtype: Optional[Dtype] = None
    # rematerialise each block in the backward pass: stored activations
    # shrink to one block-input tensor per block (instead of every
    # intra-block conv/stat intermediate) at the cost of one extra block
    # forward during backprop.  HBM headroom for the big-image games —
    # the 64x64x3 R1 config's au phase differentiates a 1920-image encoder
    # batch twice (grad-of-grad) and sits at the 16 GB edge (round 3).
    remat: bool = False
    # with remat on, rematerialise only the first `remat_depth` blocks
    # (-1 = all).  The early, large-spatial blocks hold most of the stored
    # activations AND most of the recompute FLOPs — the depth knob picks a
    # point on that memory/speed line.
    remat_depth: int = -1

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        n_down, channels, att_loc = _down_channel_schedule(
            self.img_size, self.img_channels, self.style_dim, self.min_n_channels
        )
        # argnum 0 is the module instance; 2 is the static update_sn bool
        AttR = nn.remat(SelfAttention, static_argnums=(2,))
        DownR = nn.remat(ResBlockDown, static_argnums=(2,))

        def on(i):
            return self.remat and (self.remat_depth < 0 or i < self.remat_depth)

        for i in range(n_down):
            if i == att_loc:
                x = (AttR if on(i) else SelfAttention)(
                    dtype=self.dtype, name="att")(x, update_sn)
            x = (DownR if on(i) else ResBlockDown)(
                channels[i + 1], dtype=self.dtype, name=f"down_{i}")(
                x, update_sn
            )
        x = adaptive_max_pool(x)
        if self.use_out_lrelu:
            x = leaky_relu(x)
        return x


class EncoderPair(nn.Module):
    """The src/env encoder twins as ONE vmapped module with stacked params.

    Every GIM model owns two architecturally-identical encoders applied to
    the same images (``gim_img_models.py:431-432, 456-457``).  Vmapping
    over a stacked parameter axis (a) emits the encoder body once instead
    of twice (half the HLO -> half the compile cost) and (b) presents XLA
    with double-width batched convolutions.  Identical math and parameter
    count to two separate encoders.

    ``unroll_pair=True`` keeps the SAME stacked parameter layout (init and
    checkpoints are unchanged) but applies the plain encoder body twice on
    sliced variables instead of once under vmap.  Motivation (round-3 vox
    profile): the vmapped-kernel convs lower to group-2 convolutions whose
    activations carry a minor ``(2, C)`` tile — at C<=64 that wastes half
    the 128 MXU lanes on every conv AND elementwise op (378 of 544 ms/step
    at img64x3 was spent in pair-dim kernels).  Unrolling doubles the HLO
    body (slower remote compile) but gives each conv the full tiling.
    """

    img_size: int
    img_channels: int
    style_dim: int = 512
    min_n_channels: int = 64
    use_out_lrelu: bool = True
    dtype: Optional[Dtype] = None
    unroll_pair: bool = False
    remat: bool = False
    remat_depth: int = -1

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        """[B', H, W, C] -> (src [B', style], env [B', style])."""
        VEncoder = nn.vmap(
            Encoder,
            variable_axes={"params": 0, "spectral": 0, "sigmas": 0},
            split_rngs={"params": True},
            in_axes=None,
            out_axes=0,
            axis_size=2,
        )
        enc_mod = VEncoder(
            img_size=self.img_size,
            img_channels=self.img_channels,
            style_dim=self.style_dim,
            min_n_channels=self.min_n_channels,
            use_out_lrelu=self.use_out_lrelu,
            dtype=self.dtype,
            remat=self.remat,
            remat_depth=self.remat_depth,
            name="enc",
        )
        if self.unroll_pair and not self.is_initializing():
            if update_sn:
                raise ValueError(
                    "unroll_pair supports the injected-sigmas flow only; "
                    "use update_sn=False (train/eval steps) or the vmapped "
                    "pair for direct update_sn use."
                )
            stacked = enc_mod.variables  # {'params': ..., 'spectral': ..., ('sigmas': ...)}
            inner = Encoder(
                img_size=self.img_size,
                img_channels=self.img_channels,
                style_dim=self.style_dim,
                min_n_channels=self.min_n_channels,
                use_out_lrelu=self.use_out_lrelu,
                dtype=self.dtype,
                remat=self.remat,
                remat_depth=self.remat_depth,
            )
            outs = []
            for i in range(2):
                vars_i = {
                    col: jax.tree.map(lambda v: v[i], tree)
                    for col, tree in stacked.items()
                }
                outs.append(inner.apply(vars_i, x, update_sn))
            return outs[0], outs[1]
        out = enc_mod(x, update_sn)  # [2, B', style]
        return out[0], out[1]


class EnvDecoder(nn.Module):
    """ResBlockUp stack from [B, style] to an image (``EnvDecoder:63-95``)."""

    img_size: int
    img_channels: int
    style_dim: int = 512
    min_n_channels: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        n_up = int(math.log2(self.img_size))
        channels = list(
            reversed(
                [min(self.style_dim, int(self.min_n_channels * (2 ** i))) for i in range(n_up)]
            )
        ) + [self.img_channels]
        att_loc = int(math.ceil(n_up / 2))

        x = x[:, None, None, :]  # [B, 1, 1, style]
        for i in range(n_up):
            if i == att_loc:
                x = SelfAttention(dtype=self.dtype, name="att")(x, update_sn)
            x = ResBlockUp(channels[i + 1], dtype=self.dtype, name=f"up_{i}")(x, update_sn)
        return x


class Img2ImgDownModule(nn.Module):
    """Down stage of the image-to-image net: ResBlockDown (9x9 first conv)
    + InstanceNorm per stage, midpoint attention (``Img2ImgDownModule:101-139``)."""

    img_size: int
    img_channels: int
    style_dim: int = 512
    min_n_channels: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        n_down, channels, att_loc = _down_channel_schedule(
            self.img_size, self.img_channels, self.style_dim, self.min_n_channels
        )
        for i in range(n_down):
            if i == att_loc:
                x = SelfAttention(dtype=self.dtype, name="att")(x, update_sn)
            if i == 0:
                x = ResBlockDown(
                    channels[i + 1], conv_size=9, padding=4, dtype=self.dtype, name=f"down_{i}"
                )(x, update_sn)
            else:
                x = ResBlockDown(channels[i + 1], dtype=self.dtype, name=f"down_{i}")(
                    x, update_sn
                )
            x = InstanceNorm(name=f"in_{i}")(x)
        return x


class _AdaResScanBody(nn.Module):
    """Scan body around AdaResBlock2 (returns a (carry, out) pair)."""

    channels: int
    style_dim: int
    dtype: Optional[Dtype] = None
    im2col_convs: bool = False

    @nn.compact
    def __call__(self, x, style, update_sn: bool = False):
        y = AdaResBlock2(
            channels=self.channels, style_dim=self.style_dim, dtype=self.dtype,
            im2col_convs=self.im2col_convs, name="block",
        )(x, style, update_sn)
        return y, None


class Img2ImgAdaInResModule(nn.Module):
    """Stack of AdaIN residual blocks (``Img2ImgAdaInResModule:142-162``).

    The blocks are shape-identical, so by default they run under
    ``nn.scan`` with stacked parameters: the block body is traced and
    compiled ONCE instead of ``n_blocks`` times (a large cut of the
    flagship train-step compile time), with identical math and parameter
    count.  ``scan_blocks=False`` restores the unrolled layout.
    """

    style_dim: int = 512
    n_blocks: int = 5
    dtype: Optional[Dtype] = None
    scan_blocks: bool = True
    im2col_convs: bool = False
    # lax.scan unroll factor: >1 repeats the (single traced) body in the
    # loop HLO, letting XLA pipeline across consecutive res blocks at the
    # cost of a bigger program. Distinct from scan_blocks=False (which
    # traces n_blocks separate modules and OOMed the remote compile
    # server at flagship scale, round 2).
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, x, style, update_sn: bool = False):
        if self.scan_blocks:
            scan = nn.scan(
                _AdaResScanBody,
                variable_axes={"params": 0, "spectral": 0, "sigmas": 0},
                split_rngs={"params": True},
                length=self.n_blocks,
                in_axes=(nn.broadcast, nn.broadcast),
                unroll=self.scan_unroll,
            )
            x, _ = scan(
                channels=self.style_dim, style_dim=self.style_dim, dtype=self.dtype,
                im2col_convs=self.im2col_convs, name="res_scan",
            )(x, style, update_sn)
            return x
        for i in range(self.n_blocks):
            x = AdaResBlock2(
                channels=self.style_dim, style_dim=self.style_dim, dtype=self.dtype,
                im2col_convs=self.im2col_convs, name=f"res_{i}",
            )(x, style, update_sn)
        return x


class Img2ImgAdaInUpModule(nn.Module):
    """AdaIN up stage with 9x9 final conv and tanh (``Img2ImgAdaInUpModule:165-215``)."""

    img_size: int
    img_channels: int
    style_dim: int = 512
    min_n_channels: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, style, update_sn: bool = False):
        n_up = int(math.log2(self.img_size)) - 2
        min_c = int(max(self.min_n_channels, self.style_dim / (2 ** (n_up - 1))))
        channels = list(
            reversed([min(self.style_dim, int(min_c * (2 ** i))) for i in range(n_up)])
        ) + [self.img_channels]
        att_loc = int(math.ceil(n_up / 2))

        for i in range(n_up):
            if i == att_loc:
                x = SelfAttention(dtype=self.dtype, name="att")(x, update_sn)
            if i == n_up - 1:
                x = AdaResBlockUp2(
                    in_channels=channels[i],
                    out_channels=channels[i + 1],
                    conv_size=9,
                    padding=4,
                    dtype=self.dtype,
                    name=f"up_{i}",
                )(x, style, update_sn)
            else:
                x = AdaResBlockUp2(
                    in_channels=channels[i],
                    out_channels=channels[i + 1],
                    dtype=self.dtype,
                    name=f"up_{i}",
                )(x, style, update_sn)
        return jnp.tanh(x)


class AdaInImage2Image(nn.Module):
    """Down -> AdaIN-res -> AdaIN-up image translator (``AdaInImage2Image:218-257``)."""

    img_size: int
    in_channels: int
    out_channels: int
    style_dim: int
    n_adain_res_blocks: int = 5
    min_n_channels: int = 64
    dtype: Optional[Dtype] = None
    scan_adain_blocks: bool = True
    adain_im2col: bool = False
    adain_scan_unroll: int = 1

    def setup(self):
        self.down_block = Img2ImgDownModule(
            img_size=self.img_size,
            img_channels=self.in_channels,
            style_dim=self.style_dim,
            min_n_channels=self.min_n_channels,
            dtype=self.dtype,
        )
        self.adain_res_block = Img2ImgAdaInResModule(
            style_dim=self.style_dim, n_blocks=self.n_adain_res_blocks,
            dtype=self.dtype, scan_blocks=self.scan_adain_blocks,
            im2col_convs=self.adain_im2col,
            scan_unroll=self.adain_scan_unroll,
        )
        self.adain_up_block = Img2ImgAdaInUpModule(
            img_size=self.img_size,
            img_channels=self.out_channels,
            style_dim=self.style_dim,
            min_n_channels=self.min_n_channels,
            dtype=self.dtype,
        )

    def __call__(self, x, style, update_sn: bool = False):
        x = self.down_block(x, update_sn)
        x = self.adain_res_block(x, style, update_sn)
        return self.adain_up_block(x, style, update_sn)


class GIMFaceDis(nn.Module):
    """Set-pooling discriminator head (``GIMFaceDis:263-299``).

    src branches pooled by mean, env branches by the configured stat
    module; concat -> MLP((2*(n_stats*env+src), env+src, 2*(env+src), 1)),
    kaiming init.
    """

    src_dim: int
    env_dim: int
    stat: nn.Module
    dtype: Optional[Dtype] = None

    def setup(self):
        s, e = self.src_dim, self.env_dim
        self.mlp = MLP(
            (2 * (self.stat.n_stats * e + s), e + s, 2 * (e + s), 1),
            kernel_init=kaiming_normal(0.2),
            bias_init=zeros_init,
            dtype=self.dtype,
        )

    def __call__(self, test_src, test_env, si_src, si_env):
        """All inputs [B, S, dim]; returns [B, 1] logit."""
        test_src_mean = test_src.mean(axis=1)
        si_src_mean = si_src.mean(axis=1)
        test_env_stat = self.stat(test_env)
        si_env_stat = self.stat(si_env)
        x = jnp.concatenate(
            [test_src_mean, si_src_mean, test_env_stat, si_env_stat], axis=-1
        )
        return self.mlp(x)


def _encode_sample(encoder, sample, update_sn):
    """[B, S, H, W, C] -> [B, S, style] via a single flattened encoder pass."""
    b, s = sample.shape[0], sample.shape[1]
    flat = sample.reshape(b * s, *sample.shape[2:])
    enc = encoder(flat, update_sn)
    return enc.reshape(b, s, *enc.shape[1:])


class GIMFaceAuthenticator(nn.Module):
    """Vmapped src/env encoder pair + set discriminator
    (``GIMFaceAuthenticator:304-340``)."""

    encoders: nn.Module  # EncoderPair
    dis: nn.Module

    def __call__(self, test_sample, si_sample, update_sn: bool = False):
        b, n = test_sample.shape[0], test_sample.shape[1]
        k = si_sample.shape[1]
        img_shape = test_sample.shape[2:]
        flat = jnp.concatenate(
            [
                test_sample.reshape(b * n, *img_shape),
                si_sample.reshape(b * k, *img_shape),
            ],
            axis=0,
        )
        src, env = self.encoders(flat, update_sn)
        test_src = src[: b * n].reshape(b, n, -1)
        si_src = src[b * n :].reshape(b, k, -1)
        test_env = env[: b * n].reshape(b, n, -1)
        si_env = env[b * n :].reshape(b, k, -1)
        return self.dis(
            test_src=test_src, test_env=test_env, si_src=si_src, si_env=si_env
        )

    def src_encode_sample(self, sample, update_sn: bool = False):
        b, s = sample.shape[0], sample.shape[1]
        src, _ = self.encoders(sample.reshape(b * s, *sample.shape[2:]), update_sn)
        return src.reshape(b, s, -1)

    def env_encode_sample(self, sample, update_sn: bool = False):
        b, s = sample.shape[0], sample.shape[1]
        _, env = self.encoders(sample.reshape(b * s, *sample.shape[2:]), update_sn)
        return env.reshape(b, s, -1)

    def encode_flat(self, flat_imgs, update_sn: bool = False):
        """One fused pass of BOTH encoders over a flattened image batch.

        TPU-first: the training step concatenates si/real/fake into a single
        [sum(B*S), H, W, C] batch so the (vmapped) encoder pair traces once
        per step with a large batch (one SN power-iteration per step,
        MXU-friendly batch sizes) instead of the reference's six small
        passes (``gim_img_trainer.py:104-111``).
        """
        return self.encoders(flat_imgs, update_sn)

    def discriminate(self, test_src, test_env, si_src, si_env):
        return self.dis(
            test_src=test_src, test_env=test_env, si_src=si_src, si_env=si_env
        )


class GIMFaceImpersonator(nn.Module):
    """Conditional generator (``GIMFaceImpersonator:346-423``).

    forward([B, m, H, W, C], n) ->
      1. src/env = mean_m(src/env_encoder(leaked))
      2. w = env_noise_mapper(z~N(0,I)); optionally mean-centred over n
      3. env_img = env_decoder(env + w), channel-concat with broadcast leaked img
      4. fake = img2img(env_img, style=src); optional ImgAttention blend.

    When ``use_img_att`` is False the ``img_att`` module is never called and
    therefore owns no parameters (the reference instantiates it anyway but
    it receives no gradient; behaviourally identical).
    """

    encoders: nn.Module  # EncoderPair
    env_decoder: nn.Module
    img2img: nn.Module
    env_noise_mapper: nn.Module
    style_dim: int
    img_channels: int
    use_img_att: bool = False
    dtype: Optional[Dtype] = None
    # feed the img2img input as the (env_img, leaked) channel pair instead
    # of their concatenation: the entry convs consume the pair with sliced
    # kernels (exact algebra, identical params — see nn.blocks.SNConv), and
    # XLA drops the leaked channels' input-gradient conv, which at 2C
    # output channels wastes nearly the whole MXU (4.5 ms/step flagship)
    split_gen_input: bool = True

    def setup(self):
        self.img_att = ImgAttention(img1_channels=self.img_channels, dtype=self.dtype)

    def __call__(self, leaked_sample, n: int, remove_noise_mean: bool = True,
                 update_sn: bool = False, z: Optional[jnp.ndarray] = None):
        batch_size, m = leaked_sample.shape[0], leaked_sample.shape[1]
        h, w_, c = leaked_sample.shape[2:]
        # broadcast first leaked image to n (reference :367); cast to the
        # compute dtype HERE so the channel-concat with the (bf16) env
        # decoder output below stays bf16 — an f32 participant promotes
        # the concat and forces a separate f32->bf16 relayout of the
        # [B*n, H, W, 2C] tensor whose tiny channel dim tiles at T(2,128)
        # (profiled at 4.5 ms/step flagship, round 3). The first img2img
        # conv casts its input to this dtype anyway: exact same math.
        expanded_img = jnp.broadcast_to(
            leaked_sample[:, 0:1], (batch_size, n, h, w_, c)
        )
        if self.dtype is not None:
            expanded_img = expanded_img.astype(self.dtype)

        src_e, env_e = self.encoders(
            leaked_sample.reshape(batch_size * m, h, w_, c), update_sn
        )
        src = src_e.reshape(batch_size, m, -1).mean(axis=1)
        env = env_e.reshape(batch_size, m, -1).mean(axis=1)

        if z is None:
            z = jax.random.normal(
                self.make_rng("noise"), (batch_size, n, self.style_dim),
                jnp.float32 if self.dtype is None else self.dtype,
            )
        w = self.env_noise_mapper(z)
        if remove_noise_mean:
            w = w - w.mean(axis=1, keepdims=True)
        noisy_env = env[:, None, :] + w  # [B, n, style]

        env_img = self.env_decoder(
            noisy_env.reshape(batch_size * n, self.style_dim), update_sn
        )
        env_img = env_img.reshape(batch_size, n, *env_img.shape[1:])
        if self.split_gen_input:
            env_img = (env_img, expanded_img)  # virtual channel concat
        else:
            env_img = jnp.concatenate([env_img, expanded_img], axis=-1)

        x = self.generate_img(env_img=env_img, src=src, update_sn=update_sn)

        if self.use_img_att:
            x_flat = self.img_att(
                expanded_img.reshape(batch_size * n, h, w_, c),
                x.reshape(batch_size * n, *x.shape[2:]),
                update_sn,
            )
            x = x_flat.reshape(batch_size, n, *x_flat.shape[1:])
        return x

    def generate_img(self, env_img, src, update_sn: bool = False):
        """[B, n, H, W, 2C] (or a channel-part tuple), [B, style] -> [B, n, H, W, C]."""
        parts = env_img if isinstance(env_img, tuple) else (env_img,)
        batch_size, n = parts[0].shape[0], parts[0].shape[1]
        style = jnp.broadcast_to(
            src[:, None, :], (batch_size, n, self.style_dim)
        ).reshape(batch_size * n, self.style_dim)
        flat = tuple(p.reshape(batch_size * n, *p.shape[2:]) for p in parts)
        gen = self.img2img(flat if len(flat) > 1 else flat[0], style, update_sn)
        return gen.reshape(batch_size, n, *gen.shape[1:])


def get_im(
    img_size: int,
    img_channels: int,
    style_dim: int,
    use_img_att: bool = False,
    num_env_noise_layers: int = 4,
    dtype: Optional[Dtype] = None,
    scan_adain_blocks: bool = True,
    adain_im2col: bool = False,
    unroll_encoder_pair: bool = False,
    adain_scan_unroll: int = 1,
    split_gen_input: bool = True,
    remat_encoders: bool = False,
    remat_depth: int = -1,
) -> GIMFaceImpersonator:
    """Factory matching ``gim_img_models.get_im:429-449``."""
    encoders = EncoderPair(
        img_size=img_size, img_channels=img_channels, style_dim=style_dim, dtype=dtype,
        unroll_pair=unroll_encoder_pair, remat=remat_encoders,
        remat_depth=remat_depth,
    )
    decoder = EnvDecoder(
        img_size=img_size, img_channels=img_channels, style_dim=style_dim, dtype=dtype
    )
    img2img = AdaInImage2Image(
        img_size=img_size,
        in_channels=2 * img_channels,
        out_channels=img_channels,
        style_dim=style_dim,
        dtype=dtype,
        scan_adain_blocks=scan_adain_blocks,
        adain_im2col=adain_im2col,
        adain_scan_unroll=adain_scan_unroll,
    )
    env_noise_mapper = MLP(
        [style_dim for _ in range(num_env_noise_layers + 1)], dtype=dtype
    )
    return GIMFaceImpersonator(
        encoders=encoders,
        env_decoder=decoder,
        img2img=img2img,
        env_noise_mapper=env_noise_mapper,
        style_dim=style_dim,
        img_channels=img_channels,
        use_img_att=use_img_att,
        dtype=dtype,
        split_gen_input=split_gen_input,
    )


def get_au(
    img_size: int, img_channels: int, style_dim: int, dtype: Optional[Dtype] = None,
    unroll_encoder_pair: bool = False,
    remat_encoders: bool = False,
    remat_depth: int = -1,
) -> GIMFaceAuthenticator:
    """Factory matching ``gim_img_models.get_au:452-463``."""
    stat = MeanStdFcStat(
        style_dim=style_dim,
        fc_n_stats=2,
        fc_hidden_layers=(style_dim * 2, style_dim * 3, style_dim * 2),
        dtype=dtype,
    )
    dis = GIMFaceDis(src_dim=style_dim, env_dim=style_dim, stat=stat, dtype=dtype)
    encoders = EncoderPair(
        img_size=img_size, img_channels=img_channels, style_dim=style_dim, dtype=dtype,
        unroll_pair=unroll_encoder_pair, remat=remat_encoders,
        remat_depth=remat_depth,
    )
    return GIMFaceAuthenticator(encoders=encoders, dis=dis)
