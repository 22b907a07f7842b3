"""Fre-GAN vocoder, TPU-native.

Parity with `/root/reference/models/vocoder/fregan/` (generator.py:79-209,
discriminator.py:13-302, dwt.py): a HiFi-GAN-style generator with top-k=4
mel-conditioning levels and a nearest-upsample residual output pyramid, plus
ResWise multi-period / multi-scale discriminators that inject Haar-DWT
downsampled views of the waveform. Config: upsample rates (5,5,2,2,2),
ResBlock1 with dilations (1,3,5,7) (`fregan/config.json`).

The Haar DWT (`dwt.py:19-76`, pywt filters as strided convs) is a reshape +
two fused adds here — no conv needed on TPU.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...config import Config
from .hifigan import LRELU_SLOPE, _avg_pool1d, _wn_conv

_SQRT2 = float(np.sqrt(2.0))


def fregan_config() -> Config:
    return Config(
        resblock="1",
        upsample_rates=[5, 5, 2, 2, 2],
        upsample_kernel_sizes=[10, 10, 4, 4, 4],
        upsample_initial_channel=512,
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5, 7], [1, 3, 5, 7], [1, 3, 5, 7]],
        num_mels=80,
        segment_size=6400,
        n_fft=1024,
        hop_size=200,
        win_size=800,
        sample_rate=16000,
        fmin=0.0,
        fmax=7600.0,
        fmax_for_loss=None,
        learning_rate=2e-4,
        adam_b1=0.8,
        adam_b2=0.99,
        lr_decay=0.999,
        batch_size=16,
        disc_start_step=0,
        top_k=4,
        # optional multi-resolution STFT aux loss (`fregan/stft_loss.py:98-135`,
        # disabled in the reference trainer at `fregan/train.py:161-162`); when
        # on, replaces the L1 mel loss with lambda_aux*(sc+mag) per the
        # reference's commented-out wiring.
        use_stft_loss=False,
        lambda_aux=45.0,
    )


def dwt_haar(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level Haar DWT over the last axis: (..., T) → (low, high) each
    (..., T//2). Matches `dwt.py` (stride-2 conv with rec_lo/rec_hi)."""
    t = x.shape[-1] - (x.shape[-1] % 2)
    pairs = x[..., :t].reshape(*x.shape[:-1], t // 2, 2)
    low = (pairs[..., 0] + pairs[..., 1]) / _SQRT2
    high = (pairs[..., 0] - pairs[..., 1]) / _SQRT2
    return low, high


class FreGanResBlock(nn.Module):
    """ResBlock1 with 4 dilations (`generator.py:11-54`)."""
    channels: int
    kernel: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5, 7)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel, dilation=d, name=f"convs1_{i}")(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel, name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class FreGanGenerator(nn.Module):
    """mel (B, T, 80) → wav (B, T*200) (`generator.py:79-168`)."""
    cfg: Any

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        rates, kernels = list(c.upsample_rates), list(c.upsample_kernel_sizes)
        n_up = len(rates)
        cond_level = n_up - c.top_k
        num_kernels = len(c.resblock_kernel_sizes)

        mel = x
        x = nn.WeightNorm(nn.Conv(c.upsample_initial_channel, (7,), padding="SAME",
                                  name="conv_pre_conv"), name="conv_pre")(x)
        output = None
        for i, (u, k) in enumerate(zip(rates, kernels)):
            ch_in = c.upsample_initial_channel // (2 ** i)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            if i >= cond_level:
                # upsample the running mel branch to x's rate and add
                tm = mel.shape[1]
                um, km = rates[i - 1], kernels[i - 1]
                mel = nn.WeightNorm(
                    nn.ConvTranspose(ch_in, (km,), strides=(um,),
                                     padding="VALID", name=f"cond_up_{i - cond_level}_conv"),
                    name=f"cond_up_{i - cond_level}")(mel)
                offm = um // 2 + um % 2
                mel = mel[:, offm : offm + tm * um]
                x = x + mel
            if i > cond_level:
                src = x if output is None else output
                up = jnp.repeat(src, u, axis=1)  # nearest upsample
                output = nn.WeightNorm(
                    nn.Conv(ch, (1,), padding="SAME",
                            name=f"res_output_{i - cond_level - 1}_conv"),
                    name=f"res_output_{i - cond_level - 1}")(up)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            t_in = x.shape[1]
            x = nn.WeightNorm(nn.ConvTranspose(ch, (k,), strides=(u,), padding="VALID",
                                               name=f"ups_{i}_conv"), name=f"ups_{i}")(x)
            off = u // 2 + u % 2
            x = x[:, off : off + t_in * u]
            xs = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                blk = FreGanResBlock(ch, rk, tuple(rd), name=f"resblock_{i}_{j}")
                xs = blk(x) if xs is None else xs + blk(x)
            x = xs / num_kernels
            if output is not None:
                output = output + x

        x = nn.leaky_relu(output)
        x = nn.WeightNorm(nn.Conv(1, (7,), padding="SAME", name="conv_post_conv"),
                          name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class FreGanDiscriminatorP(nn.Module):
    """Period discriminator with DWT time-cat injections
    (`discriminator.py:81-177`)."""
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        p = self.period

        def to_period_2d(sig):
            b, t = sig.shape
            if t % p != 0:
                sig = jnp.pad(sig, ((0, 0), (0, p - t % p)), mode="reflect")
                t = sig.shape[1]
            return sig.reshape(b, t // p, p, 1)

        lo1, hi1 = dwt_haar(x)
        d1 = nn.WeightNorm(nn.Conv(1, (1,)), name="dwt_conv1")(
            jnp.stack([lo1, hi1], axis=-1))[..., 0]
        lo2a, hi2a = dwt_haar(lo1)
        lo2b, hi2b = dwt_haar(hi1)
        d2 = nn.WeightNorm(nn.Conv(1, (1,)), name="dwt_conv2")(
            jnp.stack([lo2a, hi2a, lo2b, hi2b], axis=-1))[..., 0]
        lvl3 = []
        for s in (lo2a, hi2a, lo2b, hi2b):
            a, b2 = dwt_haar(s)
            lvl3 += [a, b2]
        d3 = nn.WeightNorm(nn.Conv(1, (1,)), name="dwt_conv3")(
            jnp.stack(lvl3, axis=-1))[..., 0]

        proj1 = nn.WeightNorm(nn.Conv(32, (self.kernel_size, 1), strides=(self.stride, 1),
                                      padding=((2, 2), (0, 0))), name="dwt_proj1")(to_period_2d(d1))
        proj2 = nn.WeightNorm(nn.Conv(128, (self.kernel_size, 1), strides=(self.stride, 1),
                                      padding=((2, 2), (0, 0))), name="dwt_proj2")(to_period_2d(d2))
        proj3 = nn.WeightNorm(nn.Conv(512, (self.kernel_size, 1), strides=(self.stride, 1),
                                      padding=((2, 2), (0, 0))), name="dwt_proj3")(to_period_2d(d3))

        xx = to_period_2d(x)
        fmap = []
        chs = [(32, self.stride), (128, self.stride), (512, self.stride),
               (1024, self.stride), (1024, 1)]
        injections = [proj1, proj2, proj3, None, None]
        for i, (ch, st) in enumerate(chs):
            xx = nn.WeightNorm(nn.Conv(ch, (self.kernel_size, 1), strides=(st, 1),
                                       padding=((2, 2), (0, 0))), name=f"convs_{i}")(xx)
            xx = nn.leaky_relu(xx, LRELU_SLOPE)
            fmap.append(xx)
            if injections[i] is not None:
                xx = jnp.concatenate([xx, injections[i]], axis=1)  # time axis
        xx = nn.WeightNorm(nn.Conv(1, (3, 1), padding=((1, 1), (0, 0))), name="conv_post")(xx)
        fmap.append(xx)
        return xx.reshape(x.shape[0], -1), fmap


class FreGanDiscriminatorS(nn.Module):
    """Scale discriminator with DWT channel injections
    (`discriminator.py:207-251`)."""
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        lo1, hi1 = dwt_haar(x)
        d1 = nn.WeightNorm(nn.Conv(128, (15,), padding="SAME"), name="dwt_conv1")(
            jnp.stack([lo1, hi1], axis=-1))
        lo2a, hi2a = dwt_haar(lo1)
        lo2b, hi2b = dwt_haar(hi1)
        d2 = nn.WeightNorm(nn.Conv(128, (41,), strides=(2,), padding="SAME"), name="dwt_conv2")(
            jnp.stack([lo2a, hi2a, lo2b, hi2b], axis=-1))

        spec = [(128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16), (512, 41, 4, 16),
                (1024, 41, 4, 16), (1024, 41, 1, 16), (1024, 5, 1, 1)]
        xx = x[..., None]
        fmap = []
        for i, (ch, k, s, g) in enumerate(spec):
            conv = nn.Conv(ch, (k,), strides=(s,), padding="SAME", feature_group_count=g)
            if self.use_spectral_norm:
                xx = nn.SpectralNorm(conv, name=f"convs_{i}")(xx, update_stats=train)
            else:
                xx = nn.WeightNorm(conv, name=f"convs_{i}")(xx)
            xx = nn.leaky_relu(xx, LRELU_SLOPE)
            fmap.append(xx)
            if i == 0:
                xx = jnp.concatenate([xx, d1], axis=1)  # time axis cat
            elif i == 1:
                xx = jnp.concatenate([xx, d2], axis=1)
        post = nn.Conv(1, (3,), padding="SAME")
        if self.use_spectral_norm:
            xx = nn.SpectralNorm(post, name="conv_post")(xx, update_stats=train)
        else:
            xx = nn.WeightNorm(post, name="conv_post")(xx)
        fmap.append(xx)
        return xx.reshape(b, -1), fmap


class ResWiseMultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        rs, gs, frs, fgs = [], [], [], []
        for p in self.periods:
            d = FreGanDiscriminatorP(p, name=f"disc_{p}")
            r, fr = d(y)
            g, fg = d(y_hat)
            rs.append(r); frs.append(fr); gs.append(g); fgs.append(fg)
        return rs, gs, frs, fgs


class ResWiseMultiScaleDiscriminator(nn.Module):
    """3 scales; scales 1/2 see DWT-downsampled signals instead of avg-pool
    (`discriminator.py:254-302`)."""

    @nn.compact
    def __call__(self, y, y_hat, train: bool = False):
        dwt_conv1 = nn.WeightNorm(nn.Conv(1, (1,)), name="dwt_conv1")
        dwt_conv2 = nn.WeightNorm(nn.Conv(1, (1,)), name="dwt_conv2")

        lo1y, hi1y = dwt_haar(y)
        y1 = dwt_conv1(jnp.stack([lo1y, hi1y], axis=-1))[..., 0]
        lo1g, hi1g = dwt_haar(y_hat)
        g1 = dwt_conv1(jnp.stack([lo1g, hi1g], axis=-1))[..., 0]

        def lvl2(lo, hi):
            a, b = dwt_haar(lo)
            c_, d_ = dwt_haar(hi)
            return dwt_conv2(jnp.stack([a, b, c_, d_], axis=-1))[..., 0]
        y2 = lvl2(lo1y, hi1y)
        g2 = lvl2(lo1g, hi1g)

        rs, gs, frs, fgs = [], [], [], []
        pairs = [(y, y_hat), (y1, g1), (y2, g2)]
        for i, (yy, gg) in enumerate(pairs):
            d = FreGanDiscriminatorS(use_spectral_norm=(i == 0), name=f"disc_{i}")
            r, fr = d(yy, train)
            g, fg = d(gg, train)
            rs.append(r); frs.append(fr); gs.append(g); fgs.append(fg)
        return rs, gs, frs, fgs


class FreGanDiscriminators(nn.Module):
    @nn.compact
    def __call__(self, y, y_hat, train: bool = False):
        mpd = ResWiseMultiPeriodDiscriminator(name="mpd")(y, y_hat)
        msd = ResWiseMultiScaleDiscriminator(name="msd")(y, y_hat, train)
        return mpd, msd
