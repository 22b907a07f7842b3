"""HiFi-GAN vocoder (generator + MPD/MSD discriminators), TPU-native.

Parity with `/root/reference/models/vocoder/hifigan/models.py:11-285` at the
16 kHz config (`config_16k_.json`: upsample rates (5,5,4,2), kernels
(10,10,8,4), 512 initial channels, ResBlock1 with kernels (3,7,11) ×
dilations (1,3,5)). TPU-first notes:

  * everything is time-major channel-last (B, T, C) — XLA's native conv
    layout on TPU;
  * transposed convs use SAME padding so each stage emits exactly T×u frames
    (the reference picks torch paddings to achieve the same length);
  * weight_norm is flax `nn.WeightNorm`, spectral_norm (first MSD disc) is
    flax `nn.SpectralNorm` with its power-iteration state in `batch_stats`;
  * the whole mel→wav generator is one feed-forward conv program — no
    sequential loops — so XLA fuses it onto the MXU end to end.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config

LRELU_SLOPE = 0.1


def hifigan_config() -> Config:
    """16 kHz config (`config_16k_.json`)."""
    return Config(
        use_interpolation=False,   # True = 24 kHz variant (`models.py:107-118`)
        resblock="1",
        upsample_rates=[5, 5, 4, 2],
        upsample_kernel_sizes=[10, 10, 8, 4],
        upsample_initial_channel=512,
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
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
    )


def _wn_conv(features, kernel, strides=1, dilation=1, groups=1, name=None):
    # the wrapped conv gets an explicit sibling name (<name>_conv) so param
    # paths are stable for checkpoint interop (see interop/torch_weights.py)
    return nn.WeightNorm(nn.Conv(features, (kernel,), strides=(strides,),
                                 kernel_dilation=(dilation,), padding="SAME",
                                 feature_group_count=groups, name=f"{name}_conv"),
                         name=name)


class ResBlock1(nn.Module):
    """MRF block: 3×(dilated conv + plain conv) with residuals
    (`models.py:11-48`)."""
    channels: int
    kernel: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel, dilation=d, name=f"convs1_{i}")(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel, name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel: int = 3
    dilations: Tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel, dilation=d, name=f"convs_{i}")(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """mel (B, T, 80) → wav (B, T*hop) in [-1, 1] (`models.py:93-150`)."""
    cfg: Any

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.WeightNorm(nn.Conv(c.upsample_initial_channel, (7,), padding="SAME",
                                  name="conv_pre_conv"), name="conv_pre")(x)
        res_cls = ResBlock1 if c.resblock == "1" else ResBlock2
        num_kernels = len(c.resblock_kernel_sizes)

        use_interp = bool(getattr(c, "use_interpolation", False)
                          or getattr(c, "sample_rate", 16000) == 24000)
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            t_in = x.shape[1]
            if use_interp:
                # 24 kHz variant (`models.py:107-118`): nearest-neighbour
                # upsample (InterpolationBlock, mode='nearest') + Conv1d with
                # torch padding (k-1)//2
                x = jnp.repeat(x, u, axis=1)
                p = (k - 1) // 2
                x = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
                x = nn.WeightNorm(nn.Conv(ch, (k,), padding="VALID",
                                          name=f"ups_{i}_conv"), name=f"ups_{i}")(x)
            else:
                x = nn.WeightNorm(
                    nn.ConvTranspose(ch, (k,), strides=(u,), padding="VALID",
                                     name=f"ups_{i}_conv"), name=f"ups_{i}")(x)
                # torch ConvTranspose1d(pad=u//2+u%2, output_padding=u%2) == the
                # VALID (full) transposed conv sliced at that offset
                off = u // 2 + u % 2
                x = x[:, off : off + t_in * u]
            xs = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                block = res_cls(ch, rk, tuple(rd), name=f"resblock_{i}_{j}")
                xs = block(x) if xs is None else xs + block(x)
            x = xs / num_kernels

        x = nn.leaky_relu(x)
        x = nn.WeightNorm(nn.Conv(1, (7,), padding="SAME", name="conv_post_conv"),
                          name="conv_post")(x)
        return jnp.tanh(x)[..., 0]  # (B, T*prod(rates))


class DiscriminatorP(nn.Module):
    """Period discriminator: fold wav into (T/p, p) and run 2D convs
    (`models.py:165-199`)."""
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        # x: (B, T) → (B, T/p, p, 1)
        b, t = x.shape
        p = self.period
        if t % p != 0:
            x = jnp.pad(x, ((0, 0), (0, p - t % p)), mode="reflect")
            t = x.shape[1]
        x = x.reshape(b, t // p, p, 1)

        fmap = []
        chs = [32, 128, 512, 1024]
        for i, ch in enumerate(chs):
            x = nn.WeightNorm(nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                                      padding=((2, 2), (0, 0)), name=f"convs_{i}_conv"),
                              name=f"convs_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.WeightNorm(nn.Conv(1024, (self.kernel_size, 1), padding=((2, 2), (0, 0)),
                                  name="convs_4_conv"), name="convs_4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = nn.WeightNorm(nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)),
                                  name="conv_post_conv"), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1D conv stack (`models.py:229-253`)."""
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x[..., None]  # (B, T, 1)
        spec = [(128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16), (512, 41, 4, 16),
                (1024, 41, 4, 16), (1024, 41, 1, 16), (1024, 5, 1, 1)]
        fmap = []
        for i, (ch, k, s, g) in enumerate(spec):
            conv = nn.Conv(ch, (k,), strides=(s,), padding="SAME",
                           feature_group_count=g, name=f"convs_{i}_conv")
            if self.use_spectral_norm:
                x = nn.SpectralNorm(conv, name=f"convs_{i}")(x, update_stats=train)
            else:
                x = nn.WeightNorm(conv, name=f"convs_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        post = nn.Conv(1, (3,), padding="SAME", name="conv_post_conv")
        if self.use_spectral_norm:
            x = nn.SpectralNorm(post, name="conv_post")(x, update_stats=train)
        else:
            x = nn.WeightNorm(post, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Periods 2,3,5,7,11 (`models.py:202-226`)."""
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, name=f"disc_{p}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r); fmap_rs.append(fr)
            y_d_gs.append(g); fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiScaleDiscriminator(nn.Module):
    """3 scales with ×2 average pooling between (`models.py:256-285`)."""

    @nn.compact
    def __call__(self, y, y_hat, train: bool = False):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            d = DiscriminatorS(use_spectral_norm=(i == 0), name=f"disc_{i}")
            if i != 0:
                y = _avg_pool1d(y, 4, 2, 2)
                y_hat = _avg_pool1d(y_hat, 4, 2, 2)
            r, fr = d(y, train)
            g, fg = d(y_hat, train)
            y_d_rs.append(r); fmap_rs.append(fr)
            y_d_gs.append(g); fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def _avg_pool1d(x, kernel: int, stride: int, pad: int):
    """torch AvgPool1d semantics (count includes zero padding)."""
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    n = (x.shape[1] - kernel) // stride + 1
    idx = np.arange(n)[:, None] * stride + np.arange(kernel)[None, :]
    return x[:, idx].mean(axis=-1)


class HifiganDiscriminators(nn.Module):
    """MPD + MSD bundled for one apply call."""

    @nn.compact
    def __call__(self, y, y_hat, train: bool = False):
        mpd = MultiPeriodDiscriminator(name="mpd")(y, y_hat)
        msd = MultiScaleDiscriminator(name="msd")(y, y_hat, train)
        return mpd, msd


def init_generator(key, cfg=None, t: int = 32):
    cfg = cfg or hifigan_config()
    if isinstance(cfg, Config):
        cfg = cfg.freeze()
    model = Generator(cfg)
    variables = model.init(key, jnp.zeros((1, t, cfg.num_mels)))
    return model, variables


def init_discriminators(key, t: int = 4000):
    model = HifiganDiscriminators()
    variables = model.init(key, jnp.zeros((1, t)), jnp.zeros((1, t)))
    return model, variables
