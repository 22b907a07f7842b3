"""VITS building blocks, TPU-native (time-major (B, T, C) layout).

Parity with `/root/reference/models/synthesizer/models/sublayer/vits_modules.py`
(LayerNorm, DDSConv, WN gated dilated convs, normalizing flows, windowed
relative-position transformer) and `sublayer/common/transforms.py:12-193`
(piecewise rational-quadratic spline). Everything is pointwise/conv/matmul
math with static shapes — XLA fuses it; no kernel needs to be sequential.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """(B,) → (B, T) float mask (`utils/util.py` sequence_mask)."""
    return (jnp.arange(max_length)[None, :] < lengths[:, None]).astype(jnp.float32)


def fused_add_tanh_sigmoid_multiply(a, b, n_channels):
    in_act = a + b
    return jnp.tanh(in_act[..., :n_channels]) * jax.nn.sigmoid(in_act[..., n_channels:])


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels (`vits_modules.py:13-26`)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5)(x)


class DDSConv(nn.Module):
    """Dilated depth-separable convs (`vits_modules.py:63-102`)."""
    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, train: bool = False):
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size ** i
            y = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(dilation,),
                        feature_group_count=self.channels, padding="SAME",
                        name=f"convs_sep_{i}")(x * x_mask)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Conv(self.channels, (1,), name=f"convs_1x1_{i}")(y)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = x + y
        return x * x_mask


class WN(nn.Module):
    """WaveNet-style gated dilated conv stack (`vits_modules.py:104-177`)."""
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, train: bool = False):
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            g_all = nn.WeightNorm(nn.Conv(2 * h * self.n_layers, (1,),
                                          name="cond_layer_conv"),
                                  name="cond_layer")(g)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = nn.WeightNorm(nn.Conv(2 * h, (self.kernel_size,),
                                         kernel_dilation=(dilation,), padding="SAME",
                                         name=f"in_layers_{i}_conv"),
                                 name=f"in_layers_{i}")(x)
            x_in = nn.Dropout(self.p_dropout, deterministic=not train)(x_in)
            if g is not None:
                g_l = g_all[..., i * 2 * h : (i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = fused_add_tanh_sigmoid_multiply(x_in, g_l, h)
            out_ch = 2 * h if i < self.n_layers - 1 else h
            res_skip = nn.WeightNorm(nn.Conv(out_ch, (1,),
                                             name=f"res_skip_layers_{i}_conv"),
                                     name=f"res_skip_layers_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask


# ---------------------------------------------------------------------------
# Flows
# ---------------------------------------------------------------------------

class Log(nn.Module):
    """y = log(x) (`vits_modules.py:252-261`)."""

    def __call__(self, x, x_mask, reverse=False, **kw):
        if not reverse:
            y = jnp.log(jnp.clip(x, min=1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class Flip(nn.Module):
    """Channel flip (`vits_modules.py:263-271`)."""

    def __call__(self, x, x_mask=None, g=None, reverse=False, **kw):
        x = jnp.flip(x, axis=-1)
        if not reverse:
            return x, jnp.zeros(x.shape[0], x.dtype)
        return x


class ElementwiseAffine(nn.Module):
    """y = m + exp(logs)·x per channel (`vits_modules.py:273-289`)."""
    channels: int

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False, **kw):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs[None, None, :] * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class ResidualCouplingLayer(nn.Module):
    """Affine (mean-only) coupling with a WN conditioner
    (`vits_modules.py:291-337`)."""
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False, train: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, self.gin_channels, name="enc")(h, x_mask, g=g, train=train)
        out_ch = half if self.mean_only else 2 * half
        stats = nn.Conv(out_ch, (1,), kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="post")(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ConvFlow(nn.Module):
    """Spline coupling flow (`vits_modules.py:339-383`)."""
    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False, train: bool = False):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.filter_channels, (1,), name="pre")(x0)
        h = DDSConv(self.filter_channels, self.kernel_size, self.n_layers,
                    name="convs")(h, x_mask, g=g, train=train)
        h = nn.Conv(half * (self.num_bins * 3 - 1), (1,),
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="proj")(h) * x_mask

        b, t, _ = x0.shape
        h = h.reshape(b, t, half, 3 * self.num_bins - 1)
        denom = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]

        x1_new, logabsdet = rational_quadratic_spline(
            x1, uw, uh, ud, inverse=reverse, tail_bound=self.tail_bound)
        x_out = jnp.concatenate([x0, x1_new], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return x_out, logdet
        return x_out


def rational_quadratic_spline(inputs, unnormalized_widths, unnormalized_heights,
                              unnormalized_derivatives, inverse=False,
                              tail_bound=5.0, min_bin_width=1e-3,
                              min_bin_height=1e-3, min_derivative=1e-3):
    """Unconstrained (linear-tailed) monotonic rational-quadratic spline
    (`transforms.py:55-193`, Durkan et al. 2019). inputs (..., ), params
    (..., num_bins[*3-1])."""
    num_bins = unnormalized_widths.shape[-1]

    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # pad derivative endpoints so boundary derivative == 1 (linear tails)
    constant = np.log(np.exp(1 - min_derivative) - 1)
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives,
        [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant)

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    x_in = jnp.clip(inputs, -tail_bound, tail_bound)
    bins = cumheights if inverse else cumwidths
    bin_idx = jnp.clip(
        jnp.sum((x_in[..., None] >= bins[..., :-1]).astype(jnp.int32), axis=-1) - 1,
        0, num_bins - 1)[..., None]

    def take(t):
        return jnp.take_along_axis(t, bin_idx, axis=-1)[..., 0]

    input_cumwidths = take(cumwidths[..., :-1])
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights[..., :-1])
    input_heights = take(heights)
    delta = heights / widths
    input_delta = take(delta)
    input_d = take(derivatives[..., :-1])
    input_d_plus = take(derivatives[..., 1:])

    if inverse:
        a = ((x_in - input_cumheights) * (input_d + input_d_plus - 2 * input_delta)
             + input_heights * (input_delta - input_d))
        b = (input_heights * input_d
             - (x_in - input_cumheights) * (input_d + input_d_plus - 2 * input_delta))
        c = -input_delta * (x_in - input_cumheights)
        disc = b ** 2 - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)) - 1e-12)
        outputs = root * input_bin_widths + input_cumwidths
        theta_one_minus_theta = root * (1 - root)
        denom = input_delta + ((input_d + input_d_plus - 2 * input_delta)
                               * theta_one_minus_theta)
        dnum = input_delta ** 2 * (input_d_plus * root ** 2
                                   + 2 * input_delta * theta_one_minus_theta
                                   + input_d * (1 - root) ** 2)
        logabsdet = -(jnp.log(jnp.maximum(dnum, 1e-12)) - 2 * jnp.log(jnp.maximum(denom, 1e-12)))
    else:
        theta = (x_in - input_cumwidths) / jnp.maximum(input_bin_widths, 1e-12)
        theta_one_minus_theta = theta * (1 - theta)
        numerator = input_heights * (input_delta * theta ** 2 + input_d * theta_one_minus_theta)
        denom = input_delta + ((input_d + input_d_plus - 2 * input_delta)
                               * theta_one_minus_theta)
        outputs = input_cumheights + numerator / jnp.maximum(denom, 1e-12)
        dnum = input_delta ** 2 * (input_d_plus * theta ** 2
                                   + 2 * input_delta * theta_one_minus_theta
                                   + input_d * (1 - theta) ** 2)
        logabsdet = jnp.log(jnp.maximum(dnum, 1e-12)) - 2 * jnp.log(jnp.maximum(denom, 1e-12))

    outputs = jnp.where(inside, outputs, inputs)       # identity on tails
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return outputs, logabsdet


# ---------------------------------------------------------------------------
# Windowed relative-position transformer (`vits_modules.py:385-675`)
# ---------------------------------------------------------------------------

class RelativeMultiHeadAttention(nn.Module):
    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = 4

    @nn.compact
    def __call__(self, x, attn_mask=None, train: bool = False):
        k_ch = self.channels // self.n_heads
        b, t, _ = x.shape
        q = nn.Conv(self.channels, (1,), name="conv_q")(x)
        k = nn.Conv(self.channels, (1,), name="conv_k")(x)
        v = nn.Conv(self.channels, (1,), name="conv_v")(x)

        def split(u):  # (B, T, C) → (B, H, T, d)
            return u.reshape(b, t, self.n_heads, k_ch).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        scores = jnp.einsum("bhtd,bhsd->bhts", q / math.sqrt(k_ch), k)

        if self.window_size is not None:
            emb_rel_k = self.param("emb_rel_k", nn.initializers.normal(k_ch ** -0.5),
                                   (1, 2 * self.window_size + 1, k_ch))
            emb_rel_v = self.param("emb_rel_v", nn.initializers.normal(k_ch ** -0.5),
                                   (1, 2 * self.window_size + 1, k_ch))
            rel_k = _relative_embeddings(emb_rel_k, t, self.window_size)
            rel_logits = jnp.einsum("bhtd,gmd->bhtm", q / math.sqrt(k_ch), rel_k)
            scores = scores + _relative_to_absolute(rel_logits)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout, deterministic=not train)(p_attn)
        out = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)

        if self.window_size is not None:
            rel_weights = _absolute_to_relative(p_attn)
            rel_v = _relative_embeddings(emb_rel_v, t, self.window_size)
            out = out + jnp.einsum("bhtm,gmd->bhtd", rel_weights, rel_v)

        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.channels)
        return nn.Conv(self.out_channels, (1,), name="conv_o")(out)


def _relative_embeddings(emb, length, window):
    """Pad/slice the (1, 2w+1, d) table to (1, 2*length-1, d)."""
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


def _relative_to_absolute(x):
    """(B, H, T, 2T-1) → (B, H, T, T) (`vits_modules.py` _relative_position_to_absolute_position)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, t * 2 * t)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, t - 1)))
    return x_flat.reshape(b, h, t + 1, 2 * t - 1)[:, :, :t, t - 1:]


def _absolute_to_relative(x):
    """(B, H, T, T) → (B, H, T, 2T-1)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x_flat = x.reshape(b, h, t * (2 * t - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (t, 0)))
    return x_flat.reshape(b, h, t, 2 * t)[:, :, :, 1:]


class FFN(nn.Module):
    filter_channels: int
    out_channels: int
    kernel_size: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        y = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME",
                    name="conv_1")(x * x_mask)
        y = nn.relu(y)
        y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
        y = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                    name="conv_2")(y * x_mask)
        return y * x_mask


class TransformerEncoder(nn.Module):
    """Stack of windowed-relative-attention blocks (`vits_modules.py:385-420`)."""
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4

    @nn.compact
    def __call__(self, x, x_mask, train: bool = False):
        attn_mask = x_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][:, :, :, None]
        x = x * x_mask
        for i in range(self.n_layers):
            y = RelativeMultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                self.p_dropout, self.window_size, name=f"attn_{i}")(x, attn_mask, train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x + y)
            y = FFN(self.filter_channels, self.hidden_channels, self.kernel_size,
                    self.p_dropout, name=f"ffn_{i}")(x, x_mask, train)
            y = nn.Dropout(self.p_dropout, deterministic=not train)(y)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(x + y)
        return x * x_mask


# ---------------------------------------------------------------------------
# Segment utilities (`utils/util.py:64-108`)
# ---------------------------------------------------------------------------

def slice_segments(x, ids_str, segment_size):
    """x (B, T, C) or (B, T); gather [ids_str : ids_str+segment_size) per row."""
    idx = ids_str[:, None] + jnp.arange(segment_size)[None, :]
    if x.ndim == 2:
        return jnp.take_along_axis(x, idx, axis=1)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def rand_slice_segments(key, x, x_lengths, segment_size):
    b = x.shape[0]
    max_start = jnp.maximum(x_lengths - segment_size + 1, 1)
    ids_str = (jax.random.uniform(key, (b,)) * max_start).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def generate_path(duration, mask):
    """duration (B, 1, T_x); mask (B, 1, T_y, T_x) → path (B, 1, T_y, T_x)
    (`utils/util.py` generate_path)."""
    b, _, t_x = duration.shape
    t_y = mask.shape[2]
    cum = jnp.cumsum(duration, axis=-1)  # (B, 1, T_x)
    ys = jnp.arange(t_y)[None, None, :, None]
    path = (ys < cum[:, :, None, :]).astype(mask.dtype)
    path_prev = jnp.pad(path, ((0, 0), (0, 0), (0, 0), (1, 0)))[:, :, :, :-1]
    return (path - path_prev) * mask
