"""Discretized mixture-of-logistics loss + sampling (JAX).

Parity with `/root/reference/models/vocoder/distribution.py:16-132` (the
r9y9/wavenet_vocoder formulation): 10 logistic mixtures over 16-bit-ish
quantized audio in [-1, 1], 30 output params (logit_probs, means, log_scales).
Time-major (B, T, C) layout.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def log_sum_exp(x, axis=-1):
    m = jnp.max(x, axis=axis, keepdims=True)
    return jnp.squeeze(m, axis) + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis))


def discretized_mix_logistic_loss(y_hat, y, num_classes=65536, log_scale_min=None, reduce=True):
    """y_hat (B, T, 30); y (B, T, 1) in [-1, 1]."""
    if log_scale_min is None:
        log_scale_min = math.log(1e-14)  # host constant (jit/remat safe)
    nr_mix = y_hat.shape[-1] // 3

    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix : 2 * nr_mix]
    log_scales = jnp.clip(y_hat[..., 2 * nr_mix :], min=log_scale_min)

    y = jnp.broadcast_to(y, y.shape[:-1] + (nr_mix,))
    centered_y = y - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_y + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered_y - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)       # log P(X < 1st bin edge)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)         # log P(X > last bin edge)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered_y
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner_inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        log_pdf_mid - jnp.log((num_classes - 1) / 2.0))
    inner = jnp.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = jnp.where(y < -0.999, log_cdf_plus, inner)

    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    nll = -log_sum_exp(log_probs, axis=-1)
    return jnp.mean(nll) if reduce else nll[..., None]


def sample_from_discretized_mix_logistic(key, y, log_scale_min=None):
    """y (B, T, 30) → samples (B, T) in [-1, 1]."""
    if log_scale_min is None:
        log_scale_min = math.log(1e-14)  # host constant (jit/remat safe)
    nr_mix = y.shape[-1] // 3
    logit_probs = y[..., :nr_mix]

    k1, k2 = jax.random.split(key)
    # gumbel-max mixture selection
    idx = jax.random.categorical(k1, logit_probs, axis=-1)
    onehot = jax.nn.one_hot(idx, nr_mix, dtype=y.dtype)
    means = jnp.sum(y[..., nr_mix : 2 * nr_mix] * onehot, axis=-1)
    log_scales = jnp.clip(jnp.sum(y[..., 2 * nr_mix :] * onehot, axis=-1), min=log_scale_min)

    u = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)
