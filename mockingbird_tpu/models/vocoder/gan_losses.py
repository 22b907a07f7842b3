"""Shared GAN losses (LSGAN + feature matching), used by HiFi-GAN, Fre-GAN
and VITS trainers.

Parity with `/root/reference/utils/loss.py:4-53`: feature loss is 2×Σ L1 over
all feature maps; discriminator loss is Σ (1−D(y))² + D(ŷ)²; generator
adversarial loss is Σ (1−D(ŷ))².
"""
from __future__ import annotations

import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1 - dr) ** 2)
        g_loss = jnp.mean(dg ** 2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


# Fre-GAN auxiliary multi-resolution STFT loss
# (`/root/reference/models/vocoder/fregan/stft_loss.py:12-135`; disabled in the
# reference trainer at `fregan/train.py:161-162`, shipped here as an optional
# loss gated by `use_stft_loss`). Resolutions are (fft_size, hop, win_length).
DEFAULT_STFT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def _stft_mag(x, fft_size, hop, win_length):
    from ...dsp.stft import stft
    # torch.stft default: center=True reflect pad; the reference clamps the
    # power at 1e-7 before the sqrt (`stft_loss.py:28`)
    re, im = stft(x, fft_size, hop, win_length, center=True, pad_mode="reflect")
    return jnp.sqrt(jnp.maximum(re * re + im * im, 1e-7))


def stft_loss(x, y, fft_size, hop, win_length):
    """Single-resolution (spectral-convergence, log-magnitude) pair for
    predicted x and ground-truth y, both (B, T) (`stft_loss.py:67-96`)."""
    x_mag = _stft_mag(x, fft_size, hop, win_length)
    y_mag = _stft_mag(y, fft_size, hop, win_length)
    sc = jnp.linalg.norm(y_mag - x_mag) / jnp.maximum(jnp.linalg.norm(y_mag), 1e-7)
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return sc, mag


def multi_resolution_stft_loss(x, y, resolutions=DEFAULT_STFT_RESOLUTIONS):
    """Mean spectral-convergence + log-magnitude losses over resolutions
    (`stft_loss.py:98-135` MultiResolutionSTFTLoss)."""
    sc_total, mag_total = 0.0, 0.0
    for fft_size, hop, win_length in resolutions:
        sc, mag = stft_loss(x, y, fft_size, hop, win_length)
        sc_total += sc
        mag_total += mag
    n = len(resolutions)
    return sc_total / n, mag_total / n


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask):
    """VITS prior/posterior KL (`utils/loss.py` kl_loss): all (B, C, T)-style
    tensors with mask broadcastable."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)
