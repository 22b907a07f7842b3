"""Mu-law companding + label quantisation (numpy and JAX flavours).

Parity targets: the reference's WaveRNN data path
(`/root/reference/models/vocoder/wavernn/audio.py` label/mu-law helpers and
`models/vocoder/wavernn/models/fatchord_version.py:245-253` decode_mu_law).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def encode_mu_law(x, mu: int):
    """x in [-1,1] → integer class in [0, mu)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    mu = mu - 1
    fx = xp.sign(x) * xp.log1p(mu * xp.abs(x)) / np.log1p(mu)
    return xp.floor((fx + 1) / 2 * mu + 0.5).astype(xp.int32)


def decode_mu_law(y, mu: int, from_labels: bool = True):
    """Inverse companding; ``from_labels`` maps class index back to [-1,1]."""
    xp = jnp if isinstance(y, jnp.ndarray) else np
    mu = mu - 1
    if from_labels:
        y = label_2_float(y, int(np.log2(mu + 1)))
    return xp.sign(y) / mu * ((1 + mu) ** xp.abs(y) - 1)


def label_2_float(x, bits: int):
    return 2 * x / (2**bits - 1.0) - 1.0


def float_2_label(x, bits: int):
    xp = jnp if isinstance(x, jnp.ndarray) else np
    x = xp.clip(x, -1.0, 1.0)
    return (x + 1.0) * (2**bits - 1) / 2


def encode_mulaw8_device(wav):
    """float wav in [-1,1] → 8-bit mu-law bytes, on device. One byte per
    sample instead of int16's two: halves the device→host PCM transfer,
    which is the e2e serving bottleneck on tunneled TPU hosts. The format
    is the standard 256-level mu-law companding (telephony G.711 family);
    decode on host with `decode_mulaw8_to_int16` (a 256-entry LUT)."""
    return encode_mu_law(jnp.clip(wav, -1.0, 1.0), 256).astype(jnp.uint8)


_MULAW8_LUT = None


def decode_mulaw8_to_int16(u8: np.ndarray) -> np.ndarray:
    """Host-side inverse of `encode_mulaw8_device`: uint8 labels → int16 PCM
    via a cached 256-entry lookup table (a vectorized gather — negligible
    next to the halved transfer it buys)."""
    global _MULAW8_LUT
    if _MULAW8_LUT is None:
        labels = np.arange(256, dtype=np.int32)
        _MULAW8_LUT = np.round(
            np.clip(decode_mu_law(labels, 256), -1.0, 1.0) * 32767.0
        ).astype(np.int16)
    return _MULAW8_LUT[np.asarray(u8, np.uint8)]
