"""PPG extractor: Conformer ASR encoder → frame-level bottleneck features.

Parity with `/root/reference/models/ppg_extractor/` (espnet-derived):
DefaultFrontend (STFT → 80 log-mel at 10 ms hop) → UtteranceMVN →
ConformerEncoder (macaron feed-forward ×0.5, relative-position MHSA with
learned u/v biases, depthwise conv module, `encoder/conformer_encoder.py:31-262`)
→ 144-d bottleneck per 10 ms frame (`__init__.py:25-39`).

TPU-first: the whole wav→PPG path is one jitted program; the frontend reuses
the MXU matmul STFT; no host DSP in the loop.
"""
from __future__ import annotations

import functools
import math
from pathlib import Path
from typing import Any, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from ...dsp.mel import mel_filterbank
from ...dsp.stft import stft_magnitude, _mm
from ...train.checkpoint import load_single
from ..vits.modules import sequence_mask


def ppg_config() -> Config:
    return Config(
        # frontend (espnet DefaultFrontend defaults @16 kHz)
        sample_rate=16000,
        n_fft=512,
        win_size=400,
        hop_size=160,
        num_mels=80,
        fmin=0.0,
        fmax=None,
        norm_means=True,
        norm_vars=False,
        # conformer
        output_size=144,
        attention_heads=4,
        linear_units=1024,
        num_blocks=8,
        dropout_rate=0.1,
        cnn_kernel=15,
        input_layer="linear",   # or "conv2d_nosub"; both keep the 10 ms rate
    )


def logmel_frontend(wav: jax.Array, cfg, lengths=None) -> jax.Array:
    """(B, L) → (B, T, 80) log-mel, 10 ms hop.

    espnet DefaultFrontend semantics (`ppg_extractor/frontend.py:69-103`,
    `log_mel.py:59-73`): POWER spectrum → slaney mel (norm=1) → natural log
    of (power_mel + 1e-20), padded frames zeroed."""
    mag = stft_magnitude(wav, cfg.n_fft, cfg.hop_size, cfg.win_size,
                         center=True, pad_mode="reflect")
    power = mag * mag
    melb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels,
                                      cfg.fmin, cfg.fmax or cfg.sample_rate / 2).T)
    mel = _mm(power, melb)
    logmel = jnp.log(mel + 1e-20)
    if lengths is not None:
        logmel = logmel * sequence_mask(lengths, logmel.shape[1])[..., None]
    return logmel


def utterance_mvn(feats, lengths, norm_means=True, norm_vars=False):
    """Per-utterance mean/variance normalisation
    (`ppg_extractor/utterance_mvn.py:8-82`)."""
    mask = sequence_mask(lengths, feats.shape[1])[..., None]
    n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(feats * mask, axis=1, keepdims=True) / n
    if norm_means:
        feats = (feats - mean) * mask
    if norm_vars:
        var = jnp.sum((feats * mask) ** 2, axis=1, keepdims=True) / n
        feats = feats * jax.lax.rsqrt(jnp.maximum(var, 1e-20))
    return feats


class RelPositionMultiHeadAttention(nn.Module):
    """Relative-position attention with learned u/v biases, matching espnet's
    LEGACY RelPositionMultiHeadedAttention exactly (`encoder/attention.py:
    104-184`): pos_emb has T (reversed) positions and matrix_bd goes through
    the Transformer-XL pad-reshape shift (`attention.py:127-143`)."""
    n_heads: int
    n_feat: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, train: bool = False):
        d_k = self.n_feat // self.n_heads
        b, t, _ = x.shape
        q = nn.Dense(self.n_feat, name="linear_q")(x).reshape(b, t, self.n_heads, d_k)
        k = nn.Dense(self.n_feat, name="linear_k")(x).reshape(b, t, self.n_heads, d_k)
        v = nn.Dense(self.n_feat, name="linear_v")(x).reshape(b, t, self.n_heads, d_k)
        p = nn.Dense(self.n_feat, use_bias=False, name="linear_pos")(pos_emb)
        p = p.reshape(1, -1, self.n_heads, d_k)  # (1, T, H, d)

        u = self.param("pos_bias_u", nn.initializers.zeros, (self.n_heads, d_k))
        vb = self.param("pos_bias_v", nn.initializers.zeros, (self.n_heads, d_k))

        q = q.transpose(0, 2, 1, 3)  # (B, H, T, d)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        p = p.transpose(0, 2, 1, 3)  # (1, H, T, d)

        ac = jnp.einsum("bhtd,bhsd->bhts", q + u[None, :, None, :], k)
        bd = jnp.einsum("bhtd,ghsd->bhts", q + vb[None, :, None, :], p)
        bd = _legacy_rel_shift(bd)
        scores = (ac + bd) / math.sqrt(d_k)
        if mask is not None:
            scores = jnp.where(mask == 0, jnp.finfo(scores.dtype).min, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(mask == 0, 0.0, attn)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.n_feat)
        return nn.Dense(self.n_feat, name="linear_out")(out)


def _legacy_rel_shift(x):
    """espnet legacy rel_shift (`encoder/attention.py:127-143`): pad one zero
    column on the left then reinterpret (B,H,T,T+1) as (B,H,T+1,T) and drop
    the first row."""
    b, h, t, s = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    return x.reshape(b, h, s + 1, t)[:, :, 1:].reshape(b, h, t, s)


def legacy_rel_pos(t: int, d: int, max_len: int = 5000) -> np.ndarray:
    """espnet legacy (reversed) positional table: the module builds the table
    once for max_len=5000 positions (`embedding.py:36-41, 56-77` with
    reverse=True) and forward slices the FIRST t rows — so row m encodes
    absolute position max_len-1-m, NOT t-1-m. Reproduced exactly so converted
    checkpoints match."""
    max_len = max(max_len, t)
    pos = np.arange(max_len - 1, max_len - 1 - t, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(np.log(10000.0) / d))
    pe = np.zeros((t, d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


class ConvModule(nn.Module):
    """Conformer conv module: pointwise-GLU → depthwise → BN → swish → pointwise."""
    channels: int
    kernel: int

    @nn.compact
    def __call__(self, x, mask, train: bool):
        y = nn.LayerNorm(epsilon=1e-12, name="norm")(x)
        y = nn.Dense(2 * self.channels, name="pw1")(y)
        y = nn.glu(y, axis=-1)
        y = y * mask
        y = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                    feature_group_count=self.channels, name="dw")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(y)
        y = nn.swish(y)
        y = nn.Dense(self.channels, name="pw2")(y)
        return y


class ConformerBlock(nn.Module):
    size: int
    heads: int
    linear_units: int
    dropout: float
    cnn_kernel: int

    @nn.compact
    def __call__(self, x, pos_emb, pad_mask, attn_mask, train: bool):
        def ff(name):
            def f(z):
                z = nn.LayerNorm(epsilon=1e-12, name=f"{name}_norm")(z)
                z = nn.Dense(self.linear_units, name=f"{name}_1")(z)
                z = nn.swish(z)
                z = nn.Dropout(self.dropout, deterministic=not train)(z)
                return nn.Dense(self.size, name=f"{name}_2")(z)
            return f

        x = x + 0.5 * ff("ff_macaron")(x)
        y = nn.LayerNorm(epsilon=1e-12, name="attn_norm")(x)
        x = x + RelPositionMultiHeadAttention(self.heads, self.size, self.dropout,
                                              name="attn")(y, pos_emb, attn_mask, train)
        x = x + ConvModule(self.size, self.cnn_kernel, name="conv")(x, pad_mask, train)
        x = x + 0.5 * ff("ff")(x)
        return nn.LayerNorm(epsilon=1e-12, name="final_norm")(x)


class ConformerEncoder(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, feats, lengths, train: bool = False):
        c = self.cfg
        size = c.output_size
        if getattr(c, "input_layer", "linear") == "conv2d_nosub":
            # espnet Conv2dNoSubsampling (`encoder/subsampling.py:85-125`):
            # two 5×5 convs (stride 1) over (T, F), then Linear(odim·F → odim)
            b, t, f = feats.shape
            y = feats[..., None]
            y = nn.relu(nn.Conv(size, (5, 5), padding=((2, 2), (2, 2)),
                                name="embed_conv_0")(y))
            y = nn.relu(nn.Conv(size, (5, 5), padding=((2, 2), (2, 2)),
                                name="embed_conv_1")(y))
            # torch flattens channel-major: (B, T, C·F)
            y = y.transpose(0, 1, 3, 2).reshape(b, t, size * f)
            x = nn.Dense(size, name="embed_out")(y)
        else:
            # espnet "linear" input layer: Linear → LayerNorm → Dropout
            # (`conformer_encoder.py:102-108`)
            x = nn.Dense(size, name="embed")(feats)
            x = nn.LayerNorm(epsilon=1e-5, name="embed_norm")(x)  # plain torch LN
            x = nn.Dropout(c.dropout_rate, deterministic=not train)(x)
        # RelPositionalEncoding scales x by sqrt(d) (`embedding.py:152-166`)
        x = x * math.sqrt(size)
        t = x.shape[1]
        pos_emb = jnp.asarray(legacy_rel_pos(t, size))[None]
        pad_mask = sequence_mask(lengths, t)[..., None]
        attn_mask = pad_mask[:, None, :, 0][:, :, None, :]  # (B,1,1,T)
        for i in range(c.num_blocks):
            x = ConformerBlock(size, c.attention_heads, c.linear_units,
                               c.dropout_rate, c.cnn_kernel,
                               name=f"block_{i}")(x, pos_emb, pad_mask, attn_mask, train)
        x = nn.LayerNorm(epsilon=1e-12, name="after_norm")(x)
        return x * pad_mask


class PPGModel(nn.Module):
    """wav → (B, T, 144) bottleneck features (`ppg_extractor/__init__.py:13-62`)."""
    cfg: Any

    @nn.compact
    def __call__(self, speech, speech_lengths, train: bool = False):
        c = self.cfg
        feat_lengths = speech_lengths // c.hop_size + 1
        feats = logmel_frontend(speech, c, feat_lengths)
        feats = utterance_mvn(feats, feat_lengths, c.norm_means, c.norm_vars)
        return ConformerEncoder(c, name="encoder")(feats, feat_lengths, train)


class PPGExtractor:
    """Inference wrapper with bucketed jit (`load_model`/`extract_from_wav`
    surface)."""

    def __init__(self, model_fpath: Optional[Union[str, Path]] = None,
                 cfg=None, verbose: bool = True, seed: int = 0):
        self.cfg = Config(ppg_config()).merge(cfg or {})
        fcfg = self.cfg.freeze()
        self.model = PPGModel(fcfg)
        variables = self.model.init(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, 3200)), jnp.asarray([3200]))
        if model_fpath is not None and Path(model_fpath).exists():
            loaded = load_single(model_fpath)
            variables = jax.tree.map(jnp.asarray, loaded)
            if verbose:
                print(f"Loaded PPG extractor from {model_fpath}")
        elif verbose:
            print("PPG extractor: fresh (untrained) weights")
        self.variables = variables

    @functools.lru_cache(maxsize=8)
    def _fwd(self, n_samples: int):
        @jax.jit
        def f(variables, wav, length):
            out, _ = self.model.apply(variables, wav, length,
                                      mutable=["batch_stats"])
            return out
        return f

    def extract_from_wav(self, wav: np.ndarray) -> np.ndarray:
        """wav float32 → (T, 144) PPG at 10 ms frames."""
        return self.extract_from_wavs([wav])[0]

    def extract_from_wavs(self, wavs) -> list:
        """Batched extraction: list of wavs → list of (T_i, 144) PPGs.

        All utterances are zero-padded to one shared 1 s length bucket and
        run through ONE Conformer forward — the per-frame attention/conv
        work batches onto the MXU instead of dispatching B sequential
        programs (the PPG-VC throughput path, VERDICT r4 Next #2). Padded
        frames are masked inside the model (`sequence_mask` in the frontend,
        MVN and attention), so per-utterance outputs match the single-wav
        path."""
        ns = [len(w) for w in wavs]
        n_pad = max(3200, int(np.ceil(max(ns) / 16000)) * 16000)  # 1 s buckets
        w = np.zeros((len(wavs), n_pad), np.float32)
        for i, wav in enumerate(wavs):
            w[i, : ns[i]] = wav
        out = self._fwd(n_pad)(self.variables, jnp.asarray(w),
                               jnp.asarray(ns, jnp.int32))
        out = np.asarray(out)
        return [out[i, : ns[i] // self.cfg.hop_size + 1]
                for i in range(len(wavs))]
