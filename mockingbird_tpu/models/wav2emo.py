"""TPU-native wav2vec2 speech-emotion model (arousal/dominance/valence).

Parity with `/root/reference/models/synthesizer/models/wav2emo.py:9-50`
(`EmotionExtractorModel` = HF `Wav2Vec2Model` + tanh `RegressionHead`) and
its preprocessing entry `preprocess_audio.py:22-45` (`extract_emo`): the
1024-d mean-pooled hidden embedding conditions VITS (`vits.py:154,169`).

The reference runs this through torch/transformers on the host GPU; here the
whole wav→embedding path is ONE jitted flax program (conv feature encoder,
feature projection, weight-norm-folded grouped positional conv, (stable-)
pre-LN transformer, regression head) so emotion extraction rides the TPU's
MXU during preprocessing. Weights come from the reference's pretrained
checkpoint via `interop.torch_weights.convert_wav2vec2_emotion`; both HF
encoder variants (`do_stable_layer_norm`, `feat_extract_norm` layer/group)
are supported and equivalence-tested against the torch classes.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config

_LN_EPS = 1e-5


def wav2emo_config() -> Config:
    """audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim architecture
    (wav2vec2-large-robust pruned to 12 transformer blocks, 3 regression
    labels)."""
    return Config(
        conv_dim=(512, 512, 512, 512, 512, 512, 512),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_bias=True,
        feat_extract_norm="layer",      # "layer" (robust) or "group" (base)
        hidden_size=1024,
        num_hidden_layers=12,
        num_attention_heads=16,
        intermediate_size=4096,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=True,
        num_labels=3,
        sample_rate=16000,
    )


def feat_extract_output_length(length: int, cfg) -> int:
    """Waveform samples → frame count after the conv feature encoder."""
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        length = (length - k) // s + 1
    return length


def normalize_wav(wav: jnp.ndarray, n_valid: Optional[jnp.ndarray] = None):
    """HF Wav2Vec2FeatureExtractor zero-mean/unit-var normalization. With
    `n_valid` (true sample counts), statistics ignore right-padding and the
    padded tail is left at exactly 0 (matching HF's padded batching)."""
    if n_valid is None:
        mean = jnp.mean(wav, axis=-1, keepdims=True)
        var = jnp.var(wav, axis=-1, keepdims=True)
        return (wav - mean) / jnp.sqrt(var + 1e-7)
    t = wav.shape[-1]
    mask = (jnp.arange(t)[None, :] < n_valid[:, None]).astype(wav.dtype)
    n = jnp.maximum(n_valid[:, None].astype(wav.dtype), 1.0)
    mean = jnp.sum(wav * mask, -1, keepdims=True) / n
    var = jnp.sum(jnp.square(wav - mean) * mask, -1, keepdims=True) / n
    return (wav - mean) / jnp.sqrt(var + 1e-7) * mask


class FeatureEncoder(nn.Module):
    """Strided conv stack (Wav2Vec2FeatureEncoder): raw wav → frame feats.
    `feat_extract_norm="layer"` puts a LayerNorm after every conv
    (`Wav2Vec2LayerNormConvLayer`); "group" puts one GroupNorm after conv 0
    only (`Wav2Vec2GroupNormConvLayer`)."""
    cfg: Any  # FrozenConfig (pass Config.freeze())

    @nn.compact
    def __call__(self, wav):                      # (B, T) → (B, frames, C)
        c = self.cfg
        x = wav[..., None]
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                        use_bias=c.conv_bias, name=f"conv_{i}")(x)
            if c.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=_LN_EPS, name=f"ln_{i}")(x)
            elif i == 0:  # "group"
                x = nn.GroupNorm(num_groups=dim, epsilon=_LN_EPS, name="gn_0")(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embeddings (Wav2Vec2PositionalConvEmbedding).
    The torch module is weight-normed (dim=2); the converter folds g·v/‖v‖
    into a plain kernel. Even kernels drop the trailing frame
    (Wav2Vec2SamePadLayer)."""
    cfg: Any  # FrozenConfig (pass Config.freeze())

    @nn.compact
    def __call__(self, x):                        # (B, T, H)
        c = self.cfg
        k = c.num_conv_pos_embeddings
        y = nn.Conv(c.hidden_size, (k,), padding=[(k // 2, k // 2)],
                    feature_group_count=c.num_conv_pos_embedding_groups,
                    name="conv")(x)
        if k % 2 == 0:
            y = y[:, :-1]
        return jax.nn.gelu(y, approximate=False)


class SelfAttention(nn.Module):
    """Standard post-scaling MHA (Wav2Vec2Attention, all projections biased)."""
    cfg: Any  # FrozenConfig (pass Config.freeze())

    @nn.compact
    def __call__(self, x, attn_bias):             # (B, T, H), (B, 1, 1, T)
        c = self.cfg
        h, n = c.hidden_size, c.num_attention_heads
        d = h // n
        q = nn.Dense(h, name="q_proj")(x) * (d ** -0.5)
        k = nn.Dense(h, name="k_proj")(x)
        v = nn.Dense(h, name="v_proj")(x)
        split = lambda t: t.reshape(t.shape[0], t.shape[1], n, d)
        scores = jnp.einsum("bqnd,bknd->bnqk", split(q), split(k))
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bnqk,bknd->bqnd", probs, split(v))
        out = out.reshape(x.shape[0], x.shape[1], h)
        return nn.Dense(h, name="out_proj")(out)


class FeedForward(nn.Module):
    cfg: Any  # FrozenConfig (pass Config.freeze())

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.cfg.intermediate_size, name="intermediate_dense")(x)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Dense(self.cfg.hidden_size, name="output_dense")(y)


class EncoderLayer(nn.Module):
    """One transformer block; `stable=True` is the pre-LN variant
    (Wav2Vec2EncoderLayerStableLayerNorm), else post-LN."""
    cfg: Any  # FrozenConfig (pass Config.freeze())
    stable: bool

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        if self.stable:
            y = nn.LayerNorm(epsilon=_LN_EPS, name="layer_norm")(x)
            x = x + SelfAttention(c, name="attention")(y, attn_bias)
            y = nn.LayerNorm(epsilon=_LN_EPS, name="final_layer_norm")(x)
            return x + FeedForward(c, name="feed_forward")(y)
        x = x + SelfAttention(c, name="attention")(x, attn_bias)
        x = nn.LayerNorm(epsilon=_LN_EPS, name="layer_norm")(x)
        x = x + FeedForward(c, name="feed_forward")(x)
        return nn.LayerNorm(epsilon=_LN_EPS, name="final_layer_norm")(x)


class Wav2Vec2Encoder(nn.Module):
    """Positional conv + transformer stack. Matches HF's mask semantics:
    padded frames are zeroed before the positional conv and excluded from
    attention via an additive −inf key bias."""
    cfg: Any  # FrozenConfig (pass Config.freeze())

    @nn.compact
    def __call__(self, x, frame_mask):            # (B, T, H), (B, T) or None
        c = self.cfg
        attn_bias = None
        if frame_mask is not None:
            x = x * frame_mask[..., None]
            attn_bias = jnp.where(frame_mask[:, None, None, :] > 0, 0.0,
                                  jnp.finfo(jnp.float32).min)
        x = x + PositionalConvEmbedding(c, name="pos_conv_embed")(x)
        if not c.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=_LN_EPS, name="layer_norm")(x)
        for i in range(c.num_hidden_layers):
            x = EncoderLayer(c, c.do_stable_layer_norm, name=f"layer_{i}")(x, attn_bias)
        if c.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=_LN_EPS, name="layer_norm")(x)
        return x


class Wav2Vec2Model(nn.Module):
    """Feature encoder → projection → transformer (HF Wav2Vec2Model, eval
    semantics: no spec-augment masking, no dropout)."""
    cfg: Any  # FrozenConfig (pass Config.freeze())

    @nn.compact
    def __call__(self, wav, frame_mask=None):     # (B, T) → (B, frames, H)
        c = self.cfg
        feats = FeatureEncoder(c, name="feature_encoder")(wav)
        x = nn.LayerNorm(epsilon=_LN_EPS, name="fp_layer_norm")(feats)
        x = nn.Dense(c.hidden_size, name="fp_projection")(x)
        return Wav2Vec2Encoder(c, name="encoder")(x, frame_mask)


class EmotionExtractorModel(nn.Module):
    """Wav2Vec2 + tanh regression head (`wav2emo.py:9-50`). Returns
    (mean-pooled hidden embedding, emotion logits); with `frame_mask` the
    pooling is a masked mean (the reference never pads, so unmasked calls
    reproduce it exactly)."""
    cfg: Any  # FrozenConfig (pass Config.freeze())

    @nn.compact
    def __call__(self, wav, frame_mask=None):
        c = self.cfg
        hidden = Wav2Vec2Model(c, name="wav2vec2")(wav, frame_mask)
        if frame_mask is None:
            pooled = jnp.mean(hidden, axis=1)
        else:
            n = jnp.maximum(jnp.sum(frame_mask, -1, keepdims=True), 1.0)
            pooled = jnp.sum(hidden * frame_mask[..., None], axis=1) / n
        y = nn.Dense(c.hidden_size, name="cls_dense")(pooled)
        y = jnp.tanh(y)
        logits = nn.Dense(c.num_labels, name="cls_out_proj")(y)
        return pooled, logits


def init_wav2emo(rng, cfg: Optional[Config] = None, n_samples: int = 1600):
    cfg = cfg or wav2emo_config()
    model = EmotionExtractorModel(cfg.freeze())
    variables = model.init(rng, jnp.zeros((1, n_samples), jnp.float32))
    return model, variables
