"""PPG→Mel one-shot voice-conversion decoder (MelDecoderMOLv2), TPU-native.

Parity with `/root/reference/models/ppg2mel/__init__.py:20-209`,
`rnn_decoder_mol.py:24-374` and `utils/mol_attention.py:6-123`:
conv-downsampled PPG prenet (×4) + parallel pitch (lf0+uv) convs summed,
normalised speaker d-vector concat → reduce_proj, MOL-attention
(location-relative GMMv2b) LSTM decoder emitting 2 mel frames/step with stop
tokens, 5-layer conv Postnet.

TPU-first: teacher-forced decoding is an `nn.scan`; inference is a jitted
`lax.while_loop` with on-device stop; the whole model keeps static shapes.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from ..vits.modules import sequence_mask


def ppg2mel_config() -> Config:
    return Config(
        num_speakers=1,
        spk_embed_dim=256,
        bottle_neck_feature_dim=144,
        encoder_dim=256,
        encoder_downsample_rates=[2, 2],
        attention_rnn_dim=512,
        decoder_rnn_dim=512,
        num_decoder_rnn_layer=1,
        concat_context_to_last=True,
        prenet_dims=[256, 128],
        num_mixtures=5,
        frames_per_step=2,
        num_mels=80,
        pitch_dim=2,
    )


class DecoderPrenet(nn.Module):
    """Bias-free Dense+relu+always-on dropout stack
    (`rnn_decoder_mol.py:10-22`; Linear bias=False at `:15`, dropout
    training=True hardcoded at `:20` — kept, gated only for equivalence
    tests via always_dropout=False)."""
    sizes: tuple
    always_dropout: bool = True

    @nn.compact
    def __call__(self, x):
        for i, s in enumerate(self.sizes):
            x = nn.relu(nn.Dense(s, use_bias=False, name=f"fc{i}")(x))
            x = nn.Dropout(0.5, deterministic=not self.always_dropout)(x)
        return x


class MOLAttention(nn.Module):
    """Discretized mixture-of-logistics location-relative attention
    (`utils/mol_attention.py:6-123`). Stateless: caller carries mu_prev."""
    M: int = 5
    r: float = 0.5  # frames_per_step / encoder_down_factor

    @nn.compact
    def __call__(self, query, memory, mu_prev, mask=None, train: bool = False):
        def delta_bias_init(key, shape, dtype=jnp.float32):
            # softplus(bias) ≈ r (`mol_attention.py:41-52`)
            bias = {1: 0.5413, 2: 1.8545, 4: 3.9815}.get(int(self.r) if self.r >= 1 else -1,
                                                         -0.432)
            b = np.zeros(shape, np.float32)
            b[self.M : 2 * self.M] = 1.0        # sigma bias
            b[2 * self.M :] = bias              # Delta bias
            return jnp.asarray(b)

        h = nn.relu(nn.Dense(256, name="query_fc1")(query))
        params = nn.Dense(3 * self.M, bias_init=delta_bias_init, name="query_fc2")(h)
        w_hat = params[:, : self.M]
        sigma_hat = params[:, self.M : 2 * self.M]
        delta_hat = params[:, 2 * self.M :]
        w_hat = nn.Dropout(0.5, deterministic=not train)(w_hat)

        eps = 1e-5
        w = jax.nn.softmax(w_hat, axis=-1) + eps
        sigma = jax.nn.softplus(sigma_hat) + eps
        delta = jax.nn.softplus(delta_hat)
        mu_cur = mu_prev + delta

        t_enc = memory.shape[1]
        j = (jnp.arange(t_enc + 1) + 0.5)[None, None, :]           # (1,1,T+1)
        # reference quirk kept verbatim: CDF via 1/(1+sigmoid((mu-j)/sigma))
        phi = w[..., None] * (1.0 / (1.0 + jax.nn.sigmoid(
            (mu_cur[..., None] - j) / sigma[..., None])))
        alpha = jnp.sum(phi, axis=1)                                # (B, T+1)
        alpha = alpha[:, 1:] - alpha[:, :-1]                        # (B, T)
        alpha = jnp.where(alpha == 0, eps, alpha)
        if mask is not None:
            alpha = alpha * mask                                    # score_mask_value=0
        context = jnp.einsum("bt,btd->bd", alpha, memory)
        return context, alpha, mu_cur


class MolDecoderCell(nn.Module):
    """One decode step (`rnn_decoder_mol.py:187-207`)."""
    cfg: Any

    def setup(self):
        c = self.cfg
        self.prenet = DecoderPrenet(tuple(c.prenet_dims),
                                    always_dropout=getattr(c, "prenet_always_dropout", True),
                                    name="prenet")
        self.attention_rnn = nn.OptimizedLSTMCell(c.attention_rnn_dim, name="attention_rnn")
        down = int(np.prod(c.encoder_downsample_rates))
        self.attention_layer = MOLAttention(c.num_mixtures, c.frames_per_step / down,
                                            name="attention_layer")
        self.decoder_rnns = [nn.OptimizedLSTMCell(c.decoder_rnn_dim, name=f"decoder_rnn_{i}")
                             for i in range(c.num_decoder_rnn_layer)]
        out_in = c.encoder_dim + c.decoder_rnn_dim if c.concat_context_to_last \
            else c.decoder_rnn_dim
        self.linear_projection = nn.Dense(c.num_mels * c.frames_per_step,
                                          name="linear_projection")
        self.stop_layer = nn.Dense(1, name="stop_layer")

    def __call__(self, memory, mem_mask, carry, prev_frame, train: bool):
        c = self.cfg
        (attn_state, dec_states, context, mu_prev) = carry
        pre = self.prenet(prev_frame)
        attn_state, attn_h = self.attention_rnn(
            attn_state, jnp.concatenate([pre, context], axis=-1))
        context, alpha, mu_prev = self.attention_layer(
            attn_h, memory, mu_prev, mem_mask, train)

        x = jnp.concatenate([attn_h, context], axis=-1)
        new_dec_states = []
        for i, cell in enumerate(self.decoder_rnns):
            st, x = cell(dec_states[i], x)
            new_dec_states.append(st)
        if c.concat_context_to_last:
            x = jnp.concatenate([x, context], axis=-1)
        mel = self.linear_projection(x)            # (B, M*r)
        stop = self.stop_layer(x)[:, 0]
        carry = (attn_state, tuple(new_dec_states), context, mu_prev)
        return carry, (mel, stop, alpha)

    def init_carry(self, batch: int, enc_dim: int):
        c = self.cfg
        z = lambda d: jnp.zeros((batch, d))
        attn_state = (z(c.attention_rnn_dim), z(c.attention_rnn_dim))
        dec_states = tuple((z(c.decoder_rnn_dim), z(c.decoder_rnn_dim))
                           for _ in range(c.num_decoder_rnn_layer))
        return (attn_state, dec_states, z(enc_dim), jnp.zeros((batch, c.num_mixtures)))


class Postnet(nn.Module):
    """5×(conv512 k5 + BN) residual refinement (`utils/cnn_postnet.py:7-52`)."""
    num_mels: int = 80
    hidden: int = 512
    layers: int = 5
    kernel: int = 5

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.layers - 1):
            x = nn.Conv(self.hidden, (self.kernel,), padding="SAME", name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn_{i}")(x)
            x = jnp.tanh(x)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(self.num_mels, (self.kernel,), padding="SAME", name=f"conv_out")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_out")(x)
        return nn.Dropout(0.5, deterministic=not train)(x)


def _instance_norm(x):
    """Non-affine instance norm over time, per channel."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class DownsampleConvStack(nn.Module):
    """1×1 conv + two stride-2 convs with leaky-relu + instance norm
    (`ppg2mel/__init__.py:50-98`). (B, T, C) → (B, T/4, encoder_dim)."""
    encoder_dim: int
    rates: tuple

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.encoder_dim, (1,), use_bias=False, name="conv_in")(x)
        x = nn.leaky_relu(x, 0.1)
        x = _instance_norm(x)
        for i, r in enumerate(self.rates):
            x = nn.Conv(self.encoder_dim, (2 * r,), strides=(r,), padding=[(r // 2, r // 2)],
                        name=f"down_{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            x = _instance_norm(x)
        return x


class MelDecoderMOLv2(nn.Module):
    """Full PPG→mel model (`ppg2mel/__init__.py:20-192`)."""
    cfg: Any

    def setup(self):
        c = self.cfg
        self.bnf_prenet = DownsampleConvStack(c.encoder_dim,
                                              tuple(c.encoder_downsample_rates),
                                              name="bnf_prenet")
        self.pitch_convs = DownsampleConvStack(c.encoder_dim,
                                               tuple(c.encoder_downsample_rates),
                                               name="pitch_convs")
        self.reduce_proj = nn.Dense(c.encoder_dim, name="reduce_proj")
        self.cell = MolDecoderCell(c, name="decoder")
        self.postnet = Postnet(c.num_mels, name="postnet")

    def encode_inputs(self, bnf, logf0_uv, spembs):
        x = self.bnf_prenet(bnf)
        p = self.pitch_convs(logf0_uv)
        x = x + p
        spk = spembs / (jnp.linalg.norm(spembs, axis=-1, keepdims=True) + 1e-8)
        spk = jnp.broadcast_to(spk[:, None, :], (x.shape[0], x.shape[1], spk.shape[-1]))
        return self.reduce_proj(jnp.concatenate([x, spk], axis=-1))

    def __call__(self, bnf, feature_lengths, speech, speech_lengths,
                 logf0_uv, spembs, train: bool = True):
        """Teacher-forced training forward. speech (B, T_mel, M)."""
        c = self.cfg
        memory = self.encode_inputs(bnf, logf0_uv, spembs)
        down = int(np.prod(c.encoder_downsample_rates))
        mem_mask = sequence_mask(feature_lengths // down, memory.shape[1])

        b, t_mel, m = speech.shape
        r = c.frames_per_step
        steps = t_mel // r
        go = jnp.zeros((b, 1, m))
        # input at step s is frame (s*r - 1)'s row in the r-strided sequence
        dec_in = jnp.concatenate([go, speech[:, r - 1 :: r][:, : steps - 1]], axis=1)
        dec_in = jnp.swapaxes(dec_in, 0, 1)  # (S, B, M)

        carry = self.cell.init_carry(b, c.encoder_dim)

        def body(mdl, carry, frame):
            return mdl.cell(memory, mem_mask, carry, frame, train)

        # scan_unroll measured counterproductive here (36.5 ms at 1 vs
        # 38.7 at 4, batch 8; 98.3 vs 103.7 at batch 256) — the MOL
        # attention's per-step work is already few large ops. Knob kept.
        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=0,
                       unroll=c.get("scan_unroll", 1))
        _, (mels, stops, aligns) = scan(self, carry, dec_in)
        mel_out = jnp.swapaxes(mels, 0, 1).reshape(b, steps * r, m)
        stop_out = jnp.repeat(jnp.swapaxes(stops, 0, 1), r, axis=1)
        aligns = jnp.swapaxes(aligns, 0, 1)

        post = self.postnet(mel_out, train)
        mel_post = mel_out + post

        out_mask = sequence_mask(speech_lengths, t_mel)[..., None]
        return mel_out * out_mask, mel_post * out_mask, stop_out, aligns

    def decode_step(self, memory, mem_mask, carry, prev_frame):
        return self.cell(memory, mem_mask, carry, prev_frame, False)

    def postnet_apply(self, mel, train: bool = False):
        return mel + self.postnet(mel, train)

    def init_carry(self, batch):
        return self.cell.init_carry(batch, self.cfg.encoder_dim)


def init_ppg2mel(key, cfg=None, t_ppg: int = 16, t_mel: int = 8):
    cfg = cfg or ppg2mel_config()
    if isinstance(cfg, Config):
        fcfg = cfg.freeze()
    else:
        fcfg = cfg
    model = MelDecoderMOLv2(fcfg)
    b = 1
    bnf = jnp.zeros((b, t_ppg, fcfg.bottle_neck_feature_dim))
    fl = jnp.asarray([t_ppg], jnp.int32)
    speech = jnp.zeros((b, t_mel, fcfg.num_mels))
    sl = jnp.asarray([t_mel], jnp.int32)
    lf0 = jnp.zeros((b, t_ppg, fcfg.pitch_dim))
    spk = jnp.zeros((b, fcfg.spk_embed_dim))
    k1, k2 = jax.random.split(key)
    variables = model.init({"params": k1, "dropout": k2}, bnf, fl, speech, sl, lf0, spk)
    return model, variables
