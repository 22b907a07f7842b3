"""Tacotron SV2TTS synthesizer, TPU-native.

Behavioural parity with `/root/reference/models/synthesizer/models/tacotron.py`
(CBHG encoder + per-char speaker-embedding concat + GST concat + autoregressive
decoder with LSA attention, two zoneout LSTMs, reduction factor r, stop-token
head, CBHG postnet), with TPU-first structure:

  * the teacher-forced training decoder is a `lax.scan` over frame groups
    (one compiled while-loop) instead of a Python loop (`tacotron.py:264-275`);
  * greedy generation is a `lax.while_loop` with on-device stop-token
    early-exit (see inference.py), all static shapes;
  * the decoder step is a standalone module (`TacotronDecoderCell`) so the
    same parameters drive both paths.

Dims (hparams `models/synthesizer/hparams.py`): embed 512, encoder 256,
decoder 128, lstm 1024, postnet 512, K=5/5, 4 highways, dropout 0.5; GST:
10 tokens × 8 heads, E=512 (`gst_hyperparameters.py`); reduction r ≤ 20.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config


def tacotron_config() -> Config:
    """Model hyperparameters (reference `hparams.py:17-32`, `gst_hyperparameters.py`)."""
    from ...text import symbols as _symbols
    return Config(
        num_chars=len(_symbols),    # 75: pad+eos+letters+digits+punct
        embed_dims=512,
        encoder_dims=256,
        decoder_dims=128,
        n_mels=80,
        fft_bins=80,                # postnet head size == n_mels (train.py:91)
        postnet_dims=512,
        encoder_K=5,
        postnet_K=5,
        num_highways=4,
        lstm_dims=1024,
        dropout=0.5,
        speaker_embedding_size=256,
        max_r=20,
        stop_threshold=-3.4,
        lsa_mask="additive",        # "reference" = the lsa.py:41 u*mask quirk
        remat_decoder=False,        # rematerialise the decoder scan (large batch)
        fused_scan=True,            # hoist prenet/RNG/output-proj out of the scan
        scan_unroll=4,              # unroll factor for the teacher-forced scan
        use_gst=True,
        use_ser_for_gst=True,
        gst_E=512,
        gst_token_num=10,
        gst_num_heads=8,
        gst_ref_filters=(32, 32, 64, 64, 128, 128),
    )


class HighwayNetwork(nn.Module):
    """y = g·relu(W1 x) + (1-g)·x (`sublayer/common/highway_network.py`)."""
    size: int

    @nn.compact
    def __call__(self, x):
        x1 = nn.Dense(self.size, name="W1")(x)
        g = jax.nn.sigmoid(nn.Dense(self.size, name="W2")(x))
        return g * nn.relu(x1) + (1.0 - g) * x


class BatchNormConv(nn.Module):
    """Conv1d(no bias) → (relu) → BatchNorm, matching the reference's unusual
    relu-before-BN order (`sublayer/common/batch_norm_conv.py`). Time-major
    (B, T, C) layout."""
    out_channels: int
    kernel: int
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.out_channels, (self.kernel,), padding=self.kernel // 2,
                    use_bias=False, name="conv")(x)
        if self.relu:
            x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bnorm")(x)
        return x


class CBHG(nn.Module):
    """Conv bank (k=1..K) → maxpool(2,1) → 2 conv projections + residual →
    highways → BiGRU (`sublayer/cbhg.py:6-85`). (B, T, C) in/out."""
    K: int
    channels: int
    proj_channels: Tuple[int, int]
    num_highways: int

    @nn.compact
    def __call__(self, x, train: bool):
        seq_len = x.shape[1]
        residual = x

        bank = [BatchNormConv(self.channels, k, name=f"bank_{k}")(x, train)[:, :seq_len]
                for k in range(1, self.K + 1)]
        y = jnp.concatenate(bank, axis=-1)

        # maxpool kernel 2 stride 1 pad 1, trimmed to seq_len
        y = jnp.pad(y, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
        y = jnp.maximum(y[:, :-1], y[:, 1:])[:, :seq_len]

        y = BatchNormConv(self.proj_channels[0], 3, name="conv_project1")(y, train)
        y = BatchNormConv(self.proj_channels[1], 3, relu=False, name="conv_project2")(y, train)
        y = y + residual

        if self.proj_channels[-1] != self.channels:
            y = nn.Dense(self.channels, use_bias=False, name="pre_highway")(y)
        for i in range(self.num_highways):
            y = HighwayNetwork(self.channels, name=f"highway_{i}")(y)

        half = self.channels // 2
        # cells constructed in this compact scope bind here: name explicitly
        cell_f = nn.GRUCell(half, name="gru_fwd")
        cell_b = nn.GRUCell(half, name="gru_bwd")
        fwd = nn.RNN(cell_f)(y)
        bwd = nn.RNN(cell_b, reverse=True, keep_order=True)(y)
        return jnp.concatenate([fwd, bwd], axis=-1)


class PreNet(nn.Module):
    """Two dense+relu layers with always-on dropout (`sublayer/pre_net.py` —
    dropout stays active at inference, the classic Tacotron trick).
    ``enabled=False`` disables it entirely (used by equivalence tests)."""
    fc1_dims: int
    fc2_dims: int
    dropout: float = 0.5
    enabled: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.fc1_dims, name="fc1")(x))
        x = nn.Dropout(self.dropout, deterministic=not self.enabled)(x)
        x = nn.relu(nn.Dense(self.fc2_dims, name="fc2")(x))
        x = nn.Dropout(self.dropout, deterministic=not self.enabled)(x)
        return x


class TacotronEncoder(nn.Module):
    """Char embedding → PreNet → CBHG (`tacotron.py:11-44`)."""
    cfg: Any

    @nn.compact
    def __call__(self, texts, train: bool):
        c = self.cfg
        x = nn.Embed(c.num_chars, c.embed_dims, name="embedding")(texts)
        x = PreNet(c.encoder_dims, c.encoder_dims, c.dropout,
                   enabled=getattr(c, "prenet_dropout", True), name="pre_net")(x)
        return CBHG(c.encoder_K, c.encoder_dims, (c.encoder_dims, c.encoder_dims),
                    c.num_highways, name="cbhg")(x, train)


# ---------------------------------------------------------------------------
# Global style tokens (`sublayer/global_style_token.py`)
# ---------------------------------------------------------------------------

class ReferenceEncoder(nn.Module):
    """Stack of stride-2 conv2d + BN + relu, then GRU → (B, E/2). The input is
    (B, T, n_feat) 'mel-like'; in this codebase it is the 256-d speaker
    embedding viewed as one frame (`global_style_token.py:30-76`)."""
    cfg: Any

    @nn.compact
    def __call__(self, inputs, train: bool):
        c = self.cfg
        b = inputs.shape[0]
        n_feat = inputs.shape[-1]
        x = inputs.reshape(b, -1, n_feat, 1)  # NHWC: (B, T, n_feat, 1)
        for i, ch in enumerate(c.gst_ref_filters):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"bn_{i}")(x)
            x = nn.relu(x)
        b, t, w, ch = x.shape
        # torch flattens channel-major (C, W): match that order for interop
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, ch * w)
        cell = nn.GRUCell(c.gst_E // 2, name="gru")
        out = nn.RNN(cell)(x)
        return out[:, -1, :]  # final hidden state


class StyleTokenLayer(nn.Module):
    """10 learned tokens attended by the reference encoding (+ speaker embed)
    through 8-head attention (`global_style_token.py:81-148`)."""
    cfg: Any

    def setup(self):
        c = self.cfg
        self.embed = self.param(
            "embed", nn.initializers.normal(0.5),
            (c.gst_token_num, c.gst_E // c.gst_num_heads))
        self.W_query = nn.Dense(c.gst_E, use_bias=False, name="W_query")
        self.W_key = nn.Dense(c.gst_E, use_bias=False, name="W_key")
        self.W_value = nn.Dense(c.gst_E, use_bias=False, name="W_value")

    def __call__(self, query_vec):
        """query_vec (B, d_q) → style embed (B, 1, E)."""
        c = self.cfg
        n = query_vec.shape[0]
        keys = jnp.tanh(self.embed)[None].repeat(n, axis=0)  # (B, tokens, E/h)
        q = self.W_query(query_vec[:, None, :])               # (B, 1, E)
        k = self.W_key(keys)                                  # (B, tokens, E)
        v = self.W_value(keys)
        h, e = c.gst_num_heads, c.gst_E
        d = e // h
        key_dim = self.embed.shape[-1]

        def split(x):  # (B, T, E) → (h, B, T, d)
            return jnp.stack(jnp.split(x, h, axis=2), axis=0)
        qs, ks, vs = split(q), split(k), split(v)
        scores = jnp.einsum("hbqd,hbkd->hbqk", qs, ks) / (key_dim ** 0.5)
        scores = jax.nn.softmax(scores, axis=3)
        out = jnp.einsum("hbqk,hbkd->hbqd", scores, vs)       # (h, B, 1, d)
        return jnp.concatenate(list(out), axis=2)             # (B, 1, E)

    def token_value(self, style_idx: jax.Array):
        """Inference style selection: with a zero query the attention output
        collapses to W_value(tanh(embed[style_idx])) (`tacotron.py:246-251`)."""
        key = jnp.tanh(self.embed)[style_idx][None, None, :]  # (1, 1, E/h)
        return self.W_value(key)                              # (1, 1, E)


class GlobalStyleToken(nn.Module):
    cfg: Any

    def setup(self):
        self.encoder = ReferenceEncoder(self.cfg, name="encoder")
        self.stl = StyleTokenLayer(self.cfg, name="stl")

    def __call__(self, inputs, speaker_embedding, train: bool):
        enc_out = self.encoder(inputs, train)
        if self.cfg.use_ser_for_gst and speaker_embedding is not None:
            enc_out = jnp.concatenate([enc_out, speaker_embedding], axis=-1)
        return self.stl(enc_out)

    def token_style(self, style_idx):
        return self.stl.token_value(style_idx)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class LSA(nn.Module):
    """Location-sensitive attention (`sublayer/lsa.py:5-43`): conv(31,32) over
    the cumulative attention, additive scoring.

    Masking diverges deliberately from the reference: `lsa.py:41` multiplies
    pre-softmax logits by the char mask, so every padded position keeps
    logit 0 → weight e⁰. The reference pads text only to the batch max, so
    the leak is small; this build bucket-pads text to fixed lengths
    (XLA compile-cache keys, `dataset.py:TEXT_BUCKET`), where dozens of e⁰
    pad positions soak up real attention mass and visibly blur alignment.
    Default is therefore proper additive masking (-1e9 on pads); the quirk
    stays available as masking="reference" (with no padded positions the two
    are identical, which is why torch-equivalence tests pass either way)."""
    attn_dim: int
    kernel_size: int = 31
    filters: int = 32
    masking: str = "additive"

    @nn.compact
    def __call__(self, encoder_seq_proj, query, cumulative, char_mask):
        processed_query = nn.Dense(self.attn_dim, name="W")(query)[:, None, :]
        # conv(31,1→32) followed by L(32→128) composed into ONE effective
        # (31,1→128) conv: L is linear, so k_eff = k ∘ L and the conv bias
        # becomes a constant (128,) vector. One kernel instead of two per
        # decoder step (this runs S times inside the scan), and the
        # (B, T, 32) intermediate never exists. Param paths are unchanged
        # (conv/kernel, conv/bias, L/kernel) so checkpoints and the torch
        # interop mapping are untouched; the composition is exact modulo
        # float reassociation.
        lecun = nn.initializers.lecun_normal()
        conv_k, conv_b = _GateParams(
            (self.kernel_size, 1, self.filters), lecun, True, name="conv")()
        l_k, _ = _GateParams((self.filters, self.attn_dim), lecun, False,
                             name="L")()
        k_eff = jnp.einsum("kio,od->kid", conv_k, l_k)
        pad = (self.kernel_size - 1) // 2
        processed_loc = jax.lax.conv_general_dilated(
            cumulative[..., None], k_eff.astype(cumulative.dtype),
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC")) + conv_b @ l_k
        u = nn.Dense(1, use_bias=False, name="v")(
            jnp.tanh(processed_query + encoder_seq_proj + processed_loc))[..., 0]
        if self.masking == "reference":
            u = u * char_mask
        else:
            u = jnp.where(char_mask > 0, u, -1e9)
        return jax.nn.softmax(u, axis=1)  # (B, T_text)


class FusedGRUCell(nn.Module):
    """flax ``nn.GRUCell`` numerics and parameter tree (ir/iz/in + hr/hz/hn,
    biases on the i-gates and hn) computed as TWO concatenated matmuls
    instead of six per-gate Denses. Inside the decoder scan the six small
    (B,·)@(·,H) kernels are pure launch overhead; concatenating the gate
    kernels keeps the MXU fed and triples per-kernel work. Checkpoints and
    the torch-interop mapping are unaffected (identical param paths)."""
    features: int

    @nn.compact
    def __call__(self, carry, inputs):
        h = carry
        d, hd = inputs.shape[-1], self.features
        lecun = nn.initializers.lecun_normal()
        orth = nn.initializers.orthogonal()
        wi, bi = [], []
        for g in ("ir", "iz", "in"):
            k, b = _GateParams((d, hd), lecun, True, name=g)()
            wi.append(k)
            bi.append(b)
        wh = []
        for g, has_b in (("hr", False), ("hz", False), ("hn", True)):
            k, b = _GateParams((hd, hd), orth, has_b, name=g)()
            wh.append(k)
            if has_b:
                bn = b
        x_proj = inputs @ jnp.concatenate(wi, axis=1) + jnp.concatenate(bi)
        h_proj = h @ jnp.concatenate(wh, axis=1)
        xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
        hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * (hn + bn))
        new_h = (1.0 - z) * n + z * h
        return new_h, new_h


class _GateParams(nn.Module):
    """kernel(+bias) holder reproducing flax's per-gate param paths so
    checkpoints and the torch-interop mapping stay valid (same pattern as
    `models/encoder/model.py:_GateParams`)."""
    shape: tuple
    kernel_init: Any
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = (self.param("bias", nn.initializers.zeros_init(), (self.shape[-1],))
             if self.use_bias else None)
        return k, b


class TacotronDecoderCell(nn.Module):
    """One decoder step (`tacotron.py:46-138`): PreNet → attention GRU → LSA →
    context → 2 zoneout-LSTMs with residuals → r mel frames + stop token."""
    cfg: Any

    def setup(self):
        c = self.cfg
        self.prenet = PreNet(c.decoder_dims * 2, c.decoder_dims * 2, c.dropout,
                             enabled=getattr(c, "prenet_dropout", True), name="prenet")
        self.attn_net = LSA(c.decoder_dims, name="attn_net",
                            masking=getattr(c, "lsa_mask", "additive"))
        self.attn_rnn = FusedGRUCell(c.decoder_dims, name="attn_rnn")
        self.rnn_input = nn.Dense(c.lstm_dims, name="rnn_input")
        self.res_rnn1 = nn.OptimizedLSTMCell(c.lstm_dims, name="res_rnn1")
        self.res_rnn2 = nn.OptimizedLSTMCell(c.lstm_dims, name="res_rnn2")
        self.mel_proj = nn.Dense(c.n_mels * c.max_r, use_bias=False, name="mel_proj")
        self.stop_proj = nn.Dense(1, name="stop_proj")

    def _zoneout(self, prev, current, mask=None, p=0.1):
        if mask is None:
            mask = jax.random.bernoulli(self.make_rng("zoneout"), p, prev.shape)
        return jnp.where(mask, prev, current)

    def step_core(self, encoder_seq, encoder_seq_proj, char_mask, carry,
                  prenet_out, train: bool, zo_masks=None):
        """Recurrent core of one decoder step: everything that genuinely
        depends on the carry. PreNet (whose input is known for all steps
        under teacher forcing) and the mel/stop output projections (pure
        functions of this step's outputs) live OUTSIDE so the fused
        training path can run them as single large MXU matmuls over all S
        steps — and so the per-step threefry RNG for zoneout can be one
        batched draw instead of S sequential ones (`zo_masks`).

        Returns (carry, (x, context_vec, scores)) where ``x`` feeds
        mel_proj and stop_proj."""
        (attn_hidden, rnn1_state, rnn2_state, context_vec, cumulative) = carry

        attn_rnn_in = jnp.concatenate([context_vec, prenet_out], axis=-1)
        _, attn_hidden = self.attn_rnn(attn_hidden, attn_rnn_in)

        scores = self.attn_net(encoder_seq_proj, attn_hidden, cumulative, char_mask)
        cumulative = cumulative + scores
        context_vec = jnp.einsum("bt,btd->bd", scores, encoder_seq)

        x = self.rnn_input(jnp.concatenate([context_vec, attn_hidden], axis=1))

        m1, m2 = zo_masks if zo_masks is not None else (None, None)
        rnn1_state_next, rnn1_out = self.res_rnn1(rnn1_state, x)
        rnn1_hidden = self._zoneout(rnn1_state[1], rnn1_out, m1) if train else rnn1_out
        rnn1_state = (rnn1_state_next[0], rnn1_hidden)
        x = x + rnn1_hidden

        rnn2_state_next, rnn2_out = self.res_rnn2(rnn2_state, x)
        rnn2_hidden = self._zoneout(rnn2_state[1], rnn2_out, m2) if train else rnn2_out
        rnn2_state = (rnn2_state_next[0], rnn2_hidden)
        x = x + rnn2_hidden

        carry = (attn_hidden, rnn1_state, rnn2_state, context_vec, cumulative)
        return carry, (x, context_vec, scores)

    def project_out(self, x, context_vec, r: int):
        """mel/stop heads over decoder output ``x`` (..., lstm_dims). Works
        per-step ((B, D), legacy/generation) or stacked over all steps
        ((S, B, D), fused path) — Dense maps the trailing axis either way."""
        c = self.cfg
        lead = x.shape[:-1]
        mels = self.mel_proj(x).reshape(*lead, c.n_mels, c.max_r)[..., :r]
        mels = jnp.swapaxes(mels, -1, -2)  # (..., r, M)
        stop = jax.nn.sigmoid(self.stop_proj(
            jnp.concatenate([x, context_vec], axis=-1)))[..., 0]
        return mels, stop

    def __call__(self, encoder_seq, encoder_seq_proj, char_mask, carry,
                 prenet_in, train: bool, r: int):
        prenet_out = self.prenet(prenet_in)
        carry, (x, context_vec, scores) = self.step_core(
            encoder_seq, encoder_seq_proj, char_mask, carry, prenet_out, train)
        mels, stop = self.project_out(x, context_vec, r)
        return carry, (mels, scores, stop)

    def init_carry(self, batch: int, t_text: int, project_dims: int):
        c = self.cfg
        z = lambda *s: jnp.zeros(s, jnp.float32)
        return (z(batch, c.decoder_dims),
                (z(batch, c.lstm_dims), z(batch, c.lstm_dims)),
                (z(batch, c.lstm_dims), z(batch, c.lstm_dims)),
                z(batch, project_dims),
                z(batch, t_text))


class Tacotron(nn.Module):
    """Full model (`tacotron.py:140-298`)."""
    cfg: Any

    @property
    def project_dims(self) -> int:
        c = self.cfg
        d = c.encoder_dims + c.speaker_embedding_size
        if c.use_gst:
            d += c.gst_E
        return d

    def setup(self):
        c = self.cfg
        self.encoder = TacotronEncoder(c, name="encoder")
        self.encoder_proj = nn.Dense(c.decoder_dims, use_bias=False, name="encoder_proj")
        if c.use_gst:
            self.gst = GlobalStyleToken(c, name="gst")
        self.cell = TacotronDecoderCell(c, name="decoder")
        # reference postnet: CBHG(in=n_mels, channels=postnet_dims,
        # proj=[postnet_dims, fft_bins]) (`tacotron.py:161-163`)
        self.postnet = CBHG(c.postnet_K, c.postnet_dims, (c.postnet_dims, c.fft_bins),
                            c.num_highways, name="postnet")
        self.post_proj = nn.Dense(c.fft_bins, use_bias=False, name="post_proj")

    # -- encoder path -------------------------------------------------------

    def encode(self, texts, speaker_embedding, train: bool,
               style_idx: int = 0, style_mode: str = "train"):
        """→ (encoder_seq (B,T,P), encoder_seq_proj (B,T,D), char_mask (B,T)).

        style_mode: 'train' — GST conditioned on the speaker embedding
        (`tacotron.py:240-242`); 'token' — pick GST token ``style_idx``
        (`tacotron.py:243-251`); 'neutral' — zero reference input
        (`tacotron.py:252-254`).
        """
        c = self.cfg
        b, t = texts.shape
        enc = self.encoder(texts, train)
        spk = jnp.broadcast_to(speaker_embedding[:, None, :],
                               (b, t, c.speaker_embedding_size))
        encoder_seq = jnp.concatenate([enc, spk], axis=-1)

        if c.use_gst:
            if style_mode == "train":
                style = self.gst(speaker_embedding, speaker_embedding, train)
            elif style_mode == "token":
                style = self.gst.token_style(jnp.asarray(style_idx))
                style = jnp.broadcast_to(style, (b, 1, c.gst_E))
            else:  # neutral
                zeros = jnp.zeros((b, 1, c.speaker_embedding_size))
                style = self.gst(zeros, speaker_embedding, train)
            style = jnp.broadcast_to(style[:, :1, :], (b, t, c.gst_E))
            encoder_seq = jnp.concatenate([encoder_seq, style], axis=-1)

        encoder_seq_proj = self.encoder_proj(encoder_seq)
        char_mask = (texts != 0).astype(encoder_seq.dtype)
        return encoder_seq, encoder_seq_proj, char_mask

    # -- teacher-forced training forward ------------------------------------

    def __call__(self, texts, mels, speaker_embedding, r: int, train: bool = True):
        """texts (B, T_text) int32; mels (B, T_mel, M) with T_mel % r == 0.

        Returns (mel_out (B, T_mel, M), postnet_out (B, T_mel, fft_bins),
        attn (B, S, T_text), stop (B, T_mel))."""
        c = self.cfg
        b, t_mel, m = mels.shape
        assert t_mel % r == 0, f"mel length {t_mel} not divisible by r={r}"
        steps = t_mel // r

        encoder_seq, encoder_seq_proj, char_mask = self.encode(
            texts, speaker_embedding, train, style_mode="train")

        go_frame = jnp.zeros((b, 1, m))
        # prenet input at group s is mel frame s*r - 1 (`tacotron.py:266`)
        prenet_ins = jnp.concatenate([go_frame, mels[:, r - 1 :: r, :][:, : steps - 1]], axis=1)
        prenet_ins = jnp.swapaxes(prenet_ins, 0, 1)  # (S, B, M) for scan

        carry = self.cell.init_carry(b, texts.shape[1], self.project_dims)

        # remat_decoder: recompute the cell's activations in the backward
        # pass instead of materialising them for all S steps (the LSA
        # location-conv features alone are S·B·T_text·128 floats — ~6 GB at
        # batch 192, which OOMs a 16 GB chip). The recompute is ~1/3 extra
        # decoder FLOPs for ~S× less scan-activation HBM; off at reference
        # batch sizes, required for large-batch training.
        remat = getattr(c, "remat_decoder", False) and train

        if getattr(c, "fused_scan", True):
            # Fused teacher-forced path: the scan body keeps only the true
            # recurrence (step_core). Everything whose inputs are known for
            # all S steps runs as ONE batched op instead of S sequential
            # ones: the PreNet (two (S·B, D) MXU matmuls + one dropout draw
            # instead of 2S small matmuls + 2S threefry calls), the zoneout
            # masks (one bernoulli over (S, 2, B, lstm) — per-step threefry
            # inside a scan serialises on the scalar core), and the
            # mel/stop projections (applied post-scan to the stacked
            # (S, B, lstm) outputs). Identical math to the legacy path —
            # only the RNG draw order differs (tests/test_tacotron.py
            # pins exact parity with dropout/zoneout disabled).
            prenet_outs = self.cell.prenet(prenet_ins)          # (S, B, P)
            if train:
                zo = jax.random.bernoulli(
                    self.make_rng("zoneout"), 0.1, (steps, 2, b, c.lstm_dims))
            else:
                zo = jnp.zeros((steps, 2, b, c.lstm_dims), bool)

            def body(mdl, carry, xs):
                pn, masks = xs
                return mdl.cell.step_core(encoder_seq, encoder_seq_proj,
                                          char_mask, carry, pn, train,
                                          (masks[0], masks[1]))

            if remat:
                body = nn.remat(body, prevent_cse=False)
            # unroll: the transposed (backward) scan inherits the unroll
            # factor, fusing k steps' small kernels per loop iteration —
            # the backward pass is loop-overhead-bound (measured 323 ms →
            # 235 ms at unroll=4, batch 192; BASELINE.md r5 ablation)
            scan = nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=0, out_axes=0,
                           unroll=getattr(c, "scan_unroll", 1))
            _, (xs_out, contexts, scores) = scan(self, carry, (prenet_outs, zo))
            mel_groups, stops = self.cell.project_out(xs_out, contexts, r)
        else:
            def body(mdl, carry, prenet_in):
                return mdl.cell(encoder_seq, encoder_seq_proj, char_mask, carry,
                                prenet_in, train, r)

            if remat:
                body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(body, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": True,
                                       "zoneout": True},
                           in_axes=0, out_axes=0)
            _, (mel_groups, scores, stops) = scan(self, carry, prenet_ins)

        # mel_groups (S, B, r, M) → (B, S*r, M)
        mel_out = jnp.swapaxes(mel_groups, 0, 1).reshape(b, steps * r, m)
        attn = jnp.swapaxes(scores, 0, 1)                       # (B, S, T_text)
        stop_out = jnp.repeat(jnp.swapaxes(stops, 0, 1), r, axis=1)  # (B, S*r)

        postnet_out = self.post_proj(self.postnet(mel_out, train))
        return mel_out, postnet_out, attn, stop_out

    # -- single-step decode (used by the jitted generation while-loop) ------

    def decode_step(self, encoder_seq, encoder_seq_proj, char_mask, carry, prenet_in, r: int):
        return self.cell(encoder_seq, encoder_seq_proj, char_mask, carry,
                         prenet_in, False, r)

    def postnet_apply(self, mel_out, train: bool = False):
        return self.post_proj(self.postnet(mel_out, train))

    def init_carry(self, batch: int, t_text: int):
        return self.cell.init_carry(batch, t_text, self.project_dims)


def init_tacotron(key: jax.Array, cfg=None, t_text: int = 16, t_mel: int = 8, r: int = 2):
    cfg = cfg or tacotron_config()
    if isinstance(cfg, Config):
        cfg = cfg.freeze()
    model = Tacotron(cfg)
    texts = jnp.ones((1, t_text), jnp.int32)
    mels = jnp.zeros((1, t_mel, cfg.n_mels))
    spk = jnp.zeros((1, cfg.speaker_embedding_size))
    k1, k2, k3 = jax.random.split(key, 3)
    variables = model.init({"params": k1, "dropout": k2, "zoneout": k3},
                           texts, mels, spk, r)
    return model, variables
