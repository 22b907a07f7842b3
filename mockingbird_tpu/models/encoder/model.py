"""GE2E speaker encoder (d-vector model), TPU-native.

Functionality parity with `/root/reference/models/encoder/model.py:12-135`:
a 3-layer LSTM(40→256) + Linear(256→256) + ReLU + L2-norm producing a 256-d
speaker embedding, trained with the GE2E softmax loss over a
(speakers × utterances) batch with a learned similarity scale (w=10, b=−5).

TPU-first differences from the reference:
  * the similarity matrix is one fused einsum + mask select — the reference
    builds it with a Python loop over speakers on the CPU "loss device"
    (`model.py:86-92`, FIXME'd in its own trainer);
  * loss and EER stay on-device; EER is computed exactly from the sorted
    score distribution rather than sklearn's ROC + brentq root-finding;
  * the LSTM stack runs as `lax.scan` layers via flax's OptimizedLSTMCell,
    giving one fused XLA while-loop per layer.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MEL_N_CHANNELS = 40
MODEL_HIDDEN_SIZE = 256
MODEL_EMBEDDING_SIZE = 256
MODEL_NUM_LAYERS = 3


class _GateParams(nn.Module):
    """kernel(+bias) holder reproducing flax LSTMCell's per-gate param paths
    (`lstm_i/ii/kernel`, `lstm_i/hi/{kernel,bias}` …) so checkpoints and the
    torch-interop mapping stay valid."""
    shape: tuple
    kernel_init: nn.initializers.Initializer
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = (self.param("bias", nn.initializers.zeros_init(), (self.shape[-1],))
             if self.use_bias else None)
        return k, b


class FusedLSTMLayer(nn.Module):
    """One LSTM layer with the input projections hoisted out of the scan.

    `nn.RNN(OptimizedLSTMCell)` keeps BOTH matmuls (x·W_ih and h·W_hh) inside
    the per-timestep loop: 160 steps × 2 small matmuls leave the MXU ~idle
    (measured 0.05% MFU for the GE2E step). Here x·W_ih for ALL timesteps is
    one large (B·T, D)@(D, 4H) matmul outside the scan, and only the
    (B, H)@(H, 4H) recurrence runs per step — measured ≈2× on the GE2E train
    step on a v5e chip. Params and numerics match flax's LSTMCell
    (gate order i,f,g,o; c' = σ(f)·c + σ(i)·tanh(g); h' = σ(o)·tanh(c')).

    ``unroll``: steps per loop iteration of the scan (and of its transposed
    backward scan, which inherits it). Measured on-chip: unrolling HURTS
    this layer (51.8 ms at 1 vs 54.0 at 4, 64×10 batch) — the hoisted
    (B·T, D)@(D, 4H) projection already dominates, so unrolling only grows
    code size. Default 1; the knob stays for other shapes."""
    hidden: int
    unroll: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, d = x.shape
        h = self.hidden
        lecun = nn.initializers.lecun_normal()
        orth = nn.initializers.orthogonal()
        wi, wh, bh = [], [], []
        for g in "ifgo":
            k, _ = _GateParams((d, h), lecun, False, name=f"i{g}")()
            wi.append(k)
            k, bias = _GateParams((h, h), orth, True, name=f"h{g}")()
            wh.append(k)
            bh.append(bias)
        w_in = jnp.concatenate(wi, axis=1)        # (D, 4H)
        w_rec = jnp.concatenate(wh, axis=1)       # (H, 4H)
        b_rec = jnp.concatenate(bh)               # (4H,)

        xw = x.reshape(b * t, d) @ w_in           # ONE MXU-sized matmul
        xw = xw.reshape(b, t, 4 * h)

        def step(carry, xw_t):
            c, hs = carry
            z = xw_t + hs @ w_rec + b_rec
            zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
            c = nn.sigmoid(zf) * c + nn.sigmoid(zi) * jnp.tanh(zg)
            hs = nn.sigmoid(zo) * jnp.tanh(c)
            return (c, hs), hs

        zeros = jnp.zeros((b, h), x.dtype)
        _, ys = jax.lax.scan(step, (zeros, zeros), jnp.swapaxes(xw, 0, 1),
                             unroll=self.unroll)
        return jnp.swapaxes(ys, 0, 1)


class SpeakerEncoder(nn.Module):
    """mel frames (B, T, 40) → L2-normalised embeddings (B, 256)."""

    hidden_size: int = MODEL_HIDDEN_SIZE
    embedding_size: int = MODEL_EMBEDDING_SIZE
    num_layers: int = MODEL_NUM_LAYERS
    # rematerialise each LSTM layer in the backward pass: saves only layer
    # boundaries instead of the hoisted (B·T, 4H) projections + per-step gate
    # residuals, which OOM a 16 GB chip past ~512 speakers/batch. ~2× layer
    # recompute for ~8× less activation HBM; off at the reference batch.
    remat: bool = False

    @nn.compact
    def __call__(self, utterances: jax.Array) -> jax.Array:
        x = utterances
        layer_cls = (nn.remat(FusedLSTMLayer, prevent_cse=False)
                     if self.remat else FusedLSTMLayer)
        for i in range(self.num_layers):
            # param paths `lstm_{i}/…` match flax's LSTMCell layout exactly
            # (interop + existing checkpoints rely on them; nn.remat keeps
            # the module name/param tree identical)
            x = layer_cls(self.hidden_size, name=f"lstm_{i}")(x)
        # reference takes the last layer's final hidden state (`model.py:55-57`);
        # for an LSTM the final hidden state equals the last output
        last = x[:, -1, :]
        embeds_raw = nn.relu(nn.Dense(self.embedding_size, name="linear")(last))
        return embeds_raw / (jnp.linalg.norm(embeds_raw, axis=1, keepdims=True) + 1e-5)


def init_similarity_params() -> dict:
    """Learned cosine-similarity scale, initial w=10 b=−5 (`model.py:27-28`)."""
    return {"weight": jnp.array([10.0]), "bias": jnp.array([-5.0])}


def similarity_matrix(embeds: jax.Array, sim_weight: jax.Array, sim_bias: jax.Array) -> jax.Array:
    """GE2E §2.1 similarity matrix, fully vectorised.

    embeds: (S, U, D) L2-normalised. Returns (S, U, S): entry [j, i, k] is the
    scaled cosine similarity of utterance (j,i) to centroid k — exclusive
    centroid when k == j, inclusive otherwise (parity: `model.py:63-107`).
    """
    s, u, d = embeds.shape
    centroids_incl = jnp.mean(embeds, axis=1)  # (S, D)
    centroids_incl = centroids_incl / (jnp.linalg.norm(centroids_incl, axis=1, keepdims=True) + 1e-5)

    centroids_excl = (jnp.sum(embeds, axis=1, keepdims=True) - embeds) / (u - 1)  # (S, U, D)
    centroids_excl = centroids_excl / (jnp.linalg.norm(centroids_excl, axis=2, keepdims=True) + 1e-5)

    sim_incl = jnp.einsum("jid,kd->jik", embeds, centroids_incl)
    sim_excl = jnp.sum(embeds * centroids_excl, axis=2)  # (S, U)

    eye = jnp.eye(s, dtype=bool)[:, None, :]  # (S, 1, S) — true where k == j
    sim = jnp.where(eye, sim_excl[:, :, None], sim_incl)
    return sim * sim_weight + sim_bias


def ge2e_loss(embeds: jax.Array, sim_weight: jax.Array, sim_bias: jax.Array) -> tuple[jax.Array, jax.Array]:
    """GE2E softmax loss. Returns (scalar loss, (S*U, S) similarity matrix)."""
    s, u, _ = embeds.shape
    sim = similarity_matrix(embeds, sim_weight, sim_bias).reshape(s * u, s)
    target = jnp.repeat(jnp.arange(s), u)
    logp = jax.nn.log_softmax(sim, axis=1)
    loss = -jnp.mean(jnp.take_along_axis(logp, target[:, None], axis=1))
    return loss, sim


def equal_error_rate(sim: jax.Array, speakers_per_batch: int,
                     utterances_per_speaker: Optional[int] = None) -> jax.Array:
    """Exact EER from the flattened (positives vs negatives) score distribution.

    The reference computes this with sklearn's ROC + scipy brentq on the host
    (`model.py:125-133`); here it stays on-device: sort all S*U*S scores, count
    positives-above-threshold / negatives-above-threshold at every score, and
    find the crossing of FAR and FRR.
    """
    s = speakers_per_batch
    n = sim.shape[0]  # S*U
    target = jnp.repeat(jnp.arange(s), n // s)
    labels = (jnp.arange(s)[None, :] == target[:, None])  # (S*U, S) bool

    scores = sim.reshape(-1)
    pos = labels.reshape(-1).astype(jnp.float32)
    order = jnp.argsort(-scores)
    pos_sorted = pos[order]

    n_pos = jnp.sum(pos)
    n_neg = pos.shape[0] - n_pos
    tp = jnp.cumsum(pos_sorted)                      # true accepts at each threshold
    fp = jnp.cumsum(1.0 - pos_sorted)                # false accepts
    far = fp / jnp.maximum(n_neg, 1)                 # false accept rate
    frr = 1.0 - tp / jnp.maximum(n_pos, 1)           # false reject rate
    idx = jnp.argmin(jnp.abs(far - frr))
    return (far[idx] + frr[idx]) / 2.0


def init_params(key: jax.Array, hidden_size: int = MODEL_HIDDEN_SIZE,
                embedding_size: int = MODEL_EMBEDDING_SIZE,
                num_layers: int = MODEL_NUM_LAYERS) -> dict:
    """Full parameter pytree: flax model params + similarity scale."""
    model = SpeakerEncoder(hidden_size, embedding_size, num_layers)
    dummy = jnp.zeros((1, 16, MEL_N_CHANNELS), jnp.float32)
    return {
        "model": model.init(key, dummy)["params"],
        "similarity": init_similarity_params(),
    }
