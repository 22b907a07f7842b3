"""Fused Pallas TPU kernel for WaveRNN autoregressive sampling.

The sample loop (`fatchord_version.py:190-234`, SURVEY §7 hard part (a)) is
inherently sequential over ~10^4 steps; the XLA `lax.scan` version pays
per-step HBM weight reloads and op overheads. This kernel instead:

  * keeps ALL recurrent weights resident in VMEM in bf16 (~8 MB);
  * streams the conditioning features (mels, aux) chunk-by-chunk via the
    Pallas grid (auto double-buffered HBM→VMEM pipelining);
  * carries GRU states and the previous sample in VMEM scratch across grid
    steps (sequential grid on TPU);
  * samples with the on-chip PRNG (Gumbel-max categorical).

Weight layout matches flax `nn.GRUCell` (r = σ(ir·x + hr·h), z = σ(iz·x +
hz·h), n = tanh(in·x + r·(hn·h + bn)), h' = (1−z)·n + z·h) so trained
`WaveRNN` checkpoints drive the kernel directly; `pack_wavernn_weights`
extracts/fuses them from the model's param tree.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256  # conditioning frames per grid step


def pack_wavernn_weights(params: Dict, dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Flax WaveRNN params → fused matrices for the kernel.

    Returns I (in,512)+bias, per-GRU fused input/hidden kernels (·,3h) with
    gate order [r, z, n], fc1/fc2/fc3 (+biases).
    """
    def cc(*xs, axis=1):
        return jnp.concatenate(xs, axis=axis)

    def gru(p):
        wi = cc(p["ir"]["kernel"], p["iz"]["kernel"], p["in"]["kernel"])
        bi = cc(p["ir"]["bias"], p["iz"]["bias"], p["in"]["bias"], axis=0)
        wh = cc(p["hr"]["kernel"], p["hz"]["kernel"], p["hn"]["kernel"])
        bn = p["hn"]["bias"]
        return wi, bi, wh, bn

    w1i, b1i, w1h, b1n = gru(params["rnn1"]["cell"])
    w2i, b2i, w2h, b2n = gru(params["rnn2"]["cell"])
    out = dict(
        I_w=params["I"]["kernel"], I_b=params["I"]["bias"],
        g1_wi=w1i, g1_bi=b1i, g1_wh=w1h, g1_bn=b1n,
        g2_wi=w2i, g2_bi=b2i, g2_wh=w2h, g2_bn=b2n,
        fc1_w=params["fc1"]["kernel"], fc1_b=params["fc1"]["bias"],
        fc2_w=params["fc2"]["kernel"], fc2_b=params["fc2"]["bias"],
        fc3_w=params["fc3"]["kernel"], fc3_b=params["fc3"]["bias"],
    )
    return {k: v.astype(dtype) for k, v in out.items()}


def _kernel(seed_ref, mels_ref, aux_ref,
            I_w, I_b, g1_wi, g1_bi, g1_wh, g1_bn, g2_wi, g2_bi, g2_wh, g2_bn,
            fc1_w, fc1_b, fc2_w, fc2_b, fc3_w, fc3_b,
            labels_ref, h1_ref, h2_ref, x_ref, *, rnn_dims, aux_d, n_classes, greedy):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        h1_ref[:, :] = jnp.zeros_like(h1_ref)
        h2_ref[:, :] = jnp.zeros_like(h2_ref)
        x_ref[:, :] = jnp.zeros_like(x_ref)
    if not greedy:  # interpret mode (CPU) has no TPU PRNG; greedy needs none
        pltpu.prng_seed(seed_ref[0] + step)

    f = mels_ref.shape[0]
    cls_f = float(n_classes - 1)

    def mm(a, w):
        # compute dtype follows the packed weight dtype (bf16 in production,
        # f32 for exact-parity testing); accumulate in f32 either way
        return jax.lax.dot_general(a.astype(w.dtype), w[:, :],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def gru(x, h, wi, bi, wh, bn):
        gx = mm(x, wi) + bi.astype(jnp.float32)
        gh = mm(h, wh)
        r = jax.nn.sigmoid(gx[:, :rnn_dims] + gh[:, :rnn_dims])
        z = jax.nn.sigmoid(gx[:, rnn_dims:2*rnn_dims] + gh[:, rnn_dims:2*rnn_dims])
        n = jnp.tanh(gx[:, 2*rnn_dims:] + r * (gh[:, 2*rnn_dims:] + bn.astype(jnp.float32)))
        return (1.0 - z) * n + z * h

    def body(t, _):
        m_t = mels_ref[:, t, :].astype(jnp.float32)          # (F, 80)
        a_t = aux_ref[:, t, :].astype(jnp.float32)            # (F, 4*aux_d)
        a1 = a_t[:, :aux_d]
        a2 = a_t[:, aux_d:2*aux_d]
        a3 = a_t[:, 2*aux_d:3*aux_d]
        a4 = a_t[:, 3*aux_d:]
        x_prev = x_ref[:, :]                                  # (F, 1) f32

        u = mm(jnp.concatenate([x_prev, m_t, a1], axis=1), I_w[:, :]) \
            + I_b[:].astype(jnp.float32)
        h1 = gru(u, h1_ref[:, :], g1_wi[:, :], g1_bi[:], g1_wh[:, :], g1_bn[:])
        u = u + h1
        h2 = gru(jnp.concatenate([u, a2], axis=1), h2_ref[:, :],
                 g2_wi[:, :], g2_bi[:], g2_wh[:, :], g2_bn[:])
        u = u + h2
        u = jax.nn.relu(mm(jnp.concatenate([u, a3], axis=1), fc1_w[:, :])
                        + fc1_b[:].astype(jnp.float32))
        u = jax.nn.relu(mm(jnp.concatenate([u, a4], axis=1), fc2_w[:, :])
                        + fc2_b[:].astype(jnp.float32))
        logits = mm(u, fc3_w[:, :]) + fc3_b[:].astype(jnp.float32)  # (F, n_classes)

        if greedy:
            scores = logits
        else:
            bits = pltpu.bitcast(pltpu.prng_random_bits((f, n_classes)), jnp.int32)
            # mask to 23 low bits (non-negative in signed i32, f32-exact)
            uni = (bits & jnp.int32(0x7FFFFF)).astype(jnp.float32) \
                * (1.0 / (1 << 23)) + 1e-7
            gumbel = -jnp.log(-jnp.log(uni))
            scores = logits + gumbel
        label = jnp.argmax(scores, axis=1).astype(jnp.int32)  # (F,)

        # store at dynamic sublane index (lane-dim dynamic stores are
        # unsupported by Mosaic) — output layout is (T, F), transposed by host
        labels_ref[t, :] = label
        x_ref[:, :] = (2.0 * label.astype(jnp.float32) / cls_f - 1.0)[:, None]
        h1_ref[:, :] = h1
        h2_ref[:, :] = h2
        return 0

    jax.lax.fori_loop(0, mels_ref.shape[1], body, 0)


def _kernel_v2(seed_ref, mels_ref, aux_ref,
               I_w, I_b, g1_wi, g1_bi, g1_wh, g1_bn, g2_wi, g2_bi, g2_wh, g2_bn,
               fc1_w, fc1_b, fc2_w, fc2_b, fc3_w, fc3_b,
               labels_ref, h1_ref, h2_ref, x_ref, *, rnn_dims, aux_d, n_classes,
               greedy):
    """Time-leading layout variant: conditioning arrives (chunk, F, D) so the
    per-sample slice `mels_ref[t]` is a plain outer-dim offset — the (F, t, D)
    layout of `_kernel` makes every per-step load a dynamic *sublane* index
    across all F tiles, which Mosaic lowers to a slow gather (measured ~2 ms
    per sample step; this layout is the fix)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        h1_ref[:, :] = jnp.zeros_like(h1_ref)
        h2_ref[:, :] = jnp.zeros_like(h2_ref)
        x_ref[:, :] = jnp.zeros_like(x_ref)
    if not greedy:
        pltpu.prng_seed(seed_ref[0] + step)

    f = mels_ref.shape[1]
    cls_f = float(n_classes - 1)

    def mm(a, w):
        return jax.lax.dot_general(a.astype(w.dtype), w[:, :],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def gru(x, h, wi, bi, wh, bn):
        gx = mm(x, wi) + bi.astype(jnp.float32)
        gh = mm(h, wh)
        r = jax.nn.sigmoid(gx[:, :rnn_dims] + gh[:, :rnn_dims])
        z = jax.nn.sigmoid(gx[:, rnn_dims:2*rnn_dims] + gh[:, rnn_dims:2*rnn_dims])
        n = jnp.tanh(gx[:, 2*rnn_dims:] + r * (gh[:, 2*rnn_dims:] + bn.astype(jnp.float32)))
        return (1.0 - z) * n + z * h

    def body(t, _):
        m_t = mels_ref[t].astype(jnp.float32)                 # (F, 80)
        a_t = aux_ref[t].astype(jnp.float32)                  # (F, 4*aux_d)
        a1 = a_t[:, :aux_d]
        a2 = a_t[:, aux_d:2*aux_d]
        a3 = a_t[:, 2*aux_d:3*aux_d]
        a4 = a_t[:, 3*aux_d:]
        x_prev = x_ref[:, :]                                  # (F, 1) f32

        u = mm(jnp.concatenate([x_prev, m_t, a1], axis=1), I_w[:, :]) \
            + I_b[:].astype(jnp.float32)
        h1 = gru(u, h1_ref[:, :], g1_wi[:, :], g1_bi[:], g1_wh[:, :], g1_bn[:])
        u = u + h1
        h2 = gru(jnp.concatenate([u, a2], axis=1), h2_ref[:, :],
                 g2_wi[:, :], g2_bi[:], g2_wh[:, :], g2_bn[:])
        u = u + h2
        u = jax.nn.relu(mm(jnp.concatenate([u, a3], axis=1), fc1_w[:, :])
                        + fc1_b[:].astype(jnp.float32))
        u = jax.nn.relu(mm(jnp.concatenate([u, a4], axis=1), fc2_w[:, :])
                        + fc2_b[:].astype(jnp.float32))
        logits = mm(u, fc3_w[:, :]) + fc3_b[:].astype(jnp.float32)

        if greedy:
            scores = logits
        else:
            bits = pltpu.bitcast(pltpu.prng_random_bits((f, n_classes)), jnp.int32)
            uni = (bits & jnp.int32(0x7FFFFF)).astype(jnp.float32) \
                * (1.0 / (1 << 23)) + 1e-7
            gumbel = -jnp.log(-jnp.log(uni))
            scores = logits + gumbel
        label = jnp.argmax(scores, axis=1).astype(jnp.int32)   # (F,)

        labels_ref[t, :] = label
        x_ref[:, :] = (2.0 * label.astype(jnp.float32) / cls_f - 1.0)[:, None]
        h1_ref[:, :] = h1
        h2_ref[:, :] = h2
        return 0

    jax.lax.fori_loop(0, mels_ref.shape[0], body, 0)


def _auto_chunk(f: int, feat: int, itemsize: int = 4) -> int:
    """Largest power-of-two chunk whose double-buffered conditioning slices
    fit VMEM alongside the ~8 MB of resident weights. Goes as low as 4 frames
    for very wide folds (F ≥ 256) — small chunks only add grid steps, which
    amortise; an oversized chunk is a hard VMEM OOM."""
    budget = 5_000_000  # bytes for the double-buffered conditioning slices
    c = 4
    while f * (2 * c) * feat * itemsize * 2 <= budget and c < 512:
        c *= 2
    return c


@functools.partial(jax.jit, static_argnames=("n_classes", "greedy", "interpret",
                                             "chunk", "time_major"))
def wavernn_sample_pallas(weights: Dict[str, jax.Array], mels: jax.Array,
                          aux: jax.Array, seed, n_classes: int = 512,
                          greedy: bool = False, interpret: bool = False,
                          chunk: int = 0, time_major: bool = True) -> jax.Array:
    """mels (F, T, 80) f32, aux (F, T, 4*aux_d) → labels (F, T) int32.

    Conditioning is padded to a chunk multiple internally; the returned
    labels cover the padded range (caller trims to T). ``time_major=True``
    (default) feeds the kernel (T, F, D)-ordered conditioning so per-sample
    slices are outer-dim offsets — ~50× faster per step than the fold-major
    layout's dynamic sublane gathers (kept as time_major=False for A/B).
    """
    f, t0, mel_d = mels.shape
    aux4 = aux.shape[-1]
    # stream conditioning in the weight dtype (bf16 in production, f32 in
    # parity tests): halves the VMEM slices; the kernel upcasts per step.
    # The legacy fold-major path keeps f32 conditioning.
    cond_dtype = weights["I_w"].dtype if time_major else jnp.float32
    if chunk == 0:
        chunk = _auto_chunk(f, mel_d + aux4, np.dtype(cond_dtype).itemsize)
    if t0 % chunk:
        pad = chunk - t0 % chunk
        mels = jnp.pad(mels, ((0, 0), (0, pad), (0, 0)))
        aux = jnp.pad(aux, ((0, 0), (0, pad), (0, 0)))
    t = mels.shape[1]
    rnn_dims = weights["I_w"].shape[1]
    aux_d = aux4 // 4

    w_names = ["I_w", "I_b", "g1_wi", "g1_bi", "g1_wh", "g1_bn",
               "g2_wi", "g2_bi", "g2_wh", "g2_bn",
               "fc1_w", "fc1_b", "fc2_w", "fc2_b", "fc3_w", "fc3_b"]
    w_list = [weights[k] for k in w_names]

    def w_spec(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, (lambda i, *_, _nd=nd: (0,) * _nd),
                            memory_space=pltpu.VMEM)

    if time_major:
        cond_specs = [pl.BlockSpec((chunk, f, mel_d), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((chunk, f, aux4), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
        mels_in = jnp.swapaxes(mels, 0, 1).astype(cond_dtype)
        aux_in = jnp.swapaxes(aux, 0, 1).astype(cond_dtype)
        base_kernel = _kernel_v2
    else:
        cond_specs = [pl.BlockSpec((f, chunk, mel_d), lambda i, *_: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((f, chunk, aux4), lambda i, *_: (0, i, 0),
                                   memory_space=pltpu.VMEM)]
        mels_in = mels.astype(jnp.float32)
        aux_in = aux.astype(jnp.float32)
        base_kernel = _kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // chunk,),
        in_specs=cond_specs + [w_spec(x) for x in w_list],
        out_specs=pl.BlockSpec((chunk, f), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((f, rnn_dims), jnp.float32),
                        pltpu.VMEM((f, rnn_dims), jnp.float32),
                        pltpu.VMEM((f, 1), jnp.float32)],
    )

    kernel = functools.partial(base_kernel, rnn_dims=rnn_dims, aux_d=aux_d,
                               n_classes=n_classes, greedy=greedy)
    labels_tf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, f), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.asarray([seed], jnp.int32).reshape(1,) if np.ndim(seed) == 0 else seed,
      mels_in, aux_in, *w_list)
    return labels_tf.T[:, :t0]  # (F, T)
