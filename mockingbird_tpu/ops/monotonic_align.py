"""Monotonic alignment search (VITS MAS), TPU-native.

Replaces the reference's Cython/OpenMP kernel + GPU→CPU→GPU round-trip
(`/root/reference/monotonic_align/__init__.py:6-19`, `core.pyx:7-42`,
called from `models/synthesizer/models/vits.py:479` every training step).

The DP has a row recurrence — value[y, x] = neg_cent[y, x] +
max(value[y-1, x], value[y-1, x-1]) inside the monotonic band — so on TPU it
runs as a `lax.scan` over mel frames with each row update fully vectorised
over (batch × text): O(T_mel) steps of VPU work, entirely on device.
Backtracking is a reverse scan carrying one index per batch row.

Layouts match the reference: neg_cent (B, T_mel, T_text); returned path is a
one-hot {0,1} float mask of the same shape.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_NEG_INF = -1e9


def maximum_path(neg_cent: jax.Array, mask: jax.Array) -> jax.Array:
    """neg_cent (B, T_mel, T_text); mask same shape in {0,1}.

    Per-batch lengths are derived from the mask as in the reference wrapper
    (`monotonic_align/__init__.py:13-18`).

    Dispatch: the `lax.scan` row recurrence below is the default — measured
    FASTER than the Pallas VMEM kernel on a real v5e chip at training shapes
    (amortised, tunnel-latency-free: scan 3.0/5.9 ms vs Pallas 3.7/7.6 ms at
    (16,400,96)/(16,1000,160)), because each scan step updates all B rows on
    the VPU while the Pallas grid serialises over batch. `MB_MAS_IMPL=pallas`
    opts into the kernel (`monotonic_align_pallas.py`, parity-tested on-chip
    by tests/test_monotonic_align.py). Either way the whole search stays on
    device — the reference round-trips through host numpy + a Cython kernel
    every training step (`monotonic_align/__init__.py:13-19`). The DP runs in
    f32 regardless of the caller's compute dtype (the path is an argmax —
    bf16 ties would perturb alignments); the returned one-hot path keeps the
    caller's dtype.
    """
    in_dtype = neg_cent.dtype
    neg_cent = neg_cent.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    t_ys = jnp.sum(mask_f[:, :, 0], axis=1).astype(jnp.int32)  # mel lengths
    t_xs = jnp.sum(mask_f[:, 0, :], axis=1).astype(jnp.int32)  # text lengths
    impl = os.environ.get("MB_MAS_IMPL", "scan")
    if impl == "pallas" and jax.default_backend() in ("tpu", "axon"):
        from .monotonic_align_pallas import maximum_path_pallas
        path = maximum_path_pallas(neg_cent * mask_f, t_ys, t_xs)
    else:
        path = _maximum_path_impl(neg_cent * mask_f, t_ys, t_xs)
    return (path * mask_f).astype(in_dtype)


def maximum_path_with_lengths(neg_cent, t_ys, t_xs):
    return _maximum_path_impl(neg_cent, jnp.asarray(t_ys, jnp.int32),
                              jnp.asarray(t_xs, jnp.int32))


@jax.jit
def _maximum_path_impl(neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array) -> jax.Array:
    b, t_y, t_x = neg_cent.shape
    xs = jnp.arange(t_x)[None, :]                     # (1, T_x)

    # ---- forward DP --------------------------------------------------------
    band_hi = t_xs[:, None]                           # x < t_x
    def fwd(prev_row, inputs):
        y, row = inputs                               # row (B, T_x)
        shifted = jnp.concatenate(
            [jnp.full((b, 1), _NEG_INF, prev_row.dtype), prev_row[:, :-1]], axis=1)
        v_cur = jnp.where(xs == y, _NEG_INF, prev_row)   # can't stay when x == y
        best = jnp.maximum(v_cur, shifted)
        best = jnp.where(y == 0, jnp.where(xs == 0, 0.0, _NEG_INF), best)
        value = row + best
        # feasible band: t_x + y - t_y <= x <= min(y, t_x - 1)
        band_lo = t_xs[:, None] + y - t_ys[:, None]
        value = jnp.where((xs > y) | (xs < band_lo) | (xs >= band_hi), _NEG_INF, value)
        return value, value

    init = jnp.full((b, t_x), _NEG_INF, neg_cent.dtype)
    _, values = jax.lax.scan(fwd, init,
                             (jnp.arange(t_y), jnp.swapaxes(neg_cent, 0, 1)))
    values = jnp.swapaxes(values, 0, 1)               # (B, T_y, T_x)

    # ---- backtracking ------------------------------------------------------
    def bwd(index, y):
        active = y < t_ys                              # padded rows: no-op
        prev_vals = jnp.where(y > 0, values[:, jnp.maximum(y - 1, 0), :],
                              jnp.full((b, t_x), _NEG_INF))
        v_here = jnp.take_along_axis(prev_vals, index[:, None], axis=1)[:, 0]
        v_left = jnp.take_along_axis(
            prev_vals, jnp.maximum(index - 1, 0)[:, None], axis=1)[:, 0]
        step_down = jnp.logical_and(index != 0,
                                    jnp.logical_or(index == y, v_here < v_left))
        emit = jnp.where(active, index, -1)            # -1 → no path entry
        new_index = jnp.where(jnp.logical_and(active, step_down), index - 1, index)
        return new_index, emit

    start_index = jnp.maximum(t_xs - 1, 0)             # (B,)
    ys_rev = jnp.arange(t_y - 1, -1, -1)
    _, emitted = jax.lax.scan(bwd, start_index, ys_rev)
    emitted = jnp.flip(emitted, axis=0)                # (T_y, B) in natural order
    emitted = jnp.swapaxes(emitted, 0, 1)              # (B, T_y)

    path = jax.nn.one_hot(emitted, t_x, dtype=neg_cent.dtype)
    path = path * (emitted >= 0)[..., None]
    return path


# ---------------------------------------------------------------------------
# Numpy oracle (direct statement of the DP; used by tests)
# ---------------------------------------------------------------------------

def maximum_path_numpy(neg_cent: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray) -> np.ndarray:
    """Per-sample O(T_y·T_x) DP + backtracking, the semantics of
    `core.pyx:7-33` written in plain numpy."""
    b, t_y_max, t_x_max = neg_cent.shape
    paths = np.zeros_like(neg_cent)
    for i in range(b):
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        value = neg_cent[i, :t_y, :t_x].copy()
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = -np.inf if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else -np.inf
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_cur, v_prev)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[i, y, index] = 1.0
            if index != 0 and (index == y or value[y - 1, index] < value[y - 1, index - 1]):
                index -= 1
    return paths
