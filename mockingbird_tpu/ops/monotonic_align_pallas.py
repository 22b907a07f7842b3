"""Pallas TPU kernel for monotonic alignment search.

One grid program per batch element: the forward DP fills a (T_y, T_x) VMEM
value table with a `fori_loop` of fully-vectorised row updates, then the
backtrack walks the table in the same kernel, writing the one-hot path —
the whole search runs on-chip with zero HBM round-trips per row (the
reference ships this as a Cython/OpenMP CPU kernel fed by a GPU→CPU copy,
`/root/reference/monotonic_align/core.pyx:7-42`).

Lengths (t_ys, t_xs) arrive as scalar-prefetch operands so each program can
mask its own feasible band. Falls back to the lax.scan implementation in
`monotonic_align.py` on non-TPU backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _mas_kernel(t_ys_ref, t_xs_ref, neg_cent_ref, path_ref, values_ref):
    b = pl.program_id(0)
    t_y_max, t_x_max = neg_cent_ref.shape[1], neg_cent_ref.shape[2]
    t_y = t_ys_ref[b]
    t_x = t_xs_ref[b]

    xs = jax.lax.broadcasted_iota(jnp.int32, (1, t_x_max), 1)

    # ---- forward DP: row scan ------------------------------------------
    def fwd_body(y, prev_row):
        row = neg_cent_ref[0, y, :].reshape(1, t_x_max)
        shifted = pltpu.roll(prev_row, 1, axis=1)
        shifted = jnp.where(xs == 0, _NEG_INF, shifted)
        v_cur = jnp.where(xs == y, _NEG_INF, prev_row)
        best = jnp.maximum(v_cur, shifted)
        best = jnp.where(y == 0, jnp.where(xs == 0, 0.0, _NEG_INF), best)
        value = row + best
        band_lo = t_x + y - t_y
        value = jnp.where((xs > y) | (xs < band_lo) | (xs >= t_x), _NEG_INF, value)
        values_ref[y, :] = value.reshape(t_x_max)
        return value

    init = jnp.full((1, t_x_max), _NEG_INF, jnp.float32)
    jax.lax.fori_loop(0, t_y_max, fwd_body, init)

    # ---- backtrack ------------------------------------------------------
    path_ref[0, :, :] = jnp.zeros((t_y_max, t_x_max), jnp.float32)

    def bwd_body(i, index):
        y = t_y - 1 - i  # walk only real rows

        @pl.when(y >= 0)
        def _():
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, t_x_max), 1) == index
                      ).astype(jnp.float32)
            path_ref[0, y, :] = onehot.reshape(t_x_max)
        prev_vals = jnp.where(
            y > 0, values_ref[jnp.maximum(y - 1, 0), :].reshape(1, t_x_max),
            jnp.full((1, t_x_max), _NEG_INF, jnp.float32))
        v_here = jnp.sum(jnp.where(xs == index, prev_vals, 0.0))
        v_left = jnp.sum(jnp.where(xs == jnp.maximum(index - 1, 0), prev_vals, 0.0))
        step_down = jnp.logical_and(index != 0,
                                    jnp.logical_or(index == y, v_here < v_left))
        return jnp.where(jnp.logical_and(y >= 0, step_down), index - 1, index)

    jax.lax.fori_loop(0, t_y_max, bwd_body, jnp.maximum(t_x - 1, 0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(neg_cent: jax.Array, t_ys: jax.Array, t_xs: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """neg_cent (B, T_y, T_x) f32; per-batch lengths → one-hot path."""
    b, t_y, t_x = neg_cent.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t_y, t_x), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t_y, t_x), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t_y, t_x), jnp.float32)],
    )

    def kernel(t_ys_ref, t_xs_ref, nc_ref, path_ref, values_ref):
        _mas_kernel(t_ys_ref, t_xs_ref, nc_ref, path_ref, values_ref)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t_y, t_x), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(t_ys, jnp.int32), jnp.asarray(t_xs, jnp.int32),
      neg_cent.astype(jnp.float32))


def maximum_path_auto(neg_cent, mask):
    """Deprecated alias: `monotonic_align.maximum_path` now dispatches to
    this kernel on TPU backends itself (the VITS hot path at
    `models/vits/model.py` uses it directly)."""
    from .monotonic_align import maximum_path
    return maximum_path(neg_cent, mask)
