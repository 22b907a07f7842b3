"""bf16 mixed-precision policy for training (TPU-native replacement for the
reference's AMP GradScaler, `/root/reference/models/synthesizer/train_vits.py:197,230`).

Policy semantics (the standard TPU recipe):
  * master parameters, optimizer state and losses stay float32;
  * model compute (matmuls/convs, i.e. the MXU work) runs in bfloat16 by
    casting parameters and floating batch inputs on the fly inside the loss
    function — the cast is differentiable, so gradients flow back to the
    fp32 master params automatically;
  * no loss scaling: bfloat16 shares float32's exponent range, so the
    GradScaler machinery has no TPU equivalent to replicate.

Usage inside a train step::

    policy = Policy.from_name(precision)        # "fp32" | "bf16"
    def loss_fn(p):
        out = model.apply({"params": policy.cast(p)}, *policy.cast(inputs))
        out = policy.uncast(out)                # fp32 before the loss math
        ...
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype`` (ints, bools
    and PRNG keys pass through untouched)."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(_cast, tree)


@dataclass(frozen=True)
class Policy:
    """Compute-dtype policy. ``cast`` moves a tree to the compute dtype,
    ``uncast`` brings results back to fp32 for loss math / state storage."""
    compute_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_name(name: str) -> "Policy":
        name = (name or "fp32").lower()
        if name in ("fp32", "float32", "f32"):
            return Policy(jnp.float32)
        if name in ("bf16", "bfloat16", "mixed"):
            return Policy(jnp.bfloat16)
        raise ValueError(f"unknown precision {name!r} (use 'fp32' or 'bf16')")

    @property
    def is_mixed(self) -> bool:
        return self.compute_dtype != jnp.float32

    def cast(self, tree):
        if not self.is_mixed:
            return tree
        return cast_floating(tree, self.compute_dtype)

    def uncast(self, tree):
        if not self.is_mixed:
            return tree
        return cast_floating(tree, jnp.float32)
