"""Unified checkpointing for all model families (orbax-backed).

Replaces the reference's five per-family checkpoint formats (SURVEY.md §5:
encoder `{step, model_state, optimizer_state}`, Tacotron `Base.save/load`,
VITS `G_/D_*.pth`, HiFi-GAN `g_/do_`, VC solver dicts) with one scheme:
a directory of step-numbered orbax checkpoints holding an arbitrary pytree
(params / optimizer state / step), with latest-discovery, periodic backups and
resume semantics matching the reference trainers (save-every / backup-every,
`models/synthesizer/train.py:230-237`).
"""
from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: ``save(step, state)`` / ``restore_latest(template)``."""

    def __init__(self, directory, max_to_keep: int = 3, backup_every: Optional[int] = None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.backup_every = backup_every
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mgr.wait_until_finished()
        if self.backup_every and step % self.backup_every == 0:
            src = self.directory / str(step)
            dst = self.directory.parent / f"{self.directory.name}_backup_{step:06d}"
            if src.exists() and not dst.exists():
                shutil.copytree(src, dst)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> tuple[Optional[int], Any]:
        """Restore the newest checkpoint into the structure of ``template``.
        Returns (step, state); (None, template) when nothing to restore."""
        step = self._mgr.latest_step()
        if step is None:
            return None, template
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return step, state

    def restore(self, step: int, template: Any) -> Any:
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_latest_raw(self) -> tuple[Optional[int], Any]:
        """Restore the newest checkpoint without a structure template
        (numpy arrays, saved structure) — for consumers that only need a
        subtree of what the trainer saved (e.g. exporting inference weights
        from a best-loss checkpoint that also holds optimizer state)."""
        step = self._mgr.latest_step()
        if step is None:
            return None, None
        return step, self._mgr.restore(step, args=ocp.args.StandardRestore())

    def close(self):
        self._mgr.close()


def save_single(path, state: Any, dtype: Optional[str] = None) -> None:
    """One-shot whole-pytree save (for exporting inference weights).

    ``dtype="bfloat16"`` casts float32 leaves before writing — inference
    exports at half the bytes (the committed evidence payload halves, r4
    advisor; `load_single` upcasts back to float32 so runtime behavior and
    compute-dtype choices are unchanged — bf16 STORAGE is free, bf16
    COMPUTE is a per-wrapper decision since it measured slower for VITS).
    Output parity fp32-save vs bf16-save is tested
    (`tests/test_infra.py::test_bf16_export_roundtrip_parity`)."""
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    if dtype is not None:
        import jax.numpy as jnp
        target = jnp.dtype(dtype)
        state = jax.tree.map(
            lambda x: x.astype(target)
            if getattr(x, "dtype", None) == jnp.float32 else x, state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def load_single(path, template: Any = None) -> Any:
    """Load an exported pytree. Without a template, arrays come back as
    host numpy regardless of the devices the checkpoint was SAVED on —
    an export written on a TPU must load on a CPU-only box (tests, tooling)
    where orbax's default sharding-aware restore would fail with
    "Device TPU ... was not found". bfloat16 leaves (half-size storage
    exports, see `save_single`) are upcast to float32. Callers move leaves
    on-device themselves (`jax.tree.map(jnp.asarray, ...)`)."""
    path = Path(path).absolute()
    if template is not None:
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, template)
    import numpy as np
    import jax.numpy as jnp
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        loaded = ckptr.restore(path, restore_args=restore_args)
        return jax.tree.map(
            lambda x: x.astype(np.float32)
            if getattr(x, "dtype", None) == jnp.bfloat16 else x, loaded)
