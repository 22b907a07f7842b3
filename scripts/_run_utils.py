"""Shared helpers for the on-chip evidence-run scripts.

One implementation of the wipe-unless---resume guard: the phased
resume-from-checkpoint design of these scripts would otherwise silently
pick up a PREVIOUS run's trainer state (observed: a regen did one step per
phase from a stale checkpoint and reported a meaningless trajectory, and
ppg_run could export a stale best-loss checkpoint).
"""
from __future__ import annotations

import shutil
from pathlib import Path

# everything a trainer regenerates: step checkpoints (incl. the
# `*_backup_*` siblings CheckpointManager.backup_every creates), TB logs,
# validation attention dumps, umap projections. Exports like
# `synthesizer.ckpt` / `encoder.ckpt` do NOT match these patterns and are
# kept — they are the artifacts the bench loads.
STALE_PATTERNS = ("ckpt*", "logs*", "attn", "umap")


def wipe_stale_state(models_dir, run_id: str, resume: bool) -> None:
    """Delete a run's trainer state unless the caller asked to resume."""
    if resume:
        return
    run_dir = Path(models_dir) / run_id
    for pattern in STALE_PATTERNS:
        for stale in sorted(run_dir.glob(pattern)):
            if stale.is_dir():
                print(f"wiping stale trainer state: {stale}", flush=True)
                shutil.rmtree(stale)
