"""Trained-artifact presence tests (fast tier — runs on every `pytest`).

Round 3 lost its trained exports to a machine wipe and the bench silently
degraded to random weights (VERDICT r3: "nothing in the test suite asserts
the exports exist, so the degradation is invisible"). These tests make the
absence LOUD: if any of the five families' inference exports is missing or
unloadable, the suite goes red — not just a quietly-worse BENCH json.

The exports are produced by scripts/{attention,encoder,gan,vits,ppg}_run.py
(scripts/regen_runs.sh regenerates all five) and are tracked in git.
Reference parity: the reference's end state is a trained checkpoint per
family that its inference wrappers load
(`/root/reference/models/synthesizer/inference.py:46`,
`/root/reference/models/vocoder/hifigan/inference.py:22`,
`/root/reference/models/ppg2mel/__init__.py:195`).
"""
from pathlib import Path

import numpy as np
import pytest

SAVED = Path(__file__).resolve().parent.parent / "saved_models"

EXPORTS = {
    "tacotron": SAVED / "attention_run" / "synthesizer.ckpt",
    "encoder": SAVED / "encoder_run" / "encoder.ckpt",
    "vocoder_hifigan": SAVED / "gan_run" / "vocoder_hifigan.ckpt",
    "vits": SAVED / "vits_run" / "synthesizer_vits.ckpt",
    "ppg2mel": SAVED / "ppg_run" / "ppg2mel.ckpt",
    "vocoder_wavernn": SAVED / "wavernn_run" / "vocoder_wavernn.ckpt",
}


@pytest.mark.parametrize("family", sorted(EXPORTS))
def test_trained_export_exists_and_loads(family):
    path = EXPORTS[family]
    assert path.exists(), (
        f"{family} inference export missing at {path} — regenerate with "
        "scripts/regen_runs.sh (bench.py will report quality_gate=degraded "
        "until it exists)")
    from mockingbird_tpu.train.checkpoint import load_single
    tree = load_single(path)
    leaves = [x for x in _leaves(tree) if hasattr(x, "dtype")]
    assert leaves, f"{family} export at {path} holds no arrays"
    sample = np.asarray(leaves[0]).ravel()[:64]
    assert np.all(np.isfinite(sample)), f"{family} export has non-finite weights"


def _leaves(tree):
    import jax
    return jax.tree.leaves(tree)


def test_regen_runs_covers_all_families():
    """scripts/regen_runs.sh must invoke every evidence-run script — round 3
    lost the ppg family because the regen script silently omitted it
    (ADVICE r3)."""
    regen = (Path(__file__).resolve().parent.parent
             / "scripts" / "regen_runs.sh").read_text()
    for script in ("attention_run.py", "encoder_run.py", "gan_run.py",
                   "vits_run.py", "ppg_run.py", "wavernn_run.py"):
        assert script in regen, f"regen_runs.sh does not run {script}"


def test_wipe_stale_state_covers_eval_dumps(tmp_path):
    """Non-resume evidence runs must wipe per-phase eval dumps (r4 advisor:
    attention_run's trajectory globs eval/attention_*.npz, so stale dumps
    from a longer previous run corrupt a fresh shorter run's readout) while
    keeping the exported inference weights."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from _run_utils import wipe_stale_state

    run = tmp_path / "attention_run"
    (run / "eval").mkdir(parents=True)
    (run / "ckpt").mkdir()
    (run / "synthesizer.ckpt").mkdir()
    stale = [run / "eval" / "attention_005750.npz",
             run / "eval" / "step-003000-gen.wav",
             run / "eval" / "mas_002500.png"]
    for p in stale:
        p.write_bytes(b"x")
    keep = run / "eval" / "ground_truth.wav"
    keep.write_bytes(b"x")

    wipe_stale_state(tmp_path, "attention_run", resume=False)
    for p in stale:
        assert not p.exists(), p
    assert not (run / "ckpt").exists()
    assert (run / "synthesizer.ckpt").exists()   # export kept
    assert keep.exists()                          # non-phase eval kept

    # --resume keeps everything
    for p in stale:
        p.write_bytes(b"x")
    (run / "ckpt").mkdir()
    wipe_stale_state(tmp_path, "attention_run", resume=True)
    assert all(p.exists() for p in stale) and (run / "ckpt").exists()
