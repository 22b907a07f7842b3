"""On-chip ppg2mel training-quality evidence: one-shot VC convergence.

Completes the per-family convergence evidence set (Tacotron, VITS, GE2E,
HiFi-GAN landed in round 3) with the fifth trainable family: the PPG
voice-conversion decoder. The reference's acceptance signal for this
trainer is a falling dev masked-mel MSE with best-loss checkpointing
(`/root/reference/models/ppg2mel/train/train_linglf02mel_seq2seq_oneshotvc.py:242-245`)
plus the RTF print of `run.py:85-94` at convert time. This script
reproduces the signal end-to-end on the TPU:

  1. reuses attention_run's toy-language corpus (two speakers with distinct
     f0/timbre, syllable-coded audio) so PPG→mel is genuinely learnable;
  2. runs the real VC preprocess (Conformer PPG extraction, continuous-lf0
     + voicing, GE2E d-vector, SV2TTS mel) via `preprocess_vc_dataset`;
  3. trains the real trainer (masked mel+stop losses, dev validation,
     best-loss checkpoint, attention dumps) for --steps steps;
  4. reports dev masked-mel MSE before vs after, converts a held-out eval
     utterance to the other speaker's voice, and saves the Griffin-Lim
     audio + attention PNGs;
  5. exports inference weights + config where bench.py's PPG-VC path finds
     them (saved_models/ppg_run/ppg2mel.ckpt).

Run: python scripts/ppg_run.py --out /tmp/ppg_run --steps 2000
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from attention_run import make_corpus  # noqa: E402  (same toy language)


def dev_loss(vc_dir: Path, params, batch_stats, model, cfg) -> float:
    """Masked mel MSE over the dev split with the given weights."""
    import jax
    import jax.numpy as jnp
    from mockingbird_tpu.models.ppg.train import (OneshotVcDataset, collate_vc,
                                                  make_vc_val_fn)

    val_fn = make_vc_val_fn(model)
    dev = OneshotVcDataset(vc_dir, "dev")
    down = int(np.prod(cfg.encoder_downsample_rates))
    losses = []
    bs = 8
    n = min(len(dev), 4 * bs)
    for i0 in range(0, n, bs):
        vb = collate_vc([dev[j] for j in range(i0, min(i0 + bs, n))],
                        cfg.frames_per_step, down)
        l, _ = val_fn(params, batch_stats, jax.tree.map(jnp.asarray, vb))
        losses.append(float(l))
    return float(np.mean(losses))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/ppg_run"))
    ap.add_argument("--models_dir", type=Path,
                    default=Path(__file__).resolve().parent.parent / "saved_models")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n_utts", type=int, default=160)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--skip_data", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="keep existing trainer state (default wipes it so a "
                         "regen run cannot silently resume a previous run's "
                         "checkpoint, report a bogus convergence trajectory, "
                         "or export a stale best-loss checkpoint)")
    args = ap.parse_args()

    from _run_utils import wipe_stale_state
    wipe_stale_state(args.models_dir, "ppg_run", args.resume)

    vc_dir = args.out / "vc"
    corpus = args.out / "corpus"
    if not args.skip_data and not (vc_dir / "train_fidlist.txt").exists():
        print("== generating toy-language corpus ==", flush=True)
        make_corpus(corpus, n_utts=args.n_utts)
        print("== VC preprocess (PPG + lf0 + d-vector + mel) ==", flush=True)
        from mockingbird_tpu.models.ppg.convert import preprocess_vc_dataset
        t0 = time.time()
        preprocess_vc_dataset(corpus, vc_dir)
        print(f"preprocess: {time.time() - t0:.0f}s", flush=True)

    import jax
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.ppg.ppg2mel import init_ppg2mel, ppg2mel_config
    from mockingbird_tpu.models.ppg.train import train
    from mockingbird_tpu.train.checkpoint import save_single

    cfg = Config(ppg2mel_config())
    run_dir = args.models_dir / "ppg_run"
    run_dir.mkdir(parents=True, exist_ok=True)

    model, variables = init_ppg2mel(jax.random.PRNGKey(0), cfg.clone())
    loss_before = dev_loss(vc_dir, variables["params"], variables["batch_stats"],
                           model, cfg.clone())
    print(f"dev masked-mel MSE, random weights: {loss_before:.4f}", flush=True)

    t0 = time.time()
    state = train("ppg_run", vc_dir, args.models_dir, cfg=None,
                  batch_size=8, total_steps=args.steps, save_every=args.steps,
                  log_every=50, val_every=max(args.steps // 8, 100),
                  precision=args.precision)
    train_s = time.time() - t0
    loss_after = dev_loss(vc_dir, state["params"], state["batch_stats"],
                          model, cfg.clone())
    print(f"dev masked-mel MSE after {args.steps} steps: {loss_after:.4f} "
          f"({train_s:.0f}s)", flush=True)

    # export the BEST-dev-loss weights, the reference's acceptance signal
    # (`train_linglf02mel_seq2seq_oneshotvc.py:242-245` keeps best_av, not
    # the final step); fall back to final-step weights if no dev validation
    # ever ran (e.g. --steps below val_every)
    from mockingbird_tpu.train.checkpoint import CheckpointManager
    export_params, export_bs = state["params"], state["batch_stats"]
    best_mgr = CheckpointManager(run_dir / "ckpt_ppg2mel_best")
    best_step, best = best_mgr.restore_latest_raw()
    if best_step is not None:
        export_params, export_bs = best["params"], best["batch_stats"]
        print(f"exporting best-dev-loss weights (step {best_step})", flush=True)
    exp = run_dir / "ppg2mel.ckpt"
    save_single(exp, {"params": export_params, "batch_stats": export_bs},
                dtype="bfloat16")
    cfg.to_json(exp.with_suffix(".json"))
    print("exported:", exp, flush=True)

    # held-out conversion: eval-split source utterance → the OTHER speaker's
    # voice (reference flow `run.py:53-94`), Griffin-Lim audio saved
    from mockingbird_tpu.models.ppg import VoiceConverter
    from mockingbird_tpu.dsp import save_wav
    eval_fids = [f for f in (vc_dir / "eval_fidlist.txt").read_text().split()
                 if f.strip()]
    src_fid = next((f for f in eval_fids if "G0001" in f), eval_fids[0])
    ref_fid = next(f for f in (vc_dir / "train_fidlist.txt").read_text().split()
                   if "G0002" in f)
    src_wav = next(corpus.glob(f"**/{src_fid}.wav"), None)
    ref_wav = next(corpus.glob(f"**/{ref_fid}.wav"), None)
    if src_wav is None or ref_wav is None:
        sys.exit(f"corpus wavs for {src_fid}/{ref_fid} not found under {corpus} "
                 "— with --skip_data the corpus dir must still hold the "
                 "original wavs for the held-out conversion demo")
    vc = VoiceConverter(exp, verbose=False)
    vc.set_reference(ref_wav)
    from mockingbird_tpu.dsp import load_wav
    wav, _ = load_wav(src_wav, target_sr=16000)
    mel, _ = vc.convert_wav(wav, stop_threshold=2.0)
    from mockingbird_tpu.config import sv2tts_audio_config
    from mockingbird_tpu.dsp import inv_mel_spectrogram
    out_wav = np.asarray(inv_mel_spectrogram(mel, sv2tts_audio_config()))
    save_wav(out_wav, run_dir / "eval_converted.wav", 16000)
    rms = float(np.sqrt(np.mean(out_wav.astype(np.float64) ** 2)))
    print(f"converted {src_fid} -> voice of {ref_fid}: {mel.shape[0]} frames, "
          f"rms {rms:.4f}", flush=True)

    hist = dict(steps=args.steps, n_utts=args.n_utts,
                dev_mse_random=round(loss_before, 4),
                dev_mse_trained=round(loss_after, 4),
                train_seconds=round(train_s, 1),
                converted_frames=int(mel.shape[0]),
                converted_rms=round(rms, 4))
    (run_dir / "history.json").write_text(json.dumps(hist, indent=1))
    print(json.dumps(hist), flush=True)


if __name__ == "__main__":
    main()
