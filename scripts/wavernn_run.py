"""On-chip WaveRNN trained-sampler evidence (VERDICT r4 Next #5).

The WaveRNN bench extra previously ran a TRAINED synthesizer through a
RANDOM-weight sampler (`weights: "trained_synth"`, no quality gate). This
script closes that: it trains the full WaveRNN (RAW 9-bit mu-law mode, the
reference default) on GTA mels from the trained Tacotron — the reference's
own vocoder fine-tune flow (`/root/reference/models/vocoder/wavernn/
train.py:16-127` with `synthesize.py` GTA data) — and exports sampler
weights where the bench and pipeline load them.

Per-phase acceptance signal mirrors the reference's `gen_testset`
(`wavernn/train.py:125-126`): generate audio for fixed probe utterances
with the real (fused Pallas) sampler, save wav artifacts, and measure
mel-reconstruction L1 of the generated audio against its conditioning mel
in the ±4 SV2TTS space — the same fidelity statistic bench.py gates the
HiFi-GAN path on.

Reuses the toy-language corpus + GTA data that scripts/gan_run.py
produces (same layout); regenerates it when missing.

Run: python scripts/wavernn_run.py --steps 5000
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
from gan_run import audio_stats  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/gan_run"),
                    help="corpus/GTA working dir (shared with gan_run.py — "
                         "the same GTA mels feed both vocoder fine-tunes)")
    ap.add_argument("--models_dir", type=Path,
                    default=Path(__file__).resolve().parent.parent / "saved_models")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--phase_steps", type=int, default=1000)
    ap.add_argument("--n_utts", type=int, default=400)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--gta_run", default="attention_run")
    ap.add_argument("--skip_data", action="store_true")
    ap.add_argument("--cfg_override", default=None,
                    help="json dict merged into wavernn_config (tests)")
    ap.add_argument("--probe_samples", type=int, default=2)
    ap.add_argument("--resume", action="store_true",
                    help="keep existing trainer state (default wipes it so a "
                         "regen run cannot silently resume a previous run's "
                         "checkpoint and report a bogus trajectory)")
    args = ap.parse_args()

    from _run_utils import wipe_stale_state
    wipe_stale_state(args.models_dir, "wavernn_run", args.resume)

    out = args.out
    syn = out / "syn"
    if not args.skip_data and not (syn / "train.txt").exists():
        print("== generating toy-language corpus ==", flush=True)
        corpus = make_corpus(out / "corpus", n_utts=args.n_utts)
        print("== preprocessing ==", flush=True)
        from mockingbird_tpu.config import sv2tts_audio_config
        from mockingbird_tpu.models.tacotron.preprocess import (
            create_embeddings, preprocess_dataset)
        audio_cfg = sv2tts_audio_config().merge(dict(utterance_min_duration=0.3))
        preprocess_dataset(corpus, syn, n_processes=4,
                           dataset="aidatatang_200zh", audio_cfg=audio_cfg)
        create_embeddings(syn, None, n_processes=4)

    from mockingbird_tpu.config import Config, sv2tts_audio_config
    from mockingbird_tpu.dsp import melspectrogram_bucketed, save_wav
    from mockingbird_tpu.models.vocoder.wavernn import (
        WaveRnnVocoder, wavernn_config)
    from mockingbird_tpu.models.vocoder.wavernn_train import (
        WaveRnnDataset, train)
    from mockingbird_tpu.train.checkpoint import save_single

    if not (syn / "synthesized.txt").exists():
        print("== GTA synthesis (trained synthesizer, teacher-forced) ==",
              flush=True)
        from mockingbird_tpu.models.tacotron.train import run_gta_synthesis
        run_gta_synthesis(args.gta_run, syn, args.models_dir)

    cfg = Config(wavernn_config())
    if args.cfg_override:
        cfg.merge(json.loads(args.cfg_override))

    run_dir = args.models_dir / "wavernn_run"
    eval_dir = run_dir / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)

    dataset = WaveRnnDataset(syn / "train.txt", syn / "mels_gta",
                             syn / "audio", cfg)
    acfg = sv2tts_audio_config()

    def eval_phase(variables, step):
        """gen_testset-style probes + measured mel-reconstruction fidelity."""
        voc = WaveRnnVocoder(cfg=cfg, verbose=False, variables=variables)
        entries = []
        for i in range(min(args.probe_samples, len(dataset))):
            mel, quant = dataset[i]            # (M, T) in ±1, labels
            wav = voc.infer_waveform(mel, normalize=False, seed=step + i)
            mel2 = np.asarray(melspectrogram_bucketed(
                np.asarray(wav, np.float32), acfg))          # (T', M) in ±4
            cond = (mel * cfg.mel_max_abs_value).T           # (T, M) in ±4
            t = min(cond.shape[0], mel2.shape[0])
            l1 = float(np.mean(np.abs(cond[:t] - mel2[:t])))
            save_wav(wav, eval_dir / f"step-{step:06d}-gen_{i}.wav",
                     cfg.sample_rate)
            if step == 0:
                from mockingbird_tpu.dsp import decode_mu_law
                gt = decode_mu_law(quant, 2 ** cfg.bits, from_labels=True)
                save_wav(gt.astype(np.float32),
                         eval_dir / f"ground_truth_{i}.wav", cfg.sample_rate)
            entries.append(dict(
                probe=i, mel_recon_l1=round(l1, 4),
                gen=audio_stats(wav, cfg.sample_rate)))
        l1s = [e["mel_recon_l1"] for e in entries]
        print(f"ARTIFACT step {step}: mel-recon L1 {np.mean(l1s):.4f} "
              f"({', '.join(f'{x:.3f}' for x in l1s)})", flush=True)
        return dict(step=step, mel_recon_l1=round(float(np.mean(l1s)), 4),
                    probes=entries)

    print("== training (phased, resume-from-checkpoint) ==", flush=True)
    import jax
    import jax.numpy as jnp
    model0 = WaveRnnVocoder(cfg=cfg, verbose=False)
    history = [eval_phase(model0.variables, 0)]  # untrained baseline
    state = None
    t0 = time.time()
    for upto in range(args.phase_steps, args.steps + 1, args.phase_steps):
        state = train("wavernn_run", syn, args.models_dir, cfg=cfg,
                      total_steps=upto, save_every=args.phase_steps,
                      log_every=100, gen_samples=0, precision=args.precision)
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        history.append(eval_phase(variables, upto))
    print(f"total wall time {time.time()-t0:.0f}s", flush=True)

    exp = run_dir / "vocoder_wavernn.ckpt"
    save_single(exp, {"params": state["params"],
                      "batch_stats": state["batch_stats"]}, dtype="bfloat16")
    Config(cfg).to_json(exp.with_suffix(".json"))
    (run_dir / "history.json").write_text(json.dumps(history, indent=1))
    print("exported:", exp, flush=True)

    first, last = history[0]["mel_recon_l1"], history[-1]["mel_recon_l1"]
    # the RAW sampler's fidelity floor is higher than a deterministic GAN
    # vocoder's (categorical sampling + 9-bit mu-law quantisation noise):
    # measured random 2.40 vs trained 0.78 — 1.2 splits them with margin,
    # and bench.py's WAVERNN_FID_GATE uses the same calibration
    ok = last < 1.2 and last < first * 0.7
    print(f"RESULT mel-recon L1 {first:.3f} -> {last:.3f} "
          f"({'CONVERGED' if ok else 'NOT YET'})")


if __name__ == "__main__":
    main()
