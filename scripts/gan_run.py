"""On-chip GAN-vocoder training-quality evidence: mel error + audible output.

Mirrors scripts/attention_run.py / vits_run.py / encoder_run.py for the GAN
vocoders (VERDICT r2 Weak #4: their training had step-smoke only). The
reference's quality signal for HiFi-GAN training is the periodic validation
mel error plus generated audio dumped to TensorBoard
(`/root/reference/models/vocoder/hifigan/train.py:198-244`). This script
reproduces it end-to-end on the TPU:

  1. reuses the toy-language corpus generator (harmonic syllables → real
     preprocess → audio/ + train.txt, the exact layout `MelDataset` reads);
  2. trains the full GAN step (generator + MPD/MSD discriminators, both
     AdamW optimizers, disc from step 0 as the reference configures) in
     resume-from-checkpoint phases via the real trainer;
  3. after each phase: held-out mel-L1, plus spectral sanity of generated
     vs ground-truth audio (rms + spectral centroid), eval wav artifacts;
  4. exports generator weights where the pipeline / bench can load them
     (saved_models/gan_run/vocoder_hifigan.ckpt — `load_vocoder` dispatches
     on the "hifigan" substring exactly like the reference toolbox).

Run: python scripts/gan_run.py --out /tmp/gan_run --steps 3000
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


def audio_stats(wav: np.ndarray, sr: int) -> dict:
    w = np.asarray(wav, np.float64)
    rms = float(np.sqrt(np.mean(w**2)))
    spec = np.abs(np.fft.rfft(w * np.hanning(len(w)))) ** 2
    freqs = np.fft.rfftfreq(len(w), 1 / sr)
    centroid = float((freqs * spec).sum() / max(spec.sum(), 1e-12))
    return dict(rms=round(rms, 4), centroid_hz=round(centroid, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/gan_run"))
    ap.add_argument("--models_dir", type=Path,
                    default=Path(__file__).resolve().parent.parent / "saved_models")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--phase_steps", type=int, default=500)
    ap.add_argument("--arch", default="hifigan", choices=["hifigan", "fregan"])
    ap.add_argument("--n_utts", type=int, default=400)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--skip_data", action="store_true")
    ap.add_argument("--cfg_override", default=None,
                    help="json dict merged into the arch config (tests)")
    ap.add_argument("--gta_run", default=None,
                    help="synthesizer run_id (e.g. attention_run): run GTA "
                         "synthesis with its checkpoint and fine-tune the "
                         "vocoder on the GTA mels — the reference's vocoder "
                         "fine-tune flow (`synthesize.py:12-96` + hifigan "
                         "fine_tuning). Uses a hop-256 upsample stack so "
                         "SV2TTS mel frames align exactly with audio.")
    ap.add_argument("--resume", action="store_true",
                    help="keep existing trainer state (default wipes it so a "
                         "regen run cannot silently resume a previous run's "
                         "checkpoint and report a bogus trajectory)")
    args = ap.parse_args()

    from _run_utils import wipe_stale_state
    wipe_stale_state(args.models_dir, "gan_run", args.resume)

    out = args.out
    syn = out / "syn"
    if not args.skip_data and not (syn / "train.txt").exists():
        print("== generating toy-language corpus ==", flush=True)
        corpus = make_corpus(out / "corpus", n_utts=args.n_utts)
        print("== preprocessing ==", flush=True)
        from mockingbird_tpu.config import sv2tts_audio_config
        from mockingbird_tpu.models.tacotron.preprocess import preprocess_dataset
        audio_cfg = sv2tts_audio_config().merge(dict(utterance_min_duration=0.3))
        preprocess_dataset(corpus, syn, n_processes=4,
                           dataset="aidatatang_200zh", audio_cfg=audio_cfg)
        if args.gta_run is not None:
            # GTA synthesis conditions on speaker embeddings (embeds/), which
            # the mel preprocess alone does not produce
            from mockingbird_tpu.models.tacotron.preprocess import create_embeddings
            create_embeddings(syn, None, n_processes=4)

    import jax
    import jax.numpy as jnp
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.dsp import save_wav
    from mockingbird_tpu.models.vocoder.dataset import (
        MelDataset, collate_gan, get_dataset_filelist)
    from mockingbird_tpu.models.vocoder.gan_train import ARCHS, mel_loss_fn, train
    from mockingbird_tpu.train.checkpoint import save_single

    gen_cls, _, cfg_fn = ARCHS[args.arch]
    cfg = Config(cfg_fn())
    fine_tuning = args.gta_run is not None
    if fine_tuning:
        # SV2TTS mels are hop 256 / ±4-normalised; the stock GAN config is
        # hop 200 (the reference ships the same mismatch, config_16k_.json:
        # 12-24 vs hparams.py hop 256). For GTA fine-tuning, align exactly:
        # 8*8*4 = 256 samples per mel frame.
        cfg.merge(dict(upsample_rates=[8, 8, 4], upsample_kernel_sizes=[16, 16, 8],
                       hop_size=256, n_fft=1024, win_size=1024,
                       segment_size=8192, fmin=55.0))
        print("== GTA synthesis (trained synthesizer, teacher-forced) ==",
              flush=True)
        from mockingbird_tpu.models.tacotron.train import run_gta_synthesis
        if not (syn / "synthesized.txt").exists():
            run_gta_synthesis(args.gta_run, syn, args.models_dir)
    if args.cfg_override:
        cfg.merge(json.loads(args.cfg_override))
    fcfg = cfg.freeze()
    gen = gen_cls(fcfg)

    run_dir = args.models_dir / "gan_run"
    eval_dir = run_dir / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)

    # fixed held-out probe batch (the 5% validation tail of train.txt)
    _, val_files = get_dataset_filelist(syn)
    val_ds = MelDataset(val_files, cfg, syn_dir=syn, split=True, seed=7,
                        fine_tuning=fine_tuning)
    probe = collate_gan([val_ds[i % len(val_ds)] for i in range(8)])
    probe_mels = jnp.asarray(probe["mels"])
    probe_wavs = jnp.asarray(probe["wavs"])

    @jax.jit
    def probe_fn(gp):
        y_hat = gen.apply({"params": gp}, probe_mels)
        err = jnp.mean(jnp.abs(mel_loss_fn(probe_wavs, fcfg)
                               - mel_loss_fn(y_hat, fcfg)))
        return y_hat, err

    def dump_artifacts(gp, step):
        y_hat, err = probe_fn(gp)
        y_hat = np.asarray(y_hat, np.float32)
        gen_stats = audio_stats(y_hat[0], cfg.sample_rate)
        gt_stats = audio_stats(np.asarray(probe_wavs[0]), cfg.sample_rate)
        save_wav(y_hat[0], eval_dir / f"step-{step:06d}-gen.wav", cfg.sample_rate)
        if step == 0:
            save_wav(np.asarray(probe_wavs[0]), eval_dir / "ground_truth.wav",
                     cfg.sample_rate)
        e = float(err)
        print(f"ARTIFACT step {step}: val mel L1 {e:.4f}, gen rms "
              f"{gen_stats['rms']:.3f} centroid {gen_stats['centroid_hz']:.0f} Hz "
              f"(gt rms {gt_stats['rms']:.3f} centroid {gt_stats['centroid_hz']:.0f} Hz)",
              flush=True)
        return dict(step=step, val_mel_l1=round(e, 4), gen=gen_stats, gt=gt_stats)

    print("== training (phased, resume-from-checkpoint) ==", flush=True)
    key = jax.random.PRNGKey(1234)
    seg_frames = cfg.segment_size // cfg.hop_size
    g0 = gen.init(key, jnp.zeros((1, seg_frames, cfg.num_mels)))["params"]
    history = [dump_artifacts(g0, 0)]  # untrained baseline
    state = None
    t0 = time.time()
    for upto in range(args.phase_steps, args.steps + 1, args.phase_steps):
        state = train("gan_run", syn, args.models_dir, arch=args.arch, cfg=cfg,
                      fine_tuning=fine_tuning, total_steps=upto,
                      save_every=args.phase_steps, log_every=100, val_every=0,
                      precision=args.precision)
        history.append(dump_artifacts(state["g"], upto))
    print(f"total wall time {time.time()-t0:.0f}s", flush=True)

    exp = run_dir / f"vocoder_{args.arch}.ckpt"
    save_single(exp, {"g": state["g"]}, dtype="bfloat16")
    # sidecar read by GanVocoder (hop-256 GTA variant differs from stock)
    Config(cfg).to_json(exp.with_suffix(".json"))
    (run_dir / "history.json").write_text(json.dumps(history, indent=1))
    print("exported:", exp, flush=True)

    first, last = history[0]["val_mel_l1"], history[-1]["val_mel_l1"]
    gen_c = history[-1]["gen"]["centroid_hz"]
    gt_c = history[-1]["gt"]["centroid_hz"]
    ok = last < first * 0.5 and history[-1]["gen"]["rms"] > 0.01 \
        and 0.3 < gen_c / max(gt_c, 1e-6) < 3.0
    print(f"RESULT val mel L1 {first:.3f} -> {last:.3f}, centroid "
          f"{gen_c:.0f} Hz vs gt {gt_c:.0f} Hz "
          f"({'CONVERGED' if ok else 'NOT YET'})")


if __name__ == "__main__":
    main()
