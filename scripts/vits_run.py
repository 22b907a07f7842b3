"""On-chip VITS training-quality evidence: MAS alignment emergence.

Mirrors scripts/attention_run.py for the second synthesizer (VERDICT r2
Next #4). The reference's acceptance signal for VITS training is falling
mel/KL/duration losses + eval audio (`/root/reference/models/synthesizer/
train_vits.py:283-317` rank-0 eval; `README.md:248-251`). This script
reproduces it end-to-end on the TPU:

  1. reuses attention_run's toy-language corpus generator (each pinyin
     syllable a distinct harmonic/formant/tone pattern, so audio genuinely
     encodes text and alignment is learnable);
  2. runs the real preprocess pipeline (mels unused by VITS; audio/ +
     train.txt feed VitsDataset's on-the-fly linear specs);
  3. trains the full VITS step (both optimizers, on-device MAS,
     discriminator) in phases via the real trainer — each phase resumes
     from the previous checkpoint exactly like a user restart;
  4. after each phase: dumps the MAS alignment matrix (PNG + npz) for a
     fixed probe batch, its diagonality error, the loss parts, and a
     generated eval wav from `Vits.infer`;
  5. exports inference weights + config where bench.py's VITS path finds
     them (saved_models/vits_run/synthesizer_vits.ckpt).

Run: python scripts/vits_run.py --out /tmp/vits_run --steps 3000
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


def mas_diagonality(attn: np.ndarray, text_len: int, spec_len: int) -> float:
    """Mean |attended char − ideal diagonal| in chars over real frames.
    attn: (Ty, Tx) hard MAS path."""
    a = attn[:spec_len, :text_len]
    path = a.argmax(axis=1)
    ideal = np.linspace(0, text_len - 1, len(path))
    return float(np.mean(np.abs(path - ideal)))


def save_alignment_png(attn: np.ndarray, path: Path) -> None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.imshow(attn.T, aspect="auto", origin="lower", interpolation="none")
        ax.set_xlabel("spec frame")
        ax.set_ylabel("text position")
        fig.tight_layout()
        fig.savefig(path, dpi=90)
        plt.close(fig)
    except Exception as e:  # matplotlib optional
        print(f"(no PNG: {e})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/vits_run"))
    ap.add_argument("--models_dir", type=Path,
                    default=Path(__file__).resolve().parent.parent / "saved_models",
                    help="bench.py's VITS path looks in saved_models/vits_run")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--phase_steps", type=int, default=500,
                    help="train in resume-from-checkpoint phases; artifacts "
                         "dumped between phases")
    ap.add_argument("--n_utts", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--skip_data", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny model (CPU smoke of the script logic)")
    ap.add_argument("--resume", action="store_true",
                    help="keep existing trainer state (default wipes it so a "
                         "regen run cannot silently resume a previous run's "
                         "checkpoint and report a bogus trajectory)")
    args = ap.parse_args()

    from _run_utils import wipe_stale_state
    wipe_stale_state(args.models_dir, "vits_run", args.resume)

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

    import jax
    import jax.numpy as jnp
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.vits.model import Vits, init_vits, vits_config
    from mockingbird_tpu.models.vits.train import VitsDataset, train
    from mockingbird_tpu.dsp import save_wav
    from mockingbird_tpu.train.checkpoint import save_single

    cfg = Config(vits_config())
    if args.small:
        cfg.merge(dict(inter_channels=32, hidden_channels=32, filter_channels=64,
                       n_layers=2, upsample_rates=[8, 8, 4],
                       upsample_kernel_sizes=[16, 16, 8],
                       upsample_initial_channel=64, resblock_kernel_sizes=[3],
                       resblock_dilation_sizes=[[1, 3]], segment_size=4096,
                       gin_channels=16))
    run_dir = args.models_dir / "vits_run"
    eval_dir = run_dir / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)

    # fixed probe batch for alignment dumps (first few dataset items)
    dataset = VitsDataset(syn, cfg)
    cfg.n_speakers = max(cfg.n_speakers, dataset.n_speakers)
    fcfg = cfg.clone()
    probe = [dataset[i] for i in range(4)]
    t_x = max(len(p[0]) for p in probe)
    t_y = max(p[1].shape[0] for p in probe)
    t_x = ((t_x + 15) // 16) * 16
    t_y = ((t_y + 15) // 16) * 16
    px = np.zeros((4, t_x), np.int32)
    pxl = np.zeros((4,), np.int32)
    py = np.zeros((4, t_y, cfg.spec_channels), np.float32)
    pyl = np.zeros((4,), np.int32)
    psid = np.zeros((4,), np.int32)
    pemo = np.zeros((4, cfg.emotion_channels), np.float32)
    for i, (seq, spec, wav, sid, emo) in enumerate(probe):
        px[i, : len(seq)] = seq
        pxl[i] = len(seq)
        py[i, : spec.shape[0]] = spec
        pyl[i] = spec.shape[0]
        psid[i] = sid
        pemo[i] = emo

    model, _ = init_vits(jax.random.PRNGKey(0), fcfg.clone(), t_x=16, t_y=32)

    @jax.jit
    def probe_fwd(gp, key):
        out = model.apply({"params": gp}, jnp.asarray(px), jnp.asarray(pxl),
                          jnp.asarray(py), jnp.asarray(pyl), jnp.asarray(psid),
                          jnp.asarray(pemo), key=key, train=False,
                          rngs={"dropout": key})
        _, l_length, attn, *_ = out
        return attn, l_length

    @jax.jit
    def probe_infer(gp, key):
        k1, k2 = jax.random.split(key)
        o, attn, y_mask, y_lengths = model.apply(
            {"params": gp}, jnp.asarray(px[:1]), jnp.asarray(pxl[:1]),
            jnp.asarray(psid[:1]), jnp.asarray(pemo[:1]), noise_scale=0.667,
            length_scale=1.0, noise_scale_w=0.8, max_len=400, key=k1,
            method=Vits.infer, rngs={"dropout": k2})
        return o, y_lengths

    def dump_artifacts(gp, step):
        attn, l_length = probe_fwd(gp, jax.random.PRNGKey(0))
        attn = np.asarray(attn, np.float32)
        errs = [mas_diagonality(attn[i], int(pxl[i]), int(pyl[i]))
                for i in range(len(probe))]
        d = float(np.mean(errs))
        np.savez(eval_dir / f"mas_{step:06d}.npz", attn=attn[0],
                 text_len=int(pxl[0]), spec_len=int(pyl[0]),
                 diagonality=np.asarray(errs))
        save_alignment_png(attn[0][: int(pyl[0]), : int(pxl[0])],
                           eval_dir / f"mas_{step:06d}.png")
        o, y_lengths = probe_infer(gp, jax.random.PRNGKey(step))
        wav_hat = np.asarray(o)[0][: int(np.asarray(y_lengths)[0]) * cfg.hop_size]
        save_wav(wav_hat, eval_dir / f"step-{step:06d}-gen.wav", cfg.sample_rate)
        ld = float(np.mean(np.asarray(l_length)))
        print(f"ARTIFACT step {step}: MAS diagonality {d:.2f} chars, "
              f"dur loss {ld:.4f}, eval wav {len(wav_hat)/cfg.sample_rate:.2f}s",
              flush=True)
        return d, ld

    print("== training (phased, resume-from-checkpoint) ==", flush=True)
    history = []
    state = None
    t0 = time.time()
    for upto in range(args.phase_steps, args.steps + 1, args.phase_steps):
        state = train("vits_run", syn, args.models_dir, cfg=cfg,
                      batch_size=args.batch_size, total_steps=upto,
                      save_every=args.phase_steps, log_every=50, eval_every=0,
                      precision=args.precision)
        d, ld = dump_artifacts(state["g"], upto)
        history.append(dict(step=upto, diagonality=round(d, 3),
                            dur_loss=round(ld, 4)))
    print(f"total wall time {time.time()-t0:.0f}s", flush=True)

    exp = run_dir / "synthesizer_vits.ckpt"
    save_single(exp, {"g": state["g"]}, dtype="bfloat16")
    Config(cfg).to_json(run_dir / "config.json")
    (run_dir / "history.json").write_text(json.dumps(history, indent=1))
    print("exported:", exp, flush=True)

    first, last = history[0]["diagonality"], history[-1]["diagonality"]
    print(f"RESULT MAS diagonality {first:.2f} -> {last:.2f} chars "
          f"({'SHARPENED' if last < max(first * 0.7, 2.0) else 'NOT YET'})")


if __name__ == "__main__":
    main()
