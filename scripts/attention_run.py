"""On-chip Tacotron training-quality evidence: attention emergence.

The reference's acceptance signal for synthesizer training is a forming
attention diagonal + falling loss (`/root/reference/README.md:248-251`,
`models/synthesizer/train.py:240-277` eval artifacts). This script reproduces
that signal end-to-end on the TPU:

  1. generates a synthetic-but-nontrivial "toy language" corpus — each pinyin
     syllable maps to a distinct harmonic/formant pattern with data-dependent
     duration, so the audio genuinely encodes the text and alignment is
     learnable (no speech corpus is downloadable in this environment);
  2. runs the real preprocess → embedding pipeline;
  3. trains Tacotron for --steps steps (full-size config, bf16 by default),
     saving the trainer's standard eval artifacts (attention PNG,
     predicted-mel, Griffin-Lim wav);
  4. reports the attention-diagonality metric over time: for each eval dump,
     mean |argmax(attn row) - ideal diagonal| in chars.

Run: python scripts/attention_run.py --out /tmp/attn_run --steps 3000
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SYLLABLES = [
    "ni3", "hao3", "shi4", "jie4", "wo3", "men2", "ai4", "zhong1", "guo2",
    "tian1", "qi4", "hen3", "re4", "chi1", "fan4", "shui4", "jiao4", "xue2",
    "xi2", "gong1", "zuo4", "kai1", "xin1", "peng2", "you3", "lai2", "qu4",
    "shan1", "shui3", "hua1",
]


def syllable_audio(syl: str, base_f0: float, sr: int, rng) -> np.ndarray:
    """One syllable as a harmonic complex with syllable-specific formants,
    tone contour from the pinyin tone digit, and jittered duration."""
    i = SYLLABLES.index(syl)
    tone = int(syl[-1])
    dur = 0.12 + 0.015 * (i % 5) + rng.uniform(-0.01, 0.01)
    n = int(sr * dur)
    t = np.arange(n) / sr
    # tone contour (Mandarin-ish): 1 flat, 2 rising, 3 dip, 4 falling
    contour = {1: 1.0 + 0 * t,
               2: 1.0 + 0.25 * t / dur,
               3: 1.0 - 0.2 * np.sin(np.pi * t / dur),
               4: 1.25 - 0.3 * t / dur}[tone]
    f0 = base_f0 * contour
    phase = 2 * np.pi * np.cumsum(f0) / sr
    # two syllable-specific "formants" as harmonic weights
    h1 = 2 + (i % 4)
    h2 = 5 + (i % 7)
    sig = (0.5 * np.sin(phase)
           + 0.35 * np.sin(h1 * phase)
           + 0.25 * np.sin(h2 * phase))
    env = np.minimum(1.0, np.minimum(t / 0.02, (dur - t) / 0.04) * 2)
    return (sig * np.clip(env, 0, 1)).astype(np.float32)


def make_corpus(root: Path, n_utts: int = 400, seed: int = 0) -> Path:
    """aidatatang-style layout the existing preprocess adapters accept."""
    from scipy.io import wavfile

    rng = np.random.RandomState(seed)
    sr = 16000
    ds = root / "aidatatang_200zh"
    trans_dir = ds / "transcript"
    trans_dir.mkdir(parents=True, exist_ok=True)
    lines = []
    for u in range(n_utts):
        spk = "G0001" if u % 2 == 0 else "G0002"
        base = 150.0 if spk == "G0001" else 230.0
        spk_dir = ds / "corpus" / "train" / spk
        spk_dir.mkdir(parents=True, exist_ok=True)
        n_syl = rng.randint(4, 11)
        syls = [SYLLABLES[rng.randint(len(SYLLABLES))] for _ in range(n_syl)]
        gap = np.zeros(int(sr * 0.02), np.float32)
        audio = [np.zeros(int(sr * 0.05), np.float32)]
        for s in syls:
            audio += [syllable_audio(s, base, sr, rng), gap]
        wav = np.concatenate(audio)
        wav += 0.003 * rng.randn(len(wav)).astype(np.float32)
        utt = f"T0055{spk}S{u:04d}"
        wavfile.write(spk_dir / f"{utt}.wav", sr,
                      (np.clip(wav, -1, 1) * 32767).astype(np.int16))
        lines.append(f"{utt} {' '.join(syls)}")
    (trans_dir / "aidatatang_200_zh_transcript.txt").write_text("\n".join(lines))
    return root


def diagonality(attn: np.ndarray, text_len: int, n_steps: int = 0) -> float:
    """Mean |attended char - ideal diagonal| in chars over the REAL decoder
    steps (padded rows attend arbitrary positions and must not count)."""
    steps = min(n_steps, attn.shape[0]) if n_steps else attn.shape[0]
    path = attn[:steps, :text_len].argmax(axis=1)
    ideal = np.linspace(0, text_len - 1, steps)
    return float(np.mean(np.abs(path - ideal)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("/tmp/attn_run"))
    ap.add_argument("--models_dir", type=Path,
                    default=Path(__file__).resolve().parent.parent / "saved_models",
                    help="checkpoint dir; bench.py's quality gate looks in "
                         "saved_models/attention_run by default")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--n_utts", type=int, default=400)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--guided", type=float, default=0.2,
                    help="guided-attention weight (0 = the reference's "
                         "unaided dynamics; alignment then needs far more "
                         "steps — ~18k on real data per README.md:249, and "
                         "on this highly AR-predictable toy corpus it is "
                         "still mushy at 8k)")
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--skip_data", action="store_true",
                    help="reuse an existing preprocessed dir")
    ap.add_argument("--resume", action="store_true",
                    help="keep existing trainer state (default wipes it so a "
                         "regen run cannot silently resume a previous run's "
                         "checkpoint and report a bogus trajectory)")
    args = ap.parse_args()

    from _run_utils import wipe_stale_state
    wipe_stale_state(args.models_dir, "attention_run", args.resume)

    out = args.out
    syn = out / "syn"
    if not args.skip_data:
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

    print("== training ==", flush=True)
    from mockingbird_tpu.models.tacotron.train import train
    schedule = ((2, 1e-3, max(args.steps, 2), 12),)
    state = train("attention_run", syn, args.models_dir, schedule=schedule,
                  total_steps=args.steps, eval_every=args.eval_every,
                  save_every=max(args.steps // 2, 500), backup_every=0,
                  log_every=50, precision=args.precision,
                  guided_attn_weight=args.guided)

    # export inference weights + config sidecar where bench.py's quality
    # gate finds them (save_single format that Synthesizer.load reads)
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.tacotron.model import tacotron_config
    from mockingbird_tpu.train.checkpoint import save_single
    exp = args.models_dir / "attention_run" / "synthesizer.ckpt"
    save_single(exp, {"params": state["params"],
                      "batch_stats": state["batch_stats"]}, dtype="bfloat16")
    Config(tacotron_config()).to_json(exp.with_suffix(".json"))
    print("exported:", exp, flush=True)

    # fixed-probe diagonality: the per-dump numbers below evaluate attn[0]
    # of whichever training batch was live, so they are sample-noisy; the
    # headline metric is the mean over a FIXED batch in eval mode
    print("== fixed-probe diagonality (8 samples, eval mode) ==", flush=True)
    import jax
    import jax.numpy as jnp
    from mockingbird_tpu.models.tacotron.dataset import (
        SynthesizerDataset, collate_synthesizer)
    from mockingbird_tpu.models.tacotron.model import Tacotron
    ds = SynthesizerDataset(syn / "train.txt", syn / "mels", syn / "embeds")
    pb = collate_synthesizer([ds[i] for i in range(8)], r=2, max_abs_value=4.0)
    model = Tacotron(Config(tacotron_config()).freeze())
    out_p = model.apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        jnp.asarray(pb["texts"]), jnp.asarray(pb["mels"]),
        jnp.asarray(pb["embeds"]), 2, train=False,
        rngs={"dropout": jax.random.PRNGKey(0),
              "zoneout": jax.random.PRNGKey(1)})
    attn_p = np.asarray(out_p[2])
    probe_errs = [
        diagonality(attn_p[i], int(pb["text_lengths"][i]),
                    (int(pb["mel_lengths"][i]) + 1) // 2)
        for i in range(attn_p.shape[0])]
    probe_mean = float(np.mean(probe_errs))
    print("per-sample:", [round(e, 2) for e in probe_errs])
    print(f"PROBE diagonality mean {probe_mean:.2f} chars "
          f"({'ALIGNED' if probe_mean < 3.0 else 'NOT ALIGNED'})", flush=True)

    # emergence curve from the saved eval attention dumps (sample-noisy)
    print("== attention diagonality over training ==", flush=True)
    eval_dir = args.models_dir / "attention_run" / "eval"
    rows = []
    for f in sorted(eval_dir.glob("attention_*.npz")):
        z = np.load(f)
        step = int(f.stem.split("_")[1])
        # schedule uses r=2: decoder emits 2 mel frames per attention step
        n_steps = (int(z["mel_len"]) + 1) // 2 if "mel_len" in z else 0
        d = diagonality(z["attn"], int(z["text_len"]), n_steps)
        rows.append((step, d))
        print(f"step {step:6d}: diagonality err {d:6.2f} chars")
    if rows:
        first, last = rows[0][1], rows[-1][1]
        emerged = probe_mean < 3.0 or (last < first * 0.5 and last < 3.0)
        print(f"RESULT diagonality {first:.2f} -> {last:.2f} chars, "
              f"fixed probe {probe_mean:.2f} "
              f"({'EMERGED' if emerged else 'NOT YET'})")
    for f in sorted(eval_dir.glob("attention_*.png"))[-1:]:
        print("artifact:", f)
    for f in sorted(eval_dir.glob("*.wav"))[-1:]:
        print("artifact:", f)


if __name__ == "__main__":
    main()
