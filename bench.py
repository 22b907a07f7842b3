"""End-to-end TTS benchmark: audio-seconds synthesized per second per chip.

Pipeline measured (the reference's core product path, SURVEY.md §3.1):
reference wav → GE2E speaker embedding → Tacotron AR mel synthesis (fixed
400-frame workload, stop disabled for determinism) → HiFi-GAN vocoding →
int16 PCM on the host. Uses the fused on-device path (`pipeline.tts_batch`):
mels never leave the chip; the device→host link only carries quantised PCM.
Audio seconds are counted from the samples actually returned.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the 50× RTF/chip target in BASELINE.json.

Quality gate: when a trained synthesizer export exists (env MB_BENCH_CKPT or
`saved_models/attention_run/synthesizer.ckpt`, produced by
scripts/attention_run.py) the pipeline runs with TRAINED weights and the
output audio must pass sanity checks (non-silence + spectral centroid in the
speech band) — tying the RTF number to a pipeline that demonstrably works
(`/root/reference/run.py:85-94` prints RTF on real checkpoints the same way).
With fresh weights the gate reports "untrained" instead of asserting.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np


def audio_sanity(wavs, sr=16000):
    """(rms, spectral centroid Hz) over the first few outputs (int16 PCM)."""
    cat = np.concatenate([np.asarray(w, np.float64) for w in wavs[:4]])
    rms = float(np.sqrt(np.mean(cat**2)))
    spec = np.abs(np.fft.rfft(cat * np.hanning(len(cat)))) ** 2
    freqs = np.fft.rfftfreq(len(cat), 1 / sr)
    centroid = float((freqs * spec).sum() / max(spec.sum(), 1e-12))
    return rms, centroid


def main():
    from mockingbird_tpu import dsp
    from mockingbird_tpu.pipeline import VoiceCloningPipeline

    sample = "/root/reference/data/samples/T0055G0013S0005.wav"
    try:
        wav, sr = dsp.load_wav(sample)
        ref = sample  # path: the pipeline caches the speaker embedding by path
    except Exception:
        t = np.arange(16000 * 3) / 16000
        wav, sr = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), 16000
        ref = wav

    ckpt = os.environ.get(
        "MB_BENCH_CKPT",
        str(Path(__file__).parent / "saved_models/attention_run/synthesizer.ckpt"))
    trained = Path(ckpt).exists()
    pipe = VoiceCloningPipeline(verbose=False,
                                synthesizer_fpath=ckpt if trained else None)
    batch = int(os.environ.get("MB_BENCH_BATCH", "128"))
    texts = ["ni3 hao3 shi4 jie4 zhe4 shi4 yi2 ge4 ce4 shi4 ju4 zi3"] * batch
    steps = 400  # fixed AR workload; min_stop_token=11 disables early stop

    def run():
        return pipe.tts_batch(texts, ref, steps=steps, min_stop_token=11,
                              batch_size=batch, source_sr=sr)

    wavs = run()  # warm-up (compiles embed + AR decode + vocoder programs)

    # best of 3: the device↔host tunnel has occasional multi-second stalls
    # unrelated to the pipeline; peak throughput is the stable statistic
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        wavs = run()
        dt = min(dt, time.time() - t0)

    out_sr = 16000
    audio_seconds = sum(len(w) for w in wavs) / out_sr
    rtf = audio_seconds / dt

    rms, centroid = audio_sanity(wavs, out_sr)
    if trained:
        gate = "pass" if (rms > 100 and 150 < centroid < 6000) else "fail"
    else:
        gate = "untrained"

    print(json.dumps({
        "metric": "e2e_tts_rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "audio_seconds/s/chip",
        "vs_baseline": round(rtf / 50.0, 3),
        "weights": "trained" if trained else "random",
        "quality_gate": gate,
        "audio_rms": round(rms, 1),
        "spectral_centroid_hz": round(centroid, 1),
    }))
    return 0 if gate != "fail" else 1


if __name__ == "__main__":
    sys.exit(main())
