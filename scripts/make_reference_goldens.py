"""Generate reference-binary golden fixtures for the VAD / f0 substitutes.

Run this in ANY environment that has `webrtcvad` and `pyworld` installed
(neither is installable in the offline TPU environment — VERDICT r2
Missing #2 / Next #6). It computes, for the bundled reference sample and a
few synthetic hard cases:

- the webrtcvad-based keep-mask exactly as the reference's
  `trim_long_silences` builds it (`/root/reference/models/encoder/
  audio.py:68-108`: mode-3 VAD over 30 ms windows, moving average width 8,
  binary dilation width 6+1), and
- the pyworld `harvest` f0 track exactly as the reference's `compute_f0`
  calls it (`/root/reference/utils/f0_utils.py:14-19`: frame_period 10 ms,
  floor 80 Hz, ceil 600 Hz),

and writes them to tests/fixtures/ref_goldens/<case>.npz. Commit those
files; `tests/test_dsp_realspeech.py` then validates the energy-VAD and
autocorrelation-f0 substitutes against the *actual* reference binaries'
output (and skips those assertions when the fixtures are absent).

Usage: python scripts/make_reference_goldens.py [--sample path/to.wav]
"""
from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

import numpy as np

SR = 16000
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "ref_goldens"

# the reference's VAD parameters (`models/encoder/params_data.py`)
VAD_WINDOW_MS = 30
VAD_MOVING_AVERAGE_WIDTH = 8
VAD_MAX_SILENCE_LENGTH = 6
INT16_MAX = (2 ** 15) - 1


def webrtcvad_keep_mask(wav: np.ndarray) -> np.ndarray:
    """Per-sample bool keep-mask, reproducing the reference's
    `trim_long_silences` decision chain verbatim (audio.py:68-108)."""
    import webrtcvad
    from scipy.ndimage import binary_dilation

    samples_per_window = (VAD_WINDOW_MS * SR) // 1000
    wav = wav[: len(wav) - (len(wav) % samples_per_window)]
    pcm_wave = struct.pack("%dh" % len(wav),
                           *(np.round(wav * INT16_MAX)).astype(np.int16))
    vad = webrtcvad.Vad(mode=3)
    voice_flags = []
    for start in range(0, len(wav), samples_per_window):
        end = start + samples_per_window
        voice_flags.append(vad.is_speech(pcm_wave[start * 2 : end * 2],
                                         sample_rate=SR))
    voice_flags = np.array(voice_flags, float)

    def moving_average(array, width):
        padded = np.concatenate((np.zeros((width - 1) // 2), array,
                                 np.zeros(width // 2)))
        ret = np.cumsum(padded, dtype=float)
        ret[width:] = ret[width:] - ret[:-width]
        return ret[width - 1:] / width

    mask = np.round(moving_average(voice_flags, VAD_MOVING_AVERAGE_WIDTH)).astype(bool)
    mask = binary_dilation(mask, np.ones(VAD_MAX_SILENCE_LENGTH + 1))
    return np.repeat(mask, samples_per_window)


def harvest_f0(wav: np.ndarray) -> np.ndarray:
    import pyworld
    f0, _ = pyworld.harvest(wav.astype(np.float64), SR, frame_period=10.0,
                            f0_floor=80.0, f0_ceil=600.0)
    return f0.astype(np.float32)


def synthetic_cases(rng) -> dict:
    """Hard cases matching tests/test_dsp_realspeech.py's robustness set."""
    t = np.arange(int(SR * 2.0)) / SR
    cases = {}
    # speech-with-long-silences: tone bursts separated by silence
    sig = np.zeros_like(t)
    for s0 in (0.2, 0.9, 1.6):
        seg = (t >= s0) & (t < s0 + 0.25)
        sig[seg] = 0.4 * np.sin(2 * np.pi * 180 * t[seg]) \
            * np.hanning(seg.sum())
    cases["bursts_180hz"] = sig + 0.002 * rng.standard_normal(len(t))
    # creaky low f0
    f0 = 90 * (1 + 0.05 * np.sin(2 * np.pi * 2 * t))
    ph = 2 * np.pi * np.cumsum(f0) / SR
    cases["creaky_90hz"] = (0.3 * np.sin(ph) * (1 + 0.3 * np.sin(ph / 2))
                            ).astype(np.float64)
    # breathy high f0 + noise
    f0 = 320 * (1 + 0.03 * np.sin(2 * np.pi * 3 * t))
    ph = 2 * np.pi * np.cumsum(f0) / SR
    cases["breathy_320hz"] = 0.25 * np.sin(ph) + 0.08 * rng.standard_normal(len(t))
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sample",
                    default="/root/reference/data/samples/T0055G0013S0005.wav")
    args = ap.parse_args()
    try:
        import webrtcvad  # noqa: F401
        import pyworld  # noqa: F401
    except ImportError as e:
        print(f"needs webrtcvad + pyworld installed: {e}", file=sys.stderr)
        return 1

    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    cases = synthetic_cases(rng)
    sample = Path(args.sample)
    if sample.exists():
        import wave as _w
        with _w.open(str(sample)) as w:
            assert w.getframerate() == SR and w.getnchannels() == 1
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        cases["reference_sample"] = pcm.astype(np.float64) / 32768.0

    for name, wav in cases.items():
        np.savez(OUT / f"{name}.npz",
                 wav=wav.astype(np.float32),
                 vad_keep_mask=webrtcvad_keep_mask(wav),
                 harvest_f0=harvest_f0(wav))
        print("wrote", OUT / f"{name}.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())
