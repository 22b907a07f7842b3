"""DSP substitutes validated on real speech (VERDICT r1 weak #4/#5).

webrtcvad and pyworld are not installed in this environment (and cannot be),
so reference-pipeline goldens are impossible to generate here; instead these
tests pin down the substitutes' behaviour with (a) an independently coded
per-frame oracle for the vectorised f0 tracker, (b) plausibility and
robustness checks on the bundled real utterance and on synthetic
creaky/breathy speech, (c) trim-decision checks on real speech with injected
silence. See BASELINE.md for the honest statement of this limitation.
"""
from pathlib import Path

import numpy as np
import pytest

from mockingbird_tpu.dsp.f0 import compute_f0


def _f0_loop_oracle(wav, sr=16000, frame_period=10.0, f0_floor=80.0,
                    f0_ceil=600.0):
    """The original per-frame-loop tracker, kept verbatim as an oracle for
    the vectorised implementation."""
    wav = np.asarray(wav, np.float64)
    hop = int(sr * frame_period / 1000)
    win = int(sr * 0.04)
    n_frames = max(1, int(np.ceil((len(wav) + 1) / hop)))
    pad = win // 2
    x = np.pad(wav, (pad, win))
    lag_min = int(sr / f0_ceil)
    lag_max = min(int(sr / f0_floor), win - 1)
    f0 = np.zeros(n_frames, np.float32)
    clarity = np.zeros(n_frames, np.float32)
    rms_all = np.sqrt(np.mean(wav**2) + 1e-12)
    for i in range(n_frames):
        seg = x[i * hop : i * hop + win]
        seg = seg - seg.mean()
        rms = np.sqrt(np.mean(seg**2) + 1e-12)
        if rms < 0.05 * rms_all:
            continue
        n_fft = int(2 ** np.ceil(np.log2(2 * win)))
        spec = np.fft.rfft(seg, n_fft)
        ac = np.fft.irfft(spec * np.conj(spec))[: lag_max + 1]
        if ac[0] <= 0:
            continue
        nac = ac / ac[0]
        k = int(np.argmax(nac[lag_min : lag_max + 1])) + lag_min
        if 1 <= k < lag_max:
            a, b, c = nac[k - 1], nac[k], nac[k + 1]
            denom = a - 2 * b + c
            shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
            k_ref = k + np.clip(shift, -1, 1)
        else:
            k_ref = k
        clarity[i] = nac[k]
        f0[i] = sr / k_ref
    voiced = clarity > 0.5
    f0 = np.where(voiced, f0, 0.0).astype(np.float32)
    f0s = f0.copy()
    for i in range(1, n_frames - 1):
        if f0[i] > 0:
            window = [v for v in f0[max(0, i - 1): i + 2] if v > 0]
            f0s[i] = np.median(window)
    return f0s


def test_f0_vectorised_matches_loop_oracle(sample_wav):
    wav, sr = sample_wav
    ours = compute_f0(wav, sr)
    oracle = _f0_loop_oracle(wav, sr)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=1e-6, atol=1e-3)

    # synthetic edge cases too: silence, pure tone, noise
    rng = np.random.RandomState(0)
    for sig in (np.zeros(8000, np.float32),
                np.sin(2 * np.pi * 150 * np.arange(16000) / 16000).astype(np.float32),
                rng.randn(8000).astype(np.float32) * 0.1):
        np.testing.assert_allclose(compute_f0(sig, 16000),
                                   _f0_loop_oracle(sig, 16000),
                                   rtol=1e-6, atol=1e-3)


def test_f0_real_speech_plausible(sample_wav):
    """On the bundled utterance the track must look like speech: a sensible
    voiced fraction, median in the speech range, small frame-to-frame jitter
    (no octave flapping)."""
    wav, sr = sample_wav
    f0 = compute_f0(wav, sr)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.2 * len(f0), "too little voicing detected"
    assert 80 <= np.median(voiced) <= 350, np.median(voiced)
    # consecutive voiced frames: |cents step| p90 under 2 semitones
    both = (f0[:-1] > 0) & (f0[1:] > 0)
    cents = 1200 * np.abs(np.log2(f0[1:][both] / f0[:-1][both]))
    assert np.percentile(cents, 90) < 200, np.percentile(cents, 90)


@pytest.mark.parametrize("kind", ["creaky", "breathy"])
def test_f0_robustness_hard_voices(kind):
    """Jittered/noisy phonation — where autocorrelation trackers typically
    diverge from pyworld-harvest. Accept small deviation, reject octave
    errors on the bulk of voiced frames."""
    sr = 16000
    rng = np.random.RandomState(3)
    t = np.arange(int(sr * 1.0)) / sr
    base = 110.0
    if kind == "creaky":
        # cycle-to-cycle jitter + amplitude shimmer on a pulse-ish waveform
        jitter = 1 + 0.04 * rng.randn(len(t)).cumsum() / np.sqrt(np.arange(1, len(t) + 1))
        phase = 2 * np.pi * base * np.cumsum(jitter) / sr
        sig = (0.5 * np.sin(phase) + 0.3 * np.sin(2 * phase) + 0.2 * np.sin(3 * phase))
        sig *= 1 + 0.3 * np.sin(2 * np.pi * 7 * t)
        true_f0 = base * jitter
    else:
        sig = (0.4 * np.sin(2 * np.pi * base * t)
               + 0.2 * np.sin(2 * np.pi * 2 * base * t)
               + 0.15 * rng.randn(len(t)))  # aspiration noise (~6 dB SNR)
        true_f0 = np.full(len(t), base)

    f0 = compute_f0(sig.astype(np.float32), sr)
    hop = sr // 100
    truth = true_f0[::hop][: len(f0)]
    voiced = f0[: len(truth)] > 0
    assert voiced.mean() > 0.5, f"{kind}: lost voicing"
    err = np.abs(f0[: len(truth)][voiced] - truth[voiced]) / truth[voiced]
    within = (err < 0.1).mean()
    assert within > 0.8, f"{kind}: only {within:.0%} frames within 10%"


def test_vad_trim_real_speech(sample_wav):
    """Trim decisions on the real utterance + injected silences
    (`models/encoder/audio.py:71-108` structure): the long injected gaps must
    go, the high-energy speech frames must survive."""
    from mockingbird_tpu.config import encoder_audio_config
    from mockingbird_tpu.dsp import trim_long_silences
    from mockingbird_tpu.dsp.audio import normalize_volume

    wav, sr = sample_wav
    cfg = encoder_audio_config()
    assert cfg.sample_rate == sr
    wav = normalize_volume(wav, -30.0, increase_only=True)
    gap = np.zeros(int(sr * 1.0), np.float32)
    padded = np.concatenate([gap, wav, gap, wav, gap])
    trimmed = trim_long_silences(padded, cfg)

    # injected silence (3 s of 5.4 s total) largely removed
    assert len(trimmed) < len(padded) - 2.0 * sr
    # high-energy content survives: compare frame-RMS mass
    w = (cfg.vad_window_length_ms * sr) // 1000

    def frame_rms(x):
        x = x[: len(x) - len(x) % w]
        return np.sqrt(np.mean(x.reshape(-1, w) ** 2, axis=1))

    r_in, r_out = frame_rms(padded), frame_rms(trimmed)
    loud = np.sort(r_in)[-int(0.3 * len(r_in)):]          # top 30% frames
    kept = np.sort(r_out)[-len(loud):] if len(r_out) >= len(loud) else r_out
    assert len(r_out) >= 0.9 * len(loud), "speech frames lost"
    assert kept.sum() >= 0.9 * loud.sum(), "energy mass lost in trim"


def test_vad_agreement_with_independent_detector(sample_wav):
    """Frame-level agreement (>=85%) between the energy VAD's speech mask and
    an independently coded spectral-energy detector on real speech."""
    from mockingbird_tpu.config import encoder_audio_config
    from mockingbird_tpu.dsp.audio import (_binary_dilation, _moving_average,
                                           normalize_volume)

    wav, sr = sample_wav
    cfg = encoder_audio_config()
    wav = normalize_volume(wav, -30.0, increase_only=True)
    w = (cfg.vad_window_length_ms * sr) // 1000
    wav = wav[: len(wav) - len(wav) % w]
    frames = wav.reshape(-1, w)

    # repo detector's mask (same path as trim_long_silences)
    rms = np.sqrt(np.mean(frames**2, axis=1))
    noise_floor = np.percentile(rms, 10)
    thresh = max(noise_floor * 4.0, rms.max() / 30.0, 1e-5)
    flags = (rms > thresh).astype(float)
    mask = np.round(_moving_average(flags, cfg.vad_moving_average_width)).astype(bool)
    mask = _binary_dilation(mask, cfg.vad_max_silence_length + 1)

    # independent detector: band-limited (80-4000 Hz) spectral energy vs the
    # utterance's own noise floor, same smoothing
    spec = np.abs(np.fft.rfft(frames * np.hanning(w), axis=1)) ** 2
    freqs = np.fft.rfftfreq(w, 1 / sr)
    band = spec[:, (freqs >= 80) & (freqs <= 4000)].sum(axis=1)
    db = 10 * np.log10(band + 1e-12)
    flags2 = (db > np.percentile(db, 10) + 12).astype(float)
    mask2 = np.round(_moving_average(flags2, cfg.vad_moving_average_width)).astype(bool)
    mask2 = _binary_dilation(mask2, cfg.vad_max_silence_length + 1)

    agreement = (mask == mask2).mean()
    assert agreement >= 0.85, f"VAD agreement only {agreement:.0%}"


# ---------------------------------------------------------------------------
# Reference-binary goldens (VERDICT r2 Next #6). The fixtures are produced
# by scripts/make_reference_goldens.py in an environment where webrtcvad and
# pyworld ARE installed; when committed, these tests validate the
# substitutes against the actual reference binaries' output. They skip
# (visibly) when no fixtures exist — this offline environment cannot
# generate them.
# ---------------------------------------------------------------------------

GOLDENS = sorted(
    (Path(__file__).parent / "fixtures" / "ref_goldens").glob("*.npz"))


@pytest.mark.parametrize("fixture", GOLDENS or [None],
                         ids=[f.stem for f in GOLDENS] or ["missing"])
def test_vad_agrees_with_webrtcvad_golden(fixture):
    """Energy-VAD keep-mask vs the reference's webrtcvad mask: >=85% sample
    agreement, and >=95% of the golden's kept (speech) samples retained."""
    if fixture is None:
        pytest.skip("no ref_goldens fixtures committed (generate with "
                    "scripts/make_reference_goldens.py where webrtcvad is "
                    "installed)")
    from mockingbird_tpu.config import encoder_audio_config
    from mockingbird_tpu.dsp.audio import normalize_volume, vad_keep_mask

    z = np.load(fixture)
    wav = normalize_volume(z["wav"].astype(np.float32), -30.0,
                           increase_only=True)
    ours = vad_keep_mask(wav, encoder_audio_config())
    gold = z["vad_keep_mask"][: len(ours)]
    ours = ours[: len(gold)]
    agreement = float(np.mean(ours == gold))
    speech_kept = float(ours[gold].mean()) if gold.any() else 1.0
    assert agreement >= 0.85, f"{fixture.stem}: mask agreement {agreement:.2%}"
    assert speech_kept >= 0.95, f"{fixture.stem}: dropped speech {1-speech_kept:.2%}"


@pytest.mark.parametrize("fixture", GOLDENS or [None],
                         ids=[f.stem for f in GOLDENS] or ["missing"])
def test_f0_agrees_with_harvest_golden(fixture):
    """Autocorrelation f0 vs pyworld harvest: on frames both call voiced,
    median relative error < 5% with < 15% gross (octave-class) errors; v/uv
    decisions agree on >= 80% of frames."""
    if fixture is None:
        pytest.skip("no ref_goldens fixtures committed (generate with "
                    "scripts/make_reference_goldens.py where pyworld is "
                    "installed)")
    z = np.load(fixture)
    ours = compute_f0(z["wav"].astype(np.float32))
    gold = z["harvest_f0"]
    n = min(len(ours), len(gold))
    ours, gold = ours[:n], gold[:n]
    voiced_agree = float(np.mean((ours > 0) == (gold > 0)))
    both = (ours > 0) & (gold > 0)
    assert voiced_agree >= 0.80, f"{fixture.stem}: v/uv agreement {voiced_agree:.2%}"
    if both.sum() >= 10:
        rel = np.abs(ours[both] - gold[both]) / gold[both]
        assert float(np.median(rel)) < 0.05, \
            f"{fixture.stem}: median f0 err {np.median(rel):.2%}"
        assert float(np.mean(rel > 0.2)) < 0.15, \
            f"{fixture.stem}: gross errors {np.mean(rel > 0.2):.2%}"
