"""DSP core tests.

Golden cross-checks: the JAX matmul-STFT is validated against torch.stft (the
exact op the reference's VITS/GAN path uses, `utils/audio_utils.py:20-39`); mel
filterbank properties are validated against the Slaney-scale invariants librosa
implements; round-trips validate normalisation and companding.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mockingbird_tpu.config import sv2tts_audio_config, encoder_audio_config, vits_audio_config
from mockingbird_tpu import dsp
from mockingbird_tpu.dsp.mel import mel_filterbank, hz_to_mel, mel_to_hz


def test_mel_scale_roundtrip():
    f = np.linspace(0, 8000, 100)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk=True), htk=True), f, rtol=1e-6, atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 1024, 80, fmin=55.0, fmax=7600.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support; slaney norm makes area ~ 2/width
    assert (fb.sum(axis=1) > 0).all()
    # filters tile the [fmin, fmax] band: every bin in band covered by some filter
    freqs = np.linspace(0, 8000, 513)
    band = (freqs > 100) & (freqs < 7500)
    assert (fb.sum(axis=0)[band] > 0).all()
    # centers increase monotonically
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()


def test_stft_matches_torch(sample_wav):
    torch = pytest.importorskip("torch")
    wav, sr = sample_wav
    wav = wav[:16000]
    n_fft, hop, win = 1024, 256, 1024

    re, im = dsp.stft(jnp.asarray(wav), n_fft, hop, win, center=True, pad_mode="reflect")
    ours = np.sqrt(np.asarray(re) ** 2 + np.asarray(im) ** 2)  # (frames, bins)

    t = torch.stft(torch.from_numpy(wav), n_fft, hop_length=hop, win_length=win,
                   window=torch.hann_window(win, periodic=True), center=True,
                   pad_mode="reflect", return_complex=True)
    theirs = t.abs().numpy().T  # (frames, bins)

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_spectrogram_vits_matches_torch(sample_wav):
    """Replicates the reference's exact VITS spectrogram call
    (`utils/audio_utils.py:20-39`) with torch and compares."""
    torch = pytest.importorskip("torch")
    wav, sr = sample_wav
    wav = wav[:16384]
    n_fft, hop, win = 1024, 256, 1024

    ours = np.asarray(dsp.spectrogram_vits(jnp.asarray(wav), n_fft, hop, win))

    y = torch.from_numpy(wav).unsqueeze(0)
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False, pad_mode="reflect",
                      normalized=False, onesided=True, return_complex=True)
    theirs = torch.sqrt(spec.abs().pow(2) + 1e-6)[0].numpy().T

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_istft_roundtrip(sample_wav):
    wav, _ = sample_wav
    wav = wav[:8192]
    re, im = dsp.stft(jnp.asarray(wav), 1024, 256, 1024)
    rec = dsp.istft(re, im, 1024, 256, 1024, length=len(wav))
    np.testing.assert_allclose(np.asarray(rec), wav, atol=1e-4)


def test_melspectrogram_shapes_and_range(sample_wav):
    wav, _ = sample_wav
    cfg = sv2tts_audio_config()
    mel = np.asarray(dsp.melspectrogram(jnp.asarray(wav), cfg))
    assert mel.shape[1] == 80
    assert mel.min() >= -4.0 - 1e-5 and mel.max() <= 4.0 + 1e-5
    # speech content should span a good part of the range
    assert mel.max() > 0.0


def test_griffin_lim_converges(sample_wav):
    """GL on a true linear magnitude should reconstruct a spectrally-consistent
    signal (low relative spectral error)."""
    wav, _ = sample_wav
    wav = wav[: 256 * 40]
    mag = dsp.stft_magnitude(jnp.asarray(wav), 1024, 256, 1024)
    y = dsp.griffin_lim(mag, 1024, 256, 1024, n_iters=32, key=jax.random.PRNGKey(1))
    mag2 = dsp.stft_magnitude(jnp.asarray(np.asarray(y)[: len(wav)]), 1024, 256, 1024)
    n = min(mag.shape[0], mag2.shape[0])
    a, b = np.asarray(mag2[:n]), np.asarray(mag[:n])
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 0.25, f"griffin-lim spectral error too high: {rel}"


def test_mel_griffin_lim_roundtrip(sample_wav):
    """mel → griffin-lim wav → mel roundtrip. Note the reference's inversion
    (`audio.py:84-100`) griffin-lims S**power (power=1.5), which deliberately
    distorts amplitudes — so the roundtrip is approximate by design; this
    bounds the error rather than expecting closeness."""
    wav, _ = sample_wav
    cfg = sv2tts_audio_config().merge(dict(griffin_lim_iters=32))
    wav = wav[: 256 * 40]
    mel = dsp.melspectrogram(jnp.asarray(wav), cfg)
    rec = dsp.inv_mel_spectrogram(mel, cfg, key=jax.random.PRNGKey(1))
    mel2 = dsp.melspectrogram(jnp.asarray(rec)[: len(wav)], cfg)
    n = min(mel.shape[0], mel2.shape[0]) - 2
    err = np.abs(np.asarray(mel[:n]) - np.asarray(mel2[:n])).mean()
    assert err < 1.6, f"mel roundtrip error too high: {err}"


def test_preemphasis_roundtrip(sample_wav):
    wav, _ = sample_wav
    wav = wav[:4000]
    pe = dsp.preemphasis(jnp.asarray(wav), 0.97)
    # matches scipy lfilter implementation used by the reference
    np.testing.assert_allclose(np.asarray(pe), dsp.preemphasis_np(wav, 0.97), atol=1e-5)
    rec = dsp.inv_preemphasis(pe, 0.97)
    np.testing.assert_allclose(np.asarray(rec), wav, atol=1e-4)


def test_encoder_mel(sample_wav):
    wav, _ = sample_wav
    cfg = encoder_audio_config()
    mel = np.asarray(dsp.mel_encoder(jnp.asarray(wav), cfg))
    assert mel.shape[1] == 40
    assert (mel >= 0).all()  # power mel, non-log


def test_mel_vits_shapes(sample_wav):
    wav, _ = sample_wav
    cfg = vits_audio_config()
    spec = dsp.spectrogram_vits(jnp.asarray(wav[:16384]), cfg.n_fft, cfg.hop_size, cfg.win_size)
    assert spec.shape == (16384 // 256, 513)  # length/hop frames, center=False pad (n_fft-hop)/2
    mel = dsp.spec_to_mel_vits(spec, cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)
    assert mel.shape == (64, 80)


def test_mulaw_roundtrip():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    enc = dsp.encode_mu_law(x, 512)
    assert enc.min() >= 0 and enc.max() <= 511
    dec = dsp.decode_mu_law(enc.astype(np.float32), 512, from_labels=True)
    # 9-bit mu-law: worst-case step near |x|=1 is ~ln(512)*2/511 ≈ 0.024
    np.testing.assert_allclose(dec, x, atol=0.025)
    # and near zero it is much finer
    mid = np.abs(x) < 0.1
    np.testing.assert_allclose(dec[mid], x[mid], atol=1e-3)


def test_mulaw8_device_roundtrip():
    """On-device 8-bit mu-law PCM (the halved-d2h serving encoding) must
    round-trip through the host LUT at telephony quality (≳30 dB SNR on a
    speech-band tone) and exactly match the generic mu-law math."""
    import jax.numpy as jnp
    t = np.arange(5000) / 16000
    wav = (0.7 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    u8 = np.asarray(dsp.encode_mulaw8_device(jnp.asarray(wav)))
    assert u8.dtype == np.uint8
    pcm = dsp.decode_mulaw8_to_int16(u8)
    assert pcm.dtype == np.int16
    rec = pcm.astype(np.float64) / 32767.0
    snr = 10 * np.log10((wav.astype(np.float64) ** 2).mean()
                        / ((rec - wav) ** 2).mean())
    assert snr > 30.0, snr
    # consistency with the reference-parity mu-law helpers (±1 label:
    # device f32 vs host f64 rounding at bin boundaries)
    ref = np.asarray(dsp.encode_mu_law(np.clip(wav, -1, 1), 256))
    assert np.abs(u8.astype(np.int32) - ref).max() <= 1


def test_volume_normalize():
    rng = np.random.RandomState(0)
    wav = rng.randn(16000).astype(np.float32) * 0.001
    out = dsp.normalize_volume(wav, -30.0, increase_only=True)
    rms_db = 20 * np.log10(np.sqrt(np.mean((out * 32767) ** 2)) / 32767)
    assert abs(rms_db - (-30.0)) < 0.5


def test_trim_long_silences():
    cfg = encoder_audio_config()
    sr = cfg.sample_rate
    silence = np.zeros(sr, dtype=np.float32)
    t = np.arange(sr) / sr
    speech = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav = np.concatenate([silence, speech, silence])
    trimmed = dsp.trim_long_silences(wav, cfg)
    assert len(trimmed) < len(wav) * 0.6
    assert len(trimmed) > sr * 0.8  # speech retained


def test_resample():
    t = np.arange(48000) / 48000
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = dsp.resample(wav, 48000, 16000)
    assert abs(len(out) - 16000) <= 1
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(out))
    peak_hz = spec.argmax() * 16000 / len(out)
    assert abs(peak_hz - 440) < 5


def test_config_system():
    from mockingbird_tpu.config import Config
    cfg = Config(a=1, nested=dict(x=2, y=[1, 2]))
    assert cfg.nested.x == 2
    cfg.parse("a=5,nested.x=7,name=hello,lst=[1,2,3]")
    assert cfg.a == 5 and cfg.nested.x == 7 and cfg.name == "hello" and cfg.lst == [1, 2, 3]
    d = cfg.to_dict()
    assert d["nested"]["y"] == [1, 2]
    cfg2 = Config(d)
    assert cfg2.nested.x == 7


def test_spsi_phase_recovery(sample_wav):
    """Single-pass spectrogram inversion (the lws-equivalent fast path,
    `use_fast_phase`): reconstruction must preserve the spectral envelope on
    real speech, within 2x of Griffin-Lim's mel error at 1/60th the passes."""
    import jax.numpy as jnp
    from mockingbird_tpu.config import sv2tts_audio_config
    from mockingbird_tpu.dsp.stft import (griffin_lim, melspectrogram, spsi,
                                          stft_magnitude)

    wav, sr = sample_wav
    wav = wav[: sr * 2].astype(np.float32)
    cfg = sv2tts_audio_config()
    mag = np.asarray(stft_magnitude(jnp.asarray(wav), cfg.n_fft, cfg.hop_size,
                                    cfg.win_size))

    y_spsi = np.asarray(spsi(jnp.asarray(mag), cfg.n_fft, cfg.hop_size, cfg.win_size))
    y_gl = np.asarray(griffin_lim(jnp.asarray(mag), cfg.n_fft, cfg.hop_size,
                                  cfg.win_size, n_iters=60))
    assert np.isfinite(y_spsi).all() and len(y_spsi) > sr

    def mel_err(y):
        n = min(len(y), len(wav))
        a = np.asarray(melspectrogram(jnp.asarray(y[:n]), cfg))
        b = np.asarray(melspectrogram(jnp.asarray(wav[:n]), cfg))
        return float(np.mean(np.abs(a - b)))

    e_spsi, e_gl = mel_err(y_spsi), mel_err(y_gl)
    assert e_spsi < max(2.0 * e_gl, 0.6), (e_spsi, e_gl)

    # inv_mel path honours the flag
    from mockingbird_tpu.dsp import inv_mel_spectrogram
    mel = melspectrogram(jnp.asarray(wav), cfg)
    cfg_fast = sv2tts_audio_config().merge(dict(use_fast_phase=True))
    y = np.asarray(inv_mel_spectrogram(mel, cfg_fast))
    assert np.isfinite(y).all() and len(y) > sr


def test_melspectrogram_bucketed_exact():
    """Bucketed preprocess mel == the reference-parity melspectrogram for
    arbitrary lengths (the padding must never leak into real frames)."""
    import jax.numpy as jnp
    from mockingbird_tpu.config import sv2tts_audio_config
    from mockingbird_tpu.dsp import melspectrogram, melspectrogram_bucketed

    cfg = sv2tts_audio_config()
    rng = np.random.RandomState(0)
    for n in (5000, 16384, 16385, 40001, 70000):
        wav = (rng.randn(n) * 0.1).astype(np.float32)
        a = melspectrogram_bucketed(wav, cfg)
        b = np.asarray(melspectrogram(jnp.asarray(wav), cfg))
        assert a.shape == b.shape, (n, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)
