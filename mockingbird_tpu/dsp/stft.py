"""Device-side (JAX) spectrogram ops, designed for the TPU MXU.

Rather than translating the reference's librosa/torch STFT calls
(`/root/reference/models/synthesizer/audio.py:118-123`,
`/root/reference/utils/audio_utils.py:20-39`), the STFT here is expressed as
a windowed-frame gather followed by one dense matmul with a precomputed DFT
basis — so the whole wav→mel path is (gather → matmul → matmul → pointwise),
which XLA fuses and tiles onto the MXU. All shapes are static.

Conventions: waveforms are float32 in [-1, 1]; spectrograms are **time-major**
``(..., frames, bins)`` (the reference is bin-major ``(bins, frames)``; the
time-major layout keeps the contraction dimension last for TPU tiling).

Three frontends are provided, matching the reference's three DSP dialects:
  * ``melspectrogram``       — SV2TTS dialect: preemphasis + dB-norm to ±4
                               (`models/synthesizer/audio.py:59-65,174-206`)
  * ``spectrogram_vits`` /
    ``mel_vits``             — torch-STFT dialect: reflect pad (n_fft-hop)/2,
                               log-clamp compression (`utils/audio_utils.py:20-98`)
  * ``mel_encoder``          — GE2E dialect: power-2 mel, no log
                               (`models/encoder/audio.py:53-66`)
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank


def _mm(a, b):
    """f32-accurate matmul: the DFT/mel projections feed parity-sensitive
    features, so request full precision (3-pass bf16 on the MXU)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# DFT basis + framing
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis: two (n_fft, n_bins) matrices (cos, -sin).

    The Hann window (periodic, matching torch.hann_window and scipy/librosa
    ``sym=False``) is folded into the basis so framing needs no extra multiply.
    """
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    window = _hann(win_length)
    if win_length < n_fft:  # centre-pad window to n_fft (librosa semantics)
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    wcol = window[:, None]
    return (np.cos(angle) * wcol).astype(np.float32), (-np.sin(angle) * wcol).astype(np.float32)


def _hann(m: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(m) / m)).astype(np.float64)


@functools.lru_cache(maxsize=None)
def _idft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real inverse-DFT basis for a one-sided spectrum: (bins, n_fft) matrices
    (C, S) with x = re @ C + im @ S. Complex dtypes and jnp.fft are avoided
    entirely — the TPU backend lacks them, and matmul rides the MXU."""
    n_bins = 1 + n_fft // 2
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    angle = 2.0 * np.pi * k * n / n_fft
    scale = np.full((n_bins, 1), 2.0)
    scale[0, 0] = 1.0
    if n_fft % 2 == 0:
        scale[-1, 0] = 1.0
    c = scale * np.cos(angle) / n_fft
    s = -scale * np.sin(angle) / n_fft
    return c.astype(np.float32), s.astype(np.float32)


def frame(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Slice ``x`` (..., T) into overlapping frames (..., n_frames, frame_length)."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


def stft(
    x: jax.Array,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> tuple[jax.Array, jax.Array]:
    """Real STFT via MXU matmul. Returns (real, imag), each (..., frames, bins)."""
    win_length = win_length or n_fft
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    frames = frame(x, n_fft, hop)
    cos_b, nsin_b = _dft_basis(n_fft, win_length)
    real = _mm(frames, jnp.asarray(cos_b))
    imag = _mm(frames, jnp.asarray(nsin_b))
    return real, imag


def stft_magnitude(x, n_fft, hop, win_length=None, center=True, pad_mode="reflect", eps=0.0):
    re, im = stft(x, n_fft, hop, win_length, center, pad_mode)
    return jnp.sqrt(re * re + im * im + eps)


def _overlap_add(frames_t: jax.Array, hop: int) -> jax.Array:
    """Overlap-add (..., F, n_fft) frames at stride ``hop`` → (..., out_len).

    TPU-friendly: when hop divides n_fft this is K static shifted adds (no
    scatter, which serialises on TPU); otherwise falls back to a scatter-add.
    """
    *lead, n_frames, n_fft = frames_t.shape
    out_len = n_fft + hop * (n_frames - 1)
    if n_fft % hop == 0:
        k = n_fft // hop
        fr = frames_t.reshape(*lead, n_frames, k, hop)
        y = jnp.zeros((*lead, n_frames + k - 1, hop), frames_t.dtype)
        for c in range(k):
            y = y.at[..., c : c + n_frames, :].add(fr[..., :, c, :])
        return y.reshape(*lead, (n_frames + k - 1) * hop)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]

    def _ola(fr):
        return jnp.zeros((out_len,), dtype=fr.dtype).at[idx.reshape(-1)].add(fr.reshape(-1))

    if frames_t.ndim == 2:
        return _ola(frames_t)
    flat = frames_t.reshape(-1, n_frames, n_fft)
    return jax.vmap(_ola)(flat).reshape(*lead, out_len)


def istft(real: jax.Array, imag: jax.Array, n_fft: int, hop: int,
          win_length: Optional[int] = None, center: bool = True, length: Optional[int] = None) -> jax.Array:
    """Inverse STFT (overlap-add with squared-window normalisation).

    Used by Griffin-Lim only, so clarity over speed; spectra are (frames, bins)
    or (B, frames, bins).
    """
    win_length = win_length or n_fft
    window = np.zeros(n_fft)
    w = _hann(win_length)
    lpad = (n_fft - win_length) // 2
    window[lpad : lpad + win_length] = w

    cb, sb = _idft_basis(n_fft)
    frames_t = (_mm(real, jnp.asarray(cb)) + _mm(imag, jnp.asarray(sb))) * jnp.asarray(
        window, dtype=real.dtype)

    n_frames = frames_t.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)
    y = _overlap_add(frames_t, hop)

    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    wsq = np.zeros(out_len)
    np.add.at(wsq, idx.reshape(-1), np.tile(window**2, n_frames))
    y = y / jnp.asarray(np.maximum(wsq, 1e-10), dtype=y.dtype)

    if center:
        y = y[..., n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        y = y[..., :length]
    return y


# ---------------------------------------------------------------------------
# Preemphasis + dB helpers (SV2TTS dialect)
# ---------------------------------------------------------------------------

def preemphasis(x: jax.Array, k: float) -> jax.Array:
    """y[n] = x[n] - k*x[n-1]  (reference `models/synthesizer/audio.py:20-23`)."""
    return jnp.concatenate([x[..., :1], x[..., 1:] - k * x[..., :-1]], axis=-1)


def inv_preemphasis(y: jax.Array, k: float) -> jax.Array:
    """Inverse IIR y[n] = x[n] + k*y[n-1], as a `lax.scan` (sequential but cheap)."""
    def step(carry, xn):
        yn = xn + k * carry
        return yn, yn
    # scan over time; support leading batch dims via reshape
    shape = y.shape
    flat = y.reshape(-1, shape[-1])
    _, out = jax.lax.scan(step, jnp.zeros(flat.shape[0], flat.dtype), flat.T)
    return out.T.reshape(shape)


def amp_to_db(x: jax.Array, min_level_db: float) -> jax.Array:
    min_level = np.exp(min_level_db / 20 * np.log(10))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jax.Array) -> jax.Array:
    return jnp.power(10.0, x * 0.05)


def normalize_db(S, min_level_db, max_abs_value, symmetric=True, clip=True):
    """dB → normalised mel range (reference `audio.py:180-194`)."""
    if symmetric:
        out = (2 * max_abs_value) * ((S - min_level_db) / (-min_level_db)) - max_abs_value
        return jnp.clip(out, -max_abs_value, max_abs_value) if clip else out
    out = max_abs_value * ((S - min_level_db) / (-min_level_db))
    return jnp.clip(out, 0, max_abs_value) if clip else out


def denormalize_db(D, min_level_db, max_abs_value, symmetric=True, clip=True):
    if symmetric:
        D = jnp.clip(D, -max_abs_value, max_abs_value) if clip else D
        return ((D + max_abs_value) * -min_level_db / (2 * max_abs_value)) + min_level_db
    D = jnp.clip(D, 0, max_abs_value) if clip else D
    return (D * -min_level_db / max_abs_value) + min_level_db


# ---------------------------------------------------------------------------
# SV2TTS frontend (synthesizer + WaveRNN)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _mel_basis(sr, n_fft, n_mels, fmin, fmax) -> np.ndarray:
    # transpose: our spectra are time-major, contraction on the bins axis
    return mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T.copy()


def melspectrogram(wav: jax.Array, cfg) -> jax.Array:
    """SV2TTS mel: (..., T) float wav → (..., frames, num_mels) in ±max_abs_value.

    Parity target: `models/synthesizer/audio.py:59-65` (transposed)."""
    x = preemphasis(wav, cfg.preemphasis) if cfg.preemphasize else wav
    mag = stft_magnitude(x, cfg.n_fft, cfg.hop_size, cfg.win_size)
    melb = jnp.asarray(_mel_basis(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax))
    S = amp_to_db(_mm(mag, melb), cfg.min_level_db) - cfg.ref_level_db
    if cfg.signal_normalization:
        return normalize_db(S, cfg.min_level_db, cfg.max_abs_value,
                            cfg.symmetric_mels, cfg.allow_clipping_in_normalization)
    return S


def melspectrogram_bucketed(wav: np.ndarray, cfg, bucket_samples: int = 16384) -> np.ndarray:
    """Exactly `melspectrogram`'s output for a host wav of ANY length with
    O(#length-buckets) compilations instead of one per length.

    Preprocessing feeds utterances of arbitrary length; on a TPU backend the
    eager/per-shape dispatch of `melspectrogram` recompiles its op chain for
    every new length (minutes per corpus). Here preemphasis + the center
    reflect-pad happen host-side (bit-identical math), the signal is
    zero-appended to a bucket multiple, one jitted center=False mel program
    runs per bucket size, and the surplus frames are trimmed — frames within
    the original range only read original samples, so the result equals
    `melspectrogram(wav, cfg)` exactly (tested).
    """
    wav = np.asarray(wav, np.float32)
    n_frames = 1 + len(wav) // cfg.hop_size
    if cfg.preemphasize:
        k = np.float32(cfg.preemphasis)
        wav_p = np.concatenate([wav[:1], wav[1:] - k * wav[:-1]])
    else:
        wav_p = wav
    half = cfg.n_fft // 2
    x = np.pad(wav_p, (half, half), mode="reflect")
    x = np.pad(x, (0, (-(len(x) - cfg.n_fft)) % bucket_samples))
    mel = _mel_core_jit(_freeze(cfg))(jnp.asarray(x))
    return np.asarray(mel[:n_frames], np.float32)


@functools.lru_cache(maxsize=None)
def _mel_core_jit(frozen_cfg):
    from ..config import Config
    cfg = Config(dict(frozen_cfg))

    @jax.jit
    def f(x):
        mag = stft_magnitude(x, cfg.n_fft, cfg.hop_size, cfg.win_size, center=False)
        melb = jnp.asarray(_mel_basis(cfg.sample_rate, cfg.n_fft, cfg.num_mels,
                                      cfg.fmin, cfg.fmax))
        S = amp_to_db(_mm(mag, melb), cfg.min_level_db) - cfg.ref_level_db
        if cfg.signal_normalization:
            return normalize_db(S, cfg.min_level_db, cfg.max_abs_value,
                                cfg.symmetric_mels, cfg.allow_clipping_in_normalization)
        return S

    return f


def linearspectrogram(wav: jax.Array, cfg) -> jax.Array:
    """SV2TTS linear spectrogram (`models/synthesizer/audio.py:51-57`)."""
    x = preemphasis(wav, cfg.preemphasis) if cfg.preemphasize else wav
    mag = stft_magnitude(x, cfg.n_fft, cfg.hop_size, cfg.win_size)
    S = amp_to_db(mag, cfg.min_level_db) - cfg.ref_level_db
    if cfg.signal_normalization:
        return normalize_db(S, cfg.min_level_db, cfg.max_abs_value,
                            cfg.symmetric_mels, cfg.allow_clipping_in_normalization)
    return S


def inv_mel_spectrogram(mel: jax.Array, cfg, key: Optional[jax.Array] = None) -> jax.Array:
    """Griffin-Lim inversion of an SV2TTS mel (`audio.py:84-100`): mel (T, M).

    The whole inversion (denorm → mel-pinv → GL scan → inv-preemphasis) is one
    jitted program per (cfg, shape)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return _inv_mel_jit(_freeze(cfg))(mel, key)


@functools.lru_cache(maxsize=None)
def _inv_mel_jit(frozen_cfg):
    from ..config import Config
    cfg = Config(dict(frozen_cfg))
    return jax.jit(functools.partial(_inv_mel_impl, cfg=cfg))


def _freeze(cfg) -> tuple:
    return tuple(sorted((k, v) for k, v in cfg.items() if not isinstance(v, (dict, list))))


def _inv_mel_impl(mel: jax.Array, key: jax.Array, cfg) -> jax.Array:
    if cfg.signal_normalization:
        D = denormalize_db(mel, cfg.min_level_db, cfg.max_abs_value,
                           cfg.symmetric_mels, cfg.allow_clipping_in_normalization)
    else:
        D = mel
    amp = db_to_amp(D + cfg.ref_level_db)
    inv_b = jnp.asarray(np.linalg.pinv(
        _mel_basis(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)).astype(np.float32))
    linear = jnp.maximum(1e-10, _mm(amp, inv_b))  # (T, bins)
    if cfg.get("use_fast_phase", False):
        y = spsi(linear ** cfg.power, cfg.n_fft, cfg.hop_size, cfg.win_size)
    else:
        y = griffin_lim(linear ** cfg.power, cfg.n_fft, cfg.hop_size, cfg.win_size,
                        n_iters=cfg.griffin_lim_iters, key=key)
    if cfg.preemphasize:
        y = inv_preemphasis(y, cfg.preemphasis)
    return y


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length"))
def spsi(S_mag: jax.Array, n_fft: int, hop: int, win_length: int) -> jax.Array:
    """Single-Pass Spectrogram Inversion (Beauregard et al. 2015): the fast
    non-iterative phase-recovery option, standing in for the reference's lws
    alternative to Griffin-Lim (`models/synthesizer/audio.py:76-95`,
    `use_lws`). TPU-first: per-frame peak picking / phase locking is fully
    vectorised over bins; frames advance in one `lax.scan` carrying the
    per-bin phase accumulator — a single pass vs 60 GL iterations (~20×
    less work), at slightly lower phase quality.

    S_mag is time-major (frames, bins); returns the waveform.
    """
    n_frames, n_bins = S_mag.shape[-2], S_mag.shape[-1]
    k = jnp.arange(n_bins, dtype=jnp.float32)

    def frame_step(phase_acc, mag):
        left = jnp.concatenate([mag[:1], mag[:-1]])
        right = jnp.concatenate([mag[1:], mag[-1:]])
        is_peak = (mag > left) & (mag >= right) & (mag > 1e-8)
        # quadratic interpolation of the peak's fractional bin
        denom = left - 2 * mag + right
        frac = jnp.where(is_peak & (jnp.abs(denom) > 1e-12),
                         0.5 * (left - right) / jnp.where(
                             jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
        frac = jnp.clip(frac, -0.5, 0.5)
        # nearest peak per bin (region locking): distance transform via two
        # cumulative scans over the static bin axis
        peak_pos = jnp.where(is_peak, k, -jnp.inf)
        last_peak = jax.lax.associative_scan(jnp.maximum, peak_pos)       # ≤ k
        next_peak = -jax.lax.associative_scan(
            jnp.maximum, -jnp.where(is_peak, k, jnp.inf)[::-1])[::-1]    # ≥ k
        d_last = jnp.where(jnp.isfinite(last_peak), k - last_peak, jnp.inf)
        d_next = jnp.where(jnp.isfinite(next_peak), next_peak - k, jnp.inf)
        assigned = jnp.where(d_last <= d_next, last_peak, next_peak)
        has_peak = jnp.isfinite(assigned)
        assigned_i = jnp.clip(assigned, 0, n_bins - 1).astype(jnp.int32)

        # peak phase advances by its instantaneous frequency
        omega = 2.0 * np.pi * (k + frac) * hop / n_fft                   # per bin
        peak_phase = phase_acc + omega                                   # valid at peaks
        ph_peak = jnp.take(peak_phase, assigned_i)
        # Hann sidelobes alternate sign bin-to-bin around the peak
        phase = jnp.where(has_peak,
                          ph_peak + np.pi * jnp.round(jnp.abs(k - assigned)),
                          0.0)
        new_acc = jnp.where(has_peak, phase, phase_acc)
        return new_acc, phase

    _, phases = jax.lax.scan(frame_step, jnp.zeros(n_bins), S_mag)
    re = S_mag * jnp.cos(phases)
    im = S_mag * jnp.sin(phases)
    length = hop * (n_frames - 1)
    return istft(re, im, n_fft, hop, win_length, length=length)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "n_iters"))
def griffin_lim(S_mag: jax.Array, n_fft: int, hop: int, win_length: int,
                n_iters: int = 60, key: Optional[jax.Array] = None) -> jax.Array:
    """Griffin-Lim phase recovery (`models/synthesizer/audio.py:106-115`).

    S_mag is time-major (frames, bins). The iteration is a `lax.scan` so the
    whole inversion is one compiled program.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(key, S_mag.shape, minval=0.0, maxval=2 * np.pi)
    re, im = S_mag * jnp.cos(angles), S_mag * jnp.sin(angles)
    length = hop * (S_mag.shape[-2] - 1)  # center-trimmed output length

    def body(y, _):
        r2, i2 = stft(y, n_fft, hop, win_length)
        mag = jnp.sqrt(r2 * r2 + i2 * i2 + 1e-12)
        y2 = istft(S_mag * r2 / mag, S_mag * i2 / mag, n_fft, hop, win_length, length=length)
        return y2, None

    y0 = istft(re, im, n_fft, hop, win_length, length=length)
    y, _ = jax.lax.scan(body, y0, None, length=n_iters)
    return y


# ---------------------------------------------------------------------------
# VITS / GAN-vocoder torch-STFT dialect
# ---------------------------------------------------------------------------

def spectrogram_vits(wav: jax.Array, n_fft: int, hop: int, win_length: int) -> jax.Array:
    """Linear magnitude spectrogram, torch-dialect (`utils/audio_utils.py:20-39`):
    reflect-pad (n_fft-hop)/2 per side, center=False, +1e-6 under the sqrt.
    Returns time-major (..., frames, bins)."""
    pad = (n_fft - hop) // 2
    x = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    return stft_magnitude(x, n_fft, hop, win_length, center=False, eps=1e-6)


def spec_to_mel_vits(spec: jax.Array, sr, n_fft, num_mels, fmin, fmax) -> jax.Array:
    """Mel projection + log-clamp compression (`utils/audio_utils.py:41-50,96-103`)."""
    melb = jnp.asarray(_mel_basis(sr, n_fft, num_mels, fmin, fmax))
    return jnp.log(jnp.clip(_mm(spec, melb), min=1e-5))


def mel_vits(wav: jax.Array, cfg) -> jax.Array:
    """wav → log-mel, torch dialect (`utils/audio_utils.py:53-94`)."""
    spec = spectrogram_vits(wav, cfg.n_fft, cfg.hop_size, cfg.win_size)
    return spec_to_mel_vits(spec, cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)


# ---------------------------------------------------------------------------
# GE2E encoder frontend
# ---------------------------------------------------------------------------

def mel_encoder(wav: jax.Array, cfg) -> jax.Array:
    """40-channel power-2 mel, NOT log-scaled (`models/encoder/audio.py:53-66`).

    librosa.feature.melspectrogram defaults: power=2, center=True, fmin 0,
    fmax sr/2. Returns time-major (..., frames, 40) float32.
    """
    sr = cfg.sample_rate
    n_fft = int(sr * cfg.mel_window_length_ms / 1000)
    hop = int(sr * cfg.mel_window_step_ms / 1000)
    mag = stft_magnitude(wav, n_fft, hop, n_fft, center=True, pad_mode="reflect")
    melb = jnp.asarray(_mel_basis(sr, n_fft, cfg.mel_n_channels, 0.0, sr / 2.0))
    return _mm(mag * mag, melb)
