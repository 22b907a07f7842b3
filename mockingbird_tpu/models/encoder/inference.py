"""Speaker-encoder inference: wav → 256-d d-vector.

Parity with `/root/reference/models/encoder/inference.py:15-172`, redesigned
as an explicit `SpeakerEncoderInference` object instead of module-global
singletons, with a jitted, bucket-padded batch forward (partial counts vary
per utterance; padding to buckets keeps XLA compilation cache hits).
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...config import encoder_audio_config
from ...dsp import mel_encoder, preprocess_wav
from ...train.checkpoint import load_single, save_single
from .model import SpeakerEncoder, init_params


def compute_partial_slices(n_samples: int, cfg=None, partial_utterance_n_frames: Optional[int] = None,
                           min_pad_coverage: float = 0.75, overlap: float = 0.5,
                           rate: Optional[float] = None):
    """Split an utterance into fixed-length partials (`inference.py:67-125`).

    Returns (wav_slices, mel_slices) lists of python `slice` objects.
    """
    cfg = cfg or encoder_audio_config()
    pn = partial_utterance_n_frames or cfg.partials_n_frames
    assert 0 <= overlap < 1
    assert 0 < min_pad_coverage <= 1

    samples_per_frame = int(cfg.sample_rate * cfg.mel_window_step_ms / 1000)
    n_frames = int(np.ceil((n_samples + 1) / samples_per_frame))
    if rate is not None:
        frame_step = int(np.round((cfg.sample_rate / rate) / samples_per_frame))
    else:
        frame_step = max(int(np.round(pn * (1 - overlap))), 1)
    assert 0 < frame_step <= pn

    wav_slices, mel_slices = [], []
    steps = max(1, n_frames - pn + frame_step + 1)
    for i in range(0, steps, frame_step):
        mel_range = np.array([i, i + pn])
        wav_range = mel_range * samples_per_frame
        mel_slices.append(slice(*mel_range))
        wav_slices.append(slice(*wav_range))

    last = wav_slices[-1]
    coverage = (n_samples - last.start) / (last.stop - last.start)
    if coverage < min_pad_coverage and len(mel_slices) > 1:
        mel_slices, wav_slices = mel_slices[:-1], wav_slices[:-1]
    return wav_slices, mel_slices


class SpeakerEncoderInference:
    """Loads GE2E weights once and embeds wavs/mels on demand."""

    def __init__(self, params: Optional[dict] = None, cfg=None, seed: int = 0):
        self.cfg = cfg or encoder_audio_config()
        self.model = SpeakerEncoder()
        if params is None:
            params = init_params(jax.random.PRNGKey(seed))
        params = params["model"] if "model" in params else params
        # exports load as host numpy (`load_single`); keep weights on-device
        # so the jitted forward doesn't re-transfer them every call
        self.params = jax.tree.map(jnp.asarray, params)

        @jax.jit
        def _forward(p, frames):
            return self.model.apply({"params": p}, frames)
        self._forward = _forward

    @classmethod
    def from_checkpoint(cls, path: Union[str, Path], cfg=None) -> "SpeakerEncoderInference":
        """Accepts any of the shipped layouts: {"model": ...} (this class's
        save_checkpoint), {"params": {"model", "similarity"}} (the trainer's
        full state, e.g. scripts/encoder_run.py exports), or bare params."""
        params = load_single(path)
        if "params" in params:
            params = params["params"]
        return cls(params, cfg)

    def save_checkpoint(self, path: Union[str, Path]) -> None:
        save_single(path, {"model": self.params})

    # -- core API (parity: embed_frames_batch / embed_utterance) ------------

    def embed_frames_batch(self, frames_batch: np.ndarray) -> np.ndarray:
        """(B, T, 40) mel frames → (B, 256) embeddings, bucket-padded to avoid
        one XLA compile per distinct partial count."""
        b = frames_batch.shape[0]
        b_pad = max(1, 1 << (b - 1).bit_length())  # next power of two
        if b_pad != b:
            pad = np.zeros((b_pad - b,) + frames_batch.shape[1:], frames_batch.dtype)
            frames_batch = np.concatenate([frames_batch, pad], axis=0)
        out = np.asarray(self._forward(self.params, jnp.asarray(frames_batch)))
        return out[:b]

    def wav_to_mel(self, wav: np.ndarray) -> np.ndarray:
        return np.asarray(mel_encoder(jnp.asarray(wav, jnp.float32), self.cfg))

    def embed_utterance(self, wav: np.ndarray, using_partials: bool = True,
                        return_partials: bool = False, **kwargs):
        """wav (preprocessed float32) → (256,) embedding (`inference.py:128-172`)."""
        if not using_partials:
            frames = self.wav_to_mel(wav)
            embed = self.embed_frames_batch(frames[None, ...])[0]
            return (embed, None, None) if return_partials else embed

        wave_slices, mel_slices = compute_partial_slices(len(wav), self.cfg, **kwargs)
        max_wave_length = wave_slices[-1].stop
        if max_wave_length >= len(wav):
            wav = np.pad(wav, (0, max_wave_length - len(wav)), "constant")

        frames = self.wav_to_mel(wav)
        frames_batch = np.array([frames[s] for s in mel_slices])
        partial_embeds = self.embed_frames_batch(frames_batch)

        raw_embed = np.mean(partial_embeds, axis=0)
        embed = raw_embed / max(np.linalg.norm(raw_embed, 2), 1e-10)
        return (embed, partial_embeds, wave_slices) if return_partials else embed

    def embed_speaker(self, wavs: list) -> np.ndarray:
        """Mean-of-utterance-embeddings speaker embedding (`inference.py:175-181`)."""
        raw = np.mean([self.embed_utterance(w) for w in wavs], axis=0)
        return raw / max(np.linalg.norm(raw, 2), 1e-10)

    def preprocess_wav(self, fpath_or_wav, source_sr: Optional[int] = None) -> np.ndarray:
        return preprocess_wav(fpath_or_wav, self.cfg, source_sr)
