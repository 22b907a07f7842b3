"""Tacotron inference: (text, speaker embedding) → mel spectrograms.

Parity with `/root/reference/models/synthesizer/inference.py:19-185`
(`Synthesizer` class: lazy weight load, pinyin romanisation, batched padded
generation, stop-frame trimming) — TPU-first: greedy AR decoding runs as one
jitted `lax.while_loop` with on-device stop-token early exit, mirroring the
reference's Python decoder loop break (`models/tacotron.py:264-275`), with
text/step buckets so repeated calls hit the XLA compilation cache.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config, sv2tts_audio_config
from ...dsp import inv_mel_spectrogram, load_wav, preprocess_wav
from ...text import text_to_sequence, romanize
from ...train.checkpoint import load_single
from .model import Tacotron, init_tacotron, tacotron_config


def _bucket(n: int, size: int) -> int:
    return max(size, ((n + size - 1) // size) * size)


class Synthesizer:
    """Mel synthesizer with the reference's public surface."""

    sample_rate = 16000
    hparams = None  # set per-instance

    def __init__(self, model_fpath: Optional[Union[str, Path]] = None,
                 verbose: bool = True, cfg=None, audio_cfg=None, seed: int = 0):
        self.cfg = cfg or tacotron_config()
        self.audio_cfg = audio_cfg or sv2tts_audio_config()
        self.hparams = self.cfg
        self.model_fpath = Path(model_fpath) if model_fpath else None
        self.verbose = verbose
        self.seed = seed
        self._model: Optional[Tacotron] = None
        self._variables = None

    def is_loaded(self) -> bool:
        return self._variables is not None

    def load(self) -> None:
        model, variables = init_tacotron(jax.random.PRNGKey(self.seed), self.cfg.clone())
        if self.model_fpath is not None and Path(self.model_fpath).exists():
            # json config sidecar override (`inference.py:46-50` semantics)
            sidecar = Path(self.model_fpath).with_suffix(".json")
            if sidecar.exists():
                self.cfg.merge(Config.from_json(sidecar))
                model, variables = init_tacotron(jax.random.PRNGKey(self.seed), self.cfg.clone())
            # template-less load: exports may store bf16 leaves (half-size,
            # upcast to f32 by load_single) which a f32 template restore
            # would reject on dtype
            import jax.numpy as jnp
            loaded = load_single(self.model_fpath)
            variables = jax.tree.map(jnp.asarray, loaded)
            if self.verbose:
                print(f"Loaded synthesizer from {self.model_fpath}")
        elif self.verbose:
            print("Synthesizer using fresh (untrained) weights")
        self._model = model
        self._variables = variables

    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=8)
    def _generate_fn(self, t_text: int, max_steps: int, r: int, style_mode: str):
        """Build + cache a jitted generator for one (text-len, steps) bucket."""
        model = self._model

        @jax.jit
        def generate(variables, texts, spk_embed, key, style_idx, min_stop_token):
            b = texts.shape[0]
            m = model.cfg.n_mels
            key, enc_key = jax.random.split(key)
            enc_seq, enc_proj, char_mask = model.apply(
                variables, texts, spk_embed, False, style_idx, style_mode,
                method=Tacotron.encode, rngs={"dropout": enc_key})
            n_groups = max_steps // r
            mel_buf = jnp.zeros((n_groups, b, r, m))
            attn_buf = jnp.zeros((n_groups, b, t_text))
            carry0 = model.apply(variables, b, t_text, method=Tacotron.init_carry)
            go = jnp.zeros((b, m))

            def body(state):
                t, done, done_at, carry, prev, mel_buf, attn_buf, key = state
                key, sub = jax.random.split(key)
                carry, (mel_r, scores, stop) = model.apply(
                    variables, enc_seq, enc_proj, char_mask, carry, prev, r,
                    method=Tacotron.decode_step, rngs={"dropout": sub})
                mel_buf = jax.lax.dynamic_update_index_in_dim(mel_buf, mel_r, t, 0)
                attn_buf = jax.lax.dynamic_update_index_in_dim(attn_buf, scores, t, 0)
                # stop rule (`tacotron.py:275`): stop*10 > min_stop_token, after t*r > 10
                newly_done = jnp.logical_and(stop * 10 > min_stop_token, t * r > 10)
                done_at = jnp.where(jnp.logical_and(newly_done, ~done), t + 1, done_at)
                done = jnp.logical_or(done, newly_done)
                prev = mel_r[:, -1, :]
                return (t + 1, done, done_at, carry, prev, mel_buf, attn_buf, key)

            def cond(state):
                t, done, *_ = state
                return jnp.logical_and(t < n_groups, jnp.logical_not(jnp.all(done)))

            state = (jnp.asarray(0), jnp.zeros((b,), bool),
                     jnp.full((b,), n_groups, jnp.int32), carry0, go,
                     mel_buf, attn_buf, key)
            t_final, _, done_at, _, _, mel_buf, attn_buf, _ = \
                jax.lax.while_loop(cond, body, state)

            mels = jnp.swapaxes(mel_buf, 0, 1).reshape(b, max_steps, m)
            attn = jnp.swapaxes(attn_buf, 0, 1)
            linear = model.apply(variables, mels, False, method=Tacotron.postnet_apply)
            return mels, linear, attn, t_final * r, done_at * r

        return generate

    def synthesize_spectrograms(self, texts: List[str], embeddings: Union[np.ndarray, List[np.ndarray]],
                                return_alignments: bool = False, style_idx: int = 0,
                                min_stop_token: int = 5, steps: int = 2000,
                                batch_size: int = 16, r: int = 2) -> List[np.ndarray]:
        """texts + (B, 256) embeddings → list of (M, T) mel arrays.

        NOTE: returns bin-major (M, T) numpy arrays for drop-in parity with the
        reference API (`inference.py:75-142`); internal layout is time-major.
        """
        if not self.is_loaded():
            self.load()

        sequences = [np.asarray(text_to_sequence(romanize(t)), np.int32) for t in texts]
        embeddings = np.asarray(embeddings, np.float32)
        if embeddings.ndim == 1:
            embeddings = np.tile(embeddings, (len(sequences), 1))

        steps = _bucket(steps, 200)
        style_mode = "token" if 0 <= style_idx < self.cfg.gst_token_num else "neutral"

        specs, aligns = [], []
        for i in range(0, len(sequences), batch_size):
            chunk = sequences[i : i + batch_size]
            emb = embeddings[i : i + batch_size]
            t_text = _bucket(max(len(s) for s in chunk), 32)
            texts_arr = np.zeros((len(chunk), t_text), np.int32)
            for j, s in enumerate(chunk):
                texts_arr[j, : len(s)] = s

            gen = self._generate_fn(t_text, steps, r, style_mode)
            mels, linear, attn, n_frames, _ = gen(
                self._variables, jnp.asarray(texts_arr), jnp.asarray(emb),
                jax.random.PRNGKey(self.seed), jnp.asarray(max(style_idx, 0)),
                jnp.asarray(float(min_stop_token)))
            mels = np.asarray(mels)[:, : int(n_frames)]
            attn = np.asarray(attn)

            for j in range(len(chunk)):
                mel = mels[j].T  # (M, T) reference layout
                # trim trailing silence frames (`inference.py:130-135`)
                thresh = self.cfg.stop_threshold
                keep = np.where(~(mel <= thresh).all(axis=0))[0]
                if len(keep):
                    mel = mel[:, : keep[-1] + 1]
                specs.append(mel)
                aligns.append(attn[j])

        return (specs, aligns) if return_alignments else specs

    def synthesize_mels_device(self, texts: List[str],
                               embeddings: Union[np.ndarray, List[np.ndarray]],
                               style_idx: int = 0, min_stop_token: int = 5,
                               steps: int = 2000, r: int = 2):
        """Device-resident synthesis for fused pipelines: one bucketed batch →
        (mels (B, steps, M) on device, per-item frame lengths (B,) on device).

        Unlike `synthesize_spectrograms` nothing is transferred to the host —
        downstream stages (vocoder) consume the mel on-chip, so the tunnel
        only ever carries the final PCM (`pipeline.tts_batch`)."""
        if not self.is_loaded():
            self.load()
        sequences = [np.asarray(text_to_sequence(romanize(t)), np.int32) for t in texts]
        embeddings = np.asarray(embeddings, np.float32)
        if embeddings.ndim == 1:
            embeddings = np.tile(embeddings, (len(sequences), 1))
        steps = _bucket(steps, 200)
        style_mode = "token" if 0 <= style_idx < self.cfg.gst_token_num else "neutral"
        t_text = _bucket(max(len(s) for s in sequences), 32)
        texts_arr = np.zeros((len(sequences), t_text), np.int32)
        for j, s in enumerate(sequences):
            texts_arr[j, : len(s)] = s
        gen = self._generate_fn(t_text, steps, r, style_mode)
        mels, _, _, _, frame_lens = gen(
            self._variables, jnp.asarray(texts_arr), jnp.asarray(embeddings),
            jax.random.PRNGKey(self.seed), jnp.asarray(max(style_idx, 0)),
            jnp.asarray(float(min_stop_token)))
        return mels, frame_lens

    # ------------------------------------------------------------------
    @staticmethod
    def load_preprocess_wav(fpath) -> np.ndarray:
        """Load + denoise a wav for embedding (`inference.py:145-159`)."""
        from ...dsp.logmmse import denoise, profile_noise
        wav, _ = load_wav(fpath, target_sr=16000)
        if len(wav) > 16000 * 0.5:
            try:
                profile = profile_noise(wav[: int(16000 * 0.2)], 16000)
                wav = denoise(wav, profile)
            except Exception:
                pass
        return wav

    def make_spectrogram(self, fpath_or_wav) -> np.ndarray:
        from ...dsp import melspectrogram
        wav = self.load_preprocess_wav(fpath_or_wav) if isinstance(fpath_or_wav, (str, Path)) \
            else np.asarray(fpath_or_wav, np.float32)
        return np.asarray(melspectrogram(jnp.asarray(wav), self.audio_cfg)).T

    def griffin_lim(self, mel: np.ndarray) -> np.ndarray:
        """mel (M, T) → waveform via Griffin-Lim (`inference.py:178-185`)."""
        return np.asarray(inv_mel_spectrogram(jnp.asarray(mel.T), self.audio_cfg))
