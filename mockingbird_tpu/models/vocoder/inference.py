"""Vocoder inference: mel → waveform, with the reference's hot-swap registry.

Parity with the per-vocoder singletons (`models/vocoder/{hifigan,fregan,
wavernn}/inference.py` — identical `load_model(fpath)` / `infer_waveform(mel)`
surfaces) and the toolbox's dispatch-by-filename
(`control/toolbox/__init__.py:437-473`: "hifigan"/"fregan" substring → GAN
vocoder, else WaveRNN). Here each vocoder is an explicit object sharing a
`Vocoder` protocol; `load_vocoder` does the name dispatch.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from ...train.checkpoint import load_single
from .fregan import FreGanGenerator, fregan_config
from .hifigan import Generator as HifiGenerator, hifigan_config


def _bucket(n: int, size: int = 64) -> int:
    return max(size, ((n + size - 1) // size) * size)


class GanVocoder:
    """Parallel conv vocoder wrapper (HiFi-GAN / Fre-GAN)."""

    def __init__(self, arch: str = "hifigan", model_fpath: Optional[Union[str, Path]] = None,
                 cfg=None, verbose: bool = True, seed: int = 0, half: bool = True):
        self.arch = arch
        base = hifigan_config() if arch == "hifigan" else fregan_config()
        self.cfg = Config(base)
        # a config sidecar next to the checkpoint (e.g. the hop-256 GTA
        # fine-tune variant scripts/gan_run.py exports) overrides the stock
        # arch config, like the reference's per-checkpoint config.json
        if model_fpath is not None:
            sidecar = Path(model_fpath).with_suffix(".json")
            if sidecar.exists():
                self.cfg = Config.from_json(sidecar)
        self.cfg.merge(cfg or {})
        fcfg = self.cfg.freeze()
        self.model = (HifiGenerator(fcfg) if arch == "hifigan" else FreGanGenerator(fcfg))
        seg = self.cfg.segment_size // self.cfg.hop_size
        params = self.model.init(jax.random.PRNGKey(seed),
                                 jnp.zeros((1, seg, self.cfg.num_mels)))["params"]
        if model_fpath is not None and Path(model_fpath).exists():
            loaded = load_single(model_fpath)
            params = loaded.get("g", loaded.get("params", loaded))
            params = jax.tree.map(jnp.asarray, params)
            if verbose:
                print(f"Loaded {arch} from {model_fpath}")
        elif verbose:
            print(f"{arch}: fresh (untrained) weights")
        self.params = params
        # bf16 inference: conv stacks are FLOP-bound on the MXU; weights and
        # activations in bf16, output back to f32 (half=False for exact f32)
        self.half = half
        if half:
            self._params_c = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
        else:
            self._params_c = params

        @functools.partial(jax.jit)
        def _fwd(p, mel):
            if half:
                mel = mel.astype(jnp.bfloat16)
            return self.model.apply({"params": p}, mel).astype(jnp.float32)
        self._fwd = _fwd

        @functools.partial(jax.jit)
        def _fwd_pcm16(p, mel):
            if half:
                mel = mel.astype(jnp.bfloat16)
            wav = self.model.apply({"params": p}, mel).astype(jnp.float32)
            # int16 PCM on-device: halves the device→host transfer, which is
            # the e2e bottleneck on tunneled TPU hosts (~40 MB/s)
            return jnp.round(jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        self._fwd_pcm16 = _fwd_pcm16

        @functools.partial(jax.jit)
        def _fwd_mulaw8(p, mel):
            if half:
                mel = mel.astype(jnp.bfloat16)
            wav = self.model.apply({"params": p}, mel).astype(jnp.float32)
            # 8-bit mu-law on-device: one byte/sample (4× smaller than f32,
            # 2× smaller than int16) across the device→host link; host
            # decodes with a 256-entry LUT (`dsp.decode_mulaw8_to_int16`)
            from mockingbird_tpu.dsp import encode_mulaw8_device
            return encode_mulaw8_device(wav)
        self._fwd_mulaw8 = _fwd_mulaw8

    def infer_waveform(self, mel: np.ndarray) -> np.ndarray:
        """mel (M, T) reference layout (synthesizer output) → wav float32.

        Pads T to a bucket so repeat calls reuse the compiled program, then
        trims (the generator is length-equivariant)."""
        mel = np.asarray(mel, np.float32)
        if mel.shape[0] == self.cfg.num_mels and mel.shape[1] != self.cfg.num_mels:
            mel = mel.T  # → (T, M)
        t = mel.shape[0]
        t_pad = _bucket(t)
        if t_pad != t:
            mel = np.pad(mel, ((0, t_pad - t), (0, 0)), constant_values=mel.min())
        wav = np.asarray(self._fwd(self._params_c, jnp.asarray(mel[None])))[0]
        return wav[: t * self.cfg.hop_size]

    def infer_waveform_batch(self, mels) -> list:
        """Batched vocoding: list of (M, T_i) mels → list of wavs. All mels
        are padded to one bucketed length and vocoded in a single device
        call — on TPU this is ~len(mels)× cheaper than per-mel calls."""
        mels = [np.asarray(m, np.float32) for m in mels]
        mels = [m.T if (m.shape[0] == self.cfg.num_mels
                        and m.shape[1] != self.cfg.num_mels) else m for m in mels]
        lengths = [m.shape[0] for m in mels]
        t_pad = _bucket(max(lengths))
        batch = np.stack([
            np.pad(m, ((0, t_pad - m.shape[0]), (0, 0)), constant_values=m.min())
            for m in mels])
        wavs = np.asarray(self._fwd(self._params_c, jnp.asarray(batch)))
        return [wavs[i, : lengths[i] * self.cfg.hop_size] for i in range(len(mels))]

    def vocode_device(self, mel_dev, pcm16: bool = True, pcm_format: str = None):
        """Fused-pipeline entry: device-resident mel (B, T, M) → device wav
        (B, T*hop). `pcm_format` selects the on-device output encoding:
        "int16" (default), "mulaw8" (1 byte/sample — halves the d2h
        transfer; decode host-side with `dsp.decode_mulaw8_to_int16`) or
        "float32". No host round-trip: the synthesizer's on-chip mel feeds
        the generator directly. `pcm16` kept for back-compat."""
        if pcm_format is None:
            pcm_format = "int16" if pcm16 else "float32"
        fn = {"int16": self._fwd_pcm16, "mulaw8": self._fwd_mulaw8,
              "float32": self._fwd}[pcm_format]
        return fn(self._params_c, mel_dev)


def load_vocoder(model_fpath: Union[str, Path, None] = None, verbose: bool = True):
    """Dispatch by checkpoint filename, mirroring the toolbox rule
    (`control/toolbox/__init__.py:437-473`)."""
    name = str(model_fpath or "").lower()
    if "fregan" in name:
        return GanVocoder("fregan", model_fpath, verbose=verbose)
    if "hifigan" in name or model_fpath is None:
        return GanVocoder("hifigan", model_fpath, verbose=verbose)
    from .wavernn import WaveRnnVocoder
    return WaveRnnVocoder(model_fpath, verbose=verbose)
