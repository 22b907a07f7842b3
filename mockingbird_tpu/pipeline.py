"""End-to-end voice-cloning pipeline facade.

Replaces the reference's module-singleton pattern (`models/encoder/
inference.py:11-12` globals + toolbox wiring) with one explicit object:
encoder → synthesizer (Tacotron or VITS) → vocoder, plus the PPG
voice-conversion path. This is the programmatic surface the CLI, the HTTP
server and the benchmarks all drive.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from .config import encoder_audio_config, sv2tts_audio_config
from .dsp import load_wav, save_wav
from .models.encoder import SpeakerEncoderInference
from .models.tacotron import Synthesizer
from .models.vocoder import load_vocoder


class VoiceCloningPipeline:
    """Few-seconds reference audio → cloned-voice TTS."""

    def __init__(self,
                 encoder_fpath: Optional[Union[str, Path]] = None,
                 synthesizer_fpath: Optional[Union[str, Path]] = None,
                 vocoder_fpath: Optional[Union[str, Path]] = None,
                 synthesizer: str = "tacotron",
                 verbose: bool = True, seed: int = 0):
        self.encoder = (SpeakerEncoderInference.from_checkpoint(encoder_fpath)
                        if encoder_fpath and Path(encoder_fpath).exists()
                        else SpeakerEncoderInference(seed=seed))
        self.synthesizer_kind = synthesizer
        if synthesizer == "vits":
            from .models.vits import VitsSynthesizer
            self.synthesizer = VitsSynthesizer(synthesizer_fpath, verbose=verbose, seed=seed)
        else:
            self.synthesizer = Synthesizer(synthesizer_fpath, verbose=verbose, seed=seed)
        self.vocoder = load_vocoder(vocoder_fpath, verbose=verbose)
        self.audio_cfg = sv2tts_audio_config()
        self._embed_cache: dict = {}

    # ------------------------------------------------------------------
    def embed_reference(self, ref_wav: Union[str, Path, np.ndarray],
                        source_sr: Optional[int] = None) -> np.ndarray:
        key = str(ref_wav) if isinstance(ref_wav, (str, Path)) else None
        if key and key in self._embed_cache:
            return self._embed_cache[key]
        wav = self.encoder.preprocess_wav(ref_wav, source_sr)
        embed = self.encoder.embed_utterance(wav)
        if key:
            self._embed_cache[key] = embed
        return embed

    def clone_voice(self, texts: Union[str, List[str]],
                    ref_wav: Union[str, Path, np.ndarray],
                    style_idx: int = 0, min_stop_token: int = 5,
                    steps: int = 1000, use_griffin_lim: bool = False,
                    source_sr: Optional[int] = None) -> List[np.ndarray]:
        """texts + reference audio → waveforms (`gen_voice.py:52-97` flow)."""
        if isinstance(texts, str):
            texts = [texts]
        embed = self.embed_reference(ref_wav, source_sr)

        if self.synthesizer_kind == "vits":
            return self.synthesizer.synthesize(texts)

        embeds = np.tile(embed, (len(texts), 1))
        specs = self.synthesizer.synthesize_spectrograms(
            texts, embeds, style_idx=style_idx, min_stop_token=min_stop_token,
            steps=steps)
        if use_griffin_lim:
            return [self.synthesizer.griffin_lim(s) for s in specs]
        if hasattr(self.vocoder, "infer_waveform_batch") and len(specs) > 1:
            return self.vocoder.infer_waveform_batch(specs)
        return [self.vocoder.infer_waveform(s) for s in specs]

    def tts_batch(self, texts: Union[str, List[str]],
                  ref_wav: Union[str, Path, np.ndarray, None],
                  style_idx: int = 0, min_stop_token: int = 5,
                  steps: int = 1000, batch_size: int = 32,
                  source_sr: Optional[int] = None,
                  pcm16: bool = True, pcm_format: Optional[str] = None,
                  embed: Optional[np.ndarray] = None) -> List[np.ndarray]:
        """Fused on-device TTS: text → mel → waveform without any host
        round-trip between stages; one quantised-PCM transfer per batch.

        This is the throughput path (serving / bench): on tunneled TPU hosts
        the device↔host link, not compute, bounds e2e RTF, so the pipeline
        keeps the mel on-chip and ships only quantised PCM. `pcm_format`
        "mulaw8" halves the transfer again (1 byte/sample on the wire,
        LUT-decoded to int16 on host). Falls back to the staged path for
        non-GAN vocoders. Returns per-text int16 (or float32) waveforms
        trimmed at each utterance's stop token."""
        if isinstance(texts, str):
            texts = [texts]
        if not (self.synthesizer_kind == "tacotron"
                and hasattr(self.vocoder, "vocode_device")):
            wavs = self.clone_voice(texts, ref_wav, style_idx=style_idx,
                                    min_stop_token=min_stop_token, steps=steps,
                                    source_sr=source_sr)
            # keep the return contract uniform on the staged fallback: a
            # caller asking for quantised PCM gets int16 here too. The
            # `pcm_format` wire-encoding choice only affects the fused
            # path's device→host transfer — warn so a caller tuning
            # transfer bytes knows it didn't apply.
            if pcm_format is not None:
                import warnings
                warnings.warn(
                    f"tts_batch: pcm_format={pcm_format!r} requested but the "
                    "fused on-device path is unavailable (synthesizer="
                    f"{self.synthesizer_kind}, vocoder={type(self.vocoder).__name__}); "
                    "returning host-quantised int16 instead", stacklevel=2)
            if pcm16 or pcm_format is not None:
                wavs = [w if w.dtype == np.int16 else
                        np.round(np.clip(w, -1.0, 1.0) * 32767).astype(np.int16)
                        for w in wavs]
            return wavs
        embed = (self.embed_reference(ref_wav, source_sr) if embed is None
                 else np.asarray(embed, np.float32))
        # a (B, 256) embed batches DIFFERENT voices through one dispatch —
        # the serving layer's request coalescing rides this (serve/http.py)
        embeds_all = (np.tile(embed, (len(texts), 1)) if embed.ndim == 1
                      else embed)
        assert embeds_all.shape[0] == len(texts), \
            f"per-text embeds {embeds_all.shape} vs {len(texts)} texts"
        hop = self.vocoder.cfg.hop_size
        # two-phase software pipeline: dispatch every chunk's device program
        # first (JAX dispatch is async), then fetch in order — chunk k+1
        # computes while chunk k's PCM crosses the device→host link
        pending = []
        for i in range(0, len(texts), batch_size):
            chunk = texts[i : i + batch_size]
            embeds = embeds_all[i : i + len(chunk)]
            mels_dev, frame_lens = self.synthesizer.synthesize_mels_device(
                chunk, embeds, style_idx=style_idx,
                min_stop_token=min_stop_token, steps=steps)
            pcm_dev = self.vocoder.vocode_device(mels_dev, pcm16=pcm16,
                                                 pcm_format=pcm_format)
            pending.append((len(chunk), pcm_dev, frame_lens))
        wavs: List[np.ndarray] = []
        for n, pcm_dev, frame_lens in pending:
            pcm = np.asarray(pcm_dev)          # single D2H per chunk
            if pcm_format == "mulaw8":
                from .dsp import decode_mulaw8_to_int16
                pcm = decode_mulaw8_to_int16(pcm)
            lens = np.asarray(frame_lens)
            for j in range(n):
                wavs.append(pcm[j, : int(lens[j]) * hop])
        return wavs

    def clone_voice_long(self, text: str, ref_wav: Union[str, Path, np.ndarray],
                         break_seconds: float = 0.15, max_chars: int = 140,
                         **kwargs) -> np.ndarray:
        """Long-text TTS (`gen_voice.py:15-114` flow): number normalisation,
        punctuation split, chunking, per-chunk synthesis with silence breaks.
        Chunks ride the fused on-device batch path when available."""
        from .text.long_text import synthesize_long_text

        def synth(chunks):
            wavs = self.tts_batch(chunks, ref_wav, **kwargs)
            return [w.astype(np.float32) / 32767.0 if w.dtype == np.int16 else w
                    for w in wavs]

        return synthesize_long_text(text, synth, self.audio_cfg.sample_rate,
                                    break_seconds, max_chars)

    def tts_to_file(self, text: str, ref_wav: Union[str, Path], out_path: Union[str, Path],
                    long_text: Optional[bool] = None, **kwargs) -> float:
        t0 = time.time()
        use_gl = kwargs.pop("use_griffin_lim", False)
        if not use_gl and (long_text or (long_text is None and len(text) > 140)):
            wav = self.clone_voice_long(text, ref_wav, **kwargs)
        else:
            wav = self.clone_voice(text, ref_wav, use_griffin_lim=use_gl, **kwargs)[0]
        dt = time.time() - t0
        save_wav(wav, out_path, self.audio_cfg.sample_rate)
        return len(wav) / self.audio_cfg.sample_rate / dt  # RTF


def make_voice_converter(ppg2mel_fpath=None, verbose: bool = True):
    """PPG one-shot VC pipeline (`run.py:30-94` flow)."""
    from .models.ppg import VoiceConverter
    return VoiceConverter(ppg2mel_fpath, verbose=verbose)
