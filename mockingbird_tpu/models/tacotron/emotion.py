"""Emotion embedding extraction (wav2vec2 arousal/dominance/valence).

Parity with `/root/reference/models/synthesizer/models/wav2emo.py:9-50` +
`preprocess_audio.py:22-45`: a wav2vec2-large head producing the 1024-d
hidden embedding VITS consumes (`vits.py:154,169`). The pretrained
`audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim` weights require a
local HuggingFace cache (no network egress here); without it, a documented
zero-embedding fallback keeps the pipeline runnable (`emo` conditioning is
additive, so zeros are the neutral point).
"""
from __future__ import annotations

import warnings
from typing import Optional

import numpy as np

EMOTION_DIM = 1024
_MODEL_NAME = "audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim"
_state = {"model": None, "processor": None, "checked": False}


def _try_load():
    if _state["checked"]:
        return
    _state["checked"] = True
    try:
        import torch
        from transformers import Wav2Vec2Model, Wav2Vec2Processor
        _state["processor"] = Wav2Vec2Processor.from_pretrained(
            _MODEL_NAME, local_files_only=True)
        _state["model"] = Wav2Vec2Model.from_pretrained(
            _MODEL_NAME, local_files_only=True).eval()
    except Exception:
        warnings.warn(
            "wav2vec2 emotion model not in the local HuggingFace cache; "
            "emotion embeddings fall back to zeros (neutral). Download "
            f"{_MODEL_NAME} to enable emotion conditioning.")


def extract_emo(wav: np.ndarray, sampling_rate: int = 16000,
                embeddings: bool = True) -> np.ndarray:
    """wav → (1024,) mean-pooled emotion embedding, or zeros if the
    pretrained extractor is unavailable."""
    _try_load()
    if _state["model"] is None:
        return np.zeros(EMOTION_DIM, np.float32)
    import torch
    y = _state["processor"](wav, sampling_rate=sampling_rate)["input_values"][0]
    with torch.no_grad():
        hidden = _state["model"](torch.from_numpy(y[None])).last_hidden_state
    return hidden.mean(dim=1)[0].numpy().astype(np.float32)


def available() -> bool:
    _try_load()
    return _state["model"] is not None
