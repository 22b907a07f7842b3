"""Emotion embedding extraction (wav2vec2 arousal/dominance/valence).

Parity with `/root/reference/models/synthesizer/models/wav2emo.py:9-50` +
`preprocess_audio.py:22-45`: a wav2vec2-large model producing the 1024-d
mean-pooled hidden embedding VITS consumes (`vits.py:154,169`) and 3
emotion logits (arousal/dominance/valence).

TPU-first: unlike the reference (torch on the host GPU), extraction runs the
native flax `models.wav2emo.EmotionExtractorModel` as one jitted program with
bucket-padded wav lengths (static shapes; padded frames masked out of
attention and pooling). The pretrained
`audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim` torch weights are
converted on load via `interop.torch_weights.convert_wav2vec2_emotion` —
from the local HuggingFace cache or an explicit checkpoint path. Without
weights, a documented zero-embedding fallback keeps the pipeline runnable
(`emo` conditioning is additive, so zeros are the neutral point).
"""
from __future__ import annotations

import math
import warnings
from pathlib import Path
from typing import Optional

import numpy as np

EMOTION_DIM = 1024
_MODEL_NAME = "audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim"
_BUCKET_SECONDS = 1.0   # wav lengths padded up to multiples of this


def _load_torch_state_dict(weights_path=None):
    """Torch state_dict from an explicit file or the local HF cache."""
    import torch
    if weights_path is not None:
        p = Path(weights_path)
        if p.suffix == ".safetensors":
            from safetensors.torch import load_file
            return load_file(p)
        obj = torch.load(p, map_location="cpu", weights_only=False)
        return obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    # HF cache: instantiate the reference's EmotionExtractorModel layout
    # (Wav2Vec2Model + classifier head) without network egress.
    from transformers import AutoConfig, AutoModel
    cfg = AutoConfig.from_pretrained(_MODEL_NAME, local_files_only=True)
    try:
        model = AutoModel.from_pretrained(
            _MODEL_NAME, local_files_only=True, trust_remote_code=False)
        return model.state_dict(), cfg
    except Exception:
        # head weights live in the full checkpoint; fall back to torch.load
        from transformers.utils import cached_file
        fp = cached_file(_MODEL_NAME, "pytorch_model.bin", local_files_only=True)
        return torch.load(fp, map_location="cpu", weights_only=True), cfg


class EmotionExtractor:
    """Jitted wav → (1024-d embedding, 3 logits) extractor with bucketed
    static shapes. `weights_path` may point at the reference's torch
    checkpoint (.bin/.pt/.safetensors); default is the local HF cache."""

    def __init__(self, weights_path=None, cfg=None, verbose: bool = False):
        import jax
        from ...config import Config
        from ..wav2emo import EmotionExtractorModel, wav2emo_config
        from ...interop.torch_weights import (
            convert_wav2vec2_emotion, state_dict_to_numpy)

        self.cfg = Config(wav2emo_config()).merge(cfg or {})
        self._fns = {}
        self.params = None
        # imported orbax checkpoint (one-command path:
        # `cli import-checkpoint --family wav2emo --torch-ckpt <audeering>
        # --out emotion.ckpt` then weights_path=emotion.ckpt): loads without
        # torch/transformers present at all
        p = Path(weights_path) if weights_path is not None else None
        if p is not None and (p / "_CHECKPOINT_METADATA").exists():
            import jax.numpy as jnp
            from ...train.checkpoint import load_single
            sidecar = p.with_suffix(".json")
            if sidecar.exists():
                base = Config(wav2emo_config())
                base.merge(Config.from_json(sidecar))
                self.cfg = base.merge(cfg or {})
            loaded = load_single(p)
            self.params = jax.tree.map(jnp.asarray, loaded["params"])
            self.model = EmotionExtractorModel(self.cfg.freeze())
            if verbose:
                print(f"EmotionExtractor: loaded imported checkpoint {p}")
            return
        try:
            loaded = _load_torch_state_dict(weights_path)
            if isinstance(loaded, tuple):
                sd, hf_cfg = loaded
                self.cfg.merge(dict(
                    conv_dim=tuple(hf_cfg.conv_dim),
                    conv_stride=tuple(hf_cfg.conv_stride),
                    conv_kernel=tuple(hf_cfg.conv_kernel),
                    conv_bias=hf_cfg.conv_bias,
                    feat_extract_norm=hf_cfg.feat_extract_norm,
                    hidden_size=hf_cfg.hidden_size,
                    num_hidden_layers=hf_cfg.num_hidden_layers,
                    num_attention_heads=hf_cfg.num_attention_heads,
                    intermediate_size=hf_cfg.intermediate_size,
                    num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
                    num_conv_pos_embedding_groups=hf_cfg.num_conv_pos_embedding_groups,
                    do_stable_layer_norm=hf_cfg.do_stable_layer_norm))
            else:
                sd = loaded
            sd = {k: np.asarray(v) if not isinstance(v, np.ndarray) else v
                  for k, v in state_dict_to_numpy_safe(sd).items()}
            prefix = "wav2vec2" if any(
                k.startswith("wav2vec2.") for k in sd) else ""
            self.params = convert_wav2vec2_emotion(sd, self.cfg, prefix=prefix)
            self.model = EmotionExtractorModel(self.cfg.freeze())
            if verbose:
                print(f"EmotionExtractor: loaded wav2vec2 weights "
                      f"({self.cfg.num_hidden_layers} blocks)")
        except Exception as e:  # no weights available — neutral fallback
            warnings.warn(
                "wav2vec2 emotion weights unavailable "
                f"({type(e).__name__}: {e}); emotion embeddings fall back to "
                f"zeros (neutral). Provide {_MODEL_NAME} in the HF cache or "
                "pass weights_path= to enable emotion conditioning.")

    @property
    def available(self) -> bool:
        return self.params is not None

    def _fwd(self, n_samples: int):
        import jax
        if n_samples not in self._fns:
            def fn(params, wav, n_valid):
                import jax.numpy as jnp
                from ..wav2emo import feat_extract_output_length, normalize_wav
                wav = normalize_wav(wav, n_valid)
                frames = feat_extract_output_length(wav.shape[-1], self.cfg)
                # frame validity from true sample counts (HF
                # _get_feat_extract_output_lengths semantics)
                nf = n_valid
                for k, s in zip(self.cfg.conv_kernel, self.cfg.conv_stride):
                    nf = (nf - k) // s + 1
                fmask = (jnp.arange(frames)[None, :] < nf[:, None]).astype(jnp.float32)
                return self.model.apply({"params": params}, wav, fmask)
            self._fns[n_samples] = jax.jit(fn)
        return self._fns[n_samples]

    def extract(self, wav: np.ndarray, sampling_rate: int = 16000):
        """Single utterance → ((1024,) embedding, (3,) logits)."""
        if self.params is None:
            return (np.zeros(EMOTION_DIM, np.float32),
                    np.zeros(self.cfg.num_labels, np.float32))
        embeds, logits = self.extract_batch([np.asarray(wav, np.float32)])
        return embeds[0], logits[0]

    def extract_batch(self, wavs):
        """List of wavs (ragged) → ((B,1024), (B,3)); one device call per
        length bucket."""
        import jax.numpy as jnp
        if self.params is None:
            return (np.zeros((len(wavs), EMOTION_DIM), np.float32),
                    np.zeros((len(wavs), self.cfg.num_labels), np.float32))
        bucket = int(_BUCKET_SECONDS * self.cfg.sample_rate)
        lens = np.array([max(len(w), 1) for w in wavs])
        padded_len = int(max(bucket, bucket * math.ceil(lens.max() / bucket)))
        batch = np.zeros((len(wavs), padded_len), np.float32)
        for i, w in enumerate(wavs):
            batch[i, :len(w)] = w
        fn = self._fwd(padded_len)
        emb, logits = fn(self.params, jnp.asarray(batch), jnp.asarray(lens))
        return np.asarray(emb), np.asarray(logits)


def state_dict_to_numpy_safe(sd):
    out = {}
    for k, v in sd.items():
        out[k] = v if isinstance(v, np.ndarray) else v.detach().cpu().numpy()
    return out


_singleton = {"ex": None}


def _get() -> EmotionExtractor:
    if _singleton["ex"] is None:
        _singleton["ex"] = EmotionExtractor()
    return _singleton["ex"]


def extract_emo(wav: np.ndarray, sampling_rate: int = 16000,
                embeddings: bool = True) -> np.ndarray:
    """wav → (1024,) mean-pooled emotion embedding (embeddings=True) or (3,)
    arousal/dominance/valence logits — the reference's `extract_emo`
    surface (`preprocess_audio.py:28-45`); zeros if no weights."""
    emb, logits = _get().extract(np.asarray(wav, np.float32), sampling_rate)
    return emb if embeddings else logits


def available() -> bool:
    return _get().available
