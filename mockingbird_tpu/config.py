"""Unified configuration system.

Replaces the reference's four overlapping mechanisms (module constants,
`utils/hparams.py:51-107` HParams with comma-string overrides, GAN-vocoder JSON
AttrDicts `utils/util.py:50-53`, and YAML HpsYaml) with one dot-accessible,
nestable, serialisable Config.

Usage:
    cfg = Config(sample_rate=16000, mel=Config(n_mels=80))
    cfg.mel.n_mels                       # 80
    cfg.parse("mel.n_mels=40,fmin=55")   # CLI override string
    cfg.to_json(path) / Config.from_json(path) / Config.from_yaml(path)
"""
from __future__ import annotations

import ast
import json
from pathlib import Path
from typing import Any, Dict


from types import SimpleNamespace


class FrozenConfig(SimpleNamespace):
    """Hashable-by-identity namespace used for model configs inside flax
    modules. Create via ``Config.freeze()``."""

    def __hash__(self):
        return hash(tuple(sorted((k, repr(v)) for k, v in vars(self).items())))

    def __eq__(self, other):
        return isinstance(other, FrozenConfig) and vars(self) == vars(other)

    def get(self, name, default=None):
        return vars(self).get(name, default)


class Config(dict):
    """A dict with attribute access, deep merge, and CLI-string overrides."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for src in list(args) + [kwargs]:
            if src:
                self.merge(src)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = self._wrap(value)

    def __delattr__(self, name: str) -> None:
        del self[name]

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, dict):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    # -- merging / overrides ------------------------------------------------
    def merge(self, other: Dict[str, Any]) -> "Config":
        """Deep-merge ``other`` into self (nested dicts merge, scalars replace).
        Accepts a FrozenConfig (or any namespace) as well as a dict."""
        if isinstance(other, SimpleNamespace):
            other = vars(other)
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), Config):
                self[k].merge(v)
            else:
                self[k] = self._wrap(v)
        return self

    def set_path(self, dotted: str, value: Any) -> None:
        """Set ``a.b.c`` style nested key, creating intermediate Configs."""
        parts = dotted.split(".")
        node = self
        for p in parts[:-1]:
            if not isinstance(node.get(p), Config):
                node[p] = Config()
            node = node[p]
        node[parts[-1]] = self._wrap(value)

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for p in dotted.split("."):
            if not isinstance(node, dict) or p not in node:
                return default
            node = node[p]
        return node

    def parse(self, override: str) -> "Config":
        """Apply a ``key=value,key2=value2`` override string (reference:
        `utils/hparams.py:63-89` CLI-string behaviour, extended to dotted keys)."""
        if not override:
            return self
        for item in _split_top_level(override):
            if not item.strip():
                continue
            key, _, raw = item.partition("=")
            try:
                value = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                value = raw  # plain string
            self.set_path(key.strip(), value)
        return self

    # -- serialisation ------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        def conv(v):
            if isinstance(v, Config):
                return v.to_dict()
            if isinstance(v, (list, tuple)):
                return [conv(x) for x in v]
            return v
        return {k: conv(v) for k, v in self.items()}

    def to_json(self, path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def from_json(cls, path) -> "Config":
        return cls(json.loads(Path(path).read_text()))

    @classmethod
    def from_yaml(cls, path) -> "Config":
        import yaml
        return cls(yaml.safe_load(Path(path).read_text()))

    def to_yaml(self, path) -> None:
        import yaml
        Path(path).write_text(yaml.safe_dump(self.to_dict()))

    def clone(self) -> "Config":
        return Config(self.to_dict())

    def freeze(self) -> "FrozenConfig":
        """Immutable attribute-struct view for use as a flax Module field
        (flax coerces dict-valued fields to FrozenDict, which would lose
        attribute access; a namespace passes through untouched)."""
        def conv(v):
            if isinstance(v, dict):
                return FrozenConfig(**{k: conv(x) for k, x in v.items()})
            if isinstance(v, list):
                return tuple(conv(x) for x in v)
            return v
        return conv(self)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Config({json.dumps(self.to_dict(), indent=2, default=str)})"


def _split_top_level(s: str):
    """Split on commas not inside brackets/quotes, so `a=[1,2],b=3` works."""
    out, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch in "([{":
            depth += 1
            cur.append(ch)
        elif ch in ")]}":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


# ---------------------------------------------------------------------------
# Default hyperparameter sets, mirroring the reference's semantics
# ---------------------------------------------------------------------------

def sv2tts_audio_config() -> Config:
    """Audio config shared by the synthesizer + WaveRNN path.

    Mirrors `/root/reference/models/synthesizer/hparams.py:3-15` (16 kHz,
    n_fft 1024, 80 mel, hop 256, win 1024, fmin 55 / fmax 7600, symmetric
    mel normalisation to ±4 with preemphasis 0.97).
    """
    return Config(
        sample_rate=16000,
        n_fft=1024,
        num_mels=80,
        hop_size=256,
        win_size=1024,
        fmin=55.0,
        fmax=7600.0,
        min_level_db=-100.0,
        ref_level_db=20.0,
        max_abs_value=4.0,
        preemphasis=0.97,
        preemphasize=True,
        signal_normalization=True,
        symmetric_mels=True,
        allow_clipping_in_normalization=True,
        power=1.5,
        griffin_lim_iters=60,
        # fast single-pass phase recovery (SPSI) instead of Griffin-Lim —
        # the TPU stand-in for the reference's `use_lws` option
        # (`models/synthesizer/audio.py:76-95`); off by default like use_lws
        use_fast_phase=False,
        rescale=True,
        rescaling_max=0.9,
        max_mel_frames=900,
        trim_silence=False,
    )


def encoder_audio_config() -> Config:
    """GE2E speaker-encoder frontend config.

    Mirrors `/root/reference/models/encoder/params_data.py:3-28` (40-channel
    non-log mel, 25 ms window / 10 ms hop at 16 kHz, VAD + −30 dBFS norm).
    """
    return Config(
        sample_rate=16000,
        mel_window_length_ms=25,
        mel_window_step_ms=10,
        mel_n_channels=40,
        partials_n_frames=160,
        inference_n_frames=80,
        vad_window_length_ms=30,
        vad_moving_average_width=8,
        vad_max_silence_length=6,
        audio_norm_target_dBFS=-30.0,
    )


def vits_audio_config() -> Config:
    """VITS/GAN-vocoder torch-STFT-style config (no preemphasis, log-clamp mel).

    Mirrors `/root/reference/utils/audio_utils.py:20-98` semantics with the
    data config from the VITS `config.json` (16 kHz, filter 1024, hop 256).
    """
    return Config(
        sample_rate=16000,
        n_fft=1024,
        num_mels=80,
        hop_size=256,
        win_size=1024,
        fmin=0.0,
        fmax=None,
    )
