"""Import reference/community PyTorch checkpoints into this framework.

Reads the reference's on-disk formats (SURVEY §5 Checkpoint: per-family
containers) and writes orbax checkpoints in the exact structure each of our
inference wrappers loads:

  family          torch container                         → saved structure
  encoder         {step, model_state, optimizer_state}    → {model}
                  (`models/encoder/train.py:106-121`)
  tacotron        {model_state, optimizer_state}          → {params, batch_stats}
                  (`models/synthesizer/models/base.py:48-69`) + json sidecar
  wavernn         {model_state, optimizer_state} or raw   → {params, batch_stats}
                  (`wavernn/models/fatchord_version.py:407-428`)
  hifigan/fregan  {generator} g_* file                    → {params}
                  (`hifigan/train.py:186-214`)
  vits            {model, iteration, ...} G_* file        → {params}
                  (`train_vits.py:106-117`)
  ppg_extractor   raw espnet asr state_dict (24epoch.pt)  → {params, batch_stats}
                  (`ppg_extractor/__init__.py:90-100` filters 'encoder' keys)
  ppg2mel         {model} best_loss_step_*.pth            → {params, batch_stats}
                  (`ppg2mel/train/solver.py:167-184`)

Usage: `python -m mockingbird_tpu.cli import-checkpoint --family vits \
        --torch-ckpt G_64000.pth --out vits_imported` then pass `--out` as
        the model path anywhere this framework takes one.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..config import Config
from ..train.checkpoint import save_single
from . import torch_weights as tw

FAMILIES = ("encoder", "tacotron", "wavernn", "hifigan", "fregan", "vits",
            "ppg_extractor", "ppg2mel", "wav2emo")


def _load_torch_state_dict(path):
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model_state", "model", "generator", "state_dict"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") else v
            for k, v in ckpt.items() if hasattr(v, "detach")}


def import_reference_checkpoint(family: str, torch_ckpt, out_path,
                                cfg: Optional[Config] = None,
                                verbose: bool = True) -> Path:
    """Convert a reference torch checkpoint → our orbax checkpoint at
    out_path. Returns the written path."""
    assert family in FAMILIES, f"family must be one of {FAMILIES}"
    sd = _load_torch_state_dict(torch_ckpt)
    out_path = Path(out_path)

    if family == "encoder":
        params = tw.convert_encoder(sd)
        state = {"model": params}
    elif family == "tacotron":
        from ..models.tacotron.model import tacotron_config
        c = Config(tacotron_config()).merge(cfg or {})
        # honour the reference's json hparams sidecar if present
        sidecar = Path(torch_ckpt).with_suffix(".json")
        if sidecar.exists():
            c.merge(Config.from_json(sidecar))
        params, stats = tw.convert_tacotron(sd, c)
        state = {"params": params, "batch_stats": stats}
    elif family == "wavernn":
        from ..models.vocoder.wavernn import wavernn_config
        c = Config(wavernn_config()).merge(cfg or {})
        params, stats = tw.convert_wavernn(sd, c)
        state = {"params": params, "batch_stats": stats}
    elif family == "hifigan":
        from ..models.vocoder.hifigan import hifigan_config
        c = Config(hifigan_config()).merge(cfg or {})
        state = {"params": tw.convert_hifigan_generator(sd, c)}
    elif family == "fregan":
        from ..models.vocoder.fregan import fregan_config
        c = Config(fregan_config()).merge(cfg or {})
        state = {"params": tw.convert_fregan_generator(sd, c)}
    elif family == "vits":
        from ..models.vits.model import vits_config
        c = Config(vits_config()).merge(cfg or {})
        state = {"params": tw.convert_vits(sd, c)}
    elif family == "ppg_extractor":
        from ..models.ppg.extractor import ppg_config
        c = Config(ppg_config()).merge(cfg or {})
        params, stats = tw.convert_conformer_encoder(sd, c, prefix="encoder")
        state = {"params": {"encoder": params},
                 "batch_stats": {"encoder": stats}}
    elif family == "wav2emo":
        # the audeering emotion model the reference conditions VITS on
        # (`models/synthesizer/models/wav2emo.py:9-50`): one command turns
        # its torch checkpoint into an orbax dir EmotionExtractor loads
        # directly (no torch needed afterwards)
        from ..models.wav2emo import wav2emo_config
        c = Config(wav2emo_config()).merge(cfg or {})
        prefix = "wav2vec2" if any(k.startswith("wav2vec2.") for k in sd) else ""
        state = {"params": tw.convert_wav2vec2_emotion(sd, c, prefix=prefix)}
        # architecture sidecar: the loader must rebuild the exact conv
        # stack / depth this checkpoint was converted against
        c.to_json(Path(out_path).with_suffix(".json"))
    else:  # ppg2mel
        from ..models.ppg.ppg2mel import ppg2mel_config
        c = Config(ppg2mel_config()).merge(cfg or {})
        params, stats = tw.convert_ppg2mel(sd, c)
        state = {"params": params, "batch_stats": stats}

    save_single(out_path, state)
    if verbose:
        n = sum(x.size for x in _leaves(state))
        print(f"Imported {family} checkpoint {torch_ckpt} → {out_path} "
              f"({n / 1e6:.2f}M params)")
    return out_path


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree
