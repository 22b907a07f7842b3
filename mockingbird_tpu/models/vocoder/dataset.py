"""GAN-vocoder dataset (host side).

Parity with `/root/reference/models/vocoder/hifigan/meldataset.py` +
`fregan/meldataset.py`: file list from the synthesizer's `train.txt` with a
95/5 train/validation split, random fixed-size segment crops, on-the-fly mel
via the torch-STFT dialect; fine-tuning mode reads GTA mels and aligns audio
to them. Fixed segment size → one XLA compilation for the whole run.
"""
from __future__ import annotations

import random
from pathlib import Path
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...config import Config
from ...dsp import mel_vits, spectrogram_vits, spec_to_mel_vits


def get_dataset_filelist(syn_dir: Path, split: float = 0.95) -> Tuple[List, List]:
    """(audio .npy, mel filename) pairs from train.txt (`meldataset.py`
    get_dataset_filelist)."""
    syn_dir = Path(syn_dir)
    with (syn_dir / "train.txt").open("r", encoding="utf-8") as f:
        rows = [line.strip().split("|") for line in f if line.strip()]
    files = [(syn_dir / "audio" / r[0], r[1]) for r in rows]
    n_train = int(len(files) * split)
    return files[:n_train], files[n_train:]


def mel_for_loss(wav: np.ndarray, cfg) -> np.ndarray:
    """Full-band log-mel target (fmax_for_loss, `hifigan/train.py` mel for
    loss uses fmax_for_loss=None → sr/2)."""
    fmax = cfg.get("fmax_for_loss") or None
    spec = spectrogram_vits(jnp.asarray(wav), cfg.n_fft, cfg.hop_size, cfg.win_size)
    return np.asarray(spec_to_mel_vits(spec, cfg.sample_rate, cfg.n_fft, cfg.num_mels,
                                       cfg.fmin, fmax))


class MelDataset:
    """Random-segment (mel, wav) pairs.

    fine_tuning=False: input mel = torch-dialect log-mel of the segment.
    fine_tuning=True:  input mel = saved GTA mel (±4 SV2TTS dialect), audio
    cropped to the matching frames (`meldataset.py` fine_tuning branch).
    """

    def __init__(self, files: List[Tuple[Path, str]], cfg: Config,
                 syn_dir: Optional[Path] = None, fine_tuning: bool = False,
                 split: bool = True, seed: int = 1234):
        self.files = list(files)
        self.cfg = cfg
        self.fine_tuning = fine_tuning
        self.syn_dir = Path(syn_dir) if syn_dir else None
        self.split = split
        self.rng = random.Random(seed)
        self.frames_per_seg = cfg.segment_size // cfg.hop_size

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index) -> Tuple[np.ndarray, np.ndarray]:
        wav_path, mel_fname = self.files[index]
        wav = np.load(wav_path).astype(np.float32)

        if not self.fine_tuning:
            if self.split:
                if len(wav) >= self.cfg.segment_size:
                    start = self.rng.randint(0, len(wav) - self.cfg.segment_size)
                    wav = wav[start : start + self.cfg.segment_size]
                else:
                    wav = np.pad(wav, (0, self.cfg.segment_size - len(wav)))
            mel = np.asarray(mel_vits(jnp.asarray(wav), self.cfg), np.float32)
            return mel, wav

        mel_dir = self.syn_dir / "mels_gta"
        mel = np.load(mel_dir / mel_fname).astype(np.float32)
        if mel.shape[0] == self.cfg.num_mels and mel.shape[1] != self.cfg.num_mels:
            mel = mel.T  # (M, T) → (T, M)
        if self.split:
            fps = self.frames_per_seg
            if mel.shape[0] >= fps:
                ms = self.rng.randint(0, mel.shape[0] - fps)
                mel = mel[ms : ms + fps]
                wav = wav[ms * self.cfg.hop_size : (ms + fps) * self.cfg.hop_size]
            else:
                mel = np.pad(mel, ((0, self.frames_per_seg - mel.shape[0]), (0, 0)))
            if len(wav) < self.cfg.segment_size:
                wav = np.pad(wav, (0, self.cfg.segment_size - len(wav)))
            wav = wav[: self.cfg.segment_size]
        return mel, wav


def collate_gan(batch) -> dict:
    mels, wavs = zip(*batch)
    return dict(mels=np.stack(mels).astype(np.float32),
                wavs=np.stack(wavs).astype(np.float32))
