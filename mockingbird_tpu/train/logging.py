"""Training observability: TensorBoard + console progress.

Parity with the reference's per-trainer SummaryWriter usage
(`train_vits.py:384-392` summarize helper, `hifigan/train.py:198-244`),
`ValueWindow` moving averages (`models/synthesizer/utils/__init__.py:24-45`)
and the console `stream`/`simple_table` helpers (`models/vocoder/display.py`).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import numpy as np


class ValueWindow:
    """Moving average over the last N values (`utils/__init__.py:24-45`)."""

    def __init__(self, window_size: int = 100):
        self._window_size = window_size
        self._values: list = []

    def append(self, x):
        self._values = self._values[-(self._window_size - 1):] + [x]

    @property
    def sum(self):
        return sum(self._values)

    @property
    def count(self):
        return len(self._values)

    @property
    def average(self):
        return self.sum / max(1, self.count)

    def reset(self):
        self._values = []


class TrainLogger:
    """TensorBoard scalars/images/audio + console lines; no-op if
    tensorboardX is unavailable."""

    def __init__(self, log_dir: Optional[Path] = None, enabled: bool = True):
        self.writer = None
        # multi-process: only rank 0 writes, matching the reference's
        # `rank == 0` guards (`train_vits.py:283-317`)
        import jax
        if enabled and log_dir is not None and jax.process_index() == 0:
            try:
                from tensorboardX import SummaryWriter
                Path(log_dir).mkdir(parents=True, exist_ok=True)
                self.writer = SummaryWriter(str(log_dir))
            except Exception:
                self.writer = None

    def scalars(self, step: int, **kwargs):
        if self.writer:
            for k, v in kwargs.items():
                self.writer.add_scalar(k, float(v), step)

    def audio(self, step: int, tag: str, wav: np.ndarray, sr: int = 16000):
        if not self.writer:
            return
        # tensorboardX.add_audio requires soundfile; encode the WAV ourselves
        # (stdlib wave) and emit the Summary proto directly
        try:
            import io
            import wave as wave_mod
            from tensorboardX.proto.summary_pb2 import Summary

            peak = max(1e-3, float(np.max(np.abs(wav))))
            pcm = np.round(np.clip(np.asarray(wav, np.float32) / peak, -1, 1)
                           * 32767).astype("<i2")
            buf = io.BytesIO()
            with wave_mod.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(pcm.tobytes())
            audio = Summary.Audio(sample_rate=sr, num_channels=1,
                                  length_frames=len(pcm),
                                  encoded_audio_string=buf.getvalue(),
                                  content_type="audio/wav")
            self.writer._get_file_writer().add_summary(
                Summary(value=[Summary.Value(tag=tag, audio=audio)]), step)
        except Exception:
            pass

    def image(self, step: int, tag: str, img: np.ndarray):
        """img (H, W) or (H, W, C) in [0, 1]."""
        if self.writer:
            if img.ndim == 2:
                img = img[None]
            elif img.shape[-1] in (1, 3):
                img = np.transpose(img, (2, 0, 1))
            self.writer.add_image(tag, img, step)

    def alignment(self, step: int, tag: str, attn: np.ndarray):
        a = np.asarray(attn, np.float32)
        a = a / max(a.max(), 1e-6)
        self.image(step, tag, a)

    def close(self):
        if self.writer:
            self.writer.close()


def stream(message: str) -> None:
    """In-place console line (`display.py:stream`)."""
    sys.stdout.write(f"\r{message}")
    sys.stdout.flush()


def simple_table(item_tuples) -> None:
    """Boxed key/value table (`display.py:simple_table`)."""
    border_pattern = "+---------------------------------------"
    whitespace = "                                            "
    headings, cells = [], []
    for item in item_tuples:
        heading, cell = str(item[0]), str(item[1])
        pad_head = True
        while len(heading) < len(cell):
            heading += " " if pad_head else ""
            heading = " " + heading if pad_head else heading
            pad_head = not pad_head
        while len(cell) < len(heading):
            cell += " "
        headings.append(" " + heading + " ")
        cells.append(" " + cell + " ")
    border, head, body = "", "", ""
    for h, c in zip(headings, cells):
        border += border_pattern[: len(h) + 1]
        head += "|" + h
        body += "|" + c
    border += "+"
    print(border); print(head + "|"); print(border); print(body + "|"); print(border)


def progbar(i: int, n: int, size: int = 16) -> str:
    done = int(size * i / max(n, 1))
    return "█" * done + "░" * (size - done)
