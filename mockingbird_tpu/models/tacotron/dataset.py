"""Synthesizer dataset + collate (host side).

Parity with `/root/reference/models/synthesizer/synthesizer_dataset.py:8-93`:
reads `train.txt` pipe-separated metadata next to mels/ audio/ embeds/ dirs,
yields (text-ids, mel, speaker-embed) tuples; collate zero-pads text and pads
mels with the silence value (−max_abs_value) to a reduction-factor multiple.
TPU-first addition: lengths are padded to buckets so every batch shape comes
from a small fixed set (one XLA compilation per bucket).
"""
from __future__ import annotations

import random
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

from ...text import text_to_sequence

TEXT_BUCKET = 32
MEL_BUCKET = 100


class SynthesizerDataset:
    def __init__(self, metadata_fpath: Path, mel_dir: Path, embed_dir: Path,
                 cleaner_names: List[str] = ("basic_cleaners",), num_mels: int = 80):
        self.num_mels = num_mels
        metadata_fpath, mel_dir, embed_dir = Path(metadata_fpath), Path(mel_dir), Path(embed_dir)
        with metadata_fpath.open("r", encoding="utf-8") as f:
            metadata = [line.strip().split("|") for line in f if line.strip()]

        mel_fnames = [x[1] for x in metadata if int(x[4])]
        self.mel_fpaths = [mel_dir / fname for fname in mel_fnames]
        embed_fnames = [x[2] for x in metadata if int(x[4])]
        self.embed_fpaths = [embed_dir / fname for fname in embed_fnames]
        self.texts = [x[5].strip() for x in metadata if int(x[4])]
        self.cleaner_names = list(cleaner_names)
        assert len(self.mel_fpaths) == len(self.embed_fpaths) == len(self.texts)
        print(f"Found {len(self.mel_fpaths)} samples")

    def __len__(self):
        return len(self.mel_fpaths)

    def __getitem__(self, index):
        text = np.asarray(text_to_sequence(self.texts[index], self.cleaner_names), np.int32)
        mel = np.load(self.mel_fpaths[index]).astype(np.float32)
        if mel.shape[0] == self.num_mels and mel.shape[1] != self.num_mels:
            mel = mel.T  # stored bin-major (M, T) → time-major
        assert mel.shape[1] == self.num_mels, mel.shape
        embed = np.load(self.embed_fpaths[index]).astype(np.float32)
        return text, mel, embed, index


def collate_synthesizer(batch, r: int, max_abs_value: float = 4.0,
                        text_bucket: int = TEXT_BUCKET, mel_bucket: int = MEL_BUCKET):
    """→ dict(texts (B,Tt) int32, mels (B,Tm,M), embeds (B,256), stop (B,Tm),
    text_lengths, mel_lengths). Mel pad value is −max_abs_value ("silence",
    `synthesizer_dataset.py:64-76`); stop target is 1 from the last real frame
    on (`models/synthesizer/train.py:182-184`)."""
    texts, mels, embeds, idx = zip(*batch)
    text_lens = np.array([len(t) for t in texts], np.int32)
    mel_lens = np.array([m.shape[0] for m in mels], np.int32)

    t_text = _ceil_to(max(text_lens), text_bucket)
    t_mel = _ceil_to(max(mel_lens), mel_bucket)
    t_mel = _ceil_to(t_mel, r)

    b = len(batch)
    m = mels[0].shape[1]
    text_arr = np.zeros((b, t_text), np.int32)
    mel_arr = np.full((b, t_mel, m), -max_abs_value, np.float32)
    stop_arr = np.ones((b, t_mel), np.float32)
    for i, (t, mel) in enumerate(zip(texts, mels)):
        text_arr[i, : len(t)] = t
        mel_arr[i, : mel.shape[0]] = mel
        stop_arr[i, : max(mel.shape[0] - 1, 0)] = 0.0

    return dict(texts=text_arr, mels=mel_arr, embeds=np.stack(embeds).astype(np.float32),
                stop=stop_arr, text_lengths=text_lens, mel_lengths=mel_lens,
                indices=np.asarray(idx, np.int32))


def _ceil_to(n: int, m: int) -> int:
    return int(((n + m - 1) // m) * m)


class DataLoader:
    """Shuffling batch loader over an indexable dataset, yielding collated
    numpy batches. A background thread prefetches `prefetch` batches ahead
    (disk reads + collation overlap the device step — the host-side analogue
    of the reference's torch DataLoader workers), keeping the TPU's input
    queue full without multiprocessing."""

    def __init__(self, dataset, batch_size: int, collate_fn, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 length_sort: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = random.Random(seed)
        self.length_sort = length_sort
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return max(n, 0)

    def _batches(self) -> Iterator[dict]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        chunks = [order[i : i + bs] for i in range(0, len(order), bs)]
        if self.drop_last:
            chunks = [c for c in chunks if len(c) == bs]
        for chunk in chunks:
            yield self.collate_fn([self.dataset[i] for i in chunk])

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        import queue as _queue
        import threading

        q: "_queue.Queue" = _queue.Queue(maxsize=self.prefetch)
        _END, _ERR = object(), object()
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except _queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self._batches():
                    if not _put(b):
                        return  # consumer abandoned the epoch
                _put(_END)
            except BaseException as e:  # propagate to the consumer
                _put((_ERR, e))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
                    raise item[1]
                yield item
        finally:
            stop.set()  # unblock + retire the worker if we exit early
