"""Encoder training visualisations.

Parity with `/root/reference/models/encoder/visualizations.py:27-177`:
loss/EER curves and 2-D embedding projections saved as PNGs. visdom is
replaced with matplotlib files + TensorBoard; umap-learn with a PCA fallback
when umap is unavailable.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

_COLORMAP = np.array([
    [76, 255, 0], [0, 127, 70], [255, 0, 0], [255, 217, 38], [0, 135, 255],
    [165, 0, 165], [255, 167, 255], [0, 255, 255], [255, 96, 38],
    [142, 76, 0], [33, 0, 127], [0, 0, 0], [183, 183, 183],
], dtype=float) / 255


def project_embeddings(embeds: np.ndarray) -> np.ndarray:
    """(N, D) → (N, 2) via UMAP if installed, else PCA."""
    try:
        import umap
        return umap.UMAP().fit_transform(embeds)
    except Exception:
        x = embeds - embeds.mean(axis=0)
        _, _, vt = np.linalg.svd(x, full_matrices=False)
        return x @ vt[:2].T


def draw_projections(embeds: np.ndarray, utterances_per_speaker: int,
                     step: int, out_fpath: Optional[Path] = None,
                     max_speakers: int = 10):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_speakers = min(max_speakers, len(embeds) // utterances_per_speaker)
    embeds = embeds[: n_speakers * utterances_per_speaker]
    ground_truth = np.repeat(np.arange(n_speakers), utterances_per_speaker)
    colors = [_COLORMAP[i % len(_COLORMAP)] for i in ground_truth]

    projected = project_embeddings(embeds)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(projected[:, 0], projected[:, 1], c=colors)
    ax.set_title(f"Embedding projections (step {step})")
    ax.set_aspect("equal")
    if out_fpath is not None:
        fig.savefig(out_fpath, dpi=80)
    plt.close(fig)
    return projected


def plot_loss_curves(steps, losses, eers, out_fpath: Path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    ax1.plot(steps, losses)
    ax1.set_title("Loss")
    ax2.plot(steps, eers)
    ax2.set_title("EER")
    fig.savefig(out_fpath, dpi=80)
    plt.close(fig)


def plot_spectrogram(mel: np.ndarray, out_fpath: Optional[Path] = None,
                     title: str = "mel"):
    """(T, M) or (M, T) mel → PNG (`models/vocoder/display.py` analogue)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    m = np.asarray(mel)
    if m.shape[0] > m.shape[1]:
        m = m.T
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.imshow(m, aspect="auto", origin="lower", interpolation="none")
    ax.set_title(title)
    if out_fpath is not None:
        fig.savefig(out_fpath, dpi=80)
    plt.close(fig)
    return fig
