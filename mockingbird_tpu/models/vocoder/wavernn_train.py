"""WaveRNN dataset + trainer.

Parity with `/root/reference/models/vocoder/vocoder_dataset.py:9-83` (GTA-or-GT
mel + wav pairs, preemphasis + clip, mu-law/label quantise, random aligned
windows) and `wavernn/train.py:16-127` (Adam 1e-4, CE for RAW / discretized
MOL loss, periodic checkpoints + test generation).
"""
from __future__ import annotations

from functools import partial

import random
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...config import Config
from ...dsp import encode_mu_law, float_2_label, label_2_float, preemphasis_np
from ...parallel import multihost
from ...parallel.mesh import make_mesh, shard_batch
from ...train.checkpoint import CheckpointManager
from ...train.logging import TrainLogger
from ..tacotron.dataset import DataLoader
from .distribution import discretized_mix_logistic_loss
from .wavernn import WaveRNN, wavernn_config


class WaveRnnDataset:
    def __init__(self, metadata_fpath: Path, mel_dir: Path, wav_dir: Path, cfg):
        with Path(metadata_fpath).open("r") as f:
            metadata = [line.split("|") for line in f if line.strip()]
        gta_fnames = [x[1] for x in metadata if int(x[4])]
        wav_fnames = [x[0] for x in metadata if int(x[4])]
        self.samples = [(Path(mel_dir) / g, Path(wav_dir) / w)
                        for g, w in zip(gta_fnames, wav_fnames)]
        self.cfg = cfg
        print(f"Found {len(self.samples)} vocoder samples")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        cfg = self.cfg
        mel_path, wav_path = self.samples[index]
        mel = np.load(mel_path).astype(np.float32)
        if mel.shape[0] != cfg.feat_dims:
            mel = mel.T  # ensure (M, T) here, like the reference
        mel = mel / cfg.mel_max_abs_value

        wav = np.load(wav_path)
        if cfg.apply_preemphasis:
            wav = preemphasis_np(wav, cfg.preemphasis)
        wav = np.clip(wav, -1, 1)
        r_pad = (len(wav) // cfg.hop_size + 1) * cfg.hop_size - len(wav)
        wav = np.pad(wav, (0, r_pad))
        wav = wav[: mel.shape[1] * cfg.hop_size]

        if cfg.mode == "RAW":
            quant = (encode_mu_law(wav, mu=2 ** cfg.bits) if cfg.mu_law
                     else float_2_label(wav, bits=cfg.bits))
        else:  # MOL
            quant = float_2_label(wav, bits=16)
        return mel.astype(np.float32), quant.astype(np.int64)


def collate_wavernn(batch, cfg, rng: Optional[random.Random] = None):
    """Random aligned (mel window, label window) crops
    (`vocoder_dataset.py:58-83`)."""
    rng = rng or random
    mel_win = cfg.seq_len // cfg.hop_size + 2 * cfg.pad
    mels, labels = [], []
    for mel, quant in batch:
        max_offset = mel.shape[-1] - 2 - (mel_win + 2 * cfg.pad)
        mel_offset = rng.randint(0, max(max_offset, 1) - 1) if max_offset > 1 else 0
        sig_offset = (mel_offset + cfg.pad) * cfg.hop_size
        mels.append(mel[:, mel_offset : mel_offset + mel_win])
        lab = quant[sig_offset : sig_offset + cfg.seq_len + 1]
        if len(lab) < cfg.seq_len + 1:
            lab = np.pad(lab, (0, cfg.seq_len + 1 - len(lab)))
        labels.append(lab)
    mels = np.stack(mels).astype(np.float32).transpose(0, 2, 1)  # (B, T, M)
    labels = np.stack(labels).astype(np.int32)

    bits = 16 if cfg.mode == "MOL" else cfg.bits
    x = label_2_float(labels[:, : cfg.seq_len].astype(np.float32), bits)
    y = labels[:, 1:]
    if cfg.mode == "MOL":
        y = label_2_float(y.astype(np.float32), bits)
    return dict(x=x.astype(np.float32), y=y, mels=mels)


def make_wavernn_step(model: WaveRNN, tx, mode: str, precision: str = "fp32",
                      remat: bool = False, head_chunk: int = 128):
    """Training step. ``remat=True`` (pair with `WaveRNN(cfg.remat=True)`,
    which remats the GRU cells) additionally computes the FC head + loss in
    `jax.checkpoint`ed time chunks: the (B, T, n_classes) logits — 0.7 GB
    fp32 at batch 256 × seq 1280 × 512 classes, several times that with
    softmax intermediates — are never materialised for the full sequence,
    only (B, head_chunk, ·) at a time. Loss-parity with the plain step is
    tested (`tests/test_vocoders.py::test_wavernn_remat_loss_parity`)."""
    from ...train.precision import Policy
    policy = Policy.from_name(precision)

    def _nll_elems(logits, y):
        """Per-element negative log-likelihood, shape (B, T)."""
        if mode == "RAW":
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
        return discretized_mix_logistic_loss(logits, y[..., None],
                                             reduce=False)[..., 0]

    def loss_fn(params, batch_stats, batch):
        variables = {"params": policy.cast(params),
                     "batch_stats": policy.cast(batch_stats)}
        if not remat:
            logits, mut = model.apply(variables, policy.cast(batch["x"]),
                                      policy.cast(batch["mels"]), True,
                                      mutable=["batch_stats"])
            logits = policy.uncast(logits)
            loss = jnp.mean(_nll_elems(logits, batch["y"]))
            return loss, policy.uncast(mut)["batch_stats"]

        (h, a3, a4), mut = model.apply(variables, policy.cast(batch["x"]),
                                       policy.cast(batch["mels"]), True,
                                       method=WaveRNN.features,
                                       mutable=["batch_stats"])
        y = batch["y"]
        t = y.shape[1]
        ck = min(head_chunk, t)
        n_chunks = (t + ck - 1) // ck
        pad = n_chunks * ck - t
        if pad:  # pad labels with class 0 and mask the tail out of the sum
            h, a3, a4 = (jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
                         for v in (h, a3, a4))
            y = jnp.pad(y, ((0, 0), (0, pad)))
        mask = (jnp.arange(n_chunks * ck) < t).astype(jnp.float32)

        def chunk_loss(args):
            hc, a3c, a4c, yc, mc = args
            logits = policy.uncast(model.apply(
                variables, hc, a3c, a4c, method=WaveRNN.head))
            return (_nll_elems(logits, yc) * mc[None, :]).sum()

        def to_chunks(v):
            return v.reshape(v.shape[0], n_chunks, ck, *v.shape[2:]) \
                    .swapaxes(0, 1)

        sums = jax.lax.map(jax.checkpoint(chunk_loss, prevent_cse=False),
                           (to_chunks(h), to_chunks(a3), to_chunks(a4),
                            to_chunks(y[..., None])[..., 0],
                            mask.reshape(n_chunks, ck)))
        loss = sums.sum() / batch["y"].size
        return loss, policy.uncast(mut)["batch_stats"]

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(params, batch_stats, opt_state, batch):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step_fn


def gen_testset(variables, dataset: WaveRnnDataset, save_path: Path, cfg,
                samples: int = 2, batched: bool = True, step: int = 0,
                tb: Optional[TrainLogger] = None):
    """Per-checkpoint sample generation (`wavernn/train.py:125-126`,
    `gen_wavernn.py:1-31`): ground-truth + generated wavs for the first
    `samples` utterances, saved to `save_path` and TensorBoard."""
    from ...dsp import decode_mu_law, save_wav
    from .wavernn import WaveRnnVocoder

    voc = WaveRnnVocoder(cfg=cfg, verbose=False, variables=variables)
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)
    batch_str = f"gen_batched_target{cfg.gen_target}_overlap{cfg.gen_overlap}" \
        if batched else "gen_not_batched"
    for i in range(min(samples, len(dataset))):
        mel, quant = dataset[i]
        bits = 16 if cfg.mode == "MOL" else cfg.bits
        if cfg.mu_law and cfg.mode != "MOL":
            gt = decode_mu_law(quant, 2 ** bits, from_labels=True)
        else:
            gt = label_2_float(quant.astype(np.float32), bits)
        save_wav(gt.astype(np.float32), save_path / f"{step}_steps_{i}_target.wav",
                 cfg.sample_rate)
        # dataset mels are already ±1 (pre-divided by mel_max_abs_value)
        wav = voc.infer_waveform(mel, normalize=False, batched=batched)
        save_wav(wav, save_path / f"{step}_steps_{i}_{batch_str}.wav",
                 cfg.sample_rate)
        if tb is not None:
            tb.audio(step, f"gen/sample_{i}", wav, cfg.sample_rate)


def train(run_id: str, syn_dir: Path, models_dir: Path, ground_truth: bool = False,
          total_steps: Optional[int] = None, save_every: int = 1000,
          log_every: int = 10, cfg=None, seed: int = 0, use_mesh: bool = True,
          gen_samples: int = 2, precision: str = "bf16",
          remat: Optional[bool] = None):
    multihost.initialize_from_env()
    syn_dir = Path(syn_dir)
    cfg = Config(wavernn_config()).merge(cfg or {})
    # auto-remat at large batches: the plain step's (B, T, 512) GRU
    # residuals + (B, T, n_classes) logits OOM one chip past batch ~192
    # (measured r4); the remat step trades ~one recompute for that memory
    if remat is None:
        remat = bool(cfg.batch_size >= 192)
    cfg.merge(dict(remat=remat))
    fcfg = cfg.freeze()
    model = WaveRNN(fcfg)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, cfg.seq_len)),
                           jnp.zeros((1, cfg.seq_len // cfg.hop_size + 2 * cfg.pad,
                                      cfg.feat_dims)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)

    mel_dir = syn_dir / ("mels" if ground_truth else "mels_gta")
    dataset = WaveRnnDataset(syn_dir / "train.txt", mel_dir, syn_dir / "audio", cfg)

    ckpt = CheckpointManager(Path(models_dir) / run_id / "ckpt_wavernn")
    tb = TrainLogger(Path(models_dir) / run_id / "logs_wavernn")
    step0, restored = ckpt.restore_latest(
        {"params": params, "batch_stats": batch_stats, "opt_state": opt_state})
    step = 1
    if step0 is not None:
        params, batch_stats, opt_state = (restored["params"], restored["batch_stats"],
                                          restored["opt_state"])
        step = step0 + 1
        print(f"Resumed WaveRNN at step {step0}")

    rng = random.Random(seed)
    loader = DataLoader(dataset, cfg.batch_size,
                        lambda b: collate_wavernn(b, cfg, rng), seed=seed)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    if mesh is not None and jax.process_count() > 1:
        params, batch_stats, opt_state = multihost.make_global(
            mesh, (params, batch_stats, opt_state))
    step_fn = make_wavernn_step(model, tx, cfg.mode, precision, remat=remat)

    t0, acc = time.time(), []
    done = False
    while not done:
        for batch in loader:
            batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch))
            params, batch_stats, opt_state, loss = step_fn(params, batch_stats,
                                                           opt_state, batch)
            acc.append(float(loss))
            if step % log_every == 0:
                dt = (time.time() - t0) / len(acc)
                print(f"step {step} | loss {np.mean(acc):.4f} | {dt*1000:.0f} ms/step")
                tb.scalars(step, **{"train/loss": float(np.mean(acc)),
                                    "train/ms_per_step": dt * 1000})
                t0, acc = time.time(), []
            if save_every and step % save_every == 0:
                ckpt.save(step, {"params": params, "batch_stats": batch_stats,
                                 "opt_state": opt_state})
                if gen_samples:
                    gen_testset({"params": params, "batch_stats": batch_stats},
                                dataset, Path(models_dir) / run_id / "samples_wavernn",
                                cfg, samples=gen_samples, step=step, tb=tb)
            step += 1
            if total_steps and step > total_steps:
                done = True
                break
        if len(loader) == 0:
            raise RuntimeError("dataset smaller than one batch")
    ckpt.save(step, {"params": params, "batch_stats": batch_stats,
                     "opt_state": opt_state}, force=True)
    return {"params": params, "batch_stats": batch_stats}
