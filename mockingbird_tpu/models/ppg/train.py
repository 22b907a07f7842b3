"""One-shot VC trainer + data pipeline.

Parity with `/root/reference/models/ppg2mel/train/` (Solver scaffolding,
MaskedMSELoss mel+stop `train/loss.py:11-50`, lr-scheduled optimizer) and
`utils/data_load.py:18-215` (OneshotVcDataset joining {ppg, f0, mel, spk
d-vector} per utterance, collate padded to frames_per_step multiples with
stop targets).
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
from ...parallel import multihost
from ...parallel.mesh import make_mesh, shard_batch
from ...train.checkpoint import CheckpointManager
from ...train.logging import TrainLogger
from ..tacotron.dataset import DataLoader
from .ppg2mel import MelDecoderMOLv2, init_ppg2mel, ppg2mel_config


class OneshotVcDataset:
    """fid → (ppg, lf0_uv, mel, spk_embed) from a preprocessed VC dir
    (bnf/ f0/ embed/ mel/ + fid list files, `data_load.py:18-120`)."""

    def __init__(self, vc_dir: Path, split: str = "train"):
        vc_dir = Path(vc_dir)
        self.bnf_dir = vc_dir / "bnf"
        self.f0_dir = vc_dir / "f0"
        self.embed_dir = vc_dir / "embed"
        self.mel_dir = vc_dir / "mel"
        fid_list = vc_dir / f"{split}_fidlist.txt"
        with fid_list.open() as f:
            self.fids = [line.strip() for line in f if line.strip()]
        print(f"VC dataset [{split}]: {len(self.fids)} utterances")

    def __len__(self):
        return len(self.fids)

    def __getitem__(self, index):
        fid = self.fids[index]
        ppg = np.load(self.bnf_dir / f"{fid}.npy").astype(np.float32)
        lf0_uv = np.load(self.f0_dir / f"{fid}.npy").astype(np.float32)
        mel = np.load(self.mel_dir / f"{fid}.npy").astype(np.float32)
        embed = np.load(self.embed_dir / f"{fid}.npy").astype(np.float32)
        # align lengths (`data_load.py:137-142` tolerance trim)
        n = min(len(ppg), len(lf0_uv), len(mel))
        return ppg[:n], lf0_uv[:n], mel[:n], embed


def collate_vc(batch, frames_per_step: int = 2, down: int = 4, bucket: int = 64):
    """Pad to frames_per_step/down multiples + stop targets
    (`data_load.py` MultiSpkVcCollate)."""
    n_max = max(x[0].shape[0] for x in batch)
    lcm = int(np.lcm(frames_per_step, down))
    n_pad = ((n_max + bucket - 1) // bucket) * bucket
    n_pad = ((n_pad + lcm - 1) // lcm) * lcm
    b = len(batch)
    d_ppg = batch[0][0].shape[1]
    d_mel = batch[0][2].shape[1]
    ppgs = np.zeros((b, n_pad, d_ppg), np.float32)
    lf0s = np.zeros((b, n_pad, 2), np.float32)
    mels = np.zeros((b, n_pad, d_mel), np.float32)
    stops = np.ones((b, n_pad), np.float32)
    embeds = np.zeros((b, batch[0][3].shape[-1]), np.float32)
    lengths = np.zeros((b,), np.int32)
    for i, (ppg, lf0, mel, emb) in enumerate(batch):
        n = ppg.shape[0]
        ppgs[i, :n] = ppg
        lf0s[i, :n] = lf0
        mels[i, :n] = mel
        stops[i, : max(n - frames_per_step, 0)] = 0.0
        embeds[i] = emb
        lengths[i] = n
    return dict(ppgs=ppgs, lf0s=lf0s, mels=mels, stops=stops, embeds=embeds,
                lengths=lengths)


def masked_mse(pred, target, mask):
    return jnp.sum(((pred - target) ** 2) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_vc_step(model: MelDecoderMOLv2, tx, precision: str = "fp32"):
    from ...train.precision import Policy
    policy = Policy.from_name(precision)

    def loss_fn(params, batch_stats, batch, key):
        out, mut = model.apply(
            {"params": policy.cast(params), "batch_stats": policy.cast(batch_stats)},
            policy.cast(batch["ppgs"]), batch["lengths"],
            policy.cast(batch["mels"]), batch["lengths"],
            policy.cast(batch["lf0s"]), policy.cast(batch["embeds"]), True,
            rngs={"dropout": key}, mutable=["batch_stats"])
        out, mut = policy.uncast(out), policy.uncast(mut)
        mel, post, stop, _ = out
        from ..vits.modules import sequence_mask
        mask = sequence_mask(batch["lengths"], batch["mels"].shape[1])[..., None]
        l_mel = masked_mse(mel, batch["mels"], mask) + masked_mse(post, batch["mels"], mask)
        eps = 1e-7
        s = jnp.clip(jax.nn.sigmoid(stop), eps, 1 - eps)
        l_stop = -jnp.mean(batch["stops"] * jnp.log(s) + (1 - batch["stops"]) * jnp.log(1 - s))
        return l_mel + l_stop, (mut["batch_stats"], l_mel, l_stop)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(params, batch_stats, opt_state, batch, key):
        (loss, (stats, l_mel, l_stop)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, stats, opt_state, loss, l_mel, l_stop

    return step_fn


def make_vc_val_fn(model: MelDecoderMOLv2):
    """Eval-mode forward: masked mel MSE + attention, for the dev-split
    validation pass (`train/solver.py:13-216`, best-loss tracking
    `train_linglf02mel_seq2seq_oneshotvc.py:242-245`)."""

    @jax.jit
    def val_fn(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["ppgs"], batch["lengths"], batch["mels"], batch["lengths"],
            batch["lf0s"], batch["embeds"], False,
            rngs={"dropout": jax.random.PRNGKey(0)})
        mel, post, stop, aligns = out
        from ..vits.modules import sequence_mask
        mask = sequence_mask(batch["lengths"], batch["mels"].shape[1])[..., None]
        l_mel = masked_mse(mel, batch["mels"], mask) + masked_mse(post, batch["mels"], mask)
        return l_mel, aligns

    return val_fn


def train(run_id: str, vc_dir: Path, models_dir: Path, cfg=None,
          batch_size: int = 8, learning_rate: float = 5e-4,
          total_steps: Optional[int] = None, save_every: int = 2000,
          log_every: int = 10, val_every: int = 500, seed: int = 0,
          use_mesh: bool = True, precision: str = "bf16"):
    multihost.initialize_from_env()
    cfg = Config(ppg2mel_config()).merge(cfg or {})
    model, variables = init_ppg2mel(jax.random.PRNGKey(seed), cfg)
    params, batch_stats = variables["params"], variables["batch_stats"]

    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(optax.warmup_cosine_decay_schedule(
                         0.0, learning_rate, 1000, 500_000)))
    opt_state = tx.init(params)

    ckpt = CheckpointManager(Path(models_dir) / run_id / "ckpt_ppg2mel")
    tb = TrainLogger(Path(models_dir) / run_id / "logs_ppg2mel")
    step0, restored = ckpt.restore_latest(
        {"params": params, "batch_stats": batch_stats, "opt_state": opt_state})
    step = 1
    if step0 is not None:
        params, batch_stats, opt_state = (restored["params"], restored["batch_stats"],
                                          restored["opt_state"])
        step = step0 + 1
        print(f"Resumed ppg2mel at step {step0}")

    dataset = OneshotVcDataset(vc_dir, "train")
    down = int(np.prod(cfg.encoder_downsample_rates))
    loader = DataLoader(dataset, batch_size,
                        lambda b: collate_vc(b, cfg.frames_per_step, down), seed=seed)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    if mesh is not None and jax.process_count() > 1:
        params, batch_stats, opt_state = multihost.make_global(
            mesh, (params, batch_stats, opt_state))
    step_fn = make_vc_step(model, tx, precision)

    # dev-split validation with best-loss checkpoint + attention plot
    dev = None
    if (Path(vc_dir) / "dev_fidlist.txt").exists():
        try:
            dev = OneshotVcDataset(vc_dir, "dev")
        except Exception:
            dev = None
    val_fn = make_vc_val_fn(model)
    best_ckpt = CheckpointManager(Path(models_dir) / run_id / "ckpt_ppg2mel_best")
    best_loss = [np.inf]
    attn_dir = Path(models_dir) / run_id / "attn"

    def validate(params, batch_stats, opt_state, step):
        if dev is None or len(dev) == 0:
            return
        losses, first_attn = [], None
        n = min(len(dev), 4 * batch_size)
        for i0 in range(0, n, batch_size):
            vb = collate_vc([dev[j] for j in range(i0, min(i0 + batch_size, n))],
                            cfg.frames_per_step, down)
            l, aligns = val_fn(params, batch_stats, jax.tree.map(jnp.asarray, vb))
            losses.append(float(l))
            if first_attn is None:
                first_attn = np.asarray(aligns)[0]
        v = float(np.mean(losses))
        print(f"step {step} | dev mel loss {v:.4f}" +
              (" (best)" if v < best_loss[0] else ""))
        tb.scalars(step, **{"dev/mel": v})
        tb.alignment(step, "dev/attention", first_attn)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            attn_dir.mkdir(parents=True, exist_ok=True)
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.imshow(first_attn.T, aspect="auto", origin="lower",
                      interpolation="none")
            ax.set_xlabel("decoder step"); ax.set_ylabel("memory")
            fig.savefig(attn_dir / f"attention_{step:06d}.png", dpi=80)
            plt.close(fig)
        except Exception:
            pass
        if v < best_loss[0]:
            best_loss[0] = v
            best_ckpt.save(step, {"params": params, "batch_stats": batch_stats,
                                  "opt_state": opt_state}, force=True)

    t0, acc = time.time(), []
    done = False
    while not done:
        for batch in loader:
            batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch))
            key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
            params, batch_stats, opt_state, loss, l_mel, l_stop = step_fn(
                params, batch_stats, opt_state, batch, key)
            acc.append((float(loss), float(l_mel)))
            if step % log_every == 0:
                l, m = np.mean(acc, axis=0)
                dt = (time.time() - t0) / len(acc)
                print(f"step {step} | loss {l:.4f} | mel {m:.4f} | {dt*1000:.0f} ms/step")
                tb.scalars(step, **{"train/loss": l, "train/mel": m,
                                    "train/ms_per_step": dt * 1000})
                t0, acc = time.time(), []
            if val_every and step % val_every == 0:
                validate(params, batch_stats, opt_state, step)
            if save_every and step % save_every == 0:
                ckpt.save(step, {"params": params, "batch_stats": batch_stats,
                                 "opt_state": opt_state})
            step += 1
            if total_steps and step > total_steps:
                done = True
                break
        if len(loader) == 0:
            raise RuntimeError("dataset smaller than one batch")
    ckpt.save(step, {"params": params, "batch_stats": batch_stats,
                     "opt_state": opt_state}, force=True)
    return {"params": params, "batch_stats": batch_stats}
