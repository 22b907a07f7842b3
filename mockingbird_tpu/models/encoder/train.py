"""GE2E speaker-encoder trainer.

Parity with `/root/reference/models/encoder/train.py:15-123`: Adam at 1e-4,
similarity-parameter gradients scaled ×0.01 then global-norm clip 3
(`model.py:33-39`), periodic save/backup, EER reporting. TPU-first: one jitted
SPMD train step — batch sharded over the mesh 'data' axis (the loss needs all
embeddings, XLA inserts the all-gather), loss/EER on-device (the reference
computes the loss on the CPU, `train.py:27-32`).
"""
from __future__ import annotations

from functools import partial

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ...parallel import multihost
from ...parallel.mesh import make_mesh, shard_batch
from ...train.checkpoint import CheckpointManager
from ...train.logging import TrainLogger
from ...train.precision import Policy
from .dataset import SpeakerBatchSampler, SpeakerVerificationDataset
from .model import SpeakerEncoder, equal_error_rate, ge2e_loss, init_params

LEARNING_RATE_INIT = 1e-4
SPEAKERS_PER_BATCH = 64
UTTERANCES_PER_SPEAKER = 10
PARTIALS_N_FRAMES = 160


def make_train_step(model: SpeakerEncoder, tx: optax.GradientTransformation,
                    speakers_per_batch: int, utterances_per_speaker: int,
                    precision: str = "fp32"):
    policy = Policy.from_name(precision)

    def loss_fn(params, batch):
        s, u = batch.shape[:2]
        frames = batch.reshape(s * u, *batch.shape[2:])
        # LSTM runs in the compute dtype; similarity/EER math stays fp32
        embeds = policy.uncast(model.apply(
            {"params": policy.cast(params["model"])},
            policy.cast(frames))).reshape(s, u, -1)
        loss, sim = ge2e_loss(embeds, params["similarity"]["weight"], params["similarity"]["bias"])
        return loss, (sim, embeds)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        (loss, (sim, embeds)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        # reference `model.py:33-39`: scale similarity grads ×0.01 before clipping
        grads["similarity"] = jax.tree.map(lambda g: g * 0.01, grads["similarity"])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        eer = equal_error_rate(sim, speakers_per_batch, utterances_per_speaker)
        # embeds ride along for UMAP projections (`encoder/train.py:96-105`);
        # only fetched at vis steps
        return params, opt_state, loss, eer, embeds

    return train_step


def train(run_id: str, clean_data_root: Path, models_dir: Path,
          save_every: int = 500, backup_every: int = 7500,
          total_steps: Optional[int] = None,
          speakers_per_batch: int = SPEAKERS_PER_BATCH,
          utterances_per_speaker: int = UTTERANCES_PER_SPEAKER,
          learning_rate: float = LEARNING_RATE_INIT,
          force_restart: bool = False, log_every: int = 10,
          vis_every: int = 100, use_mesh: bool = True,
          precision: str = "bf16", seed: int = 0, remat: Optional[bool] = None):
    multihost.initialize_from_env()
    dataset = SpeakerVerificationDataset(Path(clean_data_root))
    # seeded: under multi-process SPMD every process must build the same
    # global batch (shard_global_batch slices per-process rows from it)
    sampler = SpeakerBatchSampler(dataset, speakers_per_batch, utterances_per_speaker,
                                  PARTIALS_N_FRAMES, seed=seed)

    if remat is None:
        # auto: past ~512-speaker batches the non-remat step exceeds 16 GB
        # HBM (hoisted LSTM projections + gate residuals); remat is
        # loss-parity identical, ~2x layer recompute in backward
        remat = speakers_per_batch * utterances_per_speaker >= 4096
    model = SpeakerEncoder(remat=remat)
    params = init_params(jax.random.PRNGKey(seed))
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(learning_rate))
    opt_state = tx.init(params)

    model_dir = Path(models_dir) / run_id
    ckpt = CheckpointManager(model_dir / "ckpt", backup_every=backup_every)
    tb = TrainLogger(model_dir / "logs")
    init_step = 1
    if not force_restart:
        step0, restored = ckpt.restore_latest({"params": params, "opt_state": opt_state})
        if step0 is not None:
            params, opt_state = restored["params"], restored["opt_state"]
            init_step = step0 + 1
            print(f"Resumed encoder run {run_id} at step {step0}")

    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    if mesh is not None and jax.process_count() > 1:
        params, opt_state = multihost.make_global(mesh, (params, opt_state))
    train_step = make_train_step(model, tx, speakers_per_batch, utterances_per_speaker,
                                 precision)

    vis_dir = model_dir / "umap"
    t0, losses, eers = time.time(), [], []
    for step, batch in enumerate(sampler, init_step):
        batch = shard_batch(mesh, jnp.asarray(batch))
        params, opt_state, loss, eer, embeds = train_step(params, opt_state, batch)
        losses.append(float(loss)); eers.append(float(eer))

        if vis_every and step % vis_every == 0:
            # UMAP/PCA projection PNG (`encoder/train.py:96-105`,
            # `visualizations.py:155-173`)
            try:
                import numpy as _np
                from ...train.visualizations import draw_projections
                vis_dir.mkdir(parents=True, exist_ok=True)
                e = _np.asarray(embeds).reshape(-1, embeds.shape[-1])
                draw_projections(e, utterances_per_speaker, step,
                                 vis_dir / f"umap_{step:06d}.png")
            except Exception:
                pass

        if step % log_every == 0:
            dt = (time.time() - t0) / log_every
            print(f"step {step} | loss {sum(losses)/len(losses):.4f} | "
                  f"EER {sum(eers)/len(eers):.4f} | {dt*1000:.0f} ms/step")
            tb.scalars(step, **{"train/loss": sum(losses) / len(losses),
                                "train/eer": sum(eers) / len(eers),
                                "train/ms_per_step": dt * 1000})
            t0, losses, eers = time.time(), [], []
        saved = save_every and step % save_every == 0
        if saved:
            ckpt.save(step, {"params": params, "opt_state": opt_state})
        if total_steps is not None and step >= total_steps:
            if not saved:
                ckpt.save(step, {"params": params, "opt_state": opt_state}, force=True)
            break
    return params
