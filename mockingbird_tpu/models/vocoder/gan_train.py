"""Shared GAN-vocoder trainer (HiFi-GAN + Fre-GAN).

Parity with `/root/reference/models/vocoder/hifigan/train.py:24-255` and
`fregan/train.py:24-246`: two AdamW optimizers (b1 0.8, b2 0.99) with
per-epoch exponential LR decay 0.999, losses L1-mel×45 + LSGAN adversarial +
feature matching with a `disc_start_step` gate, split g/do checkpoints,
periodic validation mel error. TPU-first: the reference's `mp.spawn` + NCCL
DDP (`train.py:38-40`) is replaced by one jitted SPMD step with the batch
sharded over the mesh 'data' axis; both discriminator and generator updates
run in a single compiled program per step.
"""
from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...config import Config
from ...dsp import spectrogram_vits, spec_to_mel_vits
from ...parallel import multihost
from ...parallel.mesh import make_mesh, shard_batch
from ...train.checkpoint import CheckpointManager
from ...train.logging import TrainLogger
from ...train.precision import Policy
from ..tacotron.dataset import DataLoader
from .dataset import MelDataset, collate_gan, get_dataset_filelist
from .gan_losses import (discriminator_loss, feature_loss, generator_loss,
                         multi_resolution_stft_loss)
from .fregan import FreGanDiscriminators, FreGanGenerator, fregan_config
from .hifigan import Generator as HifiGenerator, HifiganDiscriminators, hifigan_config

ARCHS = {
    "hifigan": (HifiGenerator, HifiganDiscriminators, hifigan_config),
    "fregan": (FreGanGenerator, FreGanDiscriminators, fregan_config),
}


def mel_loss_fn(wav: jax.Array, cfg) -> jax.Array:
    """On-device mel of generated audio for the L1 mel loss."""
    fmax = cfg.fmax_for_loss if getattr(cfg, "fmax_for_loss", None) else None
    spec = spectrogram_vits(wav, cfg.n_fft, cfg.hop_size, cfg.win_size)
    return spec_to_mel_vits(spec, cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, fmax)


def make_gan_step(gen, disc, tx_g, tx_d, cfg, precision: str = "fp32"):
    """One fused step: disc update on (y, ŷ.detach()), then gen update
    (`hifigan/train.py:141-172`)."""
    policy = Policy.from_name(precision)

    def gen_apply(gp, mels):
        return policy.uncast(gen.apply({"params": policy.cast(gp)},
                                       policy.cast(mels)))

    def disc_apply(dp, dstats, y_r, y_g, train):
        out = disc.apply({"params": policy.cast(dp),
                          "batch_stats": policy.cast(dstats)},
                         policy.cast(y_r), policy.cast(y_g), train,
                         mutable=["batch_stats"] if train else False)
        return policy.uncast(out)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3), static_argnums=(6,))
    def step_fn(g_params, d_vars, g_opt, d_opt, batch, step, disc_active: bool):
        mels, y = batch["mels"], batch["wavs"]
        y_mel = mel_loss_fn(y, cfg)
        d_params, d_stats = d_vars["params"], d_vars["batch_stats"]

        y_g_hat = gen_apply(g_params, mels)

        # ---- discriminator ------------------------------------------------
        def d_loss_fn(dp):
            (mpd, msd), mut = disc_apply(
                dp, d_stats, y, jax.lax.stop_gradient(y_g_hat), True)
            loss_mpd, _, _ = discriminator_loss(mpd[0], mpd[1])
            loss_msd, _, _ = discriminator_loss(msd[0], msd[1])
            return loss_mpd + loss_msd, mut["batch_stats"]

        if disc_active:
            (d_loss, d_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params)
            d_updates, d_opt = tx_d.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
        else:
            d_loss = jnp.float32(0)

        # ---- generator ----------------------------------------------------
        def g_loss_fn(gp):
            y_hat = gen_apply(gp, mels)
            if getattr(cfg, "use_stft_loss", False):
                # Fre-GAN aux loss replaces the L1 mel term
                # (`fregan/train.py:161-162`)
                sc, mag = multi_resolution_stft_loss(y_hat, y)
                loss_mel = getattr(cfg, "lambda_aux", 45.0) * (sc + mag)
            else:
                y_hat_mel = mel_loss_fn(y_hat, cfg)
                loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * 45
            if disc_active:
                (mpd, msd) = disc_apply(d_params, d_stats, y, y_hat, False)
                loss_fm = feature_loss(mpd[2], mpd[3]) + feature_loss(msd[2], msd[3])
                loss_adv_p, _ = generator_loss(mpd[1])
                loss_adv_s, _ = generator_loss(msd[1])
                total = loss_mel + loss_fm + loss_adv_p + loss_adv_s
            else:
                total = loss_mel
            return total, loss_mel

        (g_loss, loss_mel), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)
        g_updates, g_opt = tx_g.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        return g_params, {"params": d_params, "batch_stats": d_stats}, g_opt, d_opt, \
            g_loss, d_loss, loss_mel

    return step_fn


def train(run_id: str, syn_dir: Path, models_dir: Path, arch: str = "hifigan",
          fine_tuning: bool = False, total_steps: Optional[int] = None,
          save_every: int = 5000, log_every: int = 10, val_every: int = 1000,
          cfg=None, seed: int = 1234, use_mesh: bool = True,
          precision: str = "bf16"):
    multihost.initialize_from_env()
    gen_cls, disc_cls, cfg_fn = ARCHS[arch]
    cfg = Config(cfg_fn()).merge(cfg or {})
    fcfg = cfg.freeze()

    gen = gen_cls(fcfg)
    disc = disc_cls()
    key = jax.random.PRNGKey(seed)
    seg_frames = cfg.segment_size // cfg.hop_size
    g_params = gen.init(key, jnp.zeros((1, seg_frames, cfg.num_mels)))["params"]
    d_vars = dict(disc.init(key, jnp.zeros((1, cfg.segment_size)),
                            jnp.zeros((1, cfg.segment_size))))
    d_vars.setdefault("batch_stats", {})

    tx_g = optax.adamw(_lr_schedule(cfg), b1=cfg.adam_b1, b2=cfg.adam_b2)
    tx_d = optax.adamw(_lr_schedule(cfg), b1=cfg.adam_b1, b2=cfg.adam_b2)
    g_opt, d_opt = tx_g.init(g_params), tx_d.init(d_vars["params"])

    model_dir = Path(models_dir) / run_id
    ckpt = CheckpointManager(model_dir / f"ckpt_{arch}")
    tb = TrainLogger(model_dir / f"logs_{arch}")
    state_tpl = {"g": g_params, "d": d_vars, "g_opt": g_opt, "d_opt": d_opt}
    step0, restored = ckpt.restore_latest(state_tpl)
    step = 1
    if step0 is not None:
        g_params, d_vars = restored["g"], restored["d"]
        g_opt, d_opt = restored["g_opt"], restored["d_opt"]
        step = step0 + 1
        print(f"Resumed {arch} at step {step0}")

    train_files, val_files = get_dataset_filelist(syn_dir)
    dataset = MelDataset(train_files, cfg, syn_dir=syn_dir, fine_tuning=fine_tuning, seed=seed)
    loader = DataLoader(dataset, cfg.batch_size, collate_gan, seed=seed)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    if mesh is not None and jax.process_count() > 1:
        g_params, d_vars, g_opt, d_opt = multihost.make_global(
            mesh, (g_params, d_vars, g_opt, d_opt))

    # validation (`hifigan/train.py:198-244`): held-out mel error + TB audio.
    # TPU-first: fixed segment crops (one compiled program) instead of the
    # reference's variable-length batch-1 loop.
    val_dataset = MelDataset(val_files, cfg, syn_dir=syn_dir,
                             fine_tuning=fine_tuning, split=True, seed=seed)

    @jax.jit
    def val_fn(gp, mels, y):
        y_hat = gen.apply({"params": gp}, mels)
        err = jnp.mean(jnp.abs(mel_loss_fn(y, fcfg) - mel_loss_fn(y_hat, fcfg)))
        return y_hat, err

    def validate(gp, step):
        n = len(val_dataset)
        if n == 0:
            return
        b = cfg.batch_size
        n_batches = min(4, max(1, n // b))
        errs, first_audio = [], None
        for bi in range(n_batches):
            vb = collate_gan([val_dataset[(bi * b + j) % n] for j in range(b)])
            y_hat, err = val_fn(gp, jnp.asarray(vb["mels"]), jnp.asarray(vb["wavs"]))
            errs.append(float(err))
            if first_audio is None:
                first_audio = np.asarray(y_hat[0])
        tb.scalars(step, **{"val/mel_err": float(np.mean(errs))})
        tb.audio(step, "val/gen_audio", first_audio, cfg.sample_rate)
        print(f"step {step} | val mel err {np.mean(errs):.4f}")

    step_fn = make_gan_step(gen, disc, tx_g, tx_d, fcfg, precision)
    t0, accs = time.time(), []
    done = False
    while not done:
        for batch in loader:
            batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch))
            disc_active = step >= cfg.disc_start_step
            g_params, d_vars, g_opt, d_opt, g_loss, d_loss, mel_l = step_fn(
                g_params, d_vars, g_opt, d_opt, batch, jnp.asarray(step), disc_active)
            accs.append((float(g_loss), float(d_loss), float(mel_l)))

            if step % log_every == 0:
                g, d, ml = np.mean(accs, axis=0)
                dt = (time.time() - t0) / len(accs)
                print(f"step {step} | gen {g:.3f} | disc {d:.3f} | mel {ml/45:.4f} | "
                      f"{dt*1000:.0f} ms/step")
                tb.scalars(step, **{"train/gen": g, "train/disc": d,
                                    "train/mel": ml / 45, "train/ms_per_step": dt * 1000})
                t0, accs = time.time(), []
            if val_every and step % val_every == 0:
                validate(g_params, step)
            if save_every and step % save_every == 0:
                ckpt.save(step, {"g": g_params, "d": d_vars, "g_opt": g_opt, "d_opt": d_opt})
            step += 1
            if total_steps and step > total_steps:
                done = True
                break
        if len(loader) == 0:
            raise RuntimeError("dataset smaller than one batch")

    ckpt.save(step, {"g": g_params, "d": d_vars, "g_opt": g_opt, "d_opt": d_opt}, force=True)
    return {"g": g_params, "d": d_vars}


def _lr_schedule(cfg):
    """ExponentialLR per epoch ≈ smooth exponential decay per step
    (`train.py:114-118`); epoch length is data-dependent so decay is applied
    per 1000 steps for determinism."""
    return optax.exponential_decay(cfg.learning_rate, transition_steps=1000,
                                   decay_rate=cfg.lr_decay)
