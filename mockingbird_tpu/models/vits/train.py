"""VITS trainer + dataset.

Parity with `/root/reference/models/synthesizer/train_vits.py:34-393` and
`vits_dataset.py:14-262`: two AdamW optimizers (2e-4, betas 0.8/0.99,
eps 1e-9) with exponential decay, losses disc-LSGAN + gen (adv + feature-map +
mel L1×45 + KL×1 + duration), G/D checkpoints, length-bucketed batches.

TPU-first: the reference's gloo DDP + AMP GradScaler (`train_vits.py:133,197`)
become one jitted SPMD step in bf16-friendly f32 (no loss scaling needed on
TPU); `DistributedBucketSampler` becomes host-side length bucketing with
per-bucket static padded shapes (each bucket is one XLA compilation); the
monotonic-align step stays on device.
"""
from __future__ import annotations

import random
import time
from functools import partial
from pathlib import Path
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...config import Config
from ...dsp import spectrogram_vits, spec_to_mel_vits
from ...parallel import multihost
from ...parallel.mesh import make_mesh, shard_batch
from ...text import text_to_sequence
from ...train.checkpoint import CheckpointManager
from ...train.logging import TrainLogger
from ...train.precision import Policy
from ..vocoder.gan_losses import (discriminator_loss, feature_loss,
                                  generator_loss, kl_loss)
from ..vocoder.hifigan import DiscriminatorP, DiscriminatorS
from .model import Vits, init_vits, vits_config
from .modules import slice_segments

C_MEL = 45.0
C_KL = 1.0

# spec-frame-length bucket boundaries (`vits_dataset.py:171` boundaries)
BUCKET_BOUNDARIES = (32, 300, 400, 500, 600, 700, 800, 900, 1000)


class VitsDiscriminator(nn.Module):
    """DiscriminatorS + periods (2,3,5,7,11) (`vits.py:360-387`)."""
    periods = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat, train: bool = False):
        rs, gs, frs, fgs = [], [], [], []
        d = DiscriminatorS(use_spectral_norm=False, name="disc_s")
        r, fr = d(y, train)
        g, fg = d(y_hat, train)
        rs.append(r); frs.append(fr); gs.append(g); fgs.append(fg)
        for p in self.periods:
            dp = DiscriminatorP(p, name=f"disc_p{p}")
            r, fr = dp(y)
            g, fg = dp(y_hat)
            rs.append(r); frs.append(fr); gs.append(g); fgs.append(fg)
        return rs, gs, frs, fgs


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------

class VitsDataset:
    """(text-ids, linear spec, wav, sid, emo) tuples from a preprocessed
    synthesizer dir (`vits_dataset.py:14-163`). Linear specs are computed
    once and cached as .spec.npy next to the audio."""

    def __init__(self, syn_dir: Path, cfg, cleaner_names=("basic_cleaners",)):
        syn_dir = Path(syn_dir)
        self.cfg = cfg
        self.audio_dir = syn_dir / "audio"
        self.emo_dir = syn_dir / "emo"
        with (syn_dir / "train.txt").open("r", encoding="utf-8") as f:
            rows = [line.strip().split("|") for line in f if line.strip()]
        self.items = []
        speakers = {}
        for r in rows:
            if not int(r[4]):
                continue
            # speaker name is the prefix of `audio-<spk>_<utt>.npy`
            spk = r[0].split("-", 1)[-1].rsplit("_", 1)[0]
            sid = speakers.setdefault(spk, len(speakers))
            self.items.append((r[0], sid, r[5].strip()))
        self.n_speakers = max(len(speakers), 1)
        self.cleaner_names = list(cleaner_names)
        self.lengths = [self._spec_len(i) for i in range(len(self.items))]
        print(f"VITS dataset: {len(self.items)} utts, {self.n_speakers} speakers")

    def _spec_len(self, index) -> int:
        wav_fname = self.items[index][0]
        n = np.load(self.audio_dir / wav_fname, mmap_mode="r").shape[0]
        return n // self.cfg.hop_size

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        wav_fname, sid, text = self.items[index]
        wav = np.load(self.audio_dir / wav_fname).astype(np.float32)
        spec_path = self.audio_dir / (wav_fname + ".spec.npy")
        if spec_path.exists():
            spec = np.load(spec_path)
        else:
            spec = np.asarray(spectrogram_vits(
                jnp.asarray(wav), self.cfg.n_fft, self.cfg.hop_size, self.cfg.win_size),
                np.float32)
            np.save(spec_path, spec)
        emo_path = self.emo_dir / f"emo-{wav_fname.split('-', 1)[-1]}"
        if emo_path.exists():
            emo = np.load(emo_path).astype(np.float32)
        else:
            emo = np.zeros((self.cfg.emotion_channels,), np.float32)
        seq = np.asarray(text_to_sequence(text, self.cleaner_names), np.int32)
        return seq, spec, wav, sid, emo


class BucketBatcher:
    """Length-bucketed batches with static padded shapes (replacing the
    `DistributedBucketSampler`, `vits_dataset.py:166-262`).

    Multi-process: ``num_shards``/``shard_index`` give each process a strided
    subsample of every global batch (the reference's per-rank semantics,
    `vits_dataset.py:228-240`); ``batch_size`` is then the per-process size.
    Padded shapes are static per bucket (spec pad = bucket boundary, text pad
    = per-bucket max) so every process collates identical array shapes — a
    requirement for one SPMD program, unlike torch DDP."""

    def __init__(self, dataset: VitsDataset, batch_size: int,
                 boundaries=BUCKET_BOUNDARIES, seed: int = 1234,
                 num_shards: int = 1, shard_index: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.boundaries = list(boundaries)
        self.rng = random.Random(seed)
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.buckets: List[List[int]] = [[] for _ in range(len(self.boundaries) - 1)]
        for idx, length in enumerate(dataset.lengths):
            for bi in range(len(self.boundaries) - 1):
                if self.boundaries[bi] < length <= self.boundaries[bi + 1]:
                    self.buckets[bi].append(idx)
                    break
        keep = [i for i, b in enumerate(self.buckets) if b]
        self.bucket_bounds = [self.boundaries[min(i + 1, len(self.boundaries) - 1)]
                              for i in keep]
        self.buckets = [self.buckets[i] for i in keep]
        # static per-bucket text pad from metadata only (no audio IO)
        self.bucket_t_text = []
        for b in self.buckets:
            tmax = max(len(text_to_sequence(dataset.items[i][2],
                                            dataset.cleaner_names)) for i in b)
            self.bucket_t_text.append(max(32, _ceil(tmax, 16)))

    def __iter__(self):
        gbs = self.batch_size * self.num_shards
        batches = []
        for bi, bucket in enumerate(self.buckets):
            order = bucket[:]
            self.rng.shuffle(order)
            for i in range(0, len(order) - gbs + 1, gbs):
                batches.append((bi, order[i : i + gbs]))
        self.rng.shuffle(batches)
        for bi, idxs in batches:
            local = idxs[self.shard_index::self.num_shards]  # rank-strided
            yield self.collate([self.dataset[i] for i in local], bi)

    def __len__(self):
        gbs = self.batch_size * self.num_shards
        return sum(len(b) // gbs for b in self.buckets)

    def collate(self, batch, bucket_idx: int) -> dict:
        cfg = self.dataset.cfg
        t_spec = self.bucket_bounds[bucket_idx]
        t_wav = t_spec * cfg.hop_size
        t_text = self.bucket_t_text[bucket_idx]

        b = len(batch)
        texts = np.zeros((b, t_text), np.int32)
        specs = np.zeros((b, t_spec, cfg.spec_channels), np.float32)
        wavs = np.zeros((b, t_wav), np.float32)
        sids = np.zeros((b,), np.int32)
        emos = np.zeros((b, cfg.emotion_channels), np.float32)
        text_l = np.zeros((b,), np.int32)
        spec_l = np.zeros((b,), np.int32)
        for i, (seq, spec, wav, sid, emo) in enumerate(batch):
            texts[i, : len(seq)] = seq
            specs[i, : spec.shape[0]] = spec
            n = min(len(wav), t_wav)
            wavs[i, :n] = wav[:n]
            sids[i] = sid
            emos[i] = emo
            text_l[i] = len(seq)
            spec_l[i] = spec.shape[0]
        return dict(texts=texts, specs=specs, wavs=wavs, sids=sids, emos=emos,
                    text_lengths=text_l, spec_lengths=spec_l)


def _ceil(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def make_vits_step(model: Vits, disc: VitsDiscriminator, tx_g, tx_d, cfg,
                   precision: str = "fp32"):
    seg_frames = cfg.segment_size // cfg.hop_size
    policy = Policy.from_name(precision)

    def mel_of(wav):
        spec = spectrogram_vits(wav, cfg.n_fft, cfg.hop_size, cfg.win_size)
        return spec_to_mel_vits(spec, cfg.sample_rate, cfg.n_fft, cfg.num_mels,
                                cfg.fmin, cfg.fmax)

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def step_fn(g_params, d_vars, g_opt, d_opt, batch, key):
        k_model, k_drop, k_d = jax.random.split(key, 3)
        d_params = d_vars["params"]
        d_stats = d_vars.get("batch_stats", {})

        def gen_outputs(gp):
            out = model.apply(
                {"params": policy.cast(gp)}, batch["texts"], batch["text_lengths"],
                policy.cast(batch["specs"]), batch["spec_lengths"],
                batch["sids"], policy.cast(batch["emos"]),
                key=k_model, train=True, rngs={"dropout": k_drop})
            return policy.uncast(out)

        def disc_apply(dp, dstats, y_r, y_g, train):
            out = disc.apply({"params": policy.cast(dp),
                              "batch_stats": policy.cast(dstats)},
                             policy.cast(y_r), policy.cast(y_g), train,
                             mutable=["batch_stats"] if train else False)
            return policy.uncast(out)

        # full mel once; slices per ids (`train_vits.py:236-253`)
        mel_full = spec_to_mel_vits(batch["specs"], cfg.sample_rate, cfg.n_fft,
                                    cfg.num_mels, cfg.fmin, cfg.fmax)

        y_hat0, _, _, ids_slice, *_ = gen_outputs(g_params)
        y = slice_segments(batch["wavs"], ids_slice * cfg.hop_size, cfg.segment_size)

        # ---- discriminator ----
        def d_loss_fn(dp):
            (rs, gs, frs, fgs), mut = disc_apply(
                dp, d_stats, y, jax.lax.stop_gradient(y_hat0), True)
            loss, _, _ = discriminator_loss(rs, gs)
            return loss, mut.get("batch_stats", {})

        (d_loss, d_stats), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)
        d_updates, d_opt = tx_d.update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        # ---- generator ----
        def g_loss_fn(gp):
            y_hat, l_length, attn, ids, x_mask, y_mask, \
                (z, z_p, m_p, logs_p, m_q, logs_q) = gen_outputs(gp)
            y_real = slice_segments(batch["wavs"], ids * cfg.hop_size, cfg.segment_size)
            y_mel = slice_segments(mel_full, ids, seg_frames)
            y_hat_mel = mel_of(y_hat)
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * C_MEL
            loss_dur = jnp.sum(l_length)
            loss_kl = kl_loss(z_p, logs_q, m_p, logs_p, y_mask) * C_KL
            rs, gs, frs, fgs = disc_apply(d_params, d_stats, y_real, y_hat, False)
            loss_fm = feature_loss(frs, fgs)
            loss_gen, _ = generator_loss(gs)
            total = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
            return total, dict(mel=loss_mel, dur=loss_dur, kl=loss_kl,
                               fm=loss_fm, adv=loss_gen)

        (g_loss, parts), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)
        g_updates, g_opt = tx_g.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        return g_params, {"params": d_params, "batch_stats": d_stats}, \
            g_opt, d_opt, g_loss, d_loss, parts

    return step_fn


def train(run_id: str, syn_dir: Path, models_dir: Path, cfg=None,
          batch_size: int = 16, total_steps: Optional[int] = None,
          save_every: int = 2000, log_every: int = 10, eval_every: int = 1000,
          seed: int = 1234, use_mesh: bool = True, precision: str = "bf16"):
    multihost.initialize_from_env()
    cfg = Config(vits_config()).merge(cfg or {})
    dataset = VitsDataset(syn_dir, cfg)
    cfg.n_speakers = max(cfg.n_speakers, dataset.n_speakers)
    fcfg = cfg.freeze()

    model, variables = init_vits(jax.random.PRNGKey(seed), cfg.clone())
    g_params = variables["params"]
    disc = VitsDiscriminator()
    d_vars = dict(disc.init(jax.random.PRNGKey(seed + 1),
                            jnp.zeros((1, cfg.segment_size)),
                            jnp.zeros((1, cfg.segment_size))))
    d_vars.setdefault("batch_stats", {})

    sched = optax.exponential_decay(2e-4, transition_steps=1000, decay_rate=0.999875)
    tx_g = optax.adamw(sched, b1=0.8, b2=0.99, eps=1e-9)
    tx_d = optax.adamw(sched, b1=0.8, b2=0.99, eps=1e-9)
    g_opt, d_opt = tx_g.init(g_params), tx_d.init(d_vars["params"])

    ckpt = CheckpointManager(Path(models_dir) / run_id / "ckpt_vits")
    tb = TrainLogger(Path(models_dir) / run_id / "logs_vits")
    tpl = {"g": g_params, "d": d_vars, "g_opt": g_opt, "d_opt": d_opt}
    step0, restored = ckpt.restore_latest(tpl)
    step = 1
    if step0 is not None:
        g_params, d_vars = restored["g"], restored["d"]
        g_opt, d_opt = restored["g_opt"], restored["d_opt"]
        step = step0 + 1
        print(f"Resumed VITS at step {step0}")

    # multi-process: per-rank strided subsample, batch_size is the GLOBAL
    # batch (`vits_dataset.py:228-240` semantics)
    n_proc = multihost.process_count()
    assert batch_size % n_proc == 0, f"batch {batch_size} vs {n_proc} processes"
    batcher = BucketBatcher(dataset, batch_size // n_proc, seed=seed,
                            num_shards=n_proc,
                            shard_index=multihost.process_index())
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    if mesh is not None and n_proc > 1:
        g_params, d_vars, g_opt, d_opt = multihost.make_global(
            mesh, (g_params, d_vars, g_opt, d_opt))
    step_fn = make_vits_step(model, disc, tx_g, tx_d, fcfg, precision)

    # eval (`train_vits.py:342-381` evaluate): full inference on one training
    # sample, generated audio + gt/gen mel images to TensorBoard
    @jax.jit
    def _eval_infer(gp, x, xl, sid, emo, key):
        k1, k2 = jax.random.split(key)
        o, attn, y_mask, y_lengths = model.apply(
            {"params": gp}, x, xl, sid, emo, noise_scale=0.667,
            length_scale=1.0, noise_scale_w=0.8,
            max_len=cfg.get("eval_max_len", 1000), key=k1,
            method=Vits.infer, rngs={"dropout": k2})
        return o, y_lengths

    def _mel_img(m):
        m = np.asarray(m, np.float32)
        return (m - m.min()) / max(float(m.max() - m.min()), 1e-6)

    def evaluate(gp, step):
        seq, spec, wav_gt, sid, emo = dataset[0]
        t_text = _ceil(max(len(seq), 32), 16)
        x = np.zeros((1, t_text), np.int32)
        x[0, : len(seq)] = seq
        o, y_lengths = _eval_infer(
            gp, jnp.asarray(x), jnp.asarray([len(seq)], np.int32),
            jnp.asarray([sid], np.int32), jnp.asarray(emo[None]),
            jax.random.fold_in(jax.random.PRNGKey(seed), step))
        wav_hat = np.asarray(o)[0][: int(np.asarray(y_lengths)[0]) * cfg.hop_size]
        tb.audio(step, "eval/gen_audio", wav_hat, cfg.sample_rate)
        tb.audio(step, "eval/gt_audio", wav_gt, cfg.sample_rate)
        mel_gt = spec_to_mel_vits(jnp.asarray(spec[None]), cfg.sample_rate,
                                  cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)
        spec_hat = spectrogram_vits(jnp.asarray(wav_hat[None]), cfg.n_fft,
                                    cfg.hop_size, cfg.win_size)
        mel_hat = spec_to_mel_vits(spec_hat, cfg.sample_rate, cfg.n_fft,
                                   cfg.num_mels, cfg.fmin, cfg.fmax)
        tb.image(step, "eval/mel_gt", _mel_img(np.asarray(mel_gt)[0].T))
        tb.image(step, "eval/mel_gen", _mel_img(np.asarray(mel_hat)[0].T))
        print(f"step {step} | eval: generated {len(wav_hat)/cfg.sample_rate:.2f}s audio")

    t0, acc = time.time(), []
    done = False
    while not done:
        n_batches = 0
        for batch in batcher:
            n_batches += 1
            if n_proc > 1:
                batch = multihost.assemble_local_batch(mesh, batch)
            else:
                batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch))
            key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
            g_params, d_vars, g_opt, d_opt, g_loss, d_loss, parts = step_fn(
                g_params, d_vars, g_opt, d_opt, batch, key)
            acc.append((float(g_loss), float(d_loss), float(parts["mel"])))
            if step % log_every == 0:
                g, d, m = np.mean(acc, axis=0)
                dt = (time.time() - t0) / len(acc)
                print(f"step {step} | gen {g:.3f} | disc {d:.3f} | mel {m/C_MEL:.4f} "
                      f"| {dt*1000:.0f} ms/step")
                tb.scalars(step, **{"train/gen": g, "train/disc": d,
                                    "train/mel": m / C_MEL,
                                    "train/dur": float(parts["dur"]),
                                    "train/kl": float(parts["kl"]),
                                    "train/ms_per_step": dt * 1000})
                t0, acc = time.time(), []
            if eval_every and step % eval_every == 0:
                evaluate(g_params, step)
            if save_every and step % save_every == 0:
                ckpt.save(step, {"g": g_params, "d": d_vars,
                                 "g_opt": g_opt, "d_opt": d_opt})
            step += 1
            if total_steps and step > total_steps:
                done = True
                break
        if n_batches == 0:
            raise RuntimeError("no full batches; reduce batch_size")

    ckpt.save(step, {"g": g_params, "d": d_vars, "g_opt": g_opt, "d_opt": d_opt},
              force=True)
    return {"g": g_params, "d": d_vars}
