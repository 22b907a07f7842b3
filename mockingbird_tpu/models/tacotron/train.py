"""Tacotron trainer: schedule-driven sessions, SPMD data parallel.

Parity with `/root/reference/models/synthesizer/train.py:26-316`:
per-session (r, lr, max_step, batch_size) schedule, losses
MSE+L1 on decoder mels + MSE on postnet + BCE on stop (`train.py:200-204`),
grad-clip 1.0, periodic checkpoint/backup and eval artifacts (attention plot +
griffin-lim wav). TPU-first: the multi-GPU `data_parallel_workaround`
(`train.py:193-195`) becomes batch sharding over the mesh 'data' axis; the
loss is computed on-device, gradients psum'd by XLA.
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

from ...config import Config, sv2tts_audio_config
from ...parallel import multihost
from ...parallel.mesh import make_mesh, shard_batch
from ...train.checkpoint import CheckpointManager
from ...train.logging import TrainLogger
from ...train.precision import Policy
from .dataset import DataLoader, SynthesizerDataset, collate_synthesizer
from .model import Tacotron, init_tacotron, tacotron_config

# (r, lr, final_step, batch_size) — reference `hparams.py:34-42`
DEFAULT_SCHEDULE = (
    (2, 1e-3, 10_000, 12), (2, 5e-4, 15_000, 12), (2, 2e-4, 20_000, 12),
    (2, 1e-4, 30_000, 12), (2, 5e-5, 40_000, 12), (2, 1e-5, 60_000, 12),
    (2, 5e-6, 160_000, 12), (2, 3e-6, 320_000, 12), (2, 1e-6, 640_000, 12),
)


def tacotron_loss(out, batch):
    """`train.py:200-204`: m1 = MSE+L1(decoder, mel); m2 = MSE(postnet, mel);
    stop BCE. Padded frames carry the silence value in the target so they
    contribute as in the reference (which does not mask)."""
    mel_out, post_out, _, stop_out = out
    mels, stop_t = batch["mels"], batch["stop"]
    m1 = jnp.mean((mel_out - mels) ** 2) + jnp.mean(jnp.abs(mel_out - mels))
    m2 = jnp.mean((post_out - mels) ** 2)
    eps = 1e-7
    s = jnp.clip(stop_out, eps, 1 - eps)
    stop_l = -jnp.mean(stop_t * jnp.log(s) + (1 - stop_t) * jnp.log(1 - s))
    return m1 + m2 + stop_l, dict(m1=m1, m2=m2, stop=stop_l)


def guided_attention_loss(attn, text_lengths, mel_lengths, r: int,
                          g: float = 0.2):
    """Guided-attention penalty (Tachibana et al. 2017, DC-TTS eq. 12):
    soft diagonal prior W[s,t] = 1 − exp(−(t/T − s/S)²/2g²) applied to the
    LSA weights over the real (step, char) region. Not in the reference —
    its training relies on alignment emerging unaided after ~18k steps
    (`/root/reference/README.md:249`); with this on (train(...,
    guided_attn_weight=0.2)) alignment typically emerges within ~1-2k steps.
    Off by default for behavioural parity."""
    b, s_max, t_max = attn.shape
    steps = jnp.ceil(mel_lengths / r).astype(jnp.float32)            # (B,)
    tl = text_lengths.astype(jnp.float32)
    s_idx = jnp.arange(s_max, dtype=jnp.float32)[None, :, None]
    t_idx = jnp.arange(t_max, dtype=jnp.float32)[None, None, :]
    sn = s_idx / jnp.maximum(steps[:, None, None], 1.0)
    tn = t_idx / jnp.maximum(tl[:, None, None], 1.0)
    w = 1.0 - jnp.exp(-((tn - sn) ** 2) / (2.0 * g * g))
    mask = ((s_idx < steps[:, None, None]) & (t_idx < tl[:, None, None]))
    # each real decoder step contributes its off-diagonal attention mass
    return jnp.sum(attn * w * mask) / jnp.maximum(jnp.sum(steps), 1.0)


def finetune_mask(params, layers):
    """Trainable-parameter mask for partial finetuning (reference
    `models/base.py:71-77` `finetune_partial`; layer names follow
    `hparams.py:50` tts_finetune_layers: encoder, encoder_proj, gst,
    decoder, postnet, post_proj). Empty ``layers`` → train everything."""
    if not layers:
        return jax.tree.map(lambda _: True, params)
    layers = set(layers)

    def mask_path(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return top in layers

    return jax.tree_util.tree_map_with_path(mask_path, params)


def make_train_step(model: Tacotron, tx, r: int, precision: str = "fp32",
                    guided_attn_weight: float = 0.0, guided_attn_g: float = 0.2):
    policy = Policy.from_name(precision)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params_state, opt_state, batch, key):
        params, batch_stats = params_state
        dk, zk = jax.random.split(key)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": policy.cast(p), "batch_stats": policy.cast(batch_stats)},
                batch["texts"], policy.cast(batch["mels"]),
                policy.cast(batch["embeds"]), r, True,
                rngs={"dropout": dk, "zoneout": zk}, mutable=["batch_stats"])
            out = policy.uncast(out)
            loss, parts = tacotron_loss(out, batch)
            if guided_attn_weight:
                g_l = guided_attention_loss(out[2], batch["text_lengths"],
                                            batch["mel_lengths"], r,
                                            guided_attn_g)
                loss = loss + guided_attn_weight * g_l
                parts = dict(parts, guided=g_l)
            # out[1] (postnet mel) rides along for eval artifacts, like the
            # reference's m2_hat (`train.py:246-265`); it costs nothing until
            # the host fetches it at an eval step
            return loss, (parts, policy.uncast(mut["batch_stats"]), out[2], out[1])

        (loss, (parts, new_stats, attn, post)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_stats), opt_state, loss, parts, attn, post

    return step_fn


def train(run_id: str, syn_dir: Path, models_dir: Path,
          schedule=DEFAULT_SCHEDULE, save_every: int = 1000,
          backup_every: int = 25_000, log_every: int = 10,
          eval_every: int = 500, force_restart: bool = False,
          total_steps: Optional[int] = None, use_mesh: bool = True,
          cfg=None, audio_cfg=None, seed: int = 0, finetune_layers=(),
          precision: str = "bf16", guided_attn_weight: float = 0.0):
    multihost.initialize_from_env()
    syn_dir = Path(syn_dir)
    cfg = cfg or tacotron_config()
    audio_cfg = audio_cfg or sv2tts_audio_config()

    dataset = SynthesizerDataset(syn_dir / "train.txt", syn_dir / "mels", syn_dir / "embeds")
    model, variables = init_tacotron(jax.random.PRNGKey(seed), cfg)
    params, batch_stats = variables["params"], variables["batch_stats"]

    model_dir = Path(models_dir) / run_id
    model_dir.mkdir(parents=True, exist_ok=True)
    Config(cfg).to_json(model_dir / "config.json")  # sidecar (`train.py:78-83`)
    ckpt = CheckpointManager(model_dir / "ckpt", backup_every=backup_every)
    tb = TrainLogger(model_dir / "logs")

    step = 1
    opt_state_tpl = None
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    eval_dir = model_dir / "eval"
    eval_dir.mkdir(exist_ok=True)

    for session_i, (r, lr, max_step, batch_size) in enumerate(schedule):
        if step >= max_step:
            continue
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adam(lr, b1=0.9, b2=0.999))
        if finetune_layers:
            tx = optax.chain(tx, optax.masked(
                optax.set_to_zero(),
                jax.tree.map(lambda t: not t, finetune_mask(params, finetune_layers))))
        opt_state = tx.init(params)
        if not force_restart and opt_state_tpl is None:
            step0, restored = ckpt.restore_latest(
                {"params": params, "batch_stats": batch_stats, "opt_state": opt_state})
            if step0 is not None:
                params, batch_stats = restored["params"], restored["batch_stats"]
                opt_state = restored["opt_state"]
                step = step0 + 1
                print(f"Resumed {run_id} at step {step0}")
            opt_state_tpl = True
            if step >= max_step:
                continue

        if mesh is not None and batch_size % mesh.shape["data"] != 0:
            batch_size = max(mesh.shape["data"],
                             batch_size - batch_size % mesh.shape["data"])
        loader = DataLoader(dataset, batch_size,
                            partial(collate_synthesizer, r=r,
                                    max_abs_value=audio_cfg.max_abs_value), seed=seed)
        if mesh is not None and jax.process_count() > 1:
            params, batch_stats, opt_state = multihost.make_global(
                mesh, (params, batch_stats, opt_state))
        step_fn = make_train_step(model, tx, r, precision,
                                  guided_attn_weight=guided_attn_weight)
        print(f"Session {session_i}: r={r} lr={lr} batch={batch_size} until step {max_step}")

        t0, loss_acc = time.time(), []
        done = False
        while not done:
            for batch in loader:
                batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch))
                key = jax.random.fold_in(jax.random.PRNGKey(seed), step)
                (params, batch_stats), opt_state, loss, parts, attn, post = step_fn(
                    (params, batch_stats), opt_state, batch, key)
                loss_acc.append(float(loss))

                if step % log_every == 0:
                    dt = (time.time() - t0) / log_every
                    print(f"step {step} | loss {np.mean(loss_acc):.4f} | {dt*1000:.0f} ms/step")
                    tb.scalars(step, **{"train/loss": np.mean(loss_acc),
                                        "train/m1": float(parts["m1"]),
                                        "train/m2": float(parts["m2"]),
                                        "train/stop": float(parts["stop"]),
                                        "train/ms_per_step": dt * 1000})
                    t0, loss_acc = time.time(), []
                if save_every and step % save_every == 0:
                    ckpt.save(step, {"params": params, "batch_stats": batch_stats,
                                     "opt_state": opt_state})
                if eval_every and step % eval_every == 0:
                    _save_eval_artifacts(eval_dir, step, batch, attn, post,
                                         audio_cfg, tb=tb, loss=float(loss))
                    tb.alignment(step, "train/attention", np.asarray(attn)[0].T)
                step += 1
                if step >= max_step or (total_steps and step > total_steps):
                    done = True
                    break
            if len(loader) == 0:
                raise RuntimeError("dataset smaller than one batch")
        if total_steps and step > total_steps:
            break

    ckpt.save(step, {"params": params, "batch_stats": batch_stats, "opt_state": opt_state},
              force=True)
    return {"params": params, "batch_stats": batch_stats}


def _save_eval_artifacts(eval_dir: Path, step: int, batch, attn, post=None,
                         audio_cfg=None, tb=None, loss: float = 0.0):
    """Eval artifacts for sample 0 of the training batch, mirroring
    `eval_model` (`train.py:240-277, 286-316`): attention PNG, predicted-mel
    .npy, Griffin-Lim wav, and predicted-vs-target mel plot (+ TensorBoard)."""
    a0 = np.asarray(attn)[0]
    try:
        # raw attention + text length, for alignment-quality analysis
        # (scripts/attention_run.py diagonality metric)
        t_len = int((np.asarray(batch["texts"])[0] != 0).sum())
        m_len = int(np.asarray(batch.get("mel_lengths", [a0.shape[0]]))[0])
        np.savez(eval_dir / f"attention_{step:06d}.npz", attn=a0,
                 text_len=t_len, mel_len=m_len)
    except Exception:
        pass
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        a = a0
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.imshow(a.T, aspect="auto", origin="lower", interpolation="none")
        ax.set_xlabel("decoder step"); ax.set_ylabel("char")
        fig.savefig(eval_dir / f"attention_{step:06d}.png", dpi=80)
        plt.close(fig)
    except Exception:
        pass
    if post is None or audio_cfg is None:
        return
    try:
        from ...dsp import inv_mel_spectrogram, save_wav

        m_len = int(np.asarray(batch["mel_lengths"])[0])
        pred = np.asarray(post)[0][:m_len]                   # (T, M)
        target = np.asarray(batch["mels"])[0][:m_len]
        np.save(eval_dir / f"mel-prediction-step-{step:06d}.npy", pred,
                allow_pickle=False)

        wav = np.asarray(inv_mel_spectrogram(jnp.asarray(pred), audio_cfg))
        save_wav(wav, eval_dir / f"step-{step:06d}-wave-from-mel.wav",
                 audio_cfg.sample_rate)

        import matplotlib.pyplot as plt
        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
        ax1.imshow(target.T, aspect="auto", origin="lower", interpolation="none")
        ax1.set_title(f"target | step {step} loss {loss:.4f}")
        ax2.imshow(pred.T, aspect="auto", origin="lower", interpolation="none")
        ax2.set_title("predicted")
        fig.savefig(eval_dir / f"step-{step:06d}-mel-spectrogram.png", dpi=80)
        plt.close(fig)

        if tb is not None:
            tb.audio(step, "eval/griffin_lim", wav, audio_cfg.sample_rate)
            tb.image(step, "eval/mel_predicted",
                     (pred.T - pred.min()) / max(pred.max() - pred.min(), 1e-6))
    except Exception:
        pass


def run_gta_synthesis(run_id: str, syn_dir: Path, models_dir: Path, r: int = 2,
                      batch_size: int = 16, cfg=None, seed: int = 0):
    """Ground-truth-aligned mel synthesis for vocoder fine-tuning
    (`models/synthesizer/synthesize.py:12-96`): teacher-forced eval-mode
    forward over the training set, writes mels_gta/ + synthesized.txt."""
    syn_dir = Path(syn_dir)
    cfg = cfg or tacotron_config()
    model, variables = init_tacotron(jax.random.PRNGKey(seed), cfg)
    ckpt = CheckpointManager(Path(models_dir) / run_id / "ckpt")
    # opt_state template must match the trainer's optimizer structure
    tx_tpl = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    step0, restored = ckpt.restore_latest(
        {"params": variables["params"], "batch_stats": variables["batch_stats"],
         "opt_state": tx_tpl.init(variables["params"])})
    if step0 is not None:
        variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
        print(f"GTA with checkpoint step {step0}")

    dataset = SynthesizerDataset(syn_dir / "train.txt", syn_dir / "mels", syn_dir / "embeds")
    loader = DataLoader(dataset, batch_size, partial(collate_synthesizer, r=r),
                        shuffle=False, drop_last=False, seed=seed)
    out_dir = syn_dir / "mels_gta"
    out_dir.mkdir(exist_ok=True)

    @jax.jit
    def fwd(batch, key):
        dk, zk = jax.random.split(key)
        out = model.apply(variables, batch["texts"], batch["mels"], batch["embeds"],
                          r, False, rngs={"dropout": dk, "zoneout": zk})
        return out[0]

    meta_lines = []
    for bi, batch in enumerate(loader):
        mels = np.asarray(fwd(jax.tree.map(jnp.asarray, batch),
                              jax.random.fold_in(jax.random.PRNGKey(seed), bi)))
        for j, di in enumerate(batch["indices"]):
            length = int(batch["mel_lengths"][j])
            fname = Path(dataset.mel_fpaths[int(di)]).name
            np.save(out_dir / fname, mels[j, :length].T)  # store (M, T) like ref
            meta_lines.append(fname)
    with (syn_dir / "synthesized.txt").open("w") as f:
        f.write("\n".join(meta_lines))
    print(f"Wrote {len(meta_lines)} GTA mels to {out_dir}")
