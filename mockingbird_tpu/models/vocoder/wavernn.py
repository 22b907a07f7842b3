"""WaveRNN (fatchord alternating) vocoder, TPU-native.

Parity with `/root/reference/models/vocoder/wavernn/models/fatchord_version.py`
(MelResNet + Stretch2d upsampler, 2×GRU + 3×FC → 512-class RAW softmax or MOL
head, batched fold/overlap generation with equal-power crossfade, mu-law +
de-emphasis) and `wavernn/hparams.py` (rnn 512, fc 512, bits 9, pad 2,
res_blocks 10, target 8000 / overlap 400).

TPU-first: the sample-by-sample generation loop (`fatchord_version.py:190-234`)
runs as ONE jitted `lax.scan` over the folded batch — every per-step matmul is
batched across folds, so a long utterance keeps the MXU busy; sampling uses
the on-device PRNG. Default upsample factors are (4, 8, 8) to factorise the
SV2TTS hop 256 (the reference ships (5, 5, 8)=200, which its own trainer
asserts against hop — both are supported via config).
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from ...dsp import decode_mu_law, inv_preemphasis_np
from ...train.checkpoint import load_single
from .distribution import sample_from_discretized_mix_logistic


def wavernn_config() -> Config:
    return Config(
        mode="RAW",                # 'RAW' (9-bit softmax) or 'MOL'
        bits=9,
        mu_law=True,
        rnn_dims=512,
        fc_dims=512,
        pad=2,
        upsample_factors=[4, 8, 8],   # factorises hop 256 (see module docstring)
        feat_dims=80,
        compute_dims=128,
        res_out_dims=128,
        res_blocks=10,
        hop_size=256,
        sample_rate=16000,
        seq_len=256 * 5,
        batch_size=100,
        learning_rate=1e-4,
        gen_batched=True,
        gen_target=8000,
        gen_overlap=400,
        apply_preemphasis=True,
        preemphasis=0.97,
        mel_max_abs_value=4.0,
    )


class ResBlock(nn.Module):
    """1×1 conv + BN residual block (`fatchord_version.py:9-24`)."""
    dims: int

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        x = nn.Conv(self.dims, (1,), use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.dims, (1,), use_bias=False, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(x)
        return x + residual


class MelResNet(nn.Module):
    """k=2*pad+1 valid conv + res stack (`fatchord_version.py:27-44`).
    Consumes ``pad`` frames each side: (B, T, M) → (B, T-2*pad, res_out)."""
    cfg: Any

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.cfg
        k = c.pad * 2 + 1
        x = nn.Conv(c.compute_dims, (k,), padding="VALID", use_bias=False, name="conv_in")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(x)
        x = nn.relu(x)
        for i in range(c.res_blocks):
            x = ResBlock(c.compute_dims, name=f"res_{i}")(x, train)
        return nn.Conv(c.res_out_dims, (1,), name="conv_out")(x)


class UpsampleNetwork(nn.Module):
    """Stretch + box-init smoothing convs for mel; nearest-stretch for aux
    (`fatchord_version.py:47-85`). (B, T, M) → (B, (T-2p)*hop, M), aux same T."""
    cfg: Any

    @nn.compact
    def __call__(self, m, train: bool):
        c = self.cfg
        total = int(np.prod(c.upsample_factors))
        indent = c.pad * total

        aux = MelResNet(c, name="resnet")(m, train)        # (B, T-2p, res_out)
        aux = jnp.repeat(aux, total, axis=1)                # nearest stretch

        x = m[..., None]  # (B, T, M, 1) — treat like NHWC with W=M
        for i, scale in enumerate(c.upsample_factors):
            x = jnp.repeat(x, scale, axis=1)
            k = scale * 2 + 1
            conv = nn.Conv(1, (k, 1), padding=((scale, scale), (0, 0)), use_bias=False,
                           kernel_init=nn.initializers.constant(1.0 / k),
                           name=f"up_conv_{i}")
            x = conv(x)
        x = x[..., 0][:, indent:-indent, :]
        return x, aux


class WaveRNN(nn.Module):
    """Core net. Training: full sequences through GRU layers; generation uses
    `step` with explicit hidden state (same params)."""
    cfg: Any

    def setup(self):
        c = self.cfg
        self.n_classes = 2 ** c.bits if c.mode == "RAW" else 30
        self.aux_dims = c.res_out_dims // 4
        self.upsample = UpsampleNetwork(c, name="upsample")
        self.I = nn.Dense(c.rnn_dims, name="I")
        # remat=True (training only): recompute each GRU step's gate
        # activations in the backward pass instead of storing (B, T, ·)
        # residuals for the whole sequence — with the chunked head loss in
        # `wavernn_train.make_wavernn_step(remat=True)` this makes batch
        # 256+ fit on one chip (VERDICT r4 Next #6). nn.remat keeps the
        # parameter tree identical, so checkpoints interchange freely.
        cell_cls = (nn.remat(nn.GRUCell, prevent_cse=False)
                    if self.cfg.get("remat", False) else nn.GRUCell)
        # unroll: k GRU steps per loop iteration of the (fwd and transposed
        # bwd) scan — the backward pass is loop-overhead bound; unrolling
        # fuses the small per-step kernels and batches grad-accumulator HBM
        # round-trips (same lever as the Tacotron decoder). Measured on one
        # v5e chip: 126->120 ms/step at batch 100, 266->192 ms at batch 256
        # on the remat path (MFU 15.1 -> 20.9%).
        unroll = c.get("scan_unroll", 4)
        self.rnn1 = nn.RNN(cell_cls(c.rnn_dims), name="rnn1", unroll=unroll)
        self.rnn2 = nn.RNN(cell_cls(c.rnn_dims), name="rnn2", unroll=unroll)
        self.fc1 = nn.Dense(c.fc_dims, name="fc1")
        self.fc2 = nn.Dense(c.fc_dims, name="fc2")
        self.fc3 = nn.Dense(self.n_classes, name="fc3")

    def features(self, x, mels, train: bool = True):
        """Everything before the FC head: x (B, T) float in [-1,1];
        mels (B, T/hop + 2*pad, M) → (h (B, T, rnn), a3, a4). Split from
        `__call__` so the remat trainer can apply `head` in checkpointed
        time chunks without materialising (B, T, n_classes) logits."""
        d = self.aux_dims
        mels_up, aux = self.upsample(mels, train)
        a1, a2, a3, a4 = (aux[..., i * d:(i + 1) * d] for i in range(4))

        inp = jnp.concatenate([x[..., None], mels_up, a1], axis=-1)
        h = self.I(inp)
        res = h
        h = self.rnn1(h)
        h = h + res
        res = h
        h2 = self.rnn2(jnp.concatenate([h, a2], axis=-1))
        h = h2 + res
        return h, a3, a4

    def head(self, h, a3, a4):
        """FC head: (·, rnn) + aux → (·, n_classes) logits."""
        h = nn.relu(self.fc1(jnp.concatenate([h, a3], axis=-1)))
        h = nn.relu(self.fc2(jnp.concatenate([h, a4], axis=-1)))
        return self.fc3(h)

    def __call__(self, x, mels, train: bool = True):
        """x (B, T) float in [-1,1]; mels (B, T/hop + 2*pad, M) →
        logits (B, T, n_classes) (`fatchord_version.py:117-151`)."""
        h, a3, a4 = self.features(x, mels, train)
        return self.head(h, a3, a4)

    # -- generation primitives ---------------------------------------------

    def upsample_features(self, mels):
        """Eval-mode conditioning features for generation."""
        return self.upsample(mels, False)

    def gen_step(self, x, m_t, a1_t, a2_t, a3_t, a4_t, h1, h2):
        """One AR sample step (`fatchord_version.py:190-215`). All (B, ·)."""
        u = self.I(jnp.concatenate([x[:, None], m_t, a1_t], axis=1))
        h1, _ = self.rnn1.cell(h1, u)
        u = u + h1
        h2, _ = self.rnn2.cell(h2, jnp.concatenate([u, a2_t], axis=1))
        u = u + h2
        u = nn.relu(self.fc1(jnp.concatenate([u, a3_t], axis=1)))
        u = nn.relu(self.fc2(jnp.concatenate([u, a4_t], axis=1)))
        return self.fc3(u), h1, h2


# ---------------------------------------------------------------------------
# Fold / crossfade-unfold (`fatchord_version.py:288-402`)
# ---------------------------------------------------------------------------

def fold_with_overlap(x: np.ndarray, target: int, overlap: int) -> np.ndarray:
    """(1, T, C) → (num_folds, target + 2*overlap, C)."""
    _, total_len, features = x.shape
    num_folds = (total_len - overlap) // (target + overlap)
    extended_len = num_folds * (overlap + target) + overlap
    remaining = total_len - extended_len
    if remaining != 0:
        num_folds += 1
        padding = target + 2 * overlap - remaining
        x = np.pad(x, ((0, 0), (0, padding), (0, 0)))
    folded = np.zeros((num_folds, target + 2 * overlap, features), x.dtype)
    for i in range(num_folds):
        start = i * (target + overlap)
        folded[i] = x[0, start : start + target + 2 * overlap]
    return folded


def xfade_and_unfold(y: np.ndarray, overlap: int) -> np.ndarray:
    """(num_folds, target + 2*overlap) → (total,) with equal-power crossfade."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    total_len = num_folds * (target + overlap) + overlap

    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = np.linspace(-1, 1, fade_len, dtype=np.float64)
    fade_in = np.concatenate([np.zeros(silence_len), np.sqrt(0.5 * (1 + t))])
    fade_out = np.concatenate([np.sqrt(0.5 * (1 - t)), np.zeros(silence_len)])

    y = y.astype(np.float64).copy()
    y[:, :overlap] *= fade_in
    y[:, -overlap:] *= fade_out

    unfolded = np.zeros(total_len)
    for i in range(num_folds):
        start = i * (target + overlap)
        unfolded[start : start + length] += y[i]
    return unfolded


# ---------------------------------------------------------------------------
# Inference wrapper
# ---------------------------------------------------------------------------

class WaveRnnVocoder:
    """mel (M, T) ±4-normalised → waveform; reference surface
    (`wavernn/inference.py:8-64`)."""

    def __init__(self, model_fpath: Optional[Union[str, Path]] = None,
                 cfg=None, verbose: bool = True, seed: int = 0,
                 variables: Optional[dict] = None):
        self.cfg = Config(wavernn_config()).merge(cfg or {})
        fcfg = self.cfg.freeze()
        self.model = WaveRNN(fcfg)
        total = int(np.prod(self.cfg.upsample_factors))
        assert total == self.cfg.hop_size, \
            f"upsample factors {self.cfg.upsample_factors} must factorise hop {self.cfg.hop_size}"
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 2 * self.cfg.hop_size)),
                jnp.zeros((1, 2 + 2 * self.cfg.pad, self.cfg.feat_dims)))
        self.variables = variables
        self._fn_cache: dict = {}   # per-instance: jitted programs close over
        self._packed_w = None       # self.variables; load() must clear both
        if model_fpath is not None and Path(model_fpath).exists():
            self.load(model_fpath, verbose=verbose)
        elif verbose:
            print("WaveRNN: fresh (untrained) weights")

    def load(self, model_fpath: Union[str, Path], verbose: bool = True):
        """(Re)load weights, invalidating every cached compiled program —
        the jitted sampling closures capture ``self.variables``, so hot-swap
        without invalidation would silently keep sampling with stale weights."""
        loaded = load_single(model_fpath)
        self.variables = {
            "params": jax.tree.map(jnp.asarray, loaded["params"]),
            "batch_stats": jax.tree.map(jnp.asarray, loaded["batch_stats"])}
        self._fn_cache.clear()
        self._packed_w = None
        if verbose:
            print(f"Loaded WaveRNN from {model_fpath}")

    def _fused_pallas_fn(self, t_up: int, target: int, overlap: int,
                         greedy: bool = False, interpret: bool = False):
        key = ("fused", t_up, target, overlap, greedy, interpret)
        if key in self._fn_cache:
            return self._fn_cache[key]
        out = self._build_fused_pallas_fn(t_up, target, overlap, greedy, interpret)
        self._fn_cache[key] = out
        return out

    def _build_fused_pallas_fn(self, t_up: int, target: int, overlap: int,
                               greedy: bool = False, interpret: bool = False):
        """One jitted program: upsample → fold (device gather) → Pallas
        sampling kernel. Nothing but the sampled labels ever crosses the
        device→host link — the r1 path fetched the full upsampled
        conditioning (~13 MB/audio-second) to fold on host, which at tunnel
        bandwidth capped WaveRNN at ~1.7× realtime despite a ~30 µs/step
        kernel. Fused, the same kernel sustains >100× realtime."""
        from ...ops.wavernn_sample import wavernn_sample_pallas

        model, variables, cfg = self.model, self.variables, self.cfg
        n_classes = 2 ** cfg.bits
        packed = self._packed_weights()
        width = target + 2 * overlap
        num_folds = max((t_up - overlap) // (target + overlap), 0)
        extended = num_folds * (overlap + target) + overlap
        if t_up - extended > 0:
            num_folds += 1
        starts = np.arange(num_folds) * (target + overlap)
        idx = starts[:, None] + np.arange(width)[None, :]    # (F, width)

        @jax.jit
        def run(mel_p, seed):
            # mel_p (B, T+2p, M): all B utterances' folds ride ONE kernel —
            # the sampler's wall time is set by the sequential fold width,
            # near-flat in fold count, so batching utterances multiplies
            # throughput instead of serialising per-utterance programs
            mels_up, aux = model.apply(variables, mel_p,
                                       method=WaveRNN.upsample_features)
            pad = max(starts[-1] + width - t_up, 0) if num_folds else 0
            mels_up = jnp.pad(mels_up, ((0, 0), (0, pad), (0, 0)))
            aux = jnp.pad(aux, ((0, 0), (0, pad), (0, 0)))
            b = mels_up.shape[0]
            mels_f = mels_up[:, idx].reshape(b * num_folds, width,
                                             mels_up.shape[-1])
            aux_f = aux[:, idx].reshape(b * num_folds, width, aux.shape[-1])
            labels = wavernn_sample_pallas(packed, mels_f, aux_f, seed,
                                           n_classes, greedy=greedy,
                                           interpret=interpret,
                                           chunk=64 if interpret else 0)
            return labels.reshape(b, num_folds, -1)

        return run, num_folds

    def _packed_weights(self):
        if self._packed_w is None:
            from ...ops.wavernn_sample import pack_wavernn_weights
            self._packed_w = pack_wavernn_weights(self.variables["params"])
        return self._packed_w

    def _gen_fn(self, num_folds: int, seq_len: int, greedy: bool = False):
        key = ("gen", num_folds, seq_len, greedy)
        if key in self._fn_cache:
            return self._fn_cache[key]
        out = self._build_gen_fn(num_folds, seq_len, greedy)
        self._fn_cache[key] = out
        return out

    def _build_gen_fn(self, num_folds: int, seq_len: int, greedy: bool = False):
        model, variables, cfg = self.model, self.variables, self.cfg
        mode = cfg.mode
        n_classes = 2 ** cfg.bits if mode == "RAW" else 30

        @jax.jit
        def gen(mels_folded, aux_folded, key):
            b = mels_folded.shape[0]
            d = cfg.res_out_dims // 4
            auxs = tuple(aux_folded[..., i * d:(i + 1) * d] for i in range(4))

            def body(carry, inp):
                x, h1, h2, key = carry
                m_t, a1, a2, a3, a4 = inp
                logits, h1, h2 = model.apply(
                    variables, x, m_t, a1, a2, a3, a4, h1, h2,
                    method=WaveRNN.gen_step)
                key, sub = jax.random.split(key)
                if mode == "RAW":
                    if greedy:
                        sample_cls = jnp.argmax(logits, axis=-1)
                    else:
                        sample_cls = jax.random.categorical(sub, logits, axis=-1)
                    sample = 2.0 * sample_cls.astype(jnp.float32) / (n_classes - 1.0) - 1.0
                else:
                    sample = sample_from_discretized_mix_logistic(
                        sub, logits[:, None, :])[:, 0]
                return (sample, h1, h2, key), sample

            z = jnp.zeros((b, cfg.rnn_dims))
            init = (jnp.zeros((b,)), z, z, key)
            xs = (jnp.swapaxes(mels_folded, 0, 1),
                  *(jnp.swapaxes(a, 0, 1) for a in auxs))
            _, samples = jax.lax.scan(body, init, xs)
            return jnp.swapaxes(samples, 0, 1)  # (B, T)

        return gen

    def infer_waveform(self, mel: np.ndarray, normalize: bool = True,
                       batched: Optional[bool] = None,
                       target: Optional[int] = None, overlap: Optional[int] = None,
                       seed: int = 0, use_pallas: Optional[bool] = None,
                       greedy: bool = False, interpret: bool = False,
                       fuse: bool = True) -> np.ndarray:
        cfg = self.cfg
        batched = cfg.gen_batched if batched is None else batched
        if use_pallas is None:
            use_pallas = (cfg.mode == "RAW"
                          and jax.default_backend() not in ("cpu",))
        # TPU sweet spot: shorter folds trade VMEM batch parallelism for a
        # shorter sequential scan — measured ~2x over the reference's
        # 8000/400 (`wavernn/hparams.py:43-44`) on a v5e chip
        if use_pallas:
            target = target or cfg.get("gen_target_tpu", 2000)
            overlap = overlap or cfg.get("gen_overlap_tpu", 200)
        else:
            target = target or cfg.gen_target
            overlap = overlap or cfg.gen_overlap

        mel = np.asarray(mel, np.float32)
        if mel.shape[0] == cfg.feat_dims:
            mel = mel.T  # (T, M)
        if normalize:
            mel = mel / cfg.mel_max_abs_value  # ±4 → ±1 (`wavernn/inference.py:60-61`)
        wave_len = (mel.shape[0] - 1) * cfg.hop_size

        mel_p = np.pad(mel, ((cfg.pad, cfg.pad), (0, 0)))[None]  # (1, T+2p, M)

        if use_pallas and cfg.mode == "RAW" and batched and fuse:
            # fused on-device path: upsample → fold → VMEM sampling kernel in
            # one jitted program; only the (F, width) int32 labels come back.
            # Mel length is bucketed (edge-padded to a 100-frame multiple;
            # the surplus audio falls past wave_len and is trimmed below) so
            # serving compiles one program per ~1.6 s bucket, not one per
            # utterance length.
            bucket = 100
            t0_frames = mel.shape[0]
            t_bucket = max(bucket, ((t0_frames + bucket - 1) // bucket) * bucket)
            mel_b = (np.pad(mel, ((0, t_bucket - t0_frames), (0, 0)), mode="edge")
                     if t_bucket != t0_frames else mel)
            mel_bp = np.pad(mel_b, ((cfg.pad, cfg.pad), (0, 0)))[None]
            t_up = t_bucket * cfg.hop_size
            run, num_folds = self._fused_pallas_fn(t_up, target, overlap, greedy,
                                                   interpret)
            labels = run(jnp.asarray(mel_bp), seed)[0]
            samples = (2.0 * np.asarray(labels, np.float64)
                       / (2 ** cfg.bits - 1.0) - 1.0)
        else:
            mels_up, aux = jax.jit(functools.partial(
                self.model.apply, self.variables,
                method=WaveRNN.upsample_features))(jnp.asarray(mel_p))
            mels_up, aux = np.asarray(mels_up), np.asarray(aux)

            if batched:
                mels_f = fold_with_overlap(mels_up, target, overlap)
                aux_f = fold_with_overlap(aux, target, overlap)
            else:
                mels_f, aux_f = mels_up, aux

            if use_pallas and cfg.mode == "RAW":
                from ...ops.wavernn_sample import wavernn_sample_pallas
                labels = wavernn_sample_pallas(
                    self._packed_weights(), jnp.asarray(mels_f),
                    jnp.asarray(aux_f), seed, 2 ** cfg.bits, greedy=greedy,
                    interpret=interpret, chunk=64 if interpret else 0)
                samples = (2.0 * np.asarray(labels, np.float64)
                           / (2 ** cfg.bits - 1.0) - 1.0)
            else:
                gen = self._gen_fn(mels_f.shape[0], mels_f.shape[1], greedy)
                samples = np.asarray(gen(jnp.asarray(mels_f), jnp.asarray(aux_f),
                                         jax.random.PRNGKey(seed)), np.float64)

        return self._finalize(samples, overlap, wave_len, batched)

    def _finalize(self, samples: np.ndarray, overlap: int, wave_len: int,
                  batched: bool = True) -> np.ndarray:
        """Crossfade-unfold + mu-law decode + de-emphasis + trim + fade-out
        (`fatchord_version.py:245-253`)."""
        cfg = self.cfg
        output = xfade_and_unfold(samples, overlap) if batched else samples[0]
        if cfg.mu_law and cfg.mode == "RAW":
            output = decode_mu_law(output, 2 ** cfg.bits, False)
        if cfg.apply_preemphasis:
            output = inv_preemphasis_np(output, cfg.preemphasis)
        output = output[:wave_len]
        fade = min(len(output), 20 * cfg.hop_size)
        output[-fade:] *= np.linspace(1, 0, fade)
        return output.astype(np.float32)

    def infer_waveform_batch(self, mels, normalize: bool = True,
                             target: Optional[int] = None,
                             overlap: Optional[int] = None, seed: int = 0,
                             greedy: bool = False, interpret: bool = False,
                             max_lanes: int = 256) -> list:
        """Batch of mels → list of waveforms via ONE fused program per group:
        every utterance's folds are packed into the same Pallas kernel call
        (the sampler's wall time is the sequential fold width, near-flat in
        fold count), instead of one serial program per utterance — measured
        ~4× e2e over per-utterance calls at batch 8 on a v5e chip.

        Utterances are edge-padded to the longest mel's 100-frame bucket so
        the group shares one compiled program; `max_lanes` caps folds per
        kernel call (VMEM scratch + conditioning streaming)."""
        cfg = self.cfg
        use_pallas = (cfg.mode == "RAW" and cfg.gen_batched
                      and (interpret or jax.default_backend() not in ("cpu",)))
        if not use_pallas:
            return [self.infer_waveform(m, normalize=normalize, target=target,
                                        overlap=overlap, seed=seed, greedy=greedy)
                    for m in mels]
        target = target or cfg.get("gen_target_tpu", 2000)
        overlap = overlap or cfg.get("gen_overlap_tpu", 200)

        preps, wave_lens = [], []
        for mel in mels:
            mel = np.asarray(mel, np.float32)
            if mel.shape[0] == cfg.feat_dims:
                mel = mel.T
            if normalize:
                mel = mel / cfg.mel_max_abs_value
            preps.append(mel)
            wave_lens.append((mel.shape[0] - 1) * cfg.hop_size)

        bucket = 100
        t_bucket = max(bucket, int(np.ceil(max(m.shape[0] for m in preps)
                                           / bucket)) * bucket)
        stacked = np.stack([
            np.pad(np.pad(m, ((0, t_bucket - m.shape[0]), (0, 0)), mode="edge"),
                   ((cfg.pad, cfg.pad), (0, 0)))
            for m in preps])                                 # (B, T+2p, M)
        t_up = t_bucket * cfg.hop_size
        run, num_folds = self._fused_pallas_fn(t_up, target, overlap, greedy,
                                               interpret)
        group = max(1, max_lanes // max(num_folds, 1))
        pending = []
        for i in range(0, len(preps), group):
            pending.append(run(jnp.asarray(stacked[i : i + group]), seed + i))
        out = []
        for labels_dev in pending:
            labels = np.asarray(labels_dev, np.float64)      # (g, F, width)
            for b in range(labels.shape[0]):
                samples = 2.0 * labels[b] / (2 ** cfg.bits - 1.0) - 1.0
                out.append(self._finalize(samples, overlap,
                                          wave_lens[len(out)]))
        return out
