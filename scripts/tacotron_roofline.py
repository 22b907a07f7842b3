"""Measured roofline for the Tacotron teacher-forced train step (VERDICT r4
Next #3): where does the time go at saturating batch, and what does the
memory system allow the sequential decoder recurrence to reach?

The decoder is a 200-iteration `lax.scan` (T_mel=400, r=2). Per iteration
the recurrence must (a) stream the decoder weights from HBM (GRU + 2
zoneout-LSTMs + LSA projections; loop-invariant tensors are NOT pinned in
VMEM across `scan` iterations by XLA), (b) re-read the (B, T_text, D)
encoder memory twice (LSA scores + context), and in the backward pass (c)
recompute the forward under remat and (d) read-modify-write the fp32 grad
accumulators once per unrolled group. This script measures the real fwd
and fwd+bwd+adam times and compares them with the bandwidth floor implied
by that traffic on one v5e (819 GB/s HBM, 197 TFLOP/s bf16), then reports
the roofline MFU ceiling — the number the VERDICT asked for if 20% is not
reachable. Hot loop parity: the reference runs the same recurrence one
python step at a time (`/root/reference/models/synthesizer/models/
tacotron.py:264-275`).

Run on the TPU host: python scripts/tacotron_roofline.py [--batch 192]
Prints one JSON line for BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HBM_GBS = 819e9          # v5e HBM bandwidth (public spec)
PEAK = 197e12            # v5e bf16 peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--t_text", type=int, default=160)
    ap.add_argument("--t_mel", type=int, default=400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from bench_train import _analytic_flops, _best
    from mockingbird_tpu.models.tacotron.model import init_tacotron, tacotron_config
    from mockingbird_tpu.models.tacotron.train import make_train_step
    from mockingbird_tpu.train.precision import Policy

    cfg = tacotron_config()
    if args.batch >= 96:
        cfg = cfg.merge(dict(remat_decoder=True))
    model, variables = init_tacotron(jax.random.PRNGKey(0), cfg)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt = tx.init(params)
    B, T_TXT, T_MEL, R = args.batch, args.t_text, args.t_mel, 2
    S = T_MEL // R
    step = make_train_step(model, tx, R, "bf16")

    rng = np.random.RandomState(0)
    batch = dict(texts=jnp.asarray(rng.randint(1, 70, (B, T_TXT)), jnp.int32),
                 mels=jnp.asarray(rng.randn(B, T_MEL, 80), jnp.float32),
                 embeds=jnp.asarray(rng.randn(B, 256), jnp.float32),
                 stop=jnp.asarray(np.ones((B, T_MEL)), jnp.float32))
    key = jax.random.PRNGKey(0)

    # --- measured: full train step (fwd+bwd+adam) ---
    def run_step(state):
        p, s, o = state if state else (params, stats, opt)
        (p, s), o, loss, *_ = step((p, s), o, batch, key)
        float(loss)
        return p, s, o

    dt_step = _best(run_step)

    # --- measured: forward-only (same bf16 policy, loss scalar fetched) ---
    policy = Policy.from_name("bf16")

    @jax.jit
    def fwd(p, s):
        out, _ = model.apply(
            {"params": policy.cast(p), "batch_stats": policy.cast(s)},
            batch["texts"], policy.cast(batch["mels"]),
            policy.cast(batch["embeds"]), R, True,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "zoneout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return out[0].sum()

    def run_fwd(_):
        float(fwd(params, stats))

    dt_fwd = _best(run_fwd)

    # --- traffic model (lower bounds, bf16 weights / fp32 grads) ---
    dec = params["decoder"]
    w2 = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(dec)) * 2
    w4 = 2 * w2
    # encoder memory the LSA attention re-reads each step: keys for the
    # score matmul + values for the context matmul
    d_mem = 2 * cfg.encoder_dims + cfg.speaker_embedding_size
    mem2 = B * T_TXT * d_mem * 2
    unroll = int(getattr(cfg, "scan_unroll", 1) or 1)
    fwd_bytes = S * (w2 + 2 * mem2)
    # bwd: remat recompute (≈fwd reads) + grad-of-matmul weight reads (2x
    # fwd's matmul count) + fp32 grad accumulator RMW per unrolled group
    bwd_bytes = fwd_bytes + 2 * S * (w2 + 2 * mem2) + 2 * w4 * (S // unroll)
    floor_fwd = fwd_bytes / HBM_GBS
    floor_step = (fwd_bytes + bwd_bytes) / HBM_GBS

    flops = _analytic_flops(params, [
        ("decoder", S), ("postnet|post_proj", T_MEL), ("encoder|gst", T_TXT)], B)
    mfu = flops / dt_step / PEAK
    mfu_ceiling = flops / floor_step / PEAK

    print(json.dumps({
        "metric": "tacotron_roofline",
        "batch": B, "scan_steps": S, "scan_unroll": unroll,
        "decoder_weight_mb_bf16": round(w2 / 1e6, 1),
        "encoder_memory_mb_bf16": round(mem2 / 1e6, 1),
        "fwd_ms_measured": round(dt_fwd * 1e3, 1),
        "fwd_ms_bandwidth_floor": round(floor_fwd * 1e3, 1),
        "step_ms_measured": round(dt_step * 1e3, 1),
        "step_ms_bandwidth_floor": round(floor_step * 1e3, 1),
        "mfu_pct_measured": round(100 * mfu, 1),
        "mfu_pct_bandwidth_ceiling": round(100 * mfu_ceiling, 1),
        "flops_per_step": int(flops),
    }), flush=True)


if __name__ == "__main__":
    main()
