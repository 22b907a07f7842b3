"""Training-step throughput + MFU benchmark (one JSON line per trainer).

Measures the full jitted SPMD train step of each model family at the
reference's default batch sizes / shapes on whatever devices are visible
(one TPU chip here; the same code pjit-shards over a mesh on pods), and
reports model-flops utilization: flops/step from XLA's own post-fusion cost
analysis (`compiled.cost_analysis()['flops']` — counts one MAC as 2 flops),
achieved TFLOP/s, and the fraction of the chip's bf16 peak. MFU is the
per-chip perf bar (VERDICT r2 Next #2) — it says whether 130 ms/step is
good utilization or 5% of the chip, which raw ms/step cannot.

Run: `python bench_train.py [--families tacotron,vits,...] [--precision bf16]`
First run compiles (minutes); the persistent XLA cache makes reruns fast.
"""
import argparse
import json
import time

import numpy as np

# TPU v5e (v5 lite): 197 TFLOP/s bf16 peak per chip (public spec). fp32 runs
# are quoted against the same number — the MXU computes fp32 matmuls via
# multi-pass bf16, so this undercounts fp32 "utilization" but keeps one
# comparable denominator.
PEAK_FLOPS = {"v5e": 197e12}


def _best(fn, n=3):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.time()
        out = fn(out)
        best = min(best, time.time() - t0)
    return best


def _flops_of(jitted_fn, *args, **kwargs):
    """flops/step from the compiled HLO's cost analysis (None if the backend
    doesn't expose it). CAVEAT: XLA counts a while-loop body ONCE, so this
    badly undercounts scan-dominated models — use `_analytic_flops` there;
    it stays exact for the single-shot conv/attention graphs (GANs, VITS)."""
    try:
        cost = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def _analytic_flops(params, rules, batch_size, bwd_mult=3.0):
    """Analytic matmul-flops inventory from parameter shapes × application
    counts: every `kernel` leaf contributes 2·B·n_apply·prod(shape) flops
    (a Dense applies its (in,out) kernel once per position; a conv applies
    its (k,in,out) kernel once per output position). `rules` maps param-path
    regexes to per-step/per-position application counts (first match wins;
    unmatched kernels count once). Training step ≈ fwd + bwd ≈ 3× fwd."""
    import re

    import jax
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        p = jax.tree_util.keystr(path)
        if "kernel" not in p:
            continue
        n = 1
        for pat, cnt in rules:
            if re.search(pat, p):
                n = cnt
                break
        total += 2 * batch_size * n * int(np.prod(leaf.shape))
    return total * bwd_mult


def _mfu_fields(flops, dt):
    if not flops:
        return {}
    tflops_s = flops / dt / 1e12
    return {"flops_per_step": int(flops),
            "tflops_per_s": round(tflops_s, 2),
            "mfu_pct_v5e_bf16": round(100.0 * flops / dt / PEAK_FLOPS["v5e"], 2)}


def bench_tacotron(precision="fp32", batch=12):
    import jax, jax.numpy as jnp, optax
    from mockingbird_tpu.models.tacotron.model import init_tacotron, tacotron_config
    from mockingbird_tpu.models.tacotron.train import make_train_step

    cfg = tacotron_config()
    if batch >= 96:
        # the full-activation scan OOMs 16 GB HBM past ~batch 96 (the LSA
        # location-conv features are S·B·T_text·128 floats); remat trades
        # ~1/3 extra decoder flops for S× less activation memory
        cfg = cfg.merge(dict(remat_decoder=True))
    model, variables = init_tacotron(jax.random.PRNGKey(0), cfg)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt = tx.init(params)
    B, T_TXT, T_MEL, R = batch, 160, 400, 2  # reference schedule batch 12, r=2
    step = make_train_step(model, tx, R, precision)

    rng = np.random.RandomState(0)
    batch = dict(texts=jnp.asarray(rng.randint(1, 70, (B, T_TXT)), jnp.int32),
                 mels=jnp.asarray(rng.randn(B, T_MEL, 80), jnp.float32),
                 embeds=jnp.asarray(rng.randn(B, 256), jnp.float32),
                 stop=jnp.asarray(np.ones((B, T_MEL)), jnp.float32))
    key = jax.random.PRNGKey(0)

    def run(state):
        p, s, o = state if state else (params, stats, opt)
        (p, s), o, loss, parts, attn, post = step((p, s), o, batch, key)
        float(loss)
        return p, s, o

    dt = _best(run)
    # analytic: the teacher-forced decoder is a 200-step scan (cost_analysis
    # counts the body once). decoder params apply per attention step, en/
    # postnet per sequence position.
    flops = _analytic_flops(params, [
        ("decoder", T_MEL // R),
        ("postnet|post_proj", T_MEL),
        ("encoder|gst", T_TXT)], B)
    return {"metric": "tacotron_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch{B}/{precision}", **_mfu_fields(flops, dt)}


def bench_vits(precision="fp32", batch=16):
    import jax, jax.numpy as jnp, optax
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.vits.model import init_vits, vits_config
    from mockingbird_tpu.models.vits.train import VitsDiscriminator, make_vits_step

    cfg = Config(vits_config())
    model, variables = init_vits(jax.random.PRNGKey(0), cfg.clone())
    g_params = variables["params"]
    disc = VitsDiscriminator()
    d_vars = dict(disc.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, cfg.segment_size)),
                            jnp.zeros((1, cfg.segment_size))))
    d_vars.setdefault("batch_stats", {})
    tx_g = optax.adamw(2e-4, b1=0.8, b2=0.99, eps=1e-9)
    tx_d = optax.adamw(2e-4, b1=0.8, b2=0.99, eps=1e-9)
    g_opt, d_opt = tx_g.init(g_params), tx_d.init(d_vars["params"])
    step = make_vits_step(model, disc, tx_g, tx_d, cfg.freeze(), precision)

    B, T_TXT, T_SPEC = batch, 96, 400
    rng = np.random.RandomState(0)
    batch = dict(
        texts=jnp.asarray(rng.randint(1, 70, (B, T_TXT)), jnp.int32),
        text_lengths=jnp.asarray([T_TXT] * B, jnp.int32),
        specs=jnp.asarray(np.abs(rng.randn(B, T_SPEC, cfg.n_fft // 2 + 1)),
                          jnp.float32),
        spec_lengths=jnp.asarray([T_SPEC] * B, jnp.int32),
        sids=jnp.asarray([0] * B, jnp.int32),
        emos=jnp.asarray(rng.randn(B, 1024), jnp.float32),
        wavs=jnp.asarray(rng.randn(B, T_SPEC * cfg.hop_size) * 0.1, jnp.float32))
    key = jax.random.PRNGKey(0)

    def run(state):
        g, d, go, do = state if state else (g_params, d_vars, g_opt, d_opt)
        out = step(g, d, go, do, batch, key)
        # fetch a scalar: async dispatch means only a host read reliably
        # bounds the device work on tunneled backends
        for leaf in jax.tree.leaves(out[4:]):
            if getattr(leaf, "ndim", None) == 0:
                float(leaf)
                break
        return out[:4]

    dt = _best(run)
    flops = _flops_of(step, g_params, d_vars, g_opt, d_opt, batch, key)
    return {"metric": "vits_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch{B}/{precision}", **_mfu_fields(flops, dt)}


def bench_hifigan(precision="fp32", batch=16):
    import jax, jax.numpy as jnp, optax
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.vocoder.hifigan import (init_discriminators,
                                                        init_generator,
                                                        hifigan_config)
    from mockingbird_tpu.models.vocoder.gan_train import make_gan_step

    cfg = Config(hifigan_config()).freeze()
    gen, gvars = init_generator(jax.random.PRNGKey(0), cfg,
                                t=cfg.segment_size // cfg.hop_size)
    disc, dvars = init_discriminators(jax.random.PRNGKey(1), t=cfg.segment_size)
    g_params = gvars["params"]
    d_vars = dict(dvars)
    d_vars.setdefault("batch_stats", {})
    tx_g = optax.adamw(2e-4, b1=0.8, b2=0.99)
    tx_d = optax.adamw(2e-4, b1=0.8, b2=0.99)
    g_opt, d_opt = tx_g.init(g_params), tx_d.init(d_vars["params"])
    step = make_gan_step(gen, disc, tx_g, tx_d, cfg, precision)
    B = batch
    rng = np.random.RandomState(0)
    batch = dict(
        mels=jnp.asarray(rng.randn(B, cfg.segment_size // cfg.hop_size, 80),
                         jnp.float32),
        wavs=jnp.asarray(rng.randn(B, cfg.segment_size) * 0.1, jnp.float32))

    def run(state):
        g, d, go, do = state if state else (g_params, d_vars, g_opt, d_opt)
        out = step(g, d, go, do, batch, 1, True)
        for leaf in jax.tree.leaves(out[4:]):
            if getattr(leaf, "ndim", None) == 0:
                float(leaf)
                break
        return out[:4]

    dt = _best(run)
    flops = _flops_of(step, g_params, d_vars, g_opt, d_opt, batch, 1, True)
    return {"metric": "hifigan_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch{B}/{precision}", **_mfu_fields(flops, dt)}


def bench_encoder(precision="fp32", speakers=64):
    import jax, jax.numpy as jnp, optax
    from mockingbird_tpu.models.encoder.model import SpeakerEncoder, init_params
    from mockingbird_tpu.models.encoder.train import make_train_step

    model = SpeakerEncoder(remat=speakers >= 512)
    params = init_params(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(1e-4))
    opt = tx.init(params)
    step = make_train_step(model, tx, speakers, 10, precision)
    batch = jnp.asarray(np.random.RandomState(0).randn(speakers, 10, 160, 40),
                        jnp.float32)

    def run(state):
        p, o = state if state else (params, opt)
        p, o, loss, eer, _ = step(p, o, batch)
        float(loss)
        return p, o

    dt = _best(run)
    flops = _analytic_flops(params["model"], [("lstm", 160)], speakers * 10)
    return {"metric": "ge2e_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@{speakers}x10/{precision}", **_mfu_fields(flops, dt)}


def bench_fregan(precision="fp32", batch=16):
    import jax, jax.numpy as jnp, optax
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.vocoder.fregan import (FreGanDiscriminators,
                                                       FreGanGenerator,
                                                       fregan_config)
    from mockingbird_tpu.models.vocoder.gan_train import make_gan_step

    cfg = Config(fregan_config()).freeze()
    gen = FreGanGenerator(cfg)
    t_mel = cfg.segment_size // cfg.hop_size
    g_params = gen.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, t_mel, cfg.num_mels)))["params"]
    disc = FreGanDiscriminators()
    d_vars = dict(disc.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, cfg.segment_size)),
                            jnp.zeros((1, cfg.segment_size))))
    d_vars.setdefault("batch_stats", {})
    tx_g = optax.adamw(2e-4, b1=0.8, b2=0.99)
    tx_d = optax.adamw(2e-4, b1=0.8, b2=0.99)
    g_opt, d_opt = tx_g.init(g_params), tx_d.init(d_vars["params"])
    step = make_gan_step(gen, disc, tx_g, tx_d, cfg, precision)
    B = batch
    rng = np.random.RandomState(0)
    batch = dict(
        mels=jnp.asarray(rng.randn(B, t_mel, cfg.num_mels), jnp.float32),
        wavs=jnp.asarray(rng.randn(B, cfg.segment_size) * 0.1, jnp.float32))

    def run(state):
        g, d, go, do = state if state else (g_params, d_vars, g_opt, d_opt)
        out = step(g, d, go, do, batch, 1, True)
        for leaf in jax.tree.leaves(out[4:]):
            if getattr(leaf, "ndim", None) == 0:
                float(leaf)
                break
        return out[:4]

    dt = _best(run)
    flops = _flops_of(step, g_params, d_vars, g_opt, d_opt, batch, 1, True)
    return {"metric": "fregan_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch{B}/{precision}", **_mfu_fields(flops, dt)}


def bench_ppg(precision="fp32", batch=8):
    """ppg2mel VC train step (Conformer memory pre-encoded: the step covers
    the MOL-attention AR decoder teacher-forced scan + postnet fwd+bwd)."""
    import jax, jax.numpy as jnp, optax
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.ppg.ppg2mel import init_ppg2mel, ppg2mel_config
    from mockingbird_tpu.models.ppg.train import make_vc_step

    cfg = Config(ppg2mel_config())
    model, variables = init_ppg2mel(jax.random.PRNGKey(0), cfg)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(5e-4))
    opt = tx.init(params)
    step = make_vc_step(model, tx, precision)
    B, T = batch, 400
    rng = np.random.RandomState(0)
    batch = dict(
        ppgs=jnp.asarray(rng.randn(B, T, cfg.bottle_neck_feature_dim), jnp.float32),
        lf0s=jnp.asarray(rng.randn(B, T, 2), jnp.float32),
        mels=jnp.asarray(rng.randn(B, T, cfg.num_mels), jnp.float32),
        stops=jnp.asarray(np.ones((B, T)), jnp.float32),
        embeds=jnp.asarray(rng.randn(B, cfg.spk_embed_dim), jnp.float32),
        lengths=jnp.asarray([T] * B, jnp.int32))
    key = jax.random.PRNGKey(0)

    def run(state):
        p, s, o = state if state else (params, stats, opt)
        p, s, o, loss, l_mel, l_stop = step(p, s, o, batch, key)
        float(loss)
        return p, s, o

    dt = _best(run)
    # MOL-attention decoder scans T/frames_per_step groups; prenet/pitch
    # convs run per input frame
    flops = _analytic_flops(params, [
        ("decoder", T // cfg.frames_per_step),
        ("postnet|prenet|pitch|reduce", T)], B)
    return {"metric": "ppg2mel_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch{B}x400/{precision}", **_mfu_fields(flops, dt)}


def bench_wavernn(precision="fp32", batch=None):
    """WaveRNN train step at the reference defaults (batch 100, seq 1280,
    `wavernn/hparams.py:34`)."""
    import jax, jax.numpy as jnp, optax
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.vocoder.wavernn import WaveRNN, wavernn_config
    from mockingbird_tpu.models.vocoder.wavernn_train import make_wavernn_step

    B = batch or Config(wavernn_config()).batch_size
    # remat (GRU cells + chunked head) makes batch >=192 fit; same trainer
    # auto-enable threshold (loss-parity tested)
    remat = B >= 192
    cfg = Config(wavernn_config()).merge(dict(remat=remat))
    fcfg = cfg.freeze()
    model = WaveRNN(fcfg)
    mel_win = cfg.seq_len // cfg.hop_size + 2 * cfg.pad
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.seq_len)),
                           jnp.zeros((1, mel_win, cfg.feat_dims)))
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(cfg.learning_rate)
    opt = tx.init(params)
    step = make_wavernn_step(model, tx, cfg.mode, precision, remat=remat)
    rng = np.random.RandomState(0)
    batch = dict(x=jnp.asarray(rng.randn(B, cfg.seq_len) * 0.1, jnp.float32),
                 y=jnp.asarray(rng.randint(0, 2 ** cfg.bits, (B, cfg.seq_len)),
                               jnp.int32),
                 mels=jnp.asarray(rng.randn(B, mel_win, cfg.feat_dims), jnp.float32))

    def run(state):
        p, s, o = state if state else (params, stats, opt)
        p, s, o, loss = step(p, s, o, batch)
        float(loss)
        return p, s, o

    dt = _best(run)
    # GRUs + fc head run per sample (seq_len); the conditioning upsampler
    # runs at mel rate (mel_win positions)
    flops = _analytic_flops(params, [
        ("rnn1|rnn2|/I|fc1|fc2|fc3", cfg.seq_len),
        ("upsample", mel_win)], B)
    return {"metric": "wavernn_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch{B}/{precision}", **_mfu_fields(flops, dt)}


BENCHES = {"tacotron": bench_tacotron, "vits": bench_vits,
           "hifigan": bench_hifigan, "fregan": bench_fregan,
           "encoder": bench_encoder, "ppg": bench_ppg,
           "wavernn": bench_wavernn}


# Batch-scaled MFU sweep (VERDICT r3 Next #4): the three scan-dominated
# families at the reference batch and 4×/16× it. Each point is an
# independent measurement of the SAME jitted step at a bigger batch; if the
# "latency-bound" claim holds, ms/step stays ~flat while MFU scales ~B.
SCALED = {
    "tacotron": (bench_tacotron, (12, 48, 192, 384)),
    # encoder tops out at 512 speakers: even with remat, the forward's live
    # hoisted projection (T, B·u, 4H) is ~3 GB/layer at 1024 and the step
    # exceeds 16 GB HBM
    "encoder": (lambda p, b: bench_encoder(p, speakers=b), (64, 256, 512)),
    "ppg": (bench_ppg, (8, 32, 128, 256)),
    "hifigan": (bench_hifigan, (16, 64, 128)),
    "vits": (bench_vits, (16, 32, 64)),
    "fregan": (bench_fregan, (16, 64)),
    # >=192 auto-remats (GRU cells + chunked head): 256/384 fit where the
    # plain step OOM'd past 192 (r4) — sample-rate GRU scan activations
    "wavernn": (bench_wavernn, (100, 192, 256, 384)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families",
                    default="tacotron,vits,hifigan,fregan,encoder,ppg,wavernn")
    ap.add_argument("--precision", default="bf16", choices=("fp32", "bf16"))
    ap.add_argument("--batch_scale", action="store_true",
                    help="sweep the scan-bound families over 1x/4x/16x the "
                         "reference batch (one JSON line per point)")
    args = ap.parse_args()
    if args.batch_scale:
        for fam in args.families.split(","):
            fam = fam.strip()
            if fam not in SCALED:
                print(json.dumps({"metric": f"{fam}_train_step",
                                  "skipped": "no batch_scale sweep defined"}),
                      flush=True)
                continue
            fn, batches = SCALED[fam]
            for b in batches:
                print(json.dumps(fn(args.precision, b)), flush=True)
        return
    for fam in args.families.split(","):
        print(json.dumps(BENCHES[fam.strip()](args.precision)), flush=True)


if __name__ == "__main__":
    main()
