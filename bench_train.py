"""Training-step throughput benchmark (one JSON line per trainer).

Measures the full jitted SPMD train step of each model family at the
reference's default batch sizes / shapes on whatever devices are visible
(one TPU chip here; the same code pjit-shards over a mesh on pods).

Run: `python bench_train.py [--families tacotron,vits,hifigan,encoder]`
First run compiles (minutes); the persistent XLA cache makes reruns fast.
"""
import argparse
import json
import time

import numpy as np


def _best(fn, n=3):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.time()
        out = fn(out)
        best = min(best, time.time() - t0)
    return best


def bench_tacotron(precision="fp32"):
    import jax, jax.numpy as jnp, optax
    from mockingbird_tpu.models.tacotron.model import init_tacotron, tacotron_config
    from mockingbird_tpu.models.tacotron.train import make_train_step

    cfg = tacotron_config()
    model, variables = init_tacotron(jax.random.PRNGKey(0), cfg)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt = tx.init(params)
    B, T_TXT, T_MEL, R = 12, 160, 400, 2  # reference schedule batch 12, r=2
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
    return {"metric": "tacotron_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch12/{precision}"}


def bench_vits(precision="fp32"):
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

    B, T_TXT, T_SPEC = 16, 96, 400
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
    return {"metric": "vits_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch16/{precision}"}


def bench_hifigan(precision="fp32"):
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
    B = 16
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
    return {"metric": "hifigan_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch16/{precision}"}


def bench_encoder(precision="fp32"):
    import jax, jax.numpy as jnp, optax
    from mockingbird_tpu.models.encoder.model import SpeakerEncoder, init_params
    from mockingbird_tpu.models.encoder.train import make_train_step

    model = SpeakerEncoder()
    params = init_params(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(1e-4))
    opt = tx.init(params)
    step = make_train_step(model, tx, 64, 10, precision)
    batch = jnp.asarray(np.random.RandomState(0).randn(64, 10, 160, 40),
                        jnp.float32)

    def run(state):
        p, o = state if state else (params, opt)
        p, o, loss, eer, _ = step(p, o, batch)
        float(loss)
        return p, o

    dt = _best(run)
    return {"metric": "ge2e_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@64x10/{precision}"}


def bench_fregan(precision="fp32"):
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
    B = 16
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
    return {"metric": "fregan_train_step", "value": round(dt * 1e3, 1),
            "unit": f"ms/step@batch16/{precision}"}


BENCHES = {"tacotron": bench_tacotron, "vits": bench_vits,
           "hifigan": bench_hifigan, "fregan": bench_fregan,
           "encoder": bench_encoder}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="tacotron,vits,hifigan,fregan,encoder")
    ap.add_argument("--precision", default="fp32", choices=("fp32", "bf16"))
    args = ap.parse_args()
    for fam in args.families.split(","):
        print(json.dumps(BENCHES[fam.strip()](args.precision)), flush=True)


if __name__ == "__main__":
    main()
