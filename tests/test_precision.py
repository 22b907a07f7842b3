"""bf16 mixed-precision policy: fp32-vs-bf16 loss parity on tiny configs
(replaces the reference's AMP GradScaler semantics,
`/root/reference/models/synthesizer/train_vits.py:197,230`)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_policy_cast_roundtrip():
    from mockingbird_tpu.train.precision import Policy, cast_floating

    p = Policy.from_name("bf16")
    tree = {"w": jnp.ones((4, 4), jnp.float32), "i": jnp.arange(3),
            "b": jnp.zeros((2,), jnp.bfloat16)}
    cast = p.cast(tree)
    assert cast["w"].dtype == jnp.bfloat16
    assert cast["i"].dtype == tree["i"].dtype  # ints untouched
    back = p.uncast(cast)
    assert back["w"].dtype == jnp.float32
    assert Policy.from_name("fp32").cast(tree) is tree

    with pytest.raises(ValueError):
        Policy.from_name("fp8")


def _tacotron_setup():
    from mockingbird_tpu.models.tacotron.model import init_tacotron, tacotron_config
    cfg = tacotron_config()
    cfg.update(embed_dims=32, encoder_dims=16, decoder_dims=32, postnet_dims=16,
               encoder_K=4, lstm_dims=32, postnet_K=2, num_highways=2,
               speaker_embedding_size=16, use_gst=False)
    model, variables = init_tacotron(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, t_text, t_mel, r = 2, 12, 16, 2
    batch = dict(
        texts=jnp.asarray(rng.randint(1, 40, (b, t_text)), jnp.int32),
        mels=jnp.asarray(rng.randn(b, t_mel, 80), jnp.float32),
        embeds=jnp.asarray(rng.randn(b, 16), jnp.float32),
        stop=jnp.asarray(np.ones((b, t_mel)), jnp.float32),
        mel_lengths=jnp.asarray([t_mel] * b, jnp.int32),
    )
    return model, variables, batch, r


@pytest.mark.slow
def test_tacotron_step_bf16_parity():
    from mockingbird_tpu.models.tacotron.train import make_train_step

    model, variables, batch, r = _tacotron_setup()
    tx = optax.adam(1e-4)
    losses = {}
    for prec in ("fp32", "bf16"):
        params = jax.tree.map(jnp.copy, variables["params"])
        stats = jax.tree.map(jnp.copy, variables["batch_stats"])
        opt = tx.init(params)
        step = make_train_step(model, tx, r, prec)
        key = jax.random.PRNGKey(7)
        for i in range(3):
            (params, stats), opt, loss, parts, attn, post = step(
                (params, stats), opt, batch, key)
        losses[prec] = float(loss)
        # master params must stay fp32 under the mixed policy
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(params))
    assert np.isfinite(losses["bf16"])
    np.testing.assert_allclose(losses["bf16"], losses["fp32"], rtol=0.1)


@pytest.mark.slow
def test_gan_step_bf16_parity():
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.vocoder.gan_train import make_gan_step, mel_loss_fn
    from mockingbird_tpu.models.vocoder.hifigan import (
        Generator, HifiganDiscriminators, hifigan_config)

    cfg = Config(hifigan_config()).merge(dict(
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], segment_size=256, hop_size=16,
        n_fft=128, win_size=128, num_mels=20, fmin=0.0, fmax=None))
    fcfg = cfg.freeze()
    gen, disc = Generator(fcfg), HifiganDiscriminators()
    segf = cfg.segment_size // cfg.hop_size
    g0 = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, segf, 20)))["params"]
    d0 = dict(disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 256)), jnp.zeros((1, 256))))
    d0.setdefault("batch_stats", {})
    tx = optax.adam(2e-4)

    t = np.arange(cfg.segment_size) / 16000
    wavs = np.stack([0.3 * np.sin(2 * np.pi * 220 * t),
                     0.3 * np.sin(2 * np.pi * 440 * t)]).astype(np.float32)
    mels = np.asarray(mel_loss_fn(jnp.asarray(wavs), fcfg))
    batch = dict(mels=jnp.asarray(mels), wavs=jnp.asarray(wavs))

    results = {}
    for prec in ("fp32", "bf16"):
        gp = jax.tree.map(jnp.copy, g0)
        dv = jax.tree.map(jnp.copy, d0)
        go, do = tx.init(gp), tx.init(dv["params"])
        step = make_gan_step(gen, disc, tx, tx, fcfg, prec)
        for i in range(2):
            gp, dv, go, do, gl, dl, ml = step(gp, dv, go, do, batch,
                                              jnp.asarray(i), True)
        results[prec] = (float(gl), float(ml))
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(gp))
    assert np.isfinite(results["bf16"]).all()
    np.testing.assert_allclose(results["bf16"][1], results["fp32"][1], rtol=0.15)


@pytest.mark.slow
def test_encoder_step_bf16_parity():
    from mockingbird_tpu.models.encoder.model import SpeakerEncoder, init_params
    from mockingbird_tpu.models.encoder.train import make_train_step

    model = SpeakerEncoder()
    params = init_params(jax.random.PRNGKey(0))
    tx = optax.adam(1e-4)
    rng = np.random.RandomState(1)
    batch = jnp.asarray(rng.randn(4, 3, 160, 40), jnp.float32)

    losses = {}
    for prec in ("fp32", "bf16"):
        p = jax.tree.map(jnp.copy, params)
        opt = tx.init(p)
        step = make_train_step(model, tx, 4, 3, prec)
        for _ in range(2):
            p, opt, loss, eer, embeds = step(p, opt, batch)
        losses[prec] = float(loss)
        assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(p))
    assert np.isfinite(losses["bf16"])
    np.testing.assert_allclose(losses["bf16"], losses["fp32"], rtol=0.1)


@pytest.mark.slow
def test_vits_step_bf16_parity():
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.dsp import spectrogram_vits
    from mockingbird_tpu.models.vits import (
        VitsDiscriminator, init_vits, vits_config)
    from mockingbird_tpu.models.vits.train import make_vits_step

    cfg = Config(vits_config()).merge(dict(
        inter_channels=32, hidden_channels=32, filter_channels=64, n_heads=2,
        n_layers=2, upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=64, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], spec_channels=65,
        segment_size=16 * 8, hop_size=16, n_speakers=4, gin_channels=16,
        emotion_channels=8, n_fft=128, win_size=128, num_mels=20))
    model, variables = init_vits(jax.random.PRNGKey(0), cfg.clone(), t_x=12, t_y=40)
    fcfg = cfg.freeze()
    disc = VitsDiscriminator()
    d0 = dict(disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 128)),
                        jnp.zeros((1, 128))))
    tx = optax.adamw(2e-4, b1=0.8, b2=0.99, eps=1e-9)

    rng = np.random.RandomState(0)
    t = np.arange(40 * 16) / 16000
    wavs = np.stack([0.3 * np.sin(2 * np.pi * 220 * t),
                     0.3 * np.sin(2 * np.pi * 330 * t)]).astype(np.float32)
    specs = np.asarray(spectrogram_vits(jnp.asarray(wavs), 128, 16, 128), np.float32)
    batch = dict(
        texts=jnp.asarray(rng.randint(1, 60, (2, 12)), jnp.int32),
        text_lengths=jnp.asarray([12, 10], jnp.int32),
        specs=jnp.asarray(specs), spec_lengths=jnp.asarray([40, 40], jnp.int32),
        wavs=jnp.asarray(wavs), sids=jnp.asarray([0, 1], jnp.int32),
        emos=jnp.asarray(rng.randn(2, 8), jnp.float32))

    results = {}
    for prec in ("fp32", "bf16"):
        gp = jax.tree.map(jnp.copy, variables["params"])
        dv = jax.tree.map(jnp.copy, d0)
        go, do = tx.init(gp), tx.init(dv["params"])
        step_fn = make_vits_step(model, disc, tx, tx, fcfg, prec)
        for i in range(2):
            gp, dv, go, do, g_loss, d_loss, parts = step_fn(
                gp, dv, go, do, batch, jax.random.PRNGKey(i))
        results[prec] = float(parts["mel"])
        assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(gp))
    np.testing.assert_allclose(results["bf16"], results["fp32"], rtol=0.15)
