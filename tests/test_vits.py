"""VITS tests: module math (flows invertible, spline, relative attention),
model forward/infer shapes, a training step that reduces loss, and the
generate_path/slice utilities."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mockingbird_tpu.config import Config
from mockingbird_tpu.models.vits import (
    BucketBatcher, Vits, VitsDiscriminator, generate_path, init_vits,
    rational_quadratic_spline, sequence_mask, slice_segments, vits_config,
)
from mockingbird_tpu.models.vits.modules import (
    ElementwiseAffine, Flip, Log, ResidualCouplingLayer, TransformerEncoder,
    _absolute_to_relative, _relative_to_absolute,
)


def small_cfg():
    return Config(vits_config()).merge(dict(
        inter_channels=32, hidden_channels=32, filter_channels=64, n_heads=2,
        n_layers=2, upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=64, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], spec_channels=65,
        segment_size=16 * 8, hop_size=16, n_speakers=4, gin_channels=16,
        emotion_channels=8, n_fft=128, win_size=128, num_mels=20))


@pytest.fixture(scope="module")
def vits_small():
    return init_vits(jax.random.PRNGKey(0), small_cfg(), t_x=12, t_y=40)


def test_spline_invertible():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-4, 4, (2, 8)), jnp.float32)
    uw = jnp.asarray(rng.randn(2, 8, 10) * 0.3, jnp.float32)
    uh = jnp.asarray(rng.randn(2, 8, 10) * 0.3, jnp.float32)
    ud = jnp.asarray(rng.randn(2, 8, 9) * 0.3, jnp.float32)
    y, ld = rational_quadratic_spline(x, uw, uh, ud, inverse=False)
    x2, ld_inv = rational_quadratic_spline(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)
    # out-of-range input passes through (linear tails)
    far = jnp.asarray([[7.0]])
    y_far, ld_far = rational_quadratic_spline(
        far, uw[:1, :1], uh[:1, :1], ud[:1, :1], inverse=False)
    assert float(y_far[0, 0]) == 7.0 and float(ld_far[0, 0]) == 0.0


def test_flows_invertible():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 8), jnp.float32)
    mask = jnp.ones((2, 10, 1))

    flip = Flip()
    y, ld = flip(x, mask, reverse=False)
    np.testing.assert_allclose(np.asarray(flip(y, mask, reverse=True)), np.asarray(x))

    aff = ElementwiseAffine(8)
    v = aff.init(jax.random.PRNGKey(0), x, mask)
    y, ld = aff.apply(v, x, mask, reverse=False)
    x2 = aff.apply(v, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)

    rcl = ResidualCouplingLayer(8, 16, 3, 1, 2)
    v = rcl.init(jax.random.PRNGKey(1), x, mask)
    y, ld = rcl.apply(v, x, mask, reverse=False)
    x2 = rcl.apply(v, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)

    log = Log()
    xp = jnp.abs(x) + 0.1
    y, ld = log(xp, mask, reverse=False)
    np.testing.assert_allclose(np.asarray(log(y, mask, reverse=True)),
                               np.asarray(xp), atol=1e-5)


def test_relative_position_helpers():
    b, h, t = 1, 1, 4
    x = jnp.asarray(np.random.RandomState(0).randn(b, h, t, 2 * t - 1), jnp.float32)
    absn = _relative_to_absolute(x)
    assert absn.shape == (b, h, t, t)
    # abs[i, j] should equal rel[i, (t-1) + (j - i)]
    xn = np.asarray(x)
    for i in range(t):
        for j in range(t):
            np.testing.assert_allclose(np.asarray(absn)[0, 0, i, j],
                                       xn[0, 0, i, t - 1 + j - i], atol=1e-6)
    y = jnp.asarray(np.random.RandomState(1).randn(b, h, t, t), jnp.float32)
    rel = _absolute_to_relative(y)
    assert rel.shape == (b, h, t, 2 * t - 1)
    yn = np.asarray(y)
    for i in range(t):
        for j in range(t):
            np.testing.assert_allclose(np.asarray(rel)[0, 0, i, t - 1 + j - i],
                                       yn[0, 0, i, j], atol=1e-6)


def test_transformer_encoder_masking():
    enc = TransformerEncoder(16, 32, 2, 1, 3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16), jnp.float32)
    mask = sequence_mask(jnp.asarray([10, 6]), 10)[..., None]
    v = enc.init(jax.random.PRNGKey(0), x, mask)
    y = enc.apply(v, x, mask)
    assert y.shape == x.shape
    assert np.abs(np.asarray(y)[1, 6:]).max() == 0  # padded region zeroed


def test_generate_path():
    dur = jnp.asarray([[[2.0, 3.0, 1.0]]])  # (B=1, 1, Tx=3)
    mask = jnp.ones((1, 1, 6, 3))
    path = np.asarray(generate_path(dur, mask))[0, 0]
    expect = np.array([[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0], [0, 0, 1]],
                      np.float32)
    np.testing.assert_array_equal(path, expect)


@pytest.mark.slow
def test_vits_forward_and_infer(vits_small):
    model, variables = vits_small
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(1, 60, (2, 12)), jnp.int32)
    xl = jnp.asarray([12, 8], jnp.int32)
    y = jnp.asarray(rng.randn(2, 40, 65), jnp.float32)
    yl = jnp.asarray([40, 30], jnp.int32)
    sid = jnp.asarray([0, 1], jnp.int32)
    emo = jnp.asarray(rng.randn(2, 8), jnp.float32)

    out = model.apply(variables, x, xl, y, yl, sid, emo,
                      key=jax.random.PRNGKey(1), train=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    o, l_length, attn, ids, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q) = out
    assert o.shape == (2, 128)
    assert attn.shape == (2, 40, 12)
    assert np.isfinite(np.asarray(o)).all()
    assert np.isfinite(np.asarray(l_length)).all()
    # alignment: one text pos per frame within mask
    a = np.asarray(attn)
    assert np.allclose(a[0, :40].sum(-1), 1.0)

    io, iattn, iym, iyl = model.apply(
        variables, x, xl, sid, emo, max_len=80, key=jax.random.PRNGKey(3),
        method=Vits.infer, rngs={"dropout": jax.random.PRNGKey(4)})
    assert io.shape == (2, 80 * 16)
    assert (np.asarray(iyl) >= 1).all()


@pytest.mark.slow
def test_vits_train_step_reduces_loss(vits_small):
    import optax
    from mockingbird_tpu.models.vits.train import make_vits_step
    model, variables = vits_small
    cfg = small_cfg()
    fcfg = cfg.freeze()
    disc = VitsDiscriminator()
    d_vars = dict(disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 128)),
                            jnp.zeros((1, 128))))
    tx = optax.adamw(2e-4, b1=0.8, b2=0.99, eps=1e-9)
    g_params = variables["params"]
    g_opt, d_opt = tx.init(g_params), tx.init(d_vars["params"])
    step_fn = make_vits_step(model, disc, tx, tx, fcfg)

    rng = np.random.RandomState(0)
    t = np.arange(40 * 16) / 16000
    wavs = np.stack([0.3 * np.sin(2 * np.pi * 220 * t),
                     0.3 * np.sin(2 * np.pi * 330 * t)]).astype(np.float32)
    from mockingbird_tpu.dsp import spectrogram_vits
    specs = np.asarray(spectrogram_vits(jnp.asarray(wavs), 128, 16, 128), np.float32)
    batch = dict(
        texts=jnp.asarray(rng.randint(1, 60, (2, 12)), jnp.int32),
        text_lengths=jnp.asarray([12, 10], jnp.int32),
        specs=jnp.asarray(specs), spec_lengths=jnp.asarray([40, 40], jnp.int32),
        wavs=jnp.asarray(wavs), sids=jnp.asarray([0, 1], jnp.int32),
        emos=jnp.asarray(rng.randn(2, 8), jnp.float32))

    mels = []
    for i in range(6):
        g_params, d_vars, g_opt, d_opt, g_loss, d_loss, parts = step_fn(
            g_params, d_vars, g_opt, d_opt, batch, jax.random.PRNGKey(i))
        mels.append(float(parts["mel"]))
        assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    assert mels[-1] < mels[0], mels


def test_slice_segments():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 12)
    out = slice_segments(x, jnp.asarray([2, 5]), 4)
    np.testing.assert_array_equal(np.asarray(out),
                                  [[2, 3, 4, 5], [17, 18, 19, 20]])


@pytest.mark.slow
def test_vits_synthesizer_pcm16():
    """VitsSynthesizer's on-device int16 path matches the float path."""
    from mockingbird_tpu.models.vits.inference import VitsSynthesizer
    syn = VitsSynthesizer(cfg=small_cfg(), verbose=False, seed=0)
    texts = ["ni3 hao3 shi4 jie4"]
    f32 = syn.synthesize(texts, max_frames=40)
    i16 = syn.synthesize(texts, max_frames=40, pcm16=True)
    assert f32[0].dtype == np.float32 and i16[0].dtype == np.int16
    assert len(f32[0]) == len(i16[0])
    q = np.round(np.clip(f32[0], -1, 1) * 32767).astype(np.int16)
    assert np.abs(q.astype(np.int32) - i16[0].astype(np.int32)).max() <= 1


def test_vits_reconstruct_probe():
    """Posterior-mean reconstruction (the bench's VITS fidelity probe):
    correct shape/dtype/finiteness on a small model, and trimming to the
    input's frame count."""
    from mockingbird_tpu.models.vits.inference import VitsSynthesizer
    syn = VitsSynthesizer(cfg=small_cfg(), verbose=False, seed=0)
    sr = 16000
    t = np.arange(sr // 4) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    out = syn.reconstruct(wav)
    assert out.dtype == np.float32 and np.isfinite(out).all()
    n_frames = 1 + len(wav) // syn.cfg.hop_size  # center-padded STFT
    assert abs(len(out) - n_frames * syn.cfg.hop_size) <= syn.cfg.hop_size
