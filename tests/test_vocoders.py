"""Vocoder tests: HiFi-GAN/Fre-GAN generators + discriminators, GAN losses,
WaveRNN forward/generate + fold/unfold, MOL distribution, and one GAN train
step that must decrease mel loss."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mockingbird_tpu.config import Config
from mockingbird_tpu.models.vocoder import (
    FreGanDiscriminators, FreGanGenerator, GanVocoder, Generator,
    HifiganDiscriminators, WaveRNN, WaveRnnVocoder, dwt_haar,
    discriminator_loss, feature_loss, fold_with_overlap, fregan_config,
    generator_loss, hifigan_config, wavernn_config, xfade_and_unfold,
)
from mockingbird_tpu.models.vocoder.distribution import (
    discretized_mix_logistic_loss, sample_from_discretized_mix_logistic,
)


def small_hifigan_cfg():
    return Config(hifigan_config()).merge(dict(
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], segment_size=1600, hop_size=16))


def test_hifigan_shapes_and_lengths():
    cfg = small_hifigan_cfg().freeze()
    gen = Generator(cfg)
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))
    for t in (8, 32):
        wav = gen.apply(v, jnp.zeros((2, t, 80)))
        assert wav.shape == (2, t * 16)
    assert np.abs(np.asarray(wav)).max() <= 1.0


@pytest.mark.slow
def test_discriminators_and_losses():
    disc = HifiganDiscriminators()
    y = jnp.asarray(np.random.RandomState(0).randn(2, 1600), jnp.float32) * 0.1
    v = disc.init(jax.random.PRNGKey(0), y, y)
    mpd, msd = disc.apply(v, y, y * 0.5)
    assert len(mpd[0]) == 5 and len(msd[0]) == 3
    d_loss, r_l, g_l = discriminator_loss(mpd[0], mpd[1])
    g_loss, _ = generator_loss(mpd[1])
    f_loss = feature_loss(mpd[2], mpd[3])
    assert np.isfinite([float(d_loss), float(g_loss), float(f_loss)]).all()
    # identical inputs → zero feature loss
    mpd2, _ = disc.apply(v, y, y)
    assert float(feature_loss(mpd2[2], mpd2[3])) < 1e-6


@pytest.mark.slow
def test_fregan_generator_and_disc():
    cfg = Config(fregan_config()).merge(dict(
        upsample_rates=[4, 2, 2], upsample_kernel_sizes=[8, 4, 4],
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], top_k=2, hop_size=16)).freeze()
    gen = FreGanGenerator(cfg)
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))
    wav = gen.apply(v, jnp.zeros((2, 8, 80)))
    assert wav.shape == (2, 8 * 16)

    disc = FreGanDiscriminators()
    y = jnp.asarray(np.random.RandomState(0).randn(1, 800), jnp.float32) * 0.1
    dv = disc.init(jax.random.PRNGKey(1), y, y)
    mpd, msd = disc.apply(dv, y, y * 0.5)
    assert len(mpd[0]) == 5 and len(msd[0]) == 3


def test_dwt_haar():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64), jnp.float32)
    lo, hi = dwt_haar(x)
    assert lo.shape == (2, 32)
    # energy preservation (orthonormal transform)
    e0 = float(jnp.sum(x**2))
    e1 = float(jnp.sum(lo**2) + jnp.sum(hi**2))
    assert abs(e0 - e1) / e0 < 1e-5


def small_wavernn_cfg():
    return Config(wavernn_config()).merge(dict(
        rnn_dims=32, fc_dims=32, compute_dims=16, res_out_dims=16, res_blocks=2,
        upsample_factors=[4, 4], hop_size=16, seq_len=16 * 4, pad=2,
        gen_target=64, gen_overlap=16))


def test_wavernn_forward():
    cfg = small_wavernn_cfg().freeze()
    model = WaveRNN(cfg)
    t_frames = 8
    mels = jnp.zeros((2, t_frames + 2 * cfg.pad, 80))
    x = jnp.zeros((2, t_frames * 16))
    v = model.init(jax.random.PRNGKey(0), x, mels)
    logits, _ = model.apply(v, x, mels, True, mutable=["batch_stats"])
    assert logits.shape == (2, t_frames * 16, 512)  # 2**9 classes


def test_wavernn_generate_end_to_end():
    voc = WaveRnnVocoder(cfg=small_wavernn_cfg(), verbose=False)
    mel = np.random.RandomState(0).randn(80, 30).astype(np.float32)
    wav = voc.infer_waveform(mel, seed=1)
    assert wav.shape == ((30 - 1) * 16,)
    assert np.isfinite(wav).all()
    # deterministic given a seed
    wav2 = voc.infer_waveform(mel, seed=1)
    np.testing.assert_allclose(wav, wav2, atol=1e-5)
    # unbatched path
    wav3 = voc.infer_waveform(mel, batched=False, seed=1)
    assert wav3.shape == wav.shape


def test_fold_unfold_roundtrip():
    """Constant signal: target regions reconstruct exactly; overlap joints use
    the reference's staggered fade (amplitude dips allowed, never doubling)."""
    target, overlap = 64, 16
    x = np.ones((1, 400, 1), np.float32)
    folded = fold_with_overlap(x, target, overlap)
    assert folded.shape[1] == target + 2 * overlap
    y = xfade_and_unfold(folded[:, :, 0].astype(np.float64), overlap)
    num_folds = folded.shape[0]
    assert len(y) == num_folds * (target + overlap) + overlap
    # each fold's target region (offset overlap into its window) must be 1
    for i in range(num_folds - 1):
        start = i * (target + overlap) + overlap
        np.testing.assert_allclose(y[start : start + target], 1.0, atol=1e-9)
    assert y.max() <= 1.0 + 1e-9  # staggered fades never sum above unity


def test_mol_distribution():
    rng = np.random.RandomState(0)
    y_hat = jnp.asarray(rng.randn(2, 10, 30), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (2, 10, 1)), jnp.float32)
    loss = discretized_mix_logistic_loss(y_hat, y)
    assert np.isfinite(float(loss))
    s = sample_from_discretized_mix_logistic(jax.random.PRNGKey(0), y_hat)
    assert s.shape == (2, 10)
    assert (np.abs(np.asarray(s)) <= 1).all()
    # a sharp mixture centred at 0.5 samples near 0.5
    sharp = np.zeros((1, 100, 30), np.float32)
    sharp[..., 10:20] = 0.5   # means
    sharp[..., 20:30] = -7.0  # log scales
    s2 = np.asarray(sample_from_discretized_mix_logistic(
        jax.random.PRNGKey(1), jnp.asarray(sharp)))
    assert abs(s2.mean() - 0.5) < 0.02


def test_gan_vocoder_wrapper():
    voc = GanVocoder("hifigan", cfg=small_hifigan_cfg(), verbose=False)
    mel = np.random.RandomState(0).randn(80, 37).astype(np.float32)
    wav = voc.infer_waveform(mel)
    assert wav.shape == (37 * 16,)


@pytest.mark.slow
def test_gan_train_step_reduces_mel_loss(tmp_path):
    from mockingbird_tpu.models.vocoder.gan_train import make_gan_step
    import optax
    cfg = small_hifigan_cfg().merge(dict(segment_size=512, hop_size=16,
                                         n_fft=128, win_size=128, num_mels=20,
                                         fmin=0.0, fmax=None))
    fcfg = cfg.freeze()
    gen = Generator(fcfg)
    disc = HifiganDiscriminators()
    seg_frames = cfg.segment_size // cfg.hop_size
    g_params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, seg_frames, 20)))["params"]
    d_vars = dict(disc.init(jax.random.PRNGKey(1), jnp.zeros((1, cfg.segment_size)),
                            jnp.zeros((1, cfg.segment_size))))
    tx = optax.adam(2e-4)
    g_opt, d_opt = tx.init(g_params), tx.init(d_vars["params"])
    step_fn = make_gan_step(gen, disc, tx, tx, fcfg)

    rng = np.random.RandomState(0)
    t = np.arange(cfg.segment_size) / 16000
    wavs = np.stack([0.3 * np.sin(2 * np.pi * 220 * t), 0.3 * np.sin(2 * np.pi * 440 * t)])
    from mockingbird_tpu.models.vocoder.gan_train import mel_loss_fn
    mels = np.asarray(mel_loss_fn(jnp.asarray(wavs, jnp.float32), fcfg))
    batch = dict(mels=jnp.asarray(mels, jnp.float32), wavs=jnp.asarray(wavs, jnp.float32))

    mls = []
    for i in range(8):
        g_params, d_vars, g_opt, d_opt, g_loss, d_loss, mel_l = step_fn(
            g_params, d_vars, g_opt, d_opt, batch, jnp.asarray(i), True)
        mls.append(float(mel_l))
    assert np.isfinite(mls).all()
    assert mls[-1] < mls[0], mls


def test_multi_resolution_stft_loss():
    """MRSTFT aux loss (`fregan/stft_loss.py:98-135`) vs a numpy STFT oracle."""
    from mockingbird_tpu.models.vocoder.gan_losses import (
        multi_resolution_stft_loss, stft_loss)

    rng = np.random.RandomState(3)
    t = np.arange(4096) / 16000
    y = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    x = (y + 0.05 * rng.randn(*y.shape)).astype(np.float32)

    # identical signals -> zero loss
    sc0, mag0 = multi_resolution_stft_loss(jnp.asarray(y), jnp.asarray(y))
    assert float(sc0) < 1e-5 and float(mag0) < 1e-4

    # single-resolution values vs numpy oracle (torch.stft semantics:
    # center reflect pad, periodic hann, clamp 1e-7)
    fft_size, hop, win = 512, 50, 240
    def np_mag(sig):
        w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
        wp = np.zeros(fft_size)
        lpad = (fft_size - win) // 2
        wp[lpad:lpad + win] = w
        s = np.pad(sig[0], (fft_size // 2, fft_size // 2), mode="reflect")
        n_frames = 1 + (len(s) - fft_size) // hop
        frames = np.stack([s[i * hop:i * hop + fft_size] * wp for i in range(n_frames)])
        spec = np.fft.rfft(frames, axis=-1)
        return np.sqrt(np.maximum(np.abs(spec) ** 2, 1e-7))

    xm, ym = np_mag(x), np_mag(y)
    sc_ref = np.linalg.norm(ym - xm) / np.linalg.norm(ym)
    mag_ref = np.mean(np.abs(np.log(ym) - np.log(xm)))
    sc, mag = stft_loss(jnp.asarray(x), jnp.asarray(y), fft_size, hop, win)
    np.testing.assert_allclose(float(sc), sc_ref, rtol=1e-3)
    np.testing.assert_allclose(float(mag), mag_ref, rtol=1e-3)

    # multi-resolution is the mean over resolutions and positive for noisy x
    scm, magm = multi_resolution_stft_loss(jnp.asarray(x), jnp.asarray(y))
    assert float(scm) > 0 and float(magm) > 0


def test_wavernn_remat_loss_parity():
    """The remat step (GRU-cell remat + chunked FC head, VERDICT r4 Next
    #6) must be a pure memory/compute trade: identical loss and identical
    updated params vs the plain step — and an identical parameter TREE, so
    checkpoints interchange."""
    import optax
    from mockingbird_tpu.models.vocoder.wavernn_train import make_wavernn_step

    rng = np.random.RandomState(0)
    t_frames, hop = 8, 16
    batch = dict(
        x=jnp.asarray(rng.uniform(-1, 1, (2, t_frames * hop)), jnp.float32),
        y=jnp.asarray(rng.randint(0, 512, (2, t_frames * hop)), jnp.int32),
        mels=jnp.asarray(rng.randn(2, t_frames + 4, 80) * 0.1, jnp.float32),
    )
    outs = []
    for remat in (False, True):
        cfg = small_wavernn_cfg().merge(dict(remat=remat)).freeze()
        model = WaveRNN(cfg)
        v = model.init(jax.random.PRNGKey(0), batch["x"], batch["mels"])
        tx = optax.adam(1e-3)
        opt = tx.init(v["params"])
        step = make_wavernn_step(model, tx, "RAW", "fp32", remat=remat,
                                 head_chunk=48)  # non-divisible: tests pad+mask
        p, bs, opt, loss = step(v["params"], v["batch_stats"], opt, batch)
        outs.append((float(loss), jax.tree.map(np.asarray, p)))
    assert abs(outs[0][0] - outs[1][0]) < 1e-5, (outs[0][0], outs[1][0])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-5, atol=1e-6), outs[0][1], outs[1][1])


def test_wavernn_remat_mol_loss_parity():
    """Same trade for MOL mode (per-element reduce=False path)."""
    import optax
    from mockingbird_tpu.models.vocoder.wavernn_train import make_wavernn_step

    rng = np.random.RandomState(1)
    t_frames, hop = 8, 16
    batch = dict(
        x=jnp.asarray(rng.uniform(-1, 1, (2, t_frames * hop)), jnp.float32),
        y=jnp.asarray(rng.uniform(-1, 1, (2, t_frames * hop)), jnp.float32),
        mels=jnp.asarray(rng.randn(2, t_frames + 4, 80) * 0.1, jnp.float32),
    )
    losses = []
    for remat in (False, True):
        cfg = small_wavernn_cfg().merge(dict(mode="MOL", remat=remat)).freeze()
        model = WaveRNN(cfg)
        v = model.init(jax.random.PRNGKey(0), batch["x"], batch["mels"])
        tx = optax.adam(1e-3)
        opt = tx.init(v["params"])
        step = make_wavernn_step(model, tx, "MOL", "fp32", remat=remat,
                                 head_chunk=48)
        p, bs, opt, loss = step(v["params"], v["batch_stats"], opt, batch)
        losses.append(float(loss))
    assert abs(losses[0] - losses[1]) < 1e-5, losses
