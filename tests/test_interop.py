"""Output-equivalence vs the reference PyTorch models (SURVEY §4b).

These tests instantiate the reference's actual torch model classes from
/root/reference, convert their weights with `mockingbird_tpu.interop`, and
assert our flax models produce identical outputs. Skipped when the reference
mount or torch is unavailable.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mockingbird_tpu.config import Config
from mockingbird_tpu.interop import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")


def test_hifigan_generator_equivalence():
    from mockingbird_tpu.interop import (convert_hifigan_generator,
                                         load_reference_hifigan_generator,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.vocoder import Generator, hifigan_config

    cfg = Config(hifigan_config()).merge(dict(
        upsample_rates=[5, 4], upsample_kernel_sizes=[10, 8],
        upsample_initial_channel=64, resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]]))
    tg = load_reference_hifigan_generator(cfg).eval()
    params = convert_hifigan_generator(state_dict_to_numpy(tg.state_dict()), cfg)
    gen = Generator(cfg.freeze())
    x = np.random.RandomState(0).randn(2, 13, 80).astype(np.float32)
    with torch.no_grad():
        yt = tg(torch.from_numpy(x.transpose(0, 2, 1))).numpy()[:, 0, :]
    yf = np.asarray(gen.apply({"params": jax.tree.map(jnp.asarray, params)},
                              jnp.asarray(x)))
    np.testing.assert_allclose(yf, yt, atol=1e-5)


def test_wavernn_equivalence():
    from mockingbird_tpu.interop import (convert_wavernn, load_reference_wavernn,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.vocoder.wavernn import WaveRNN, wavernn_config

    cfg = Config(wavernn_config()).merge(dict(
        rnn_dims=32, fc_dims=32, compute_dims=16, res_out_dims=16, res_blocks=3,
        upsample_factors=[4, 4], hop_size=16, pad=2))
    tw = load_reference_wavernn(cfg).eval()
    params, stats = convert_wavernn(state_dict_to_numpy(tw.state_dict()), cfg)
    model = WaveRNN(cfg.freeze())
    t_frames = 6
    x = np.random.RandomState(0).rand(2, t_frames * 16).astype(np.float32) * 2 - 1
    mels = np.random.RandomState(1).rand(2, t_frames + 4, 80).astype(np.float32)
    with torch.no_grad():
        yt = tw(torch.from_numpy(x), torch.from_numpy(mels.transpose(0, 2, 1))).numpy()
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}
    yf = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(mels), False))
    np.testing.assert_allclose(yf, yt, atol=1e-5)


def test_encoder_equivalence():
    from mockingbird_tpu.interop import (convert_encoder, load_reference_encoder,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.encoder import SpeakerEncoder

    te = load_reference_encoder().eval()
    params = convert_encoder(state_dict_to_numpy(te.state_dict()))
    em = SpeakerEncoder()
    frames = np.random.RandomState(2).rand(3, 40, 40).astype(np.float32)
    with torch.no_grad():
        et = te(torch.from_numpy(frames)).numpy()
    ef = np.asarray(em.apply({"params": jax.tree.map(jnp.asarray, params)},
                             jnp.asarray(frames)))
    np.testing.assert_allclose(ef, et, atol=1e-5)


def test_conv_transpose_all_strides():
    """The VALID+slice transposed-conv scheme matches torch for every
    upsample stride the reference configs use."""
    import flax.linen as nn
    from mockingbird_tpu.interop.torch_weights import conv_transpose1d
    for u in (2, 4, 5, 8):
        k = 2 * u
        tc = torch.nn.ConvTranspose1d(3, 5, k, u, padding=(u // 2 + u % 2),
                                      output_padding=u % 2, bias=True)
        x = np.random.RandomState(u).randn(1, 3, 11).astype(np.float32)
        with torch.no_grad():
            yt = tc(torch.from_numpy(x)).numpy().transpose(0, 2, 1)
        fc = nn.ConvTranspose(5, (k,), strides=(u,), padding="VALID")
        kern = jnp.asarray(conv_transpose1d(tc.weight.data.numpy()))
        bias = jnp.asarray(tc.bias.data.numpy())
        full = fc.apply({"params": {"kernel": kern, "bias": bias}},
                        jnp.asarray(x.transpose(0, 2, 1)))
        off = u // 2 + u % 2
        yf = np.asarray(full[:, off : off + 11 * u])
        np.testing.assert_allclose(yf, yt, atol=1e-5)


def test_tacotron_equivalence():
    """Full Tacotron (CBHG + GST + LSA decoder + postnet) teacher-forced
    forward matches the reference exactly with converted weights (dropout and
    zoneout disabled on both sides, BN in eval)."""
    import torch.nn.functional as F
    from mockingbird_tpu.interop import (convert_tacotron, load_reference_tacotron,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.tacotron import Tacotron, tacotron_config

    cfg = tacotron_config().merge(dict(prenet_dropout=False))
    tt = load_reference_tacotron(cfg)
    tt.train()
    for m in tt.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.eval()
    orig_dropout = F.dropout
    import models.synthesizer.models.tacotron as ref_mod
    orig_zoneout = ref_mod.Decoder.zoneout
    try:
        F.dropout = lambda x, p=0.5, training=False, inplace=False: x
        ref_mod.Decoder.zoneout = lambda self, prev, cur, device, p=0.1: cur

        params, stats = convert_tacotron(state_dict_to_numpy(tt.state_dict()), cfg)
        model = Tacotron(cfg.freeze())
        rng = np.random.RandomState(0)
        texts = rng.randint(1, 74, (2, 12)).astype(np.int32)
        mels_t = rng.randn(2, 80, 8).astype(np.float32)
        spk = rng.randn(2, 256).astype(np.float32)
        with torch.no_grad():
            m_out, lin, attn, stop = tt(torch.from_numpy(texts).long(),
                                        torch.from_numpy(mels_t),
                                        torch.from_numpy(spk))
        variables = {"params": jax.tree.map(jnp.asarray, params),
                     "batch_stats": jax.tree.map(jnp.asarray, stats)}
        out, _ = model.apply(variables, jnp.asarray(texts),
                             jnp.asarray(mels_t.transpose(0, 2, 1)),
                             jnp.asarray(spk), int(tt.r), False,
                             rngs={"dropout": jax.random.PRNGKey(0),
                                   "zoneout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        mel_f, post_f, attn_f, stop_f = out
        np.testing.assert_allclose(np.asarray(mel_f),
                                   m_out.numpy().transpose(0, 2, 1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(post_f),
                                   lin.numpy().transpose(0, 2, 1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(attn_f), attn.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(stop_f), stop.numpy(), atol=1e-5)
    finally:
        F.dropout = orig_dropout
        ref_mod.Decoder.zoneout = orig_zoneout
