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


@pytest.fixture(scope="module", autouse=True)
def _clean_reference_stubs():
    """Remove the reference's import stubs after this module so later tests
    importing real libraries (transformers → tqdm etc.) see a clean state."""
    yield
    from mockingbird_tpu.interop.reference_loader import teardown_reference_imports
    teardown_reference_imports()


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


def test_hifigan_generator_24k_interpolation_equivalence():
    """24 kHz variant: Interpolation+Conv1d upsampling (`models.py:107-118`)."""
    from mockingbird_tpu.interop import (convert_hifigan_generator,
                                         load_reference_hifigan_generator,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.vocoder import Generator, hifigan_config

    cfg = Config(hifigan_config()).merge(dict(
        sample_rate=24000, use_interpolation=True,
        upsample_rates=[5, 4], upsample_kernel_sizes=[9, 7],
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


@pytest.mark.slow
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


def _tiny_vits_cfg(use_sdp=True):
    from mockingbird_tpu.models.vits import vits_config
    return vits_config().merge(dict(
        n_vocab=40, spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=24, n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32, n_speakers=4, gin_channels=8,
        use_sdp=use_sdp, hop_size=16, segment_size=64))


@pytest.mark.parametrize("use_sdp", [True, False])
@pytest.mark.slow
def test_vits_infer_equivalence(use_sdp):
    """Full VITS inference path (TextEncoder → duration predictor reverse →
    generate_path → flow reverse → decoder) matches the reference bit-for-bit
    with converted weights at zero noise scales."""
    from mockingbird_tpu.interop import (convert_vits, load_reference_vits,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.vits import Vits, init_vits

    cfg = _tiny_vits_cfg(use_sdp)
    tv = load_reference_vits(cfg).eval()
    params = convert_vits(state_dict_to_numpy(tv.state_dict()), cfg)

    rng = np.random.RandomState(0)
    x = rng.randint(1, cfg.n_vocab, (2, 9)).astype(np.int64)
    x_lengths = np.asarray([9, 6], np.int64)
    # zero text past lengths like the collate does
    x[1, 6:] = 0
    sid = np.asarray([1, 3], np.int64)
    emo = rng.randn(2, 1024).astype(np.float32)

    with torch.no_grad():
        o_t, attn_t, y_mask_t, _ = tv.infer(
            torch.from_numpy(x), torch.from_numpy(x_lengths),
            sid=torch.from_numpy(sid), emo=torch.from_numpy(emo),
            noise_scale=0.0, length_scale=2.5, noise_scale_w=0.0)
    t_y = o_t.shape[-1] // int(np.prod(cfg.upsample_rates))

    model = Vits(cfg.freeze())
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    o_f, attn_f, y_mask_f, y_lengths_f = model.apply(
        variables, jnp.asarray(x, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        sid=jnp.asarray(sid, jnp.int32), emo=jnp.asarray(emo),
        noise_scale=0.0, length_scale=2.5, noise_scale_w=0.0, max_len=t_y,
        key=jax.random.PRNGKey(0), method=Vits.infer)

    np.testing.assert_allclose(np.asarray(attn_f), attn_t.numpy()[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_f), o_t.numpy()[:, 0, :], atol=2e-4)


@pytest.mark.slow
def test_vits_posterior_flow_equivalence():
    """enc_q stats and the forward flow match the reference (training path,
    noise neutralised by feeding m_q through both flows)."""
    from mockingbird_tpu.interop import (convert_vits, load_reference_vits,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.vits import Vits

    cfg = _tiny_vits_cfg(True)
    tv = load_reference_vits(cfg).eval()
    params = convert_vits(state_dict_to_numpy(tv.state_dict()), cfg)
    model = Vits(cfg.freeze())
    variables = {"params": jax.tree.map(jnp.asarray, params)}

    rng = np.random.RandomState(1)
    y = rng.randn(2, 12, cfg.spec_channels).astype(np.float32)
    y_lengths = np.asarray([12, 10], np.int64)
    sid = np.asarray([0, 2], np.int64)

    with torch.no_grad():
        g_t = tv.emb_g(torch.from_numpy(sid)).unsqueeze(-1)
        _, m_t, logs_t, mask_t = tv.enc_q(
            torch.from_numpy(y.transpose(0, 2, 1)), torch.from_numpy(y_lengths), g=g_t)
        z_p_t = tv.flow(m_t * mask_t, mask_t, g=g_t)

    def run(mdl, y, y_lengths, sid):
        g = mdl._speaker(sid)
        z, m, logs, mask = mdl.enc_q(y, y_lengths, g=g, key=None, train=False)
        z_p = mdl.flow(m * mask, mask, g=g, train=False)
        return m, logs, z_p

    m_f, logs_f, z_p_f = model.apply(
        variables, jnp.asarray(y), jnp.asarray(y_lengths, jnp.int32),
        jnp.asarray(sid, jnp.int32), method=run)
    np.testing.assert_allclose(np.asarray(m_f), m_t.numpy().transpose(0, 2, 1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logs_f), logs_t.numpy().transpose(0, 2, 1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_p_f), z_p_t.numpy().transpose(0, 2, 1), atol=1e-5)


@pytest.mark.slow
def test_fregan_generator_equivalence():
    from mockingbird_tpu.interop import (convert_fregan_generator,
                                         load_reference_fregan,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.vocoder.fregan import FreGanGenerator, fregan_config

    cfg = fregan_config().merge(dict(
        upsample_rates=[4, 4, 2], upsample_kernel_sizes=[8, 8, 4],
        upsample_initial_channel=32, resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3, 5, 7], [1, 3, 5, 7]], top_k=2))
    tg = load_reference_fregan(cfg).eval()
    params = convert_fregan_generator(state_dict_to_numpy(tg.state_dict()), cfg)
    gen = FreGanGenerator(cfg.freeze())
    x = np.random.RandomState(0).randn(2, 11, 80).astype(np.float32)
    with torch.no_grad():
        yt = tg(torch.from_numpy(x.transpose(0, 2, 1))).numpy()[:, 0, :]
    yf = np.asarray(gen.apply({"params": jax.tree.map(jnp.asarray, params)},
                              jnp.asarray(x)))
    np.testing.assert_allclose(yf, yt, atol=1e-5)


@pytest.mark.parametrize("input_layer", ["linear", "conv2d_nosub"])
def test_conformer_encoder_equivalence(input_layer):
    """espnet-legacy ConformerEncoder (rel-pos attention with legacy shift,
    macaron FF, conv module) matches the reference with converted weights."""
    from mockingbird_tpu.interop import (convert_conformer_encoder,
                                         load_reference_conformer,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.ppg.extractor import ConformerEncoder, ppg_config

    cfg = ppg_config().merge(dict(
        output_size=32, attention_heads=2, linear_units=48, num_blocks=2,
        dropout_rate=0.0, cnn_kernel=7, num_mels=20, input_layer=input_layer))
    tc = load_reference_conformer(cfg, input_layer).eval()
    params, stats = convert_conformer_encoder(state_dict_to_numpy(tc.state_dict()),
                                              cfg, prefix="")
    model = ConformerEncoder(cfg.freeze())
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 11, 20).astype(np.float32)
    lengths = np.asarray([11, 11], np.int64)
    with torch.no_grad():
        yt, olens, _ = tc(torch.from_numpy(feats), torch.from_numpy(lengths))
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}
    yf = np.asarray(model.apply(variables, jnp.asarray(feats),
                                jnp.asarray(lengths, jnp.int32)))
    np.testing.assert_allclose(yf, yt.numpy(), atol=2e-5)


@pytest.mark.slow
def test_conformer_encoder_equivalence_longer():
    """Equivalence holds at other sequence lengths too (the legacy espnet
    positional table is sliced per length — worth pinning)."""
    from mockingbird_tpu.interop import (convert_conformer_encoder,
                                         load_reference_conformer,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.ppg.extractor import ConformerEncoder, ppg_config

    cfg = ppg_config().merge(dict(
        output_size=32, attention_heads=2, linear_units=48, num_blocks=2,
        dropout_rate=0.0, cnn_kernel=7, num_mels=20))
    tc = load_reference_conformer(cfg).eval()
    params, stats = convert_conformer_encoder(state_dict_to_numpy(tc.state_dict()),
                                              cfg, prefix="")
    model = ConformerEncoder(cfg.freeze())
    rng = np.random.RandomState(3)
    feats = rng.randn(1, 23, 20).astype(np.float32)
    lengths_np = np.asarray([23], np.int64)
    with torch.no_grad():
        yt, _, _ = tc(torch.from_numpy(feats), torch.from_numpy(lengths_np))
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, stats)}
    yf = np.asarray(model.apply(variables, jnp.asarray(feats),
                                jnp.asarray(lengths_np, jnp.int32)))
    np.testing.assert_allclose(yf, yt.numpy(), atol=2e-5)


@pytest.mark.slow
def test_ppg2mel_equivalence():
    """MelDecoderMOLv2 teacher-forced forward (downsample prenets, MOL
    attention LSTM decoder, postnet) matches the reference with converted
    weights (dropout disabled on both sides, BN eval)."""
    import torch.nn.functional as F
    from mockingbird_tpu.interop import (convert_ppg2mel, load_reference_ppg2mel,
                                         state_dict_to_numpy)
    from mockingbird_tpu.models.ppg.ppg2mel import MelDecoderMOLv2, ppg2mel_config

    cfg = ppg2mel_config().merge(dict(
        spk_embed_dim=16, bottle_neck_feature_dim=24, encoder_dim=32,
        attention_rnn_dim=40, decoder_rnn_dim=40, prenet_dims=[24, 12],
        num_mixtures=3, prenet_always_dropout=False))
    tm = load_reference_ppg2mel(cfg)
    tm.train()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.eval()
    orig_dropout = F.dropout
    # the reference's get_mask_from_lengths hardcodes torch.cuda.LongTensor
    # (`ppg2mel/utils/vc_utils.py:19`) — patch a CPU version in
    import models.ppg2mel.rnn_decoder_mol as ref_dec
    import models.ppg2mel as ref_p2m

    def _cpu_mask(lengths, max_len=None):
        if max_len is None:
            max_len = int(torch.max(lengths).item())
        ids = torch.arange(0, max_len)
        return (ids < lengths.unsqueeze(1)).bool()

    orig_mask_dec = ref_dec.get_mask_from_lengths
    orig_mask_p2m = ref_p2m.get_mask_from_lengths
    try:
        F.dropout = lambda x, p=0.5, training=False, inplace=False: x
        ref_dec.get_mask_from_lengths = _cpu_mask
        ref_p2m.get_mask_from_lengths = _cpu_mask
        params, stats = convert_ppg2mel(state_dict_to_numpy(tm.state_dict()), cfg)
        model = MelDecoderMOLv2(cfg.freeze())

        rng = np.random.RandomState(0)
        b, t_ppg, t_mel = 2, 16, 8
        bnf = rng.randn(b, t_ppg, 24).astype(np.float32)
        fl = np.asarray([16, 12], np.int64)
        mel = rng.randn(b, t_mel, 80).astype(np.float32)
        sl = np.asarray([8, 8], np.int64)
        lf0 = rng.randn(b, t_ppg, 2).astype(np.float32)
        spk = rng.randn(b, 16).astype(np.float32)

        with torch.no_grad():
            mel_t, post_t, stop_t, attn_t = tm(
                torch.from_numpy(bnf), torch.from_numpy(fl),
                torch.from_numpy(mel), torch.from_numpy(sl),
                torch.from_numpy(lf0), spembs=torch.from_numpy(spk),
                output_att_ws=True)

        variables = {"params": jax.tree.map(jnp.asarray, params),
                     "batch_stats": jax.tree.map(jnp.asarray, stats)}
        out = model.apply(variables, jnp.asarray(bnf), jnp.asarray(fl, jnp.int32),
                          jnp.asarray(mel), jnp.asarray(sl, jnp.int32),
                          jnp.asarray(lf0), jnp.asarray(spk), False,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        mel_f, post_f, stop_f, attn_f = out
        np.testing.assert_allclose(np.asarray(mel_f), mel_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(post_f), post_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(attn_f), attn_t.numpy(), atol=2e-5)
        r = cfg.frames_per_step
        np.testing.assert_allclose(np.asarray(stop_f)[:, ::r],
                                   stop_t.numpy().reshape(2, -1), atol=2e-5)
    finally:
        F.dropout = orig_dropout
        ref_dec.get_mask_from_lengths = orig_mask_dec
        ref_p2m.get_mask_from_lengths = orig_mask_p2m


@pytest.mark.slow
def test_import_checkpoint_roundtrip(tmp_path):
    """`import-checkpoint` converts a reference-format torch file and our
    inference wrappers load the result (full user path for community ckpts)."""
    from mockingbird_tpu.interop import (convert_hifigan_generator,
                                         load_reference_hifigan_generator,
                                         state_dict_to_numpy)
    from mockingbird_tpu.interop.import_checkpoint import import_reference_checkpoint
    from mockingbird_tpu.models.vocoder import hifigan_config
    from mockingbird_tpu.models.vocoder.inference import GanVocoder

    cfg = Config(hifigan_config()).merge(dict(
        upsample_rates=[5, 4], upsample_kernel_sizes=[10, 8],
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3, 5]], hop_size=20, segment_size=400))
    tg = load_reference_hifigan_generator(cfg).eval()
    # write the reference's on-disk container (g_* file: {"generator": sd})
    torch_path = tmp_path / "g_00010000"
    torch.save({"generator": tg.state_dict()}, torch_path)

    out = import_reference_checkpoint("hifigan", torch_path,
                                      tmp_path / "imported", cfg, verbose=False)
    voc = GanVocoder("hifigan", out, cfg, verbose=False, half=False)
    x = np.random.RandomState(0).randn(13, 80).astype(np.float32)
    wav = voc.infer_waveform(x)
    with torch.no_grad():
        yt = tg(torch.from_numpy(x.T[None])).numpy()[0, 0]
    # the wrapper bucket-pads the mel, so conv edges differ at the very tail;
    # the interior proves the imported weights are the same
    n = (x.shape[0] - 5) * 20
    np.testing.assert_allclose(wav[:n], yt[:n], atol=1e-3)
