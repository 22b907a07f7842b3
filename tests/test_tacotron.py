"""Tacotron tests: forward shapes, training step reduces loss on a toy task,
generation loop determinism + stop behaviour, GTA, and the Synthesizer API."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mockingbird_tpu.config import Config
from mockingbird_tpu.models.tacotron import (
    Synthesizer, Tacotron, collate_synthesizer, init_tacotron, tacotron_config,
    tacotron_loss,
)


def small_cfg():
    return tacotron_config().merge(dict(
        embed_dims=32, encoder_dims=16, decoder_dims=16, postnet_dims=32,
        lstm_dims=32, gst_E=16, gst_num_heads=4, gst_ref_filters=(4, 4),
        speaker_embedding_size=8, max_r=4, n_mels=20, fft_bins=20))


@pytest.fixture(scope="module")
def small_model():
    return init_tacotron(jax.random.PRNGKey(0), small_cfg())


@pytest.mark.slow
def test_forward_shapes(small_model):
    model, variables = small_model
    texts = jnp.asarray(np.random.RandomState(0).randint(1, 60, (2, 12)), jnp.int32)
    mels = jnp.asarray(np.random.RandomState(1).randn(2, 8, 20), jnp.float32)
    spk = jnp.asarray(np.random.RandomState(2).randn(2, 8), jnp.float32)
    out, _ = model.apply(variables, texts, mels, spk, 2, True,
                         rngs={"dropout": jax.random.PRNGKey(1),
                               "zoneout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    mel_out, post, attn, stop = out
    assert mel_out.shape == (2, 8, 20)
    assert post.shape == (2, 8, 20)
    assert attn.shape == (2, 4, 12)
    assert stop.shape == (2, 8)
    # attention rows are distributions over text
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(stop) >= 0).all() and (np.asarray(stop) <= 1).all()


@pytest.mark.slow
def test_train_step_reduces_loss(small_model):
    import optax
    model, variables = small_model
    params, stats = variables["params"], variables["batch_stats"]
    rng = np.random.RandomState(0)
    batch = dict(
        texts=jnp.asarray(rng.randint(1, 60, (2, 12)), jnp.int32),
        mels=jnp.asarray(rng.randn(2, 8, 20) * 0.1, jnp.float32),
        embeds=jnp.asarray(rng.randn(2, 8), jnp.float32),
        stop=jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 0, 1.0], (2, 1)), jnp.float32),
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, key):
        dk, zk = jax.random.split(key)
        def loss_fn(p):
            out, mut = model.apply({"params": p, "batch_stats": stats},
                                   batch["texts"], batch["mels"], batch["embeds"], 2, True,
                                   rngs={"dropout": dk, "zoneout": zk},
                                   mutable=["batch_stats"])
            loss, _ = tacotron_loss(out, batch)
            return loss, mut["batch_stats"]
        (loss, stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats2, opt_state, loss

    losses = []
    for i in range(15):
        params, stats, opt_state, loss = step(params, stats, opt_state,
                                              jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_synthesizer_generation():
    """End-to-end text→mel with fresh weights: shapes, determinism, and the
    (M, T) reference output layout."""
    syn = Synthesizer(cfg=small_cfg(), verbose=False)
    syn.load()
    embeds = np.random.RandomState(0).randn(2, 8).astype(np.float32)
    specs = syn.synthesize_spectrograms(["ni3 hao3", "hello world"], embeds,
                                        steps=40, r=2)
    assert len(specs) == 2
    for s in specs:
        assert s.shape[0] == 20  # (M, T)
        assert s.shape[1] >= 1
    specs2 = syn.synthesize_spectrograms(["ni3 hao3", "hello world"], embeds,
                                         steps=40, r=2)
    np.testing.assert_allclose(specs[0], specs2[0], atol=1e-5)


def test_collate():
    rng = np.random.RandomState(0)
    batch = [(np.arange(1, 8, dtype=np.int32), rng.randn(13, 20).astype(np.float32),
              rng.randn(8).astype(np.float32), 0),
             (np.arange(1, 15, dtype=np.int32), rng.randn(37, 20).astype(np.float32),
              rng.randn(8).astype(np.float32), 1)]
    out = collate_synthesizer(batch, r=2, max_abs_value=4.0, text_bucket=8, mel_bucket=16)
    assert out["texts"].shape == (2, 16)
    assert out["mels"].shape[1] % 2 == 0 and out["mels"].shape[1] >= 37
    # padding is silence
    assert out["mels"][0, -1, 0] == -4.0
    # stop targets: 0 before end, 1 after
    assert out["stop"][0, 0] == 0 and out["stop"][0, -1] == 1


def test_gst_token_styles():
    """Different style tokens give different mels."""
    syn = Synthesizer(cfg=small_cfg(), verbose=False)
    syn.load()
    emb = np.random.RandomState(0).randn(1, 8).astype(np.float32)
    a = syn.synthesize_spectrograms(["ni3 hao3"], emb, steps=20, r=2, style_idx=0)[0]
    b = syn.synthesize_spectrograms(["ni3 hao3"], emb, steps=20, r=2, style_idx=1)[0]
    n = min(a.shape[1], b.shape[1])
    assert not np.allclose(a[:, :n], b[:, :n])


def test_symbol_ids_fit_embedding():
    from mockingbird_tpu.text import text_to_sequence, symbols
    from mockingbird_tpu.models.tacotron import tacotron_config
    cfg = tacotron_config()
    assert cfg.num_chars == len(symbols)
    s = "ni3 hao3 SHI4 jie4! (testing) 0123456789 .,:;?'-"
    ids = text_to_sequence(s, ("english_cleaners",)) + text_to_sequence(s)
    assert max(ids) < cfg.num_chars


def test_lsa_padding_mask():
    """Additive masking (default) gives padded chars ~zero attention even
    under heavy bucket padding; masking="reference" reproduces the lsa.py:41
    u*mask quirk (pad logits 0 → weight e^0); with no pads the two agree."""
    from mockingbird_tpu.models.tacotron.model import LSA

    rng = np.random.RandomState(0)
    b, t, d = 2, 32, 16
    enc_proj = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    query = jnp.asarray(rng.randn(b, d).astype(np.float32))
    cumulative = jnp.asarray(np.abs(rng.randn(b, t)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[:, 10:] = 0.0  # 22 of 32 positions are padding

    add = LSA(d, masking="additive")
    ref = LSA(d, masking="reference")
    params = add.init(jax.random.PRNGKey(1), enc_proj, query, cumulative,
                      jnp.asarray(mask))
    s_add = np.asarray(add.apply(params, enc_proj, query, cumulative, jnp.asarray(mask)))
    s_ref = np.asarray(ref.apply(params, enc_proj, query, cumulative, jnp.asarray(mask)))

    assert s_add[:, 10:].sum() < 1e-6          # no leak to pads
    assert s_ref[:, 10:].sum() > 0.3           # the quirk leaks real mass
    full = jnp.asarray(np.ones((b, t), np.float32))
    np.testing.assert_allclose(
        np.asarray(add.apply(params, enc_proj, query, cumulative, full)),
        np.asarray(ref.apply(params, enc_proj, query, cumulative, full)),
        atol=1e-6)


def test_guided_attention_loss():
    """Diagonal attention scores near zero; attention parked on one anchor
    char (the observed failure mode) is penalised; padded region ignored."""
    from mockingbird_tpu.models.tacotron.train import guided_attention_loss

    b, s_max, t_max, r = 2, 20, 24, 2
    tl = jnp.asarray([20, 10], jnp.int32)
    ml = jnp.asarray([40, 20], jnp.int32)  # → 20 / 10 real steps

    diag = np.zeros((b, s_max, t_max), np.float32)
    parked = np.zeros((b, s_max, t_max), np.float32)
    for bi, (T, S) in enumerate([(20, 20), (10, 10)]):
        for s in range(S):
            diag[bi, s, int(round(s * (T - 1) / max(S - 1, 1)))] = 1.0
        parked[bi, :, T - 1] = 1.0  # latched on the last char
    l_diag = float(guided_attention_loss(jnp.asarray(diag), tl, ml, r))
    l_park = float(guided_attention_loss(jnp.asarray(parked), tl, ml, r))
    assert l_diag < 0.05
    assert l_park > 0.3

    # attention mass outside the real region must not change the loss
    noisy = diag.copy()
    noisy[0, 15:, 21:] = 5.0
    np.testing.assert_allclose(
        float(guided_attention_loss(jnp.asarray(noisy), tl, ml, r)), l_diag,
        atol=1e-6)


def test_remat_decoder_loss_parity():
    """`remat_decoder` must be a pure memory/compute trade: identical loss
    and identical updated params vs the full-activation scan (it gates the
    production train graph at large batches — BASELINE.md MFU sweep)."""
    import optax
    from mockingbird_tpu.models.tacotron.train import make_train_step

    rng = np.random.RandomState(0)
    batch = dict(
        texts=jnp.asarray(rng.randint(1, 60, (2, 12)), jnp.int32),
        mels=jnp.asarray(rng.randn(2, 8, 20) * 0.1, jnp.float32),
        embeds=jnp.asarray(rng.randn(2, 8), jnp.float32),
        stop=jnp.ones((2, 8), jnp.float32),
        mel_lengths=jnp.full((2,), 8, jnp.int32),
    )
    outs = []
    for remat in (False, True):
        cfg = small_cfg().merge(dict(remat_decoder=remat))
        model, variables = init_tacotron(jax.random.PRNGKey(0), cfg)
        tx = optax.adam(1e-3)
        opt = tx.init(variables["params"])
        step = make_train_step(model, tx, 2)
        (p, s), o, loss, parts, attn, post = step(
            (variables["params"], variables["batch_stats"]), opt, batch,
            jax.random.PRNGKey(7))
        outs.append((float(loss), jax.tree.map(np.asarray, p)))
    assert abs(outs[0][0] - outs[1][0]) < 1e-5, (outs[0][0], outs[1][0])
    # EVERY updated parameter must match — a backward-only remat defect
    # could corrupt one subtree's grads while leaving loss bit-identical
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-5, atol=1e-6), outs[0][1], outs[1][1])


def test_fused_scan_parity():
    """The fused teacher-forced path (prenet/zoneout-RNG/output projections
    hoisted out of the decoder scan — the default production train graph)
    must match the legacy per-step path exactly when the stochastic pieces
    are disabled; with them enabled only the RNG draw order differs."""
    rng = np.random.RandomState(0)
    texts = jnp.asarray(rng.randint(1, 60, (2, 12)), jnp.int32)
    mels = jnp.asarray(rng.randn(2, 8, 20) * 0.1, jnp.float32)
    emb = jnp.asarray(rng.randn(2, 8), jnp.float32)
    outs = {}
    for fused in (True, False):
        cfg = small_cfg().merge(dict(fused_scan=fused, prenet_dropout=False))
        model, variables = init_tacotron(jax.random.PRNGKey(0), cfg)
        outs[fused] = model.apply(
            variables, texts, mels, emb, 2, False,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "zoneout": jax.random.PRNGKey(2)})
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_scan_train_step():
    """Training through the fused path: finite loss, loss decreases over a
    few steps, and grads flow to every parameter subtree (a hoisting bug
    that detached e.g. mel_proj would show up as a zero-grad leaf)."""
    import optax
    from mockingbird_tpu.models.tacotron.train import make_train_step

    rng = np.random.RandomState(0)
    batch = dict(
        texts=jnp.asarray(rng.randint(1, 60, (2, 12)), jnp.int32),
        mels=jnp.asarray(rng.randn(2, 8, 20) * 0.1, jnp.float32),
        embeds=jnp.asarray(rng.randn(2, 8), jnp.float32),
        stop=jnp.ones((2, 8), jnp.float32))
    cfg = small_cfg().merge(dict(fused_scan=True))
    model, variables = init_tacotron(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    params, stats = variables["params"], variables["batch_stats"]
    params0 = jax.tree.map(np.asarray, params["decoder"])
    opt = tx.init(params)
    step = make_train_step(model, tx, 2)
    losses = []
    state = (params, stats)
    for i in range(5):
        state, opt, loss, parts, attn, post = step(
            state, opt, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # every decoder subtree moved (grads flowed through the hoisted heads)
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         params0, state[0]["decoder"])
    for path, delta in jax.tree_util.tree_flatten_with_path(moved)[0]:
        assert delta > 0, f"no grad reached {path}"
