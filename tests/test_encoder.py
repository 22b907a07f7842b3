"""GE2E speaker-encoder tests: similarity-matrix oracle, loss/EER behaviour,
partial slicing parity, end-to-end embedding, and a short training run that
must reduce loss on synthetic speaker clusters."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mockingbird_tpu.models.encoder import (
    SpeakerEncoder, SpeakerEncoderInference, compute_partial_slices,
    equal_error_rate, ge2e_loss, init_params, similarity_matrix,
)


def _naive_similarity(embeds, w, b):
    """Direct translation of GE2E §2.1 as a numpy loop — oracle for the
    vectorised device version."""
    s, u, d = embeds.shape
    c_incl = embeds.mean(axis=1)
    c_incl = c_incl / (np.linalg.norm(c_incl, axis=1, keepdims=True) + 1e-5)
    c_excl = (embeds.sum(axis=1, keepdims=True) - embeds) / (u - 1)
    c_excl = c_excl / (np.linalg.norm(c_excl, axis=2, keepdims=True) + 1e-5)
    sim = np.zeros((s, u, s), np.float32)
    for j in range(s):
        for i in range(u):
            for k in range(s):
                c = c_excl[j, i] if k == j else c_incl[k]
                sim[j, i, k] = np.dot(embeds[j, i], c)
    return sim * w + b


def test_similarity_matrix_matches_oracle():
    rng = np.random.RandomState(0)
    e = rng.randn(6, 4, 16).astype(np.float32)
    e /= np.linalg.norm(e, axis=2, keepdims=True)
    ours = np.asarray(similarity_matrix(jnp.asarray(e), jnp.asarray([10.0]), jnp.asarray([-5.0])))
    oracle = _naive_similarity(e, 10.0, -5.0)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_ge2e_loss_separable_embeddings():
    """Perfectly clustered speakers → low loss + ~0 EER; random → high EER."""
    s, u, d = 8, 5, 64
    rng = np.random.RandomState(0)
    centers = rng.randn(s, d)
    clustered = centers[:, None, :] + 0.01 * rng.randn(s, u, d)
    clustered /= np.linalg.norm(clustered, axis=2, keepdims=True)
    w, b = jnp.asarray([10.0]), jnp.asarray([-5.0])

    loss_c, sim_c = ge2e_loss(jnp.asarray(clustered, jnp.float32), w, b)
    eer_c = equal_error_rate(sim_c, s, u)

    rand = rng.randn(s, u, d)
    rand /= np.linalg.norm(rand, axis=2, keepdims=True)
    loss_r, sim_r = ge2e_loss(jnp.asarray(rand, jnp.float32), w, b)
    eer_r = equal_error_rate(sim_r, s, u)

    assert float(loss_c) < float(loss_r)
    assert float(eer_c) < 0.05
    assert float(eer_r) > 0.2


def test_eer_matches_numpy_oracle():
    """EER against a direct numpy threshold sweep."""
    s, u = 4, 3
    rng = np.random.RandomState(1)
    sim = rng.randn(s * u, s).astype(np.float32)
    target = np.repeat(np.arange(s), u)
    labels = (np.arange(s)[None, :] == target[:, None]).flatten()
    scores = sim.flatten()

    # oracle: sweep all thresholds
    order = np.argsort(-scores)
    ls = labels[order]
    tp = np.cumsum(ls)
    fp = np.cumsum(~ls)
    far = fp / (~labels).sum()
    frr = 1 - tp / labels.sum()
    oracle = (far[np.argmin(np.abs(far - frr))] + frr[np.argmin(np.abs(far - frr))]) / 2

    ours = float(equal_error_rate(jnp.asarray(sim), s, u))
    assert abs(ours - oracle) < 1e-6


def test_model_output_shape_and_norm():
    model = SpeakerEncoder()
    params = init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(3, 160, 40), jnp.float32)
    out = model.apply({"params": params["model"]}, x)
    assert out.shape == (3, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-3)
    assert (np.asarray(out) >= 0).all()  # post-ReLU embeddings are non-negative


def test_compute_partial_slices():
    # 3 s of 16 kHz audio, 160-frame partials, 50% overlap
    wav_slices, mel_slices = compute_partial_slices(48000)
    assert len(wav_slices) == len(mel_slices) >= 2
    for ws, ms in zip(wav_slices, mel_slices):
        assert ms.stop - ms.start == 160
        assert ws.start == ms.start * 160 and ws.stop == ms.stop * 160
    # partials advance by 80 frames (50% overlap)
    assert mel_slices[1].start - mel_slices[0].start == 80
    # short utterance still yields one slice
    ws, ms = compute_partial_slices(1000)
    assert len(ms) == 1


def test_embed_utterance_end_to_end(sample_wav):
    wav, sr = sample_wav
    enc = SpeakerEncoderInference()
    wav_p = enc.preprocess_wav(wav, source_sr=sr)
    embed = enc.embed_utterance(wav_p)
    assert embed.shape == (256,)
    np.testing.assert_allclose(np.linalg.norm(embed), 1.0, atol=1e-4)
    # deterministic
    embed2 = enc.embed_utterance(wav_p)
    np.testing.assert_allclose(embed, embed2, atol=1e-6)
    # full-utterance (no partials) path also works
    embed3 = enc.embed_utterance(wav_p, using_partials=False)
    assert embed3.shape == (256,)


def test_training_reduces_loss(tmp_path):
    """Build a tiny synthetic preprocessed dataset and check a few optimizer
    steps reduce GE2E loss."""
    import optax
    from mockingbird_tpu.models.encoder.dataset import (
        SpeakerBatchSampler, SpeakerVerificationDataset)
    from mockingbird_tpu.models.encoder.train import make_train_step

    rng = np.random.RandomState(0)
    n_frames = 40
    for spk in range(4):
        d = tmp_path / f"spk{spk}"
        d.mkdir()
        base = rng.randn(1, 40) * 2
        for utt in range(3):
            frames = (base + rng.randn(n_frames + 20, 40) * 0.3).astype(np.float32)
            np.save(d / f"utt{utt}.npy", frames)

    dataset = SpeakerVerificationDataset(tmp_path)
    sampler = SpeakerBatchSampler(dataset, 4, 3, n_frames)

    model = SpeakerEncoder(hidden_size=32, embedding_size=32)
    params = {
        "model": model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 40)))["params"],
        "similarity": {"weight": jnp.array([10.0]), "bias": jnp.array([-5.0])},
    }
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(1e-2))
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx, 4, 3)

    losses = []
    for _ in range(12):
        batch = jnp.asarray(sampler.next_batch())
        params, opt_state, loss, eer, _ = step_fn(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_encoder_train_loop_with_umap(tmp_path):
    """Full train() loop: checkpoints + periodic UMAP/PCA projection PNGs
    (`encoder/train.py:96-105`)."""
    from mockingbird_tpu.models.encoder.train import train

    rng = np.random.RandomState(0)
    data = tmp_path / "clean"
    for spk in range(4):
        d = data / f"spk{spk}"
        d.mkdir(parents=True)
        base = rng.randn(1, 40) * 2
        for utt in range(3):
            np.save(d / f"utt{utt}.npy",
                    (base + rng.randn(60, 40) * 0.3).astype(np.float32))

    train("enc_run", data, tmp_path / "models", save_every=2, total_steps=2,
          speakers_per_batch=4, utterances_per_speaker=3, log_every=1,
          vis_every=2, use_mesh=False)
    pngs = list((tmp_path / "models" / "enc_run" / "umap").glob("*.png"))
    assert pngs, "projection PNG not written"


def test_checkpoint_roundtrip(tmp_path):
    from mockingbird_tpu.train.checkpoint import load_single, save_single
    params = init_params(jax.random.PRNGKey(0))
    save_single(tmp_path / "enc", {"model": params["model"]})
    enc = SpeakerEncoderInference.from_checkpoint(tmp_path / "enc")
    x = np.random.RandomState(0).randn(2, 160, 40).astype(np.float32)
    out = enc.embed_frames_batch(x)
    model = SpeakerEncoder()
    ref = model.apply({"params": params["model"]}, jnp.asarray(x))
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


def test_lstm_remat_loss_parity():
    """`SpeakerEncoder(remat=True)` (auto-enabled by the trainer at
    >=4096-row batches) must match the non-remat step exactly: same loss,
    same updated params, same `lstm_{i}/...` param tree."""
    import optax
    import jax
    import jax.numpy as jnp
    from mockingbird_tpu.models.encoder.model import SpeakerEncoder, init_params
    from mockingbird_tpu.models.encoder.train import make_train_step

    params = init_params(jax.random.PRNGKey(0))
    batch = jnp.asarray(np.random.RandomState(0).randn(4, 3, 20, 40), np.float32)
    outs = []
    for remat in (False, True):
        model = SpeakerEncoder(remat=remat)
        # param tree must be identical (checkpoints swap between the two)
        fresh = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 20, 40)))["params"]
        assert (jax.tree_util.tree_structure(fresh)
                == jax.tree_util.tree_structure(params["model"]))
        tx = optax.adam(1e-4)
        opt = tx.init(params)
        p = jax.tree.map(jnp.copy, params)
        step = make_train_step(model, tx, 4, 3)
        p2, o2, loss, eer, _ = step(p, opt, batch)
        outs.append((float(loss), jax.tree.map(np.asarray, p2)))
    assert abs(outs[0][0] - outs[1][0]) < 1e-5, (outs[0][0], outs[1][0])
    # EVERY updated parameter must match, not just the first leaf
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-5, atol=1e-6), outs[0][1], outs[1][1])
