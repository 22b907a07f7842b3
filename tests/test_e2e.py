"""End-to-end pipeline integration test on a tiny synthetic corpus:
preprocess → embeddings → Tacotron training → GTA → vocoder dataset →
TTS through the Pipeline facade. Small configs, CPU, a few minutes."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full preprocess->train pipelines (SURVEY.md 4f)

import jax
import jax.numpy as jnp

from mockingbird_tpu.config import Config, sv2tts_audio_config


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """A fake aidatatang-style corpus: 2 speakers × 4 utterances of
    harmonic 'speech' + a transcript file (8 total: divisible over the
    8-device virtual mesh for the use_mesh=True trainer run)."""
    root = tmp_path_factory.mktemp("corpus")
    ds = root / "aidatatang_200zh"
    trans_dir = ds / "transcript"
    trans_dir.mkdir(parents=True)
    lines = []
    rng = np.random.RandomState(0)
    from scipy.io import wavfile
    sr = 16000
    for spk in ("G0001", "G0002"):
        spk_dir = ds / "corpus" / "train" / spk
        spk_dir.mkdir(parents=True)
        f_base = 150 if spk == "G0001" else 250
        for i in range(4):
            utt = f"T0055{spk}S{i:04d}"
            t = np.arange(int(sr * 1.2)) / sr
            f0 = f_base * (1 + 0.05 * np.sin(2 * np.pi * 3 * t + i))
            wav = 0.3 * np.sin(2 * np.pi * f0 * t)
            wav += 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
            wav += 0.01 * rng.randn(len(t))
            wavfile.write(spk_dir / f"{utt}.wav", sr, (wav * 32767).astype(np.int16))
            lines.append(f"{utt} ni3 hao3 shi4 jie4 {i}")
    (trans_dir / "aidatatang_200_zh_transcript.txt").write_text("\n".join(lines))
    return root


@pytest.fixture(scope="module")
def syn_dir(corpus, tmp_path_factory):
    from mockingbird_tpu.models.tacotron.preprocess import (create_embeddings,
                                                            preprocess_dataset)
    out = tmp_path_factory.mktemp("syn")
    audio_cfg = sv2tts_audio_config().merge(dict(utterance_min_duration=0.3))
    preprocess_dataset(corpus, out, n_processes=2, dataset="aidatatang_200zh",
                       audio_cfg=audio_cfg)
    train_txt = (out / "train.txt").read_text().strip().splitlines()
    assert len(train_txt) == 8, train_txt
    create_embeddings(out, None, n_processes=2)
    assert len(list((out / "embeds").glob("*.npy"))) == 8
    return out


def test_preprocess_outputs(syn_dir):
    mels = sorted((syn_dir / "mels").glob("*.npy"))
    assert len(mels) == 8
    m = np.load(mels[0])
    assert m.shape[0] == 80  # stored (M, T) like the reference
    assert -4.01 <= m.min() and m.max() <= 4.01
    line = (syn_dir / "train.txt").read_text().splitlines()[0].split("|")
    assert len(line) == 6 and "ni3" in line[5]


def test_tacotron_train_and_gta(syn_dir, tmp_path):
    from mockingbird_tpu.models.tacotron import tacotron_config
    from mockingbird_tpu.models.tacotron.train import run_gta_synthesis, train

    cfg = tacotron_config().merge(dict(
        embed_dims=32, encoder_dims=16, decoder_dims=16, postnet_dims=32,
        lstm_dims=32, gst_E=16, gst_num_heads=4, gst_ref_filters=(4, 4)))
    schedule = ((2, 1e-3, 4, 2),)
    # use_mesh=True: this trainer runs its real sharded SPMD step over the
    # 8-device virtual mesh (batch auto-rounds up to the data-axis size)
    train("e2e_run", syn_dir, tmp_path, schedule=schedule, save_every=0,
          eval_every=3, total_steps=3, use_mesh=True, cfg=cfg)
    # eval artifacts at step 3 (`train.py:240-277, 286-316` parity)
    eval_dir = tmp_path / "e2e_run" / "eval"
    assert (eval_dir / "attention_000003.png").exists()
    assert (eval_dir / "mel-prediction-step-000003.npy").exists()
    assert (eval_dir / "step-000003-wave-from-mel.wav").exists()
    assert (eval_dir / "step-000003-mel-spectrogram.png").exists()
    # resume from checkpoint + GTA
    run_gta_synthesis("e2e_run", syn_dir, tmp_path, r=2, batch_size=2, cfg=cfg)
    gta = sorted((syn_dir / "mels_gta").glob("*.npy"))
    assert len(gta) == 8
    ref_mel = np.load(sorted((syn_dir / "mels").glob("*.npy"))[0])
    gta_mel = np.load(gta[0])
    assert gta_mel.shape[0] == 80
    # GTA length matches (padded-to-r) ground truth length
    assert abs(gta_mel.shape[1] - ref_mel.shape[1]) <= 2


def test_pipeline_tts_with_fresh_weights(syn_dir, tmp_path):
    """Full user flow via the facade: reference wav → cloned (untrained) TTS."""
    from mockingbird_tpu.pipeline import VoiceCloningPipeline
    from mockingbird_tpu.models.tacotron.inference import Synthesizer
    from mockingbird_tpu.models.vocoder import GanVocoder
    from mockingbird_tpu.models.tacotron import tacotron_config
    from mockingbird_tpu.config import Config
    from mockingbird_tpu.models.vocoder import hifigan_config

    pipe = VoiceCloningPipeline(verbose=False)
    # shrink models for test speed
    pipe.synthesizer = Synthesizer(cfg=tacotron_config().merge(dict(
        embed_dims=32, encoder_dims=16, decoder_dims=16, postnet_dims=32,
        lstm_dims=32, gst_E=16, gst_num_heads=4, gst_ref_filters=(4, 4))),
        verbose=False)
    pipe.vocoder = GanVocoder("hifigan", cfg=Config(hifigan_config()).merge(dict(
        upsample_initial_channel=32, resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]])), verbose=False)

    wav_files = sorted((syn_dir / "audio").glob("*.npy"))
    ref = np.load(wav_files[0])
    out = pipe.clone_voice("ni3 hao3", ref, steps=40)
    assert len(out) == 1
    assert np.isfinite(out[0]).all()
    assert len(out[0]) > 0

    # fused on-device path: int16 PCM, same per-item lengths as staged path
    fused = pipe.tts_batch(["ni3 hao3", "ce4 shi4"], ref, steps=40,
                           min_stop_token=11)
    assert len(fused) == 2
    hop = pipe.vocoder.cfg.hop_size
    for w in fused:
        assert w.dtype == np.int16
        assert len(w) == 200 * hop  # stop disabled → full (bucketed) workload
        assert np.abs(w.astype(np.int32)).max() <= 32767
    # float32 variant (same batch → same dropout draws) matches the quantised one
    fused32 = pipe.tts_batch(["ni3 hao3", "ce4 shi4"], ref, steps=40,
                             min_stop_token=11, pcm16=False)
    assert fused32[0].dtype == np.float32
    q = np.round(np.clip(fused32[0], -1, 1) * 32767).astype(np.int16)
    assert np.abs(q.astype(np.int32) - fused[0].astype(np.int32)).max() <= 1

    # long-text path: chunks + silence breaks through the fused batch path
    long = pipe.clone_voice_long("ni3 hao3. wo3 men qu4. zai4 jian4.",
                                 ref, steps=40, min_stop_token=11,
                                 max_chars=10, break_seconds=0.05)
    assert long.dtype == np.float32
    assert len(long) >= 3 * 200 * hop + 2 * int(0.05 * 16000)


def test_wavernn_train_with_gen_testset(syn_dir, tmp_path):
    """Trainer + per-checkpoint sample generation (`wavernn/train.py:125-126`)."""
    from mockingbird_tpu.models.vocoder import wavernn_config
    from mockingbird_tpu.models.vocoder.wavernn_train import train

    cfg = Config(wavernn_config()).merge(dict(
        rnn_dims=32, fc_dims=32, compute_dims=16, res_out_dims=16, res_blocks=2,
        seq_len=256 * 2, batch_size=2, gen_target=2000, gen_overlap=200))
    train("wr_run", syn_dir, tmp_path, ground_truth=True, total_steps=2,
          save_every=2, log_every=1, cfg=cfg, use_mesh=False, gen_samples=1)
    samples = sorted((tmp_path / "wr_run" / "samples_wavernn").glob("*.wav"))
    # one target + one generated wav at the step-2 checkpoint
    assert len(samples) >= 2, samples
    from scipy.io import wavfile
    sr, wav = wavfile.read(samples[0])
    assert sr == cfg.sample_rate and len(wav) > 0


def test_gan_train_with_validation(syn_dir, tmp_path, capsys):
    """GAN trainer validation pass (`hifigan/train.py:198-244`)."""
    from mockingbird_tpu.models.vocoder.gan_train import train

    cfg = dict(upsample_initial_channel=32, resblock_kernel_sizes=[3],
               resblock_dilation_sizes=[[1, 3]], segment_size=2000,
               batch_size=2)
    train("gan_run", syn_dir, tmp_path, arch="hifigan", total_steps=2,
          save_every=0, log_every=1, val_every=2, cfg=cfg, use_mesh=False)
    assert "val mel err" in capsys.readouterr().out


def test_vits_train_with_eval(syn_dir, tmp_path, capsys):
    """VITS trainer end-to-end on the synthetic corpus, with the periodic
    inference eval (`train_vits.py:342-381`)."""
    from mockingbird_tpu.models.vits.train import train

    cfg = dict(inter_channels=32, hidden_channels=32, filter_channels=64,
               n_heads=2, n_layers=2, upsample_initial_channel=64,
               resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
               segment_size=2048, gin_channels=16, eval_max_len=50)
    train("vits_run", syn_dir, tmp_path, cfg=cfg, batch_size=2, total_steps=2,
          save_every=2, log_every=1, eval_every=2, use_mesh=False)
    assert "eval: generated" in capsys.readouterr().out
    assert (tmp_path / "vits_run" / "ckpt_vits").exists()


def test_vocoder_dataset_from_gta(syn_dir):
    from mockingbird_tpu.models.vocoder.wavernn_train import (WaveRnnDataset,
                                                              collate_wavernn)
    from mockingbird_tpu.models.vocoder import wavernn_config
    cfg = Config(wavernn_config()).merge(dict(seq_len=256 * 2))
    ds = WaveRnnDataset(syn_dir / "train.txt", syn_dir / "mels_gta",
                        syn_dir / "audio", cfg)
    assert len(ds) == 8
    batch = collate_wavernn([ds[0], ds[1]], cfg)
    assert batch["x"].shape == (2, 512)
    assert batch["mels"].shape[2] == 80
    assert batch["y"].shape == (2, 512)
    assert batch["y"].max() < 512  # 9-bit classes
