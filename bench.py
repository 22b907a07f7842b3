"""End-to-end benchmarks: audio-seconds synthesized per second per chip.

Primary metric (the reference's core product path, SURVEY.md §3.1):
reference wav → GE2E speaker embedding → Tacotron AR mel synthesis (fixed
400-frame workload, stop disabled for determinism) → HiFi-GAN vocoding →
quantised PCM on the host, via the fused on-device path (`pipeline.tts_batch`
internals): mels never leave the chip; the device→host link only carries
quantised PCM.

Trustworthy + attributable (VERDICT r2 Next #1): every stage is fenced
separately (AR decode / vocode / D2H fetch — fences are scalar fetches, not
`block_until_ready`, which the axon tunnel backend does not honour), ≥10
measured iterations, and the record carries median + min + max + raw times.
The quoted value is the MEDIAN, not best-of-N.

Output contract (VERDICT r4 Next #1 — the round-4 driver tail-capture lost
the headline because stdout carried multi-KB raw arrays):
- stdout: ONE COMPACT JSON line — every metric's median/min/max, per-stage
  medians, quality gates, trained_stages. No raw arrays. A tail capture of
  this line alone answers "what was the RTF and did the gate pass".
- full detail (raw iteration times, per-format stage stats) goes to
  `bench_detail.json` next to this file (override: MB_BENCH_DETAIL).

Extra product paths (VERDICT r2 Next #3), same JSON line under "extra",
each gated with the SAME semantics as the flagship (VERDICT r4 Next #5 —
an extra's "pass" also requires trained weights AND a measured fidelity
check, never just rms/centroid sanity):
- VITS text→waveform RTF, staged (compute vs d2h), gated on posterior-mean
  reconstruction fidelity of real speech
- PPG voice conversion RTF on the reference's own whole-directory workload
  (`/root/reference/run.py:63-94`), batched via `convert_wavs`, gated on
  content preservation vs the source mel
- e2e TTS with WaveRNN as the vocoder (fused Pallas sampler inside the full
  pipeline), trained sampler from scripts/wavernn_run.py, gated on
  mel-reconstruction fidelity like the flagship

Quality gate semantics (strictly ordered — an untrained benched stage can
NEVER read as "pass"):
- "pass"      every benched stage runs trained weights AND audio sanity
              (non-silence + speech-band centroid) holds AND the measured
              fidelity check holds;
- "degraded"  the synthesizer is trained but some benched stage fell back
              to random weights — the RTF is still measured but must not
              be quoted as a quality result;
- "untrained" no trained export exists for the path at all;
- "fail"      everything trained but a quality check failed (exit 1).
`--strict` / MB_BENCH_STRICT=1 exits nonzero for anything but "pass".

Env knobs: MB_BENCH_BATCH (128), MB_BENCH_REPS (10), MB_BENCH_PATHS
("all" | "tts"), MB_BENCH_BUDGET_S (2700: skip remaining extra paths once
exceeded — first compiles of the extras can take minutes each).
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

SR = 16000
TEXT = "ni3 hao3 shi4 jie4 zhe4 shi4 yi2 ge4 ce4 shi4 ju4 zi3"
REPO = Path(__file__).parent

# fidelity gate thresholds, calibrated on-chip (trained vs random measured
# values are recorded next to each use below). All four in-domain probes
# separate trained from random by >=1.8x; every threshold sits with
# multiplicative margin on both sides.
VOC_FID_GATE = 0.6       # HiFi-GAN mel-recon L1: trained 0.27, random 1.02
# VITS posterior-mean reconstruction of committed in-domain evidence audio:
# trained 0.69 vs random 1.24 (r5 calibration; the model trains on the toy
# corpus, so OUT-of-domain real speech does not discriminate — measured
# 0.87 trained vs 0.88 random on the reference sample)
VITS_RECON_GATE = 0.95
# PPG teacher-forced dev-probe masked-MSE (the trainer's own acceptance
# statistic, `train_linglf02mel_seq2seq_oneshotvc.py:242-245` parity):
# trained 35.3 vs random 425.6 (r5 calibration on the committed probe)
PPG_DEV_MSE_GATE = 120.0
# WaveRNN mel-recon L1: the trained sampler's floor sits higher than
# HiFi-GAN's (categorical sampling + 9-bit mu-law quantisation noise);
# measured on-chip (r5): random 2.40, trained 0.78 on GTA mels / 0.68 on
# the benched synthesized mels
WAVERNN_FID_GATE = 1.2


def audio_sanity(wavs, sr=SR):
    """(rms, spectral centroid Hz) over the first few outputs (int16 PCM)."""
    cat = np.concatenate([np.asarray(w, np.float64) for w in wavs[:4]])
    rms = float(np.sqrt(np.mean(cat**2)))
    spec = np.abs(np.fft.rfft(cat * np.hanning(len(cat)))) ** 2
    freqs = np.fft.rfftfreq(len(cat), 1 / sr)
    centroid = float((freqs * spec).sum() / max(spec.sum(), 1e-12))
    return rms, centroid


def _fence(x):
    """Force completion of the program producing device array x by fetching
    a scalar (block_until_ready does not reliably bound device work on the
    axon tunnel backend — see .claude/skills/verify)."""
    return float(np.asarray(x).ravel()[0])


def _stats(values):
    v = sorted(values)
    return dict(median=round(float(np.median(v)), 4),
                min=round(v[0], 4), max=round(v[-1], 4),
                raw=[round(x, 4) for x in values])


def _compact_stats(stats):
    """median/min/max only — the stdout line must stay tail-capture safe."""
    return {k: stats[k] for k in ("median", "min", "max")}


def load_reference_wav():
    from mockingbird_tpu import dsp
    sample = "/root/reference/data/samples/T0055G0013S0005.wav"
    try:
        wav, sr = dsp.load_wav(sample)
        return wav, sr, sample
    except Exception:
        t = np.arange(SR * 3) / SR
        wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        return wav, SR, None


def _mel_l1(wav: np.ndarray, ref_mel_tm: np.ndarray, cfg) -> float:
    """L1 in the ±4 SV2TTS mel space between `wav`'s re-analysed mel and a
    reference (T, M) mel, over their overlapping frames."""
    from mockingbird_tpu.dsp import melspectrogram_bucketed
    mel2 = np.asarray(melspectrogram_bucketed(np.asarray(wav, np.float32), cfg))
    t = min(ref_mel_tm.shape[0], mel2.shape[0])
    return float(np.mean(np.abs(ref_mel_tm[:t] - mel2[:t])))


def vocoder_fidelity_l1(pipe, embed) -> float:
    """Mel-reconstruction fidelity of the benched vocoder (VERDICT r3 Weak
    #2: rms/centroid alone pass with a random-weight generator). Synthesize
    a few mels with the benched synthesizer, vocode them, re-analyze the
    audio with the same SV2TTS mel frontend, and report L1 in the
    ±4-normalized mel space. Measured on-chip (r4): random-weight HiFi-GAN
    1.02, the GTA-fine-tuned export 0.27 — the 0.6 gate splits them.
    Mirrors the reference's acceptance loop of listening to eval audio
    against its mel (`/root/reference/models/synthesizer/train.py:240-277`)."""
    texts = [TEXT] * 2
    embeds = np.tile(embed, (2, 1))
    # synthesize_spectrograms documents its (M, T) bin-major return layout
    # (`models/tacotron/inference.py:123-126`)
    specs = pipe.synthesizer.synthesize_spectrograms(
        texts, embeds, min_stop_token=11, steps=200)
    l1 = []
    for spec in specs:
        spec = np.asarray(spec, np.float32)
        wav = np.asarray(pipe.vocoder.infer_waveform(spec), np.float32)
        l1.append(_mel_l1(wav, spec.T, pipe.synthesizer.audio_cfg))
    return float(np.mean(l1))


def bench_tts(reps: int, batch: int):
    """Primary path with per-stage attribution."""
    from mockingbird_tpu.pipeline import VoiceCloningPipeline

    wav, sr, ref = load_reference_wav()
    ckpt = os.environ.get(
        "MB_BENCH_CKPT", str(REPO / "saved_models/attention_run/synthesizer.ckpt"))
    trained = Path(ckpt).exists()
    # trained auxiliary stages when their on-chip evidence runs have exported
    # weights (scripts/encoder_run.py, scripts/gan_run.py) — the benched
    # pipeline is then trained end-to-end, not just the synthesizer
    enc_ckpt = os.environ.get(
        "MB_BENCH_ENC_CKPT", str(REPO / "saved_models/encoder_run/encoder.ckpt"))
    voc_ckpt = os.environ.get(
        "MB_BENCH_VOC_CKPT", str(REPO / "saved_models/gan_run/vocoder_hifigan.ckpt"))
    pipe = VoiceCloningPipeline(
        verbose=False,
        encoder_fpath=enc_ckpt if Path(enc_ckpt).exists() else None,
        synthesizer_fpath=ckpt if trained else None,
        vocoder_fpath=voc_ckpt if Path(voc_ckpt).exists() else None)
    trained_stages = dict(
        synthesizer=trained, encoder=Path(enc_ckpt).exists(),
        vocoder=Path(voc_ckpt).exists())
    texts = [TEXT] * batch
    steps = 400  # fixed AR workload; min_stop_token=11 disables early stop

    t0 = time.time()
    embed = pipe.embed_reference(ref if ref is not None else wav, sr)
    embed_cold = time.time() - t0
    t0 = time.time()
    pipe._embed_cache.clear()
    embed = pipe.embed_reference(ref if ref is not None else wav, sr)
    embed_warm = time.time() - t0
    embeds = np.tile(embed, (batch, 1))
    hop = pipe.vocoder.cfg.hop_size

    def staged(fmt):
        """One fenced iteration; returns (times dict, wavs as int16).

        fmt selects the on-device PCM encoding crossing the tunnel:
        "mulaw8" (1 byte/sample, host LUT-decodes to int16 — counted inside
        d2h_fetch, it is part of delivering PCM) or "int16"."""
        from mockingbird_tpu.dsp import decode_mulaw8_to_int16
        t0 = time.time()
        mels_dev, frame_lens = pipe.synthesizer.synthesize_mels_device(
            texts, embeds, min_stop_token=11, steps=steps)
        _fence(frame_lens)
        t1 = time.time()
        pcm_dev = pipe.vocoder.vocode_device(mels_dev, pcm_format=fmt)
        _fence(pcm_dev[0, :1])
        t2 = time.time()
        pcm = np.asarray(pcm_dev)
        if fmt == "mulaw8":
            pcm = decode_mulaw8_to_int16(pcm)
        lens = np.asarray(frame_lens)
        t3 = time.time()
        wavs = [pcm[j, : int(lens[j]) * hop] for j in range(batch)]
        return dict(ar_decode=t1 - t0, vocode=t2 - t1, d2h_fetch=t3 - t2,
                    e2e=t3 - t0), wavs

    # the d2h PCM fetch dominates e2e on the tunneled host (85%+ of wall,
    # VERDICT r3 Next #3) — measure BOTH on-device encodings and headline
    # the winner; both stat blocks land in the record
    fmts = ("mulaw8", "int16")
    for f in fmts:
        staged(f)  # warm-up (compiles decode + vocode + encode programs)

    stage_names = ("ar_decode", "vocode", "d2h_fetch", "e2e")
    times = {f: {k: [] for k in stage_names} for f in fmts}
    wavs_by_fmt = {}
    for _ in range(reps):
        for f in fmts:
            t, w = staged(f)
            for k in stage_names:
                times[f][k].append(t[k])
            wavs_by_fmt[f] = w

    audio_seconds = sum(len(w) for w in wavs_by_fmt[fmts[0]]) / SR
    rtf_by_fmt = {f: _stats([audio_seconds / t for t in times[f]["e2e"]])
                  for f in fmts}
    fmt = max(fmts, key=lambda f: rtf_by_fmt[f]["median"])
    rtf_stats = rtf_by_fmt[fmt]
    # the gate checks the audio of the HEADLINE format — gate and quoted
    # number must refer to the same bytes (r4 advisor finding)
    wavs = wavs_by_fmt[fmt]
    # what the chip itself sustains (decode+vocode, no host link): the number
    # that matters on pods with local PCIe/DMA instead of this tunnel
    compute_rtf = audio_seconds / (float(np.median(times[fmt]["ar_decode"]))
                                   + float(np.median(times[fmt]["vocode"])))

    # quality gate (VERDICT r3 Weak #2 / Next #2): "pass" requires EVERY
    # benched stage trained AND audio sanity AND the vocoder to actually
    # reconstruct its conditioning mel. Any untrained benched stage caps the
    # gate at "degraded" — never "pass".
    rms, centroid = audio_sanity(wavs)
    sanity_ok = rms > 100 and 150 < centroid < 6000
    # fidelity is only computed when it can affect the gate (all stages
    # trained) — on fresh checkouts it would burn bench wall-clock to
    # produce a number the "degraded"/"untrained" branches never read
    voc_fid = None
    if all(trained_stages.values()):
        voc_fid = vocoder_fidelity_l1(pipe, embed)
    if not trained:
        gate = "untrained"
    elif not all(trained_stages.values()):
        gate = "degraded"
    elif sanity_ok and voc_fid is not None and voc_fid < VOC_FID_GATE:
        gate = "pass"
    else:
        gate = "fail"

    compact = dict(
        value=rtf_stats["median"],
        rtf_median=rtf_stats["median"], rtf_min=rtf_stats["min"],
        rtf_max=rtf_stats["max"],
        pcm_format=fmt,
        compute_rtf=round(compute_rtf, 1),
        reps=reps, batch=batch,
        audio_seconds=round(audio_seconds, 2),
        stages_s={k: _compact_stats(_stats(times[fmt][k])) for k in stage_names},
        d2h_fetch_int16_s=round(float(np.median(times["int16"]["d2h_fetch"])), 4),
        embed_cold_s=round(embed_cold, 3), embed_warm_s=round(embed_warm, 3),
        weights="trained" if trained else "random",
        trained_stages=trained_stages,
        quality_gate=gate, audio_rms=round(rms, 1),
        spectral_centroid_hz=round(centroid, 1),
        vocoder_mel_recon_l1=None if voc_fid is None else round(voc_fid, 3),
    )
    detail = dict(
        rtf_by_pcm_format=rtf_by_fmt,
        stages_s={f: {k: _stats(times[f][k]) for k in stage_names}
                  for f in fmts},
    )
    return compact, detail


def bench_vits(reps: int, batch: int):
    """VITS text→waveform RTF/chip (reference infer is
    `/root/reference/models/synthesizer/models/vits.py:498-527`).

    Staged like the flagship (VERDICT r4 Weak #1: the unfenced e2e number
    swung 97–174× run-to-run — the tunnel's d2h fetch noise, not compute):
    infer compute is fenced separately from the PCM fetch, and the record
    carries both, so the headline's spread is attributable.

    Gate (VERDICT r4 Weak #7): trained weights AND audio sanity AND a
    measured fidelity check — posterior-mean reconstruction of real speech
    (`VitsSynthesizer.reconstruct`): the trained posterior+decoder
    reconstruct the reference sample's mel, random weights cannot."""
    from mockingbird_tpu.config import sv2tts_audio_config
    from mockingbird_tpu.dsp import melspectrogram_bucketed
    from mockingbird_tpu.models.vits.inference import VitsSynthesizer

    ckpt = os.environ.get(
        "MB_BENCH_VITS_CKPT",
        str(REPO / "saved_models/vits_run/synthesizer_vits.ckpt"))
    trained = Path(ckpt).exists()
    cfg_path = Path(ckpt).with_name("config.json")
    cfg = None
    if trained and cfg_path.exists():
        from mockingbird_tpu.config import Config
        cfg = Config.from_json(cfg_path)
    syn = VitsSynthesizer(ckpt if trained else None, cfg=cfg, verbose=False)
    texts = [TEXT] * batch
    hop = syn.cfg.hop_size

    def staged():
        t0 = time.time()
        o_dev, ylen_dev = syn.synthesize_device(texts, max_frames=400,
                                                pcm16=True)
        _fence(ylen_dev)
        _fence(o_dev[0, :1])
        t1 = time.time()
        o = np.asarray(o_dev)
        ylen = np.asarray(ylen_dev)
        wavs = [o[i, : ylen[i] * hop] for i in range(batch)]
        t2 = time.time()
        return dict(infer=t1 - t0, d2h_fetch=t2 - t1, e2e=t2 - t0), wavs

    staged()  # warm-up
    times = {k: [] for k in ("infer", "d2h_fetch", "e2e")}
    wavs = None
    for _ in range(reps):
        t, wavs = staged()
        for k in times:
            times[k].append(t[k])
    audio_seconds = sum(len(w) for w in wavs) / SR
    rtf_stats = _stats([audio_seconds / t for t in times["e2e"]])
    compute_rtf = audio_seconds / float(np.median(times["infer"]))

    rms, centroid = audio_sanity(wavs)
    sanity_ok = rms > 100 and 150 < centroid < 6000
    # fidelity probe: posterior-mean reconstruction of committed IN-DOMAIN
    # evidence audio (the toy-corpus ground truth the whole evidence chain
    # trains on) — out-of-domain real speech does not discriminate trained
    # from random (see VITS_RECON_GATE calibration note)
    recon_l1 = None
    probe = REPO / "saved_models/gan_run/eval/ground_truth.wav"
    if trained and probe.exists():
        from mockingbird_tpu.dsp import load_wav
        gt, _ = load_wav(probe)
        acfg = sv2tts_audio_config()
        src_mel = np.asarray(melspectrogram_bucketed(
            np.asarray(gt, np.float32), acfg))
        recon = syn.reconstruct(gt)
        recon_l1 = _mel_l1(recon, src_mel, acfg)
    if not trained:
        gate = "untrained"
    elif recon_l1 is None:
        gate = "degraded"  # trained but the committed probe audio is gone
    elif sanity_ok and recon_l1 < VITS_RECON_GATE:
        gate = "pass"
    else:
        gate = "fail"
    compact = dict(
        metric="vits_e2e_rtf_per_chip", value=rtf_stats["median"],
        unit="audio_seconds/s/chip", rtf_min=rtf_stats["min"],
        rtf_max=rtf_stats["max"], compute_rtf=round(compute_rtf, 1),
        stages_s={k: round(float(np.median(v)), 4) for k, v in times.items()},
        reps=reps, batch=batch, audio_seconds=round(audio_seconds, 2),
        weights="trained" if trained else "random", quality_gate=gate,
        recon_mel_l1=None if recon_l1 is None else round(recon_l1, 3),
        audio_rms=round(rms, 1), spectral_centroid_hz=round(centroid, 1))
    detail = dict(metric="vits_e2e_rtf_per_chip",
                  rtf=rtf_stats,
                  stages_s={k: _stats(v) for k, v in times.items()})
    return compact, detail


def bench_ppg_vc(reps: int, batch: int = 8):
    """PPG one-shot voice conversion on the reference's own workload: a
    whole directory of utterances (`/root/reference/run.py:63-94`, which
    prints rtf = elapsed / (0.01 * mel_len), LOWER is better — reported
    here as `rtf_reference_convention`). The batched `convert_wavs` path
    converts `batch` utterances per device dispatch (VERDICT r4 Next #2);
    `value` is audio-seconds converted per wall second per chip.

    Gate: trained weights AND the trainer's own acceptance statistic —
    teacher-forced masked mel-MSE on a committed in-domain dev probe
    (`saved_models/ppg_run/eval_probe.npz`, two dev utterances' PPG/lf0/
    embed/mel from the evidence run's real VC preprocess). Calibrated r5:
    trained 35.3 vs random 425.6; gate 120. (A content-preservation L1 vs
    the real-speech source does NOT discriminate — measured 1.12 trained
    vs 1.20 random, the toy-trained model being out of domain there.)"""
    from mockingbird_tpu.models.ppg import VoiceConverter

    wav, sr, ref = load_reference_wav()
    ckpt = os.environ.get(
        "MB_BENCH_PPG_CKPT", str(REPO / "saved_models/ppg_run/ppg2mel.ckpt"))
    trained = Path(ckpt).exists()
    vc = VoiceConverter(ckpt if trained else None, verbose=False)
    if ref is not None:
        vc.set_reference(ref)
    else:
        vc.ref_embed = vc.encoder.embed_utterance(wav)

    # the whole-dir workload: `batch` distinct utterances (offset crops of
    # the sample so lengths/content differ, as a directory's files would)
    n = len(wav)
    srcs = [wav[int(i * n / (2 * batch)): int(i * n / (2 * batch)) + n // 2]
            for i in range(batch)]
    # stop_threshold > 1 disables the stop token (sigmoid <= 1): with random
    # weights it would fire after a few frames and shrink the workload to
    # nothing; the honest workload is converting the full utterances
    mels = vc.convert_wavs(srcs, stop_threshold=2.0)  # warm-up + compiles
    rtfs, ref_rtfs = [], []
    for _ in range(reps):
        t0 = time.time()
        mels = vc.convert_wavs(srcs, stop_threshold=2.0)
        dt = time.time() - t0
        audio_s = 0.01 * sum(m.shape[0] for m in mels)  # 10 ms frames
        rtfs.append(audio_s / dt)
        ref_rtfs.append(dt / max(audio_s, 1e-6))
    rtf_stats = _stats(rtfs)

    dev_mse = None
    probe_path = REPO / "saved_models/ppg_run/eval_probe.npz"
    if trained and probe_path.exists():
        import jax.numpy as jnp
        from mockingbird_tpu.models.ppg.train import make_vc_val_fn
        probe = {k: jnp.asarray(v) for k, v in np.load(probe_path).items()}
        val_fn = make_vc_val_fn(vc.model)
        l_mel, _ = val_fn(vc.variables["params"], vc.variables["batch_stats"],
                          probe)
        dev_mse = float(l_mel)
    mel_sane = all(np.isfinite(m).all() and m.std() > 0.05 for m in mels)
    if not trained:
        gate = "untrained"
    elif dev_mse is None:
        gate = "degraded"  # trained but the committed dev probe is gone
    elif mel_sane and dev_mse < PPG_DEV_MSE_GATE:
        gate = "pass"
    else:
        gate = "fail"
    compact = dict(
        metric="ppg_vc_rtf_per_chip", value=rtf_stats["median"],
        unit="audio_seconds/s/chip", rtf_min=rtf_stats["min"],
        rtf_max=rtf_stats["max"],
        rtf_reference_convention=round(float(np.median(ref_rtfs)), 4),
        reps=reps, batch=batch,
        mel_frames=int(sum(m.shape[0] for m in mels)),
        weights="trained" if trained else "random", quality_gate=gate,
        dev_probe_mse=None if dev_mse is None else round(dev_mse, 2))
    return compact, dict(metric="ppg_vc_rtf_per_chip", rtf=rtf_stats)


def bench_wavernn_e2e(reps: int, batch: int):
    """Full pipeline with WaveRNN selected as the vocoder: the fused Pallas
    sampling kernel measured inside text→wav, not in isolation (VERDICT r2
    Weak #3). The sampler runs the TRAINED export from
    scripts/wavernn_run.py (GTA fine-tune, `wavernn/train.py:16-127`
    parity); gate semantics match the flagship."""
    from mockingbird_tpu.models.tacotron import Synthesizer
    from mockingbird_tpu.models.vocoder.wavernn import WaveRnnVocoder
    from mockingbird_tpu.models.encoder import SpeakerEncoderInference
    from mockingbird_tpu.config import Config

    wav, sr, ref = load_reference_wav()
    ckpt = os.environ.get(
        "MB_BENCH_CKPT", str(REPO / "saved_models/attention_run/synthesizer.ckpt"))
    trained = Path(ckpt).exists()
    wr_ckpt = os.environ.get(
        "MB_BENCH_WAVERNN_CKPT",
        str(REPO / "saved_models/wavernn_run/vocoder_wavernn.ckpt"))
    wr_trained = Path(wr_ckpt).exists()
    wr_cfg = None
    if wr_trained and Path(wr_ckpt).with_suffix(".json").exists():
        wr_cfg = Config.from_json(Path(wr_ckpt).with_suffix(".json"))
    syn = Synthesizer(ckpt if trained else None, verbose=False)
    voc = WaveRnnVocoder(wr_ckpt if wr_trained else None, cfg=wr_cfg,
                         verbose=False)
    enc_ckpt = os.environ.get(
        "MB_BENCH_ENC_CKPT", str(REPO / "saved_models/encoder_run/encoder.ckpt"))
    enc_trained = Path(enc_ckpt).exists()
    enc = (SpeakerEncoderInference.from_checkpoint(enc_ckpt) if enc_trained
           else SpeakerEncoderInference())
    embed = enc.embed_utterance(enc.preprocess_wav(wav, sr))
    texts = [TEXT] * batch
    embeds = np.tile(embed, (batch, 1))
    steps = 400  # stop disabled → every mel is exactly 400 frames → ONE
    # WaveRNN mel-length bucket → one kernel compile
    trained_stages = dict(synthesizer=trained, encoder=enc_trained,
                          vocoder=wr_trained)

    def run():
        specs = syn.synthesize_spectrograms(texts, embeds, min_stop_token=11,
                                            steps=steps)
        # one fused program for the whole batch: every utterance's folds
        # share the Pallas kernel's lanes (~4× over per-utterance calls)
        return specs, voc.infer_waveform_batch(specs)

    specs, wavs = run()  # warm-up
    dts = []
    for _ in range(reps):
        t0 = time.time()
        specs, wavs = run()
        dts.append(time.time() - t0)
    audio_seconds = sum(len(w) for w in wavs) / SR
    rtf_stats = _stats([audio_seconds / t for t in dts])

    rms, centroid = audio_sanity([w * 32767 for w in wavs])  # float path
    sanity_ok = rms > 100 and 150 < centroid < 6000
    wr_fid = None
    if all(trained_stages.values()):
        # fidelity: the benched sampler must reconstruct its conditioning
        # mel (same statistic as the flagship's HiFi-GAN gate; calibration
        # in saved_models/wavernn_run/history.json — step 0 is the
        # random-weight value)
        spec0 = np.asarray(specs[0], np.float32)              # (M, T)
        wr_fid = _mel_l1(np.asarray(wavs[0], np.float32), spec0.T,
                         syn.audio_cfg)
    if not trained:
        gate = "untrained"
    elif not all(trained_stages.values()):
        gate = "degraded"
    elif sanity_ok and wr_fid is not None and wr_fid < WAVERNN_FID_GATE:
        gate = "pass"
    else:
        gate = "fail"
    weights = ("trained" if all(trained_stages.values())
               else "trained_synth" if trained else "random")
    compact = dict(
        metric="e2e_tts_wavernn_rtf_per_chip", value=rtf_stats["median"],
        unit="audio_seconds/s/chip", rtf_min=rtf_stats["min"],
        rtf_max=rtf_stats["max"], reps=reps, batch=batch,
        audio_seconds=round(audio_seconds, 2), weights=weights,
        trained_stages=trained_stages, quality_gate=gate,
        wavernn_mel_recon_l1=None if wr_fid is None else round(wr_fid, 3),
        audio_rms=round(rms, 1), spectral_centroid_hz=round(centroid, 1))
    return compact, dict(metric="e2e_tts_wavernn_rtf_per_chip", rtf=rtf_stats)


def main():
    reps = int(os.environ.get("MB_BENCH_REPS", "10"))
    batch = int(os.environ.get("MB_BENCH_BATCH", "128"))
    paths = os.environ.get("MB_BENCH_PATHS", "all")
    budget = float(os.environ.get("MB_BENCH_BUDGET_S", "2700"))
    detail_path = os.environ.get("MB_BENCH_DETAIL",
                                 str(REPO / "bench_detail.json"))
    # --strict / MB_BENCH_STRICT=1: exit nonzero unless the gate is "pass"
    # (a driver can refuse to record a bench that ran degraded/untrained)
    strict = "--strict" in sys.argv or os.environ.get("MB_BENCH_STRICT") == "1"
    t_start = time.time()

    primary, primary_detail = bench_tts(reps, batch)
    out = {
        "metric": "e2e_tts_rtf_per_chip",
        "value": primary.pop("value"),
        "unit": "audio_seconds/s/chip",
        "vs_baseline": round(primary["rtf_median"] / 50.0, 3),
        **primary,
    }
    details = {"e2e_tts_rtf_per_chip": primary_detail}

    if paths == "all":
        extras = []
        for name, fn in (("vits", lambda: bench_vits(max(reps, 10), min(batch, 64))),
                         ("ppg_vc", lambda: bench_ppg_vc(max(reps // 2, 5))),
                         ("wavernn_e2e", lambda: bench_wavernn_e2e(
                             max(reps // 2, 3), min(batch, 8)))):
            if time.time() - t_start > budget:
                extras.append(dict(metric=name, skipped="budget"))
                continue
            try:
                compact, detail = fn()
                extras.append(compact)
                details[compact["metric"]] = detail
            except Exception as e:  # a broken extra path must not hide the primary
                extras.append(dict(metric=name, error=f"{type(e).__name__}: {e}"))
        out["extra"] = extras

    try:
        Path(detail_path).write_text(json.dumps(
            {"compact": out, "detail": details}, indent=1))
    except OSError:
        pass  # detail is best-effort; the stdout line is the record
    print(json.dumps(out))
    if strict:
        return 0 if out.get("quality_gate") == "pass" else 1
    return 0 if out.get("quality_gate") != "fail" else 1


if __name__ == "__main__":
    sys.exit(main())
