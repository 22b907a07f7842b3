"""End-to-end benchmarks: audio-seconds synthesized per second per chip.

Primary metric (the reference's core product path, SURVEY.md §3.1):
reference wav → GE2E speaker embedding → Tacotron AR mel synthesis (fixed
400-frame workload, stop disabled for determinism) → HiFi-GAN vocoding →
int16 PCM on the host, via the fused on-device path (`pipeline.tts_batch`
internals): mels never leave the chip; the device→host link only carries
quantised PCM.

Trustworthy + attributable (VERDICT r2 Next #1): every stage is fenced
separately (AR decode / vocode / D2H fetch — fences are scalar fetches, not
`block_until_ready`, which the axon tunnel backend does not honour), ≥10
measured iterations, and the JSON carries median + min + max + all raw
times. The quoted value is the MEDIAN, not best-of-N.

Extra product paths (VERDICT r2 Next #3), same JSON line under "extra":
- VITS text→waveform RTF (`models/vits/inference.py`)
- PPG voice conversion RTF — the metric the reference itself prints
  (`/root/reference/run.py:85-94`)
- e2e TTS with WaveRNN as the vocoder (the fused Pallas sampling kernel
  measured inside the full pipeline, not in isolation)

Prints ONE JSON line. Quality gate semantics (strictly ordered — an
untrained benched stage can NEVER read as "pass"):
- "pass"      every benched stage runs trained weights AND audio sanity
              (non-silence + speech-band centroid) holds AND the vocoder
              mel-reconstruction L1 check holds;
- "degraded"  the synthesizer is trained but some benched stage
              (encoder / vocoder) fell back to random weights — the RTF is
              still measured but must not be quoted as a quality result;
- "untrained" no trained synthesizer export exists at all;
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


def vocoder_fidelity_l1(pipe, embed) -> float:
    """Mel-reconstruction fidelity of the benched vocoder (VERDICT r3 Weak
    #2: rms/centroid alone pass with a random-weight generator). Synthesize
    a few mels with the benched synthesizer, vocode them, re-analyze the
    audio with the same SV2TTS mel frontend, and report L1 in the
    ±4-normalized mel space. Measured on-chip (r4): random-weight HiFi-GAN
    1.02, the GTA-fine-tuned export 0.27 — the 0.6 gate splits them.
    Mirrors the reference's acceptance loop of listening to eval audio
    against its mel (`/root/reference/models/synthesizer/train.py:240-277`)."""
    from mockingbird_tpu.dsp import melspectrogram
    texts = [TEXT] * 2
    embeds = np.tile(embed, (2, 1))
    specs = pipe.synthesizer.synthesize_spectrograms(
        texts, embeds, min_stop_token=11, steps=200)
    l1 = []
    for spec in specs:
        spec = np.asarray(spec, np.float32)
        if spec.shape[0] != pipe.synthesizer.audio_cfg.num_mels:
            spec = spec.T  # → (M, T)
        wav = np.asarray(pipe.vocoder.infer_waveform(spec), np.float32)
        mel2 = np.asarray(melspectrogram(wav, pipe.synthesizer.audio_cfg)).T
        t = min(spec.shape[1], mel2.shape[1])
        l1.append(float(np.mean(np.abs(spec[:, :t] - mel2[:, :t]))))
    return float(np.mean(l1))


def bench_tts(reps: int, batch: int):
    """Primary path with per-stage attribution."""
    import jax.numpy as jnp
    from mockingbird_tpu.pipeline import VoiceCloningPipeline

    wav, sr, ref = load_reference_wav()
    ckpt = os.environ.get(
        "MB_BENCH_CKPT",
        str(Path(__file__).parent / "saved_models/attention_run/synthesizer.ckpt"))
    trained = Path(ckpt).exists()
    # trained auxiliary stages when their on-chip evidence runs have exported
    # weights (scripts/encoder_run.py, scripts/gan_run.py) — the benched
    # pipeline is then trained end-to-end, not just the synthesizer
    enc_ckpt = os.environ.get(
        "MB_BENCH_ENC_CKPT",
        str(Path(__file__).parent / "saved_models/encoder_run/encoder.ckpt"))
    voc_ckpt = os.environ.get(
        "MB_BENCH_VOC_CKPT",
        str(Path(__file__).parent / "saved_models/gan_run/vocoder_hifigan.ckpt"))
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
    # the winner; both stat blocks land in the JSON
    fmts = ("mulaw8", "int16")
    for f in fmts:
        staged(f)  # warm-up (compiles decode + vocode + encode programs)

    stage_names = ("ar_decode", "vocode", "d2h_fetch", "e2e")
    times = {f: {k: [] for k in stage_names} for f in fmts}
    wavs = None
    for _ in range(reps):
        for f in fmts:
            t, w = staged(f)
            for k in stage_names:
                times[f][k].append(t[k])
            if f == "mulaw8":
                wavs = w  # gate checks run on the headline-format audio

    audio_seconds = sum(len(w) for w in wavs) / SR
    rtf_by_fmt = {f: _stats([audio_seconds / t for t in times[f]["e2e"]])
                  for f in fmts}
    fmt = max(fmts, key=lambda f: rtf_by_fmt[f]["median"])
    rtf_stats = rtf_by_fmt[fmt]
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
    voc_fid = None
    if trained_stages["vocoder"]:
        voc_fid = vocoder_fidelity_l1(pipe, embed)
    if not trained:
        gate = "untrained"
    elif not all(trained_stages.values()):
        gate = "degraded"
    # threshold calibrated on-chip (r4): GTA-fine-tuned export 0.27,
    # random-weight generator 1.02 — 0.6 splits them with margin both ways
    elif sanity_ok and voc_fid is not None and voc_fid < 0.6:
        gate = "pass"
    else:
        gate = "fail"

    return dict(
        value=rtf_stats["median"],
        rtf_median=rtf_stats["median"], rtf_min=rtf_stats["min"],
        rtf_max=rtf_stats["max"], rtf_raw=rtf_stats["raw"],
        pcm_format=fmt,
        rtf_by_pcm_format=rtf_by_fmt,
        compute_rtf=round(compute_rtf, 1),
        reps=reps, batch=batch,
        audio_seconds=round(audio_seconds, 2),
        stages_s={k: _stats(times[fmt][k]) for k in stage_names},
        d2h_fetch_int16_s=_stats(times["int16"]["d2h_fetch"]),
        embed_cold_s=round(embed_cold, 3), embed_warm_s=round(embed_warm, 3),
        weights="trained" if trained else "random",
        trained_stages=trained_stages,
        quality_gate=gate, audio_rms=round(rms, 1),
        spectral_centroid_hz=round(centroid, 1),
        vocoder_mel_recon_l1=None if voc_fid is None else round(voc_fid, 3),
    )


def bench_vits(reps: int, batch: int):
    """VITS text→waveform RTF/chip (VERDICT r2 Next #3; reference infer is
    `/root/reference/models/synthesizer/models/vits.py:498-527`)."""
    from mockingbird_tpu.models.vits.inference import VitsSynthesizer

    ckpt = os.environ.get(
        "MB_BENCH_VITS_CKPT",
        str(Path(__file__).parent / "saved_models/vits_run/synthesizer_vits.ckpt"))
    trained = Path(ckpt).exists()
    cfg_path = Path(ckpt).with_name("config.json")
    cfg = None
    if trained and cfg_path.exists():
        from mockingbird_tpu.config import Config
        cfg = Config.from_json(cfg_path)
    syn = VitsSynthesizer(ckpt if trained else None, cfg=cfg, verbose=False)
    texts = [TEXT] * batch

    wavs = syn.synthesize(texts, max_frames=400, pcm16=True)  # warm-up
    dts = []
    for _ in range(reps):
        t0 = time.time()
        wavs = syn.synthesize(texts, max_frames=400, pcm16=True)
        dts.append(time.time() - t0)
    audio_seconds = sum(len(w) for w in wavs) / SR
    rtfs = [audio_seconds / t for t in dts]
    rms, centroid = audio_sanity(wavs)
    gate = ("pass" if (rms > 100 and 150 < centroid < 6000) else "fail") \
        if trained else "untrained"
    s = _stats(rtfs)
    return dict(metric="vits_e2e_rtf_per_chip", value=s["median"],
                unit="audio_seconds/s/chip", rtf_min=s["min"], rtf_max=s["max"],
                reps=reps, batch=batch, audio_seconds=round(audio_seconds, 2),
                weights="trained" if trained else "random", quality_gate=gate,
                audio_rms=round(rms, 1), spectral_centroid_hz=round(centroid, 1))


def bench_ppg_vc(reps: int):
    """PPG one-shot voice conversion RTF — the metric the reference prints
    (`/root/reference/run.py:85-94`: rtf = elapsed / (0.01 * mel_len),
    LOWER is better). Also reported as audio_s/s (higher is better)."""
    from mockingbird_tpu.models.ppg import VoiceConverter

    wav, sr, ref = load_reference_wav()
    ckpt = os.environ.get(
        "MB_BENCH_PPG_CKPT",
        str(Path(__file__).parent / "saved_models/ppg_run/ppg2mel.ckpt"))
    trained = Path(ckpt).exists()
    vc = VoiceConverter(ckpt if trained else None, verbose=False)
    if ref is not None:
        vc.set_reference(ref)
    else:
        vc.ref_embed = vc.encoder.embed_utterance(wav)

    # stop_threshold > 1 disables the stop token (sigmoid ≤ 1): with random
    # weights it would fire after a few frames and shrink the workload to
    # nothing; the honest workload is converting the full utterance. The
    # warm-up run reveals the utterance's frame count; max_steps is then
    # bucketed to it so the AR loop does ~the audio's worth of work.
    mel, _ = vc.convert_wav(wav, stop_threshold=2.0)  # warm-up
    max_steps = max(((mel.shape[0] + 99) // 100) * 100, 200)
    mel, _ = vc.convert_wav(wav, max_steps=max_steps, stop_threshold=2.0)
    ref_rtfs, rtfs = [], []
    for _ in range(reps):
        t0 = time.time()
        mel, _ = vc.convert_wav(wav, max_steps=max_steps, stop_threshold=2.0)
        dt = time.time() - t0
        audio_s = 0.01 * mel.shape[0]  # 10 ms frames, as the reference counts
        ref_rtfs.append(dt / max(audio_s, 1e-6))
        rtfs.append(audio_s / dt)
    s = _stats(rtfs)
    return dict(metric="ppg_vc_rtf_per_chip", value=s["median"],
                unit="audio_seconds/s/chip", rtf_min=s["min"], rtf_max=s["max"],
                rtf_reference_convention=round(float(np.median(ref_rtfs)), 4),
                reps=reps, mel_frames=int(mel.shape[0]),
                weights="trained" if trained else "random",
                quality_gate="untrained" if not trained else "n/a")


def bench_wavernn_e2e(reps: int, batch: int):
    """Full pipeline with WaveRNN selected as the vocoder: the fused Pallas
    sampling kernel measured inside text→wav, not in isolation
    (VERDICT r2 Weak #3)."""
    from mockingbird_tpu.models.tacotron import Synthesizer
    from mockingbird_tpu.models.vocoder.wavernn import WaveRnnVocoder
    from mockingbird_tpu.models.encoder import SpeakerEncoderInference

    wav, sr, ref = load_reference_wav()
    ckpt = os.environ.get(
        "MB_BENCH_CKPT",
        str(Path(__file__).parent / "saved_models/attention_run/synthesizer.ckpt"))
    trained = Path(ckpt).exists()
    syn = Synthesizer(ckpt if trained else None, verbose=False)
    voc = WaveRnnVocoder(verbose=False)
    enc = SpeakerEncoderInference()
    embed = enc.embed_utterance(enc.preprocess_wav(wav, sr))
    texts = [TEXT] * batch
    embeds = np.tile(embed, (batch, 1))
    steps = 400  # stop disabled → every mel is exactly 400 frames → ONE
    # WaveRNN mel-length bucket → one kernel compile

    def run():
        specs = syn.synthesize_spectrograms(texts, embeds, min_stop_token=11,
                                            steps=steps)
        # one fused program for the whole batch: every utterance's folds
        # share the Pallas kernel's lanes (~4× over per-utterance calls)
        return voc.infer_waveform_batch(specs)

    wavs = run()  # warm-up
    dts = []
    for _ in range(reps):
        t0 = time.time()
        wavs = run()
        dts.append(time.time() - t0)
    audio_seconds = sum(len(w) for w in wavs) / SR
    rtfs = [audio_seconds / t for t in dts]
    s = _stats(rtfs)
    return dict(metric="e2e_tts_wavernn_rtf_per_chip", value=s["median"],
                unit="audio_seconds/s/chip", rtf_min=s["min"], rtf_max=s["max"],
                reps=reps, batch=batch, audio_seconds=round(audio_seconds, 2),
                weights="trained_synth" if trained else "random")


def main():
    reps = int(os.environ.get("MB_BENCH_REPS", "10"))
    batch = int(os.environ.get("MB_BENCH_BATCH", "128"))
    paths = os.environ.get("MB_BENCH_PATHS", "all")
    budget = float(os.environ.get("MB_BENCH_BUDGET_S", "2700"))
    # --strict / MB_BENCH_STRICT=1: exit nonzero unless the gate is "pass"
    # (a driver can refuse to record a bench that ran degraded/untrained)
    strict = "--strict" in sys.argv or os.environ.get("MB_BENCH_STRICT") == "1"
    t_start = time.time()

    primary = bench_tts(reps, batch)
    out = {
        "metric": "e2e_tts_rtf_per_chip",
        "value": primary.pop("value"),
        "unit": "audio_seconds/s/chip",
        "vs_baseline": round(primary["rtf_median"] / 50.0, 3),
        **primary,
    }

    if paths == "all":
        extras = []
        for name, fn in (("vits", lambda: bench_vits(max(reps // 2, 3), min(batch, 64))),
                         ("ppg_vc", lambda: bench_ppg_vc(max(reps // 2, 3))),
                         ("wavernn_e2e", lambda: bench_wavernn_e2e(
                             max(reps // 2, 3), min(batch, 8)))):
            if time.time() - t_start > budget:
                extras.append(dict(metric=name, skipped="budget"))
                continue
            try:
                extras.append(fn())
            except Exception as e:  # a broken extra path must not hide the primary
                extras.append(dict(metric=name, error=f"{type(e).__name__}: {e}"))
        out["extra"] = extras

    print(json.dumps(out))
    if strict:
        return 0 if out.get("quality_gate") == "pass" else 1
    return 0 if out.get("quality_gate") != "fail" else 1


if __name__ == "__main__":
    sys.exit(main())
