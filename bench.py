"""End-to-end TTS benchmark: audio-seconds synthesized per second per chip.

Pipeline measured (the reference's core product path, SURVEY.md §3.1):
reference wav → GE2E speaker embedding → Tacotron AR mel synthesis (fixed
500-frame workload, stop disabled for determinism) → HiFi-GAN vocoding.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the 50× RTF/chip target in BASELINE.json.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    from mockingbird_tpu import dsp
    from mockingbird_tpu.models.encoder import SpeakerEncoderInference
    from mockingbird_tpu.models.tacotron import Synthesizer
    from mockingbird_tpu.models.vocoder import GanVocoder

    sample = "/root/reference/data/samples/T0055G0013S0005.wav"
    try:
        wav, sr = dsp.load_wav(sample)
    except Exception:
        t = np.arange(16000 * 3) / 16000
        wav, sr = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), 16000

    enc = SpeakerEncoderInference()
    embed = enc.embed_utterance(enc.preprocess_wav(wav, source_sr=sr))

    syn = Synthesizer(verbose=False)
    syn.load()
    voc = GanVocoder("hifigan", verbose=False)

    texts = ["ni3 hao3 shi4 jie4 zhe4 shi4 yi2 ge4 ce4 shi4 ju4 zi3"] * 8
    embeds = np.tile(embed, (len(texts), 1))
    steps = 400  # fixed AR workload; stop disabled below for determinism

    def run():
        specs = syn.synthesize_spectrograms(texts, embeds, steps=steps,
                                            min_stop_token=11)  # never stops early
        wavs = voc.infer_waveform_batch(specs)
        return specs, wavs

    # warm-up (compile both stages)
    specs, wavs = run()
    jax.block_until_ready(jax.numpy.zeros(()))

    t0 = time.time()
    specs, wavs = run()
    dt = time.time() - t0

    hop, out_sr = 256, 16000
    audio_seconds = sum(s.shape[1] for s in specs) * hop / out_sr
    rtf = audio_seconds / dt

    print(json.dumps({
        "metric": "e2e_tts_rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "audio_seconds/s/chip",
        "vs_baseline": round(rtf / 50.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
