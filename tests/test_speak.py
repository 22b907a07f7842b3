"""Tests for the speak subsystem (SRT, duration forcing, timeline render,
HTTP TTS client) — reference `skills/speak/scripts/*` parity."""
import json

import numpy as np
import pytest

from mockingbird_tpu import speak


# ── SRT ───────────────────────────────────────────────────────────────

def test_split_sentences_mixed_punctuation():
    text = "你好世界。这是测试！Is it? Yes.\nNewline too"
    assert speak.split_sentences(text) == [
        "你好世界。", "这是测试！", "Is it?", "Yes.", "Newline too"]


def test_estimate_timings_floor_and_gap():
    cues = speak.estimate_timings(["ab", "c" * 40], chars_per_second=4.0,
                                  gap_ms=150, min_duration_ms=500)
    # 2 chars / 4 cps = 500ms floor applies; 40 chars / 4 cps = 10s.
    assert cues[0].start_ms == 0 and cues[0].end_ms == 500
    assert cues[1].start_ms == 650
    assert cues[1].duration_ms == 10000


def test_srt_roundtrip(tmp_path):
    cues = speak.text_to_cues("First sentence. Second one! третий?")
    p = tmp_path / "out.srt"
    speak.write_srt(cues, p)
    parsed = speak.parse_srt(p)
    assert [(c.index, c.start_ms, c.end_ms, c.text) for c in parsed] == \
           [(c.index, c.start_ms, c.end_ms, c.text) for c in cues]


def test_parse_srt_tolerates_junk_blocks():
    content = """garbage block

1
00:00:00,000 --> 00:00:01,500
hello

not-an-index
00:00:02,000 --> 00:00:03,000
skipped

2
00:01:02.250 --> 00:01:03,000
dot separator
"""
    cues = speak.parse_srt_text(content)
    assert len(cues) == 2
    assert cues[0].duration_ms == 1500
    assert cues[1].start_ms == 62250


def test_timestamp_parse_format_inverse():
    for ms in (0, 999, 61_000, 3_600_000 + 123, 35_999_999):
        assert speak.parse_timestamp_ms(speak.ms_to_timestamp(ms)) == ms
    with pytest.raises(ValueError):
        speak.parse_timestamp_ms("1:2:3")


# ── duration forcing ──────────────────────────────────────────────────

def test_pad_or_trim_exact():
    wav = np.ones(100, np.float32)
    assert len(speak.pad_or_trim(wav, 40)) == 40
    out = speak.pad_or_trim(wav, 160)
    assert len(out) == 160 and out[150] == 0.0


@pytest.mark.parametrize("ratio", [0.4, 0.8, 1.0, 1.7, 3.0])
def test_wsola_exact_length_and_tone_preserved(ratio):
    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    target = int(len(tone) * ratio)
    out = speak.wsola_stretch(tone, target, sr=sr)
    assert out.shape == (target,)
    # Pitch preserved: dominant DFT bin of the interior still ≈440 Hz.
    interior = out[sr // 10: -sr // 10] if target > sr // 4 else out
    spec = np.abs(np.fft.rfft(interior * np.hanning(len(interior))))
    peak_hz = np.argmax(spec) * sr / len(interior)
    assert abs(peak_hz - 440) < 15
    # Energy in the same ballpark (windowed OLA is unity-gain).
    rms = float(np.sqrt(np.mean(interior ** 2)))
    assert 0.2 < rms < 0.6


def test_wsola_degenerate_inputs():
    assert speak.wsola_stretch(np.zeros(0, np.float32), 100).shape == (100,)
    assert speak.wsola_stretch(np.ones(50, np.float32), 0).shape == (0,)
    short = np.ones(10, np.float32)
    assert speak.wsola_stretch(short, 400, sr=16000).shape == (400,)


# ── voice map ─────────────────────────────────────────────────────────

def test_resolve_segment_cfg_ranges_override_default():
    vm = {"default": {"voice": "a", "speed": 1.0},
          "segments": {"2-4": {"voice": "b"}, "3": {"speed": 2.0}}}
    assert speak.resolve_segment_cfg(1, vm) == {"voice": "a", "speed": 1.0}
    assert speak.resolve_segment_cfg(2, vm)["voice"] == "b"
    got = speak.resolve_segment_cfg(3, vm)
    assert got["voice"] == "b" and got["speed"] == 2.0


# ── timeline rendering ────────────────────────────────────────────────

def _fake_backend(sr=16000, freq=220.0):
    def backend(cue, cfg):
        dur = cfg.get("synth_seconds", cue.duration_ms / 1000.0 * 1.3)
        t = np.arange(int(sr * dur)) / sr
        return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32), sr
    return backend


def test_render_timeline_places_and_forces_durations():
    cues = [speak.Cue(1, 0, 1000, "one"), speak.Cue(2, 1500, 2500, "two")]
    res = speak.render_timeline(cues, _fake_backend(), tail_ms=100)
    sr = res.sample_rate
    assert res.wav.shape == (int(2.6 * sr),)
    assert len(res.segments) == 2
    # Every segment forced to its cue duration despite 1.3× raw synthesis.
    for seg in res.segments:
        assert seg.final_len == int(round(seg.cue.duration_ms * sr / 1000))
        assert seg.raw_len != seg.final_len
    # Gap between cues is silent; cue interiors are not.
    gap = res.wav[int(1.1 * sr):int(1.4 * sr)]
    assert np.max(np.abs(gap)) < 1e-4
    assert np.max(np.abs(res.wav[:sr])) > 0.1


def test_render_timeline_pad_trim_mode_and_overlap_mix():
    cues = [speak.Cue(1, 0, 1000, "a"), speak.Cue(2, 500, 1500, "b")]
    vm = {"default": {"duration_mode": "pad_trim"}}
    res = speak.render_timeline(cues, _fake_backend(), voice_map=vm)
    assert np.max(np.abs(res.wav)) <= 0.95 + 1e-6  # clip-protected mix


def test_render_timeline_file_roundtrip(tmp_path):
    srt = tmp_path / "in.srt"
    speak.text_to_srt("Hello there. Second line!", srt)
    vm_path = tmp_path / "vm.json"
    vm_path.write_text(json.dumps({"default": {}}))
    out = tmp_path / "out.wav"
    res = speak.render_timeline_file(srt, out, _fake_backend(),
                                     voice_map_path=vm_path)
    assert out.exists() and res.duration_s > 1.0


def test_command_backend_invokes_cli(tmp_path):
    calls = {}

    def fake_run(cmd, capture_output=True, text=True):
        calls["cmd"] = list(cmd)
        from mockingbird_tpu.dsp.audio import save_wav
        save_wav(np.zeros(1600, np.float32), cmd[2], 16000)

        class P:
            returncode = 0
            stderr = ""
        return P()

    backend = speak.CommandBackend("fake-tts", runner=fake_run)
    wav, sr = backend(speak.Cue(1, 0, 1000, "hi"), {"voice": "v1", "speed": 1.5})
    assert sr == 16000 and len(wav) == 1600
    assert calls["cmd"][0] == "fake-tts"
    assert "--voice" in calls["cmd"] and "--speed" in calls["cmd"]


# ── HTTP client ───────────────────────────────────────────────────────

def test_normalize_api_key_base64():
    raw = "my-secret-key"
    enc = speak.normalize_api_key_base64(raw)
    import base64
    assert base64.b64decode(enc) == raw.encode()
    # Already-canonical base64 passes through unchanged.
    assert speak.normalize_api_key_base64(enc) == enc
    assert speak.normalize_api_key_base64("") == ""


def test_wav_bytes_roundtrip():
    sr = 16000
    wav = (0.25 * np.sin(np.linspace(0, 100, 3200))).astype(np.float32)
    data = speak.encode_wav_bytes(wav, sr)
    back, back_sr = speak.decode_wav_bytes(data)
    assert back_sr == sr
    np.testing.assert_allclose(back, wav, atol=1e-3)


def _fake_transport(store):
    sr = 16000

    def transport(url, headers, body, timeout):
        store.append({"url": url, "headers": headers, "body": body})
        if url.endswith("/emotion-enhance"):
            return 200, {}, json.dumps(
                {"data": {"emotion_enhance": "[happy] hi"}}).encode()
        if url.endswith("/text-to-speech"):
            wav = np.zeros(sr, np.float32)
            return (200, {"X-Audio-Duration": "1.0"},
                    speak.encode_wav_bytes(wav, sr))
        return 404, {}, b"nope"
    return transport


def test_tts_api_client_synthesize_and_enhance():
    store = []
    client = speak.TtsApiClient("https://example.test/v1", api_key="k",
                                transport=_fake_transport(store))
    assert client.emotion_enhance("hi") == "[happy] hi"
    audio, dur = client.synthesize("hello", voice_id="v", emo={"joy": 1},
                                   duration=2.0)
    assert dur == 1.0
    wav, sr = speak.decode_wav_bytes(audio)
    assert sr == 16000 and len(wav) == 16000
    # Multipart body carries the fields.
    body = store[-1]["body"]
    assert b'name="voice_id"' in body and b'name="emo"' in body
    assert b'name="duration"' in body


def test_tts_api_client_validation():
    client = speak.TtsApiClient("https://example.test", transport=_fake_transport([]))
    with pytest.raises(ValueError):
        client.synthesize("x")  # no voice_id or reference audio
    with pytest.raises(ValueError):
        client.synthesize("x", voice_id="v", duration=37.0)


def test_cli_text_to_srt(tmp_path):
    from mockingbird_tpu.cli.main import main
    src = tmp_path / "in.txt"
    src.write_text("你好。再见！", encoding="utf-8")
    out = tmp_path / "out.srt"
    main(["text-to-srt", str(src), "--out", str(out)])
    assert len(speak.parse_srt(out)) == 2


def test_http_backend_with_reference_audio(tmp_path):
    store = []
    client = speak.TtsApiClient("https://example.test", api_key="k",
                                transport=_fake_transport(store))
    ref = tmp_path / "ref.wav"
    ref.write_bytes(speak.encode_wav_bytes(np.zeros(160, np.float32), 16000))
    backend = speak.HttpBackend(client)
    wav, sr = backend(speak.Cue(1, 0, 1000, "hi"),
                      {"reference_audio": str(ref), "emotion_enhance": True})
    assert sr == 16000
    # Both endpoints hit: enhance then synthesize with file part.
    urls = [s["url"] for s in store]
    assert any(u.endswith("/emotion-enhance") for u in urls)
    assert b'filename="ref.wav"' in store[-1]["body"]
