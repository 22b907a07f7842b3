"""Web-toolbox HTTP API tests (dataset browser, embed, synth→vocode, VC).

Covers the headless replacement for the reference's PyQt5 Toolbox
(`control/toolbox/__init__.py:50-477`) and Streamlit mkgui. Model-heavy
members are faked through the WebToolbox factories so these tests exercise
routing/session logic, not compilation.
"""
import io
import json
import urllib.request
import wave
from pathlib import Path

import numpy as np
import pytest

from mockingbird_tpu.serve.http import serve
from mockingbird_tpu.serve.toolbox import WebToolbox, read_audio


def _write_wav(path: Path, seconds=0.5, sr=16000, freq=220.0):
    t = np.arange(int(sr * seconds)) / sr
    wav = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(wav.tobytes())


class _FakeEncoder:
    def preprocess_wav(self, wav, sr=None):
        return np.asarray(wav)

    def embed_utterance(self, wav):
        rng = np.random.default_rng(int(abs(float(np.sum(wav))) * 1e3) % 2**31)
        e = rng.standard_normal(256).astype(np.float32)
        return e / np.linalg.norm(e)


class _FakeSynth:
    seed = 0

    def synthesize_spectrograms(self, texts, embeds, style_idx=0, steps=1000,
                                min_stop_token=5, **kw):
        return [np.random.default_rng(self.seed).uniform(-4, 4, (80, 120)).astype(np.float32)
                for _ in texts]

    def griffin_lim(self, mel):
        return np.zeros(mel.shape[1] * 256, np.float32)


class _FakePipeline:
    def __init__(self):
        self.encoder = _FakeEncoder()
        self.synthesizer = _FakeSynth()

    def embed_reference(self, ref_wav, source_sr=None):
        return self.encoder.embed_utterance(np.asarray(ref_wav))

    def tts_batch(self, texts, ref_wav, embed=None, **kw):
        rng = np.random.default_rng(1)
        return [(rng.uniform(-1, 1, 4000) * 32767).astype(np.int16)
                for _ in texts]


class _FakeVocoder:
    def infer_waveform(self, mel):
        return np.random.default_rng(0).uniform(-1, 1, mel.shape[1] * 256).astype(np.float32)


class _FakeVC:
    def set_reference(self, path):
        pass

    def convert_wav(self, wav):
        return np.zeros((60, 80), np.float32), 0.05


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    _write_wav(root / "LJSpeech-1.1" / "wavs" / "LJ001-0001.wav")
    _write_wav(root / "LJSpeech-1.1" / "wavs" / "LJ001-0002.wav", freq=440)
    models = tmp_path_factory.mktemp("models")
    for fam in ("default/encoder", "default/synthesizer", "default/vocoder_hifigan"):
        d = models / fam / "checkpoints"
        d.mkdir(parents=True)
        (models / fam / "config.json").write_text("{}")
    tb = WebToolbox(datasets_root=root, models_dir=models,
                    pipeline_factory=_FakePipeline, vc_factory=_FakeVC,
                    vocoder_factory=lambda name: _FakeVocoder(), seed=0)
    srv = serve(port=0, block=False, toolbox=tb)
    port = srv.server_address[1]
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        ct = r.headers.get("Content-Type", "")
        body = r.read()
        return (json.loads(body) if "json" in ct else body), dict(r.headers)


def _post_json(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        ct = r.headers.get("Content-Type", "")
        body = r.read()
        return (json.loads(body) if "json" in ct else body), dict(r.headers)


def _post_multipart(url, fields):
    boundary = "xBOUNDARYx"
    parts = []
    for name, (fname, payload) in fields.items():
        head = f'Content-Disposition: form-data; name="{name}"'
        if fname:
            head += f'; filename="{fname}"'
        if isinstance(payload, str):
            payload = payload.encode()
        parts.append(f"--{boundary}\r\n{head}\r\n\r\n".encode() + payload + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(url, data=body, headers={
        "Content-Type": f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=60) as r:
        ct = r.headers.get("Content-Type", "")
        data = r.read()
        return (json.loads(data) if "json" in ct else data), dict(r.headers)


def _wav_payload(freq=220.0):
    buf = io.BytesIO()
    t = np.arange(8000) / 16000
    pcm = (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_console_page(server):
    body, _ = _get(server + "/")
    assert b"toolbox" in body and b"/api/synthesize_mel" in body


def test_dataset_browser(server):
    listing, _ = _get(server + "/api/datasets")
    assert "LJSpeech-1.1" in listing["datasets"]
    l2, _ = _get(server + "/api/datasets?dataset=LJSpeech-1.1")
    assert "wavs" in l2["speakers"]
    l3, _ = _get(server + "/api/datasets?dataset=LJSpeech-1.1&speaker=wavs")
    assert any(u.endswith("LJ001-0001.wav") for u in l3["utterances"])
    rnd, _ = _get(server + "/api/datasets?random=1")
    assert rnd["dataset"] == "LJSpeech-1.1" and rnd["utterance"].endswith(".wav")


def test_audio_fetch_and_traversal_guard(server):
    body, hdrs = _get(server + "/api/audio?path=LJSpeech-1.1/wavs/LJ001-0001.wav")
    assert hdrs["Content-Type"] == "audio/wav" and body[:4] == b"RIFF"
    with pytest.raises(urllib.error.HTTPError):
        _get(server + "/api/audio?path=../../etc/passwd")


def test_embed_and_projection(server):
    r1, _ = _post_multipart(server + "/api/embed",
                            {"ref": ("a.wav", _wav_payload(220)), "name": (None, "utt_a")})
    assert len(r1["embed"]) == 256
    r2, _ = _post_multipart(server + "/api/embed",
                            {"ref": ("b.wav", _wav_payload(440)), "name": (None, "utt_b")})
    assert set(r2["names"]) >= {"utt_a", "utt_b"}
    assert len(r2["projection"]) == len(r2["names"])


def test_synthesize_mel_then_vocode(server):
    res, _ = _post_json(server + "/api/synthesize_mel",
                        {"text": "ni3 hao3", "utterance": "utt_a", "seed": 7})
    assert res["mel_shape"][0] == 80 and res["seconds"] > 0
    assert len(res["mel"]) == 80  # canvas preview rows
    wav, hdrs = _post_json(server + "/api/vocode", {"vocoder": "hifigan"})
    assert wav[:4] == b"RIFF" and float(hdrs["X-RTF"]) > 0


def test_vocoder_hot_swap_and_griffinlim(server):
    for name in ("fregan", "wavernn", "griffinlim"):
        wav, _ = _post_json(server + "/api/vocode", {"vocoder": name})
        assert wav[:4] == b"RIFF"


def test_one_shot_synthesize(server):
    wav, hdrs = _post_multipart(server + "/api/synthesize", {
        "text": (None, "ni3 hao3"), "ref": ("r.wav", _wav_payload())})
    assert wav[:4] == b"RIFF" and "X-RTF" in hdrs


def test_convert_endpoint(server):
    wav, hdrs = _post_multipart(server + "/api/convert", {
        "ref": ("r.wav", _wav_payload(220)), "src": ("s.wav", _wav_payload(330))})
    assert wav[:4] == b"RIFF" and "X-RTF" in hdrs


def test_models_listing(server):
    res, _ = _get(server + "/api/models")
    assert res["encoder"] and res["synthesizer"] and res["vocoder"]


def test_synthesize_mel_without_embed_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_json(server + "/api/synthesize_mel",
                   {"text": "x", "utterance": "nope"})
    assert e.value.code == 400


def test_read_audio_bytes_roundtrip():
    wav = read_audio(_wav_payload(220), 16000)
    assert wav.dtype == np.float32 and 7900 < len(wav) <= 8000 + 1
    spec = np.abs(np.fft.rfft(wav))
    assert abs(np.argmax(spec) * 16000 / len(wav) - 220) < 5


def test_stream_tts(server):
    """Streaming endpoint: RIFF streaming header + one PCM run per chunk."""
    data, hdrs = _post_multipart(server + "/api/stream_tts", {
        "text": (None, "hello one. hello two. hello three."),
        "ref": ("ref.wav", _wav_payload())})
    assert hdrs.get("Content-Type") == "audio/wav"
    assert int(hdrs.get("X-Chunks", 0)) >= 1
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    n_chunks = int(hdrs["X-Chunks"])
    sr = int(hdrs["X-Sample-Rate"])
    silence = (n_chunks - 1) * int(sr * 0.15) * 2
    expect = 44 + n_chunks * 4000 * 2 + silence
    assert len(data) == expect


# ---------------------------------------------------------------------------
# Concurrency (VERDICT r2 Next #7): ThreadingHTTPServer drives the same
# pipeline from many threads; the session lock must keep each request's
# embed→synthesize→vocode stages from interleaving with another request's.
# ---------------------------------------------------------------------------

class _SlowSynth:
    """Output depends deterministically on the text; stage boundaries sleep
    so unserialised concurrent requests WOULD interleave and corrupt."""
    seed = 0

    def synthesize_spectrograms(self, texts, embeds, **kw):
        import time as _t
        n = 40 + 13 * int(texts[0])  # text-determined mel width
        _t.sleep(0.05)
        return [np.full((80, n), float(texts[0]) + 1.0, np.float32)]

    def griffin_lim(self, mel):
        return np.zeros(mel.shape[1] * 256, np.float32)


class _SlowVocoder:
    def infer_waveform(self, mel):
        import time as _t
        _t.sleep(0.05)
        return np.full(mel.shape[1] * 256, 0.5, np.float32)


class _SlowPipeline(_FakePipeline):
    def __init__(self):
        super().__init__()
        self.synthesizer = _SlowSynth()

    def tts_batch(self, texts, ref_wav, embed=None, **kw):
        import time as _t
        _t.sleep(0.05)
        # identity rides in the text LENGTH ("a"*k) — survives the stream
        # endpoint's text normalisation, unlike digits
        return [np.full(2000 * len(t.strip()), 1000 * len(t.strip()), np.int16)
                for t in texts]


@pytest.fixture(scope="module")
def slow_server(tmp_path_factory):
    tb = WebToolbox(datasets_root=None, models_dir=None,
                    pipeline_factory=_SlowPipeline, vc_factory=_FakeVC,
                    vocoder_factory=lambda name: _SlowVocoder(), seed=0)
    srv = serve(port=0, block=False, toolbox=tb)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_concurrent_synthesize_not_interleaved(slow_server):
    """8 simultaneous /api/synthesize requests with distinct texts: every
    response's waveform length must match ITS text's mel width (a corrupted
    current_spec/current_wav handoff yields another request's length)."""
    import concurrent.futures

    def one(i):
        wav, hdrs = _post_multipart(slow_server + "/api/synthesize", {
            "text": (None, str(i)), "ref": ("r.wav", _wav_payload(200 + 10 * i))})
        return i, wav

    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        results = list(ex.map(one, range(8)))
    for i, wav in results:
        assert wav[:4] == b"RIFF"
        with wave.open(io.BytesIO(wav)) as w:
            n = w.getnframes()
        expect = (40 + 13 * i) * 256
        assert n == expect, f"request {i}: got {n} frames, expected {expect}"


def test_concurrent_stream_tts(slow_server):
    """4 simultaneous /api/stream_tts requests: each stream's PCM payload
    must carry its own text's length and sample values end to end."""
    import concurrent.futures

    def one(i):
        data, hdrs = _post_multipart(slow_server + "/api/stream_tts", {
            "text": (None, "a" * (i + 1)), "ref": ("ref.wav", _wav_payload())})
        return i, data, hdrs

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(one, range(4)))
    for i, data, hdrs in results:
        assert data[:4] == b"RIFF"
        pcm = np.frombuffer(data[44:], np.int16)
        assert len(pcm) == 2000 * (1 + i), (i, len(pcm))
        assert (pcm == 1000 * (1 + i)).all(), f"stream {i} carried foreign PCM"


def test_concurrent_mixed_load(slow_server):
    """synthesize + stream + embed fired together: no 500s, all correct."""
    import concurrent.futures

    def synth(i):
        wav, _ = _post_multipart(slow_server + "/api/synthesize", {
            "text": (None, str(i)), "ref": ("r.wav", _wav_payload())})
        with wave.open(io.BytesIO(wav)) as w:
            return ("synth", i, w.getnframes())

    def stream(i):
        data, _ = _post_multipart(slow_server + "/api/stream_tts", {
            "text": (None, "a" * (i + 1)), "ref": ("ref.wav", _wav_payload())})
        return ("stream", i, len(np.frombuffer(data[44:], np.int16)))

    def embed(i):
        res, _ = _post_multipart(slow_server + "/api/embed", {
            "name": (None, f"c{i}"), "ref": ("r.wav", _wav_payload(300 + i))})
        return ("embed", i, len(res["embed_preview"]) if "embed_preview" in res else 1)

    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        futs = [ex.submit(synth, 0), ex.submit(stream, 1), ex.submit(embed, 2),
                ex.submit(synth, 3), ex.submit(stream, 2), ex.submit(embed, 5)]
        results = [f.result(timeout=120) for f in futs]
    for kind, i, val in results:
        if kind == "synth":
            assert val == (40 + 13 * i) * 256, (i, val)
        elif kind == "stream":
            assert val == 2000 * (1 + i), (i, val)


# ---------------------------------------------------------------------------
# Request coalescing (VERDICT r4 Next #4): default one-shot /api/synthesize
# requests against a FUSED pipeline must share device dispatches instead of
# serialising on the session lock.
# ---------------------------------------------------------------------------

class _FusedVocoder:
    def vocode_device(self, mels, **kw):  # marks the fused surface
        raise NotImplementedError

    def infer_waveform(self, mel):
        return np.zeros(mel.shape[1] * 256, np.float32)


class _FusedPipeline(_FakePipeline):
    """Quacks like the real fused pipeline; tts_batch counts dispatches and
    encodes each text's identity in its PCM (length + value)."""
    synthesizer_kind = "tacotron"

    def __init__(self):
        super().__init__()
        self.vocoder = _FusedVocoder()
        self.dispatches = []
        self._lock = __import__("threading").Lock()

    def tts_batch(self, texts, ref_wav, embed=None, **kw):
        import time as _t
        assert embed is not None and np.asarray(embed).ndim == 2
        assert np.asarray(embed).shape[0] == len(texts)
        with self._lock:
            self.dispatches.append(list(texts))
        _t.sleep(0.05)  # one device dispatch's worth of wall time
        return [np.full(2000 * len(t.strip()), 1000 * len(t.strip()), np.int16)
                for t in texts]


@pytest.fixture()
def fused_server():
    tb = WebToolbox(datasets_root=None, models_dir=None,
                    pipeline_factory=_FusedPipeline, vc_factory=_FakeVC,
                    vocoder_factory=lambda name: _FakeVocoder(), seed=0)
    srv = serve(port=0, block=False, toolbox=tb)
    yield f"http://127.0.0.1:{srv.server_address[1]}", tb
    srv.shutdown()


def test_synthesize_coalesces_concurrent_requests(fused_server):
    """8 simultaneous default one-shot requests: correct per-text audio,
    X-Coalesced header, and FEWER tts_batch dispatches than requests."""
    import concurrent.futures
    base, tb = fused_server

    def one(i):
        wav, hdrs = _post_multipart(base + "/api/synthesize", {
            "text": (None, "a" * (i + 1)), "ref": ("r.wav", _wav_payload())})
        return i, wav, hdrs

    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        results = list(ex.map(one, range(8)))
    for i, wav, hdrs in results:
        assert hdrs.get("X-Coalesced") == "1"
        pcm = np.frombuffer(wav[44:], np.int16)
        n = 2000 * (i + 1)
        assert len(pcm) == n, (i, len(pcm))
    n_dispatch = len(tb.pipeline.dispatches)
    n_texts = sum(len(d) for d in tb.pipeline.dispatches)
    assert n_texts == 8
    assert n_dispatch < 8, f"no coalescing happened ({n_dispatch} dispatches)"


def test_synthesize_seed_request_stays_on_session_path(fused_server):
    """A seeded request must NOT ride the stateless batcher (seed changes
    the synthesis), falling back to the locked session flow."""
    base, tb = fused_server
    wav, hdrs = _post_multipart(base + "/api/synthesize", {
        "text": (None, "3"), "ref": ("r.wav", _wav_payload()),
        "seed": (None, "7")})
    assert "X-Coalesced" not in hdrs
    assert wav[:4] == b"RIFF"
