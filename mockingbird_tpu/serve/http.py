"""HTTP serving layer (stdlib-only).

Functional replacement for the reference's Streamlit mkgui
(`control/mkgui/base/ui/streamlit_ui.py:847-861` — 5 modes: synthesize, VC,
preprocess, train, train-VC) as a JSON/wav HTTP API plus a minimal HTML
console. No Streamlit/gradio dependency.

Endpoints:
  GET  /                → HTML console
  GET  /api/health      → {"status": "ok"}
  POST /api/synthesize  → multipart/form-data {text, ref (wav)} → audio/wav
  POST /api/convert     → multipart {ref (wav), src (wav)} → audio/wav
  POST /api/preprocess  → {"datasets_root", "dataset"} → job started
  POST /api/train       → {"kind", "syn_dir", "run_id", ...} → job started
  GET  /api/jobs        → background job states
"""
from __future__ import annotations

import io
import json
import threading
import traceback
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

_INDEX_HTML = """<!doctype html>
<html><head><title>mockingbird_tpu</title></head>
<body style="font-family:sans-serif;max-width:640px;margin:2em auto">
<h2>mockingbird_tpu</h2>
<h3>Clone a voice</h3>
<form action="/api/synthesize" method="post" enctype="multipart/form-data">
  <p>Text: <input name="text" size="50" value="ni3 hao3 shi4 jie4"></p>
  <p>Reference wav: <input type="file" name="ref"></p>
  <p><button>Synthesize</button></p>
</form>
<h3>Convert a voice</h3>
<form action="/api/convert" method="post" enctype="multipart/form-data">
  <p>Target-voice wav: <input type="file" name="ref"></p>
  <p>Source wav: <input type="file" name="src"></p>
  <p><button>Convert</button></p>
</form>
</body></html>"""


class _Jobs:
    def __init__(self):
        self.lock = threading.Lock()
        self.jobs = {}

    def start(self, name, fn, *a, **kw):
        with self.lock:
            self.jobs[name] = {"state": "running"}

        def run():
            try:
                fn(*a, **kw)
                self.jobs[name] = {"state": "done"}
            except Exception as e:  # pragma: no cover
                self.jobs[name] = {"state": "error", "error": str(e)}
        threading.Thread(target=run, daemon=True).start()

    def snapshot(self):
        with self.lock:
            return dict(self.jobs)


def _wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        peak = max(0.01, float(np.max(np.abs(wav))))
        w.writeframes((np.asarray(wav) * (32767 / peak)).astype(np.int16).tobytes())
    return buf.getvalue()


def _parse_multipart(handler) -> dict:
    import email
    from email import policy
    length = int(handler.headers.get("Content-Length", 0))
    body = handler.rfile.read(length)
    ctype = handler.headers.get("Content-Type", "")
    msg = email.message_from_bytes(
        b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body, policy=policy.default)
    fields = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        payload = part.get_payload(decode=True)
        if part.get_filename():
            fields[name] = payload
        else:
            fields[name] = payload.decode("utf-8", "replace")
    return fields


def make_handler(pipeline_factory, vc_factory, jobs: _Jobs):
    state = {"pipeline": None, "vc": None}

    def pipeline():
        if state["pipeline"] is None:
            state["pipeline"] = pipeline_factory()
        return state["pipeline"]

    def vc():
        if state["vc"] is None:
            state["vc"] = vc_factory()
        return state["vc"]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _send(self, code, body, ctype="application/json"):
            data = body if isinstance(body, bytes) else json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/":
                self._send(200, _INDEX_HTML.encode(), "text/html")
            elif self.path == "/api/health":
                self._send(200, {"status": "ok"})
            elif self.path == "/api/jobs":
                self._send(200, jobs.snapshot())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                if self.path == "/api/synthesize":
                    fields = _parse_multipart(self)
                    text = fields.get("text", "")
                    ref = fields.get("ref")
                    if not text or ref is None:
                        return self._send(400, {"error": "need text + ref wav"})
                    from ..dsp.audio import load_wav
                    import tempfile
                    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                        f.write(ref)
                        f.flush()
                        wav = pipeline().clone_voice(text, f.name)[0]
                    self._send(200, _wav_bytes(wav, 16000), "audio/wav")
                elif self.path == "/api/convert":
                    fields = _parse_multipart(self)
                    import tempfile
                    with tempfile.NamedTemporaryFile(suffix=".wav") as fr, \
                            tempfile.NamedTemporaryFile(suffix=".wav") as fs:
                        fr.write(fields["ref"]); fr.flush()
                        fs.write(fields["src"]); fs.flush()
                        conv = vc()
                        conv.set_reference(fr.name)
                        from ..dsp import load_wav as _lw
                        src_wav, _ = _lw(fs.name, target_sr=16000)
                        mel, rtf = conv.convert_wav(src_wav)
                    wav = pipeline().vocoder.infer_waveform(mel.T)
                    self._send(200, _wav_bytes(wav, 16000), "audio/wav")
                elif self.path == "/api/preprocess":
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    from ..models.tacotron.preprocess import preprocess_dataset
                    root = Path(req["datasets_root"])
                    jobs.start("preprocess", preprocess_dataset, root,
                               root / "SV2TTS" / "synthesizer",
                               dataset=req.get("dataset", "aidatatang_200zh"))
                    self._send(200, {"job": "preprocess", "state": "running"})
                elif self.path == "/api/train":
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length) or b"{}")
                    kind = req.get("kind", "synth")
                    if kind == "synth":
                        from ..models.tacotron.train import train as fn
                    elif kind == "vits":
                        from ..models.vits.train import train as fn
                    elif kind == "vc":
                        from ..models.ppg.train import train as fn
                    else:
                        return self._send(400, {"error": f"unknown kind {kind}"})
                    jobs.start(f"train-{kind}", fn, req.get("run_id", "serve_run"),
                               Path(req["syn_dir"]), Path(req.get("models_dir", "saved_models")),
                               total_steps=req.get("total_steps"))
                    self._send(200, {"job": f"train-{kind}", "state": "running"})
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:
                traceback.print_exc()
                self._send(500, {"error": str(e)})

    return Handler


def serve(port: int = 8080, encoder_fpath=None, synthesizer_fpath=None,
          vocoder_fpath=None, block: bool = True):
    from ..pipeline import VoiceCloningPipeline, make_voice_converter
    jobs = _Jobs()
    handler = make_handler(
        lambda: VoiceCloningPipeline(encoder_fpath, synthesizer_fpath, vocoder_fpath,
                                     verbose=False),
        lambda: make_voice_converter(verbose=False), jobs)
    server = ThreadingHTTPServer(("0.0.0.0", port), handler)
    print(f"Serving on http://0.0.0.0:{port}")
    if block:
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
