"""Serving latency under concurrency, on the real chip (VERDICT r2 Next #7).

Starts the real HTTP server (real pipeline, trained synthesizer when
available), then measures against it:

- sequential `/api/synthesize`: end-to-end request latency + per-request RTF
- N concurrent `/api/synthesize`: same, under contention (the session lock
  serialises the stateful flow; this quantifies the cost)
- `/api/stream_tts` first-audio latency (time to the first PCM chunk) and
  full-stream time, sequential and concurrent

Prints one JSON line for BASELINE.md. Run on the TPU host:
    python scripts/serve_latency.py [--n 4]
"""
from __future__ import annotations

import argparse
import concurrent.futures
import io
import json
import sys
import time
import urllib.request
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TEXT = "ni3 hao3 shi4 jie4 zhe4 shi4 ce4 shi4"


def wav_payload() -> bytes:
    sample = Path("/root/reference/data/samples/T0055G0013S0005.wav")
    if sample.exists():
        return sample.read_bytes()
    buf = io.BytesIO()
    t = np.arange(16000 * 2) / 16000
    pcm = (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def multipart(fields: dict) -> tuple[bytes, str]:
    boundary = "xBOUNDARYx"
    parts = []
    for name, (fname, payload) in fields.items():
        head = f'Content-Disposition: form-data; name="{name}"'
        if fname:
            head += f'; filename="{fname}"'
        if isinstance(payload, str):
            payload = payload.encode()
        parts.append(f"--{boundary}\r\n{head}\r\n\r\n".encode() + payload + b"\r\n")
    return (b"".join(parts) + f"--{boundary}--\r\n".encode(),
            f"multipart/form-data; boundary={boundary}")


def post(url: str, fields: dict, stream_first_byte: bool = False):
    body, ctype = multipart(fields)
    req = urllib.request.Request(url, data=body, headers={"Content-Type": ctype})
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=600) as r:
        if stream_first_byte:
            first = r.read(44 + 3200)     # header + 0.1 s of PCM
            t_first = time.time() - t0
            rest = r.read()
            return t_first, time.time() - t0, len(first) + len(rest)
        data = r.read()
        return time.time() - t0, data, dict(r.headers)


def audio_seconds(wav_bytes: bytes) -> float:
    with wave.open(io.BytesIO(wav_bytes)) as w:
        return w.getnframes() / w.getframerate()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4, help="concurrent requests")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from mockingbird_tpu.serve.http import serve

    ckpt = Path(__file__).resolve().parent.parent / \
        "saved_models/attention_run/synthesizer.ckpt"
    srv = serve(port=0, block=False,
                synthesizer_fpath=str(ckpt) if ckpt.exists() else None)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    ref = wav_payload()
    synth_fields = {"text": (None, TEXT), "ref": ("r.wav", ref)}
    stream_fields = {"text": (None, TEXT + ". " + TEXT), "ref": ("r.wav", ref)}

    # warm-up (compiles every program in the request path)
    post(base + "/api/synthesize", synth_fields)
    post(base + "/api/stream_tts", stream_fields, stream_first_byte=True)

    seq_lat, seq_rtf = [], []
    for _ in range(args.reps):
        dt, data, hdrs = post(base + "/api/synthesize", synth_fields)
        seq_lat.append(dt)
        seq_rtf.append(audio_seconds(data) / dt)

    conc_lat, conc_rtf = [], []
    with concurrent.futures.ThreadPoolExecutor(args.n) as ex:
        t0 = time.time()
        futs = [ex.submit(post, base + "/api/synthesize", synth_fields)
                for _ in range(args.n)]
        for f in futs:
            dt, data, hdrs = f.result()
            conc_lat.append(dt)
            conc_rtf.append(audio_seconds(data) / dt)
        conc_wall = time.time() - t0

    first, full, _ = post(base + "/api/stream_tts", stream_fields,
                          stream_first_byte=True)
    with concurrent.futures.ThreadPoolExecutor(args.n) as ex:
        futs = [ex.submit(post, base + "/api/stream_tts", stream_fields, True)
                for _ in range(args.n)]
        stream_conc = [f.result() for f in futs]

    med = lambda v: round(float(np.median(v)), 3)
    print(json.dumps({
        "synthesize_seq_latency_s": med(seq_lat),
        "synthesize_seq_rtf": med(seq_rtf),
        "synthesize_conc_n": args.n,
        "synthesize_conc_latency_s": med(conc_lat),
        "synthesize_conc_latency_max_s": round(max(conc_lat), 3),
        "synthesize_conc_wall_s": round(conc_wall, 3),
        "synthesize_conc_rtf": med(conc_rtf),
        "stream_first_audio_s": round(first, 3),
        "stream_full_s": round(full, 3),
        "stream_conc_first_audio_max_s": round(max(s[0] for s in stream_conc), 3),
        "weights": "trained" if ckpt.exists() else "random",
    }))
    srv.shutdown()


if __name__ == "__main__":
    main()
