"""One-shot voice conversion pipeline + preprocessing.

Parity with `/root/reference/run.py:30-94` (PPG extract → lf0 conversion →
ppg2mel AR decode → vocoder, with RTF reporting) and
`models/ppg2mel/preprocess.py:21-113` (corpus → bnf/ f0/ embed/ mel/ dirs +
train/dev/eval fid lists).
"""
from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config, encoder_audio_config, sv2tts_audio_config
from ...dsp import (load_wav, melspectrogram_bucketed, preprocess_wav,
                    save_wav)
from ...dsp.f0 import (compute_f0, compute_mean_std, f02lf0, get_cont_lf0,
                       get_converted_lf0uv)
from ...train.checkpoint import load_single
from ..encoder.inference import SpeakerEncoderInference
from .extractor import PPGExtractor
from .ppg2mel import MelDecoderMOLv2, init_ppg2mel, ppg2mel_config


class VoiceConverter:
    """Reference utterance sets the voice; convert() re-voices source wavs."""

    def __init__(self, ppg2mel_fpath: Optional[Union[str, Path]] = None,
                 extractor: Optional[PPGExtractor] = None,
                 encoder: Optional[SpeakerEncoderInference] = None,
                 cfg=None, verbose: bool = True, seed: int = 0):
        self.cfg = Config(ppg2mel_config()).merge(cfg or {})
        self.extractor = extractor or PPGExtractor(verbose=verbose)
        self.encoder = encoder or SpeakerEncoderInference()
        model, variables = init_ppg2mel(jax.random.PRNGKey(seed), self.cfg.clone())
        if ppg2mel_fpath is not None and Path(ppg2mel_fpath).exists():
            loaded = load_single(ppg2mel_fpath)
            variables = {"params": jax.tree.map(jnp.asarray, loaded["params"]),
                         "batch_stats": jax.tree.map(jnp.asarray, loaded["batch_stats"])}
            if verbose:
                print(f"Loaded ppg2mel from {ppg2mel_fpath}")
        elif verbose:
            print("ppg2mel: fresh (untrained) weights")
        self.model = model
        self.variables = variables
        self.ref_embed: Optional[np.ndarray] = None
        self.ref_lf0_mean = 0.0
        self.ref_lf0_std = 1.0

    def set_reference(self, ref_wav_path: Union[str, Path]) -> None:
        """Target speaker: d-vector + lf0 statistics (`run.py:53-56`)."""
        ecfg = encoder_audio_config()
        wav = preprocess_wav(ref_wav_path, ecfg)
        self.ref_embed = self.encoder.embed_utterance(wav)
        raw, _ = load_wav(ref_wav_path, target_sr=16000)
        lf0 = f02lf0(compute_f0(raw))
        self.ref_lf0_mean, self.ref_lf0_std = compute_mean_std(lf0)

    @functools.lru_cache(maxsize=8)
    def _decode_fn(self, t_mem: int, max_steps: int):
        model = self.model
        cfg = self.cfg
        r = cfg.frames_per_step
        m = cfg.num_mels

        @jax.jit
        def decode(variables, memory, mem_mask, key, stop_threshold):
            b = memory.shape[0]
            n_groups = max_steps // r
            buf = jnp.zeros((n_groups, b, m * r))
            carry0 = model.apply(variables, b, method=MelDecoderMOLv2.init_carry)
            go = jnp.zeros((b, m))

            def cond(state):
                t, done, *_ = state
                return jnp.logical_and(t < n_groups, jnp.logical_not(jnp.all(done)))

            def body(state):
                t, done, frames, carry, prev, buf, key = state
                key, sub = jax.random.split(key)
                carry, (mel_r, stop, _) = model.apply(
                    variables, memory, mem_mask, carry, prev,
                    method=MelDecoderMOLv2.decode_step, rngs={"dropout": sub})
                buf = jax.lax.dynamic_update_index_in_dim(buf, mel_r, t, 0)
                newly = jnp.logical_and(jnp.logical_not(done),
                                        jax.nn.sigmoid(stop) > stop_threshold)
                done = jnp.logical_or(done, newly)
                # per-row stop step: utterances in one batch finish at
                # different frames (the reference decodes one utterance at a
                # time, `run.py:63-94`; the batched path must track each)
                frames = jnp.where(newly, (t + 1) * r, frames)
                prev = mel_r.reshape(b, r, m)[:, -1]
                return (t + 1, done, frames, carry, prev, buf, key)

            state = (jnp.asarray(0), jnp.zeros((b,), bool),
                     jnp.zeros((b,), jnp.int32), carry0, go, buf, key)
            t_final, done, frames, _, _, buf, _ = jax.lax.while_loop(
                cond, body, state)
            frames = jnp.where(done, frames, t_final * r)
            mels = jnp.swapaxes(buf, 0, 1).reshape(b, n_groups * r, m)
            mels = model.apply(variables, mels, method=MelDecoderMOLv2.postnet_apply)
            return mels, frames

        return decode

    def convert_wavs(self, src_wavs, max_steps: Optional[int] = None,
                     stop_threshold: float = 0.5, seed: int = 0) -> list:
        """Batched one-shot VC: list of source wavs → list of (T_i, 80) mels.

        The throughput path (VERDICT r4 Next #2): the reference converts a
        whole directory one utterance at a time (`run.py:63-94`); here every
        utterance's Conformer PPG extraction and MOL-attention AR decode run
        as ONE batched device program each — the AR while-loop's per-step
        cost is nearly flat in batch, so converting B utterances together
        costs ~one utterance's latency. Memory lengths are padded to a
        shared 64-group bucket and the batch to a power-of-two so repeat
        calls reuse compiled programs; per-row stop steps trim each output.

        ``max_steps`` defaults to the longest source's frame count bucketed
        to 100 (the decoder never needs more frames than the source has,
        content-preserving VC being roughly length-preserving)."""
        assert self.ref_embed is not None, "call set_reference() first"
        down = int(np.prod(self.cfg.encoder_downsample_rates))
        ppgs = self.extractor.extract_from_wavs(src_wavs)
        ns, feats = [], []
        for wav, ppg in zip(src_wavs, ppgs):
            lf0_uv = get_converted_lf0uv(wav, self.ref_lf0_mean, self.ref_lf0_std)
            n = min(len(ppg), len(lf0_uv))
            n -= n % down
            ns.append(n)
            feats.append((ppg[:n], lf0_uv[:n]))

        b = len(src_wavs)
        b_pad = 1 << max(b - 1, 0).bit_length()  # power-of-two batch bucket
        t_mem_pad = max(64, int(np.ceil(max(ns) / down / 64)) * 64)
        if max_steps is None:
            max_steps = max(((max(ns) + 99) // 100) * 100, 200)
        ppg_pad = np.zeros((b_pad, t_mem_pad * down, ppgs[0].shape[1]), np.float32)
        lf0_pad = np.zeros((b_pad, t_mem_pad * down, 2), np.float32)
        mem_mask = np.zeros((b_pad, t_mem_pad), np.float32)
        for i, (ppg, lf0_uv) in enumerate(feats):
            ppg_pad[i, : ns[i]] = ppg
            lf0_pad[i, : ns[i]] = lf0_uv
            mem_mask[i, : ns[i] // down] = 1
        mem_mask[b:, :1] = 1  # padding rows attend to one frame, decode junk

        embeds = np.tile(self.ref_embed, (b_pad, 1))
        memory = self._encode(jnp.asarray(ppg_pad), jnp.asarray(lf0_pad),
                              jnp.asarray(embeds))
        decode = self._decode_fn(t_mem_pad, max_steps)
        mels, frames = decode(self.variables, memory, jnp.asarray(mem_mask),
                              jax.random.PRNGKey(seed),
                              jnp.float32(stop_threshold))
        mels = np.asarray(mels)
        frames = np.asarray(frames)
        return [mels[i, : min(int(frames[i]), ns[i])] for i in range(b)]

    def convert_wav(self, src_wav: np.ndarray, max_steps: int = 1600,
                    stop_threshold: float = 0.5, seed: int = 0) -> tuple[np.ndarray, float]:
        """source wav → (mel (T, 80), rtf). Mel in SV2TTS ±4 convention."""
        t0 = time.time()
        mel = self.convert_wavs([src_wav], max_steps=max_steps,
                                stop_threshold=stop_threshold, seed=seed)[0]
        rtf = (time.time() - t0) / max(0.01 * len(mel), 1e-6)
        return mel, rtf

    @functools.partial(jax.jit, static_argnums=0)
    def _encode(self, ppg, lf0_uv, spembs):
        return self.model.apply(self.variables, ppg, lf0_uv, spembs,
                                method=MelDecoderMOLv2.encode_inputs)

    def convert_files(self, src_paths, out_dir, vocoder=None,
                      batch_size: int = 8) -> None:
        """Whole-directory conversion with RTF report (`run.py:63-94`).

        Unlike the reference's sequential loop, utterances ride the batched
        `convert_wavs` path in groups of ``batch_size`` — the reported mean
        RTF is the reference's own convention (elapsed / 0.01·mel_len,
        lower is better), computed per utterance from its batch's share."""
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        rtfs = []
        src_paths = list(src_paths)
        for i in range(0, len(src_paths), batch_size):
            chunk = src_paths[i : i + batch_size]
            wavs = [load_wav(p, target_sr=16000)[0] for p in chunk]
            t0 = time.time()
            mels = self.convert_wavs(wavs)
            elapsed = time.time() - t0
            total_frames = sum(len(m) for m in mels)
            rtfs += [elapsed / max(0.01 * total_frames, 1e-6)] * len(chunk)
            if vocoder is not None and hasattr(vocoder, "infer_waveform_batch"):
                outs = vocoder.infer_waveform_batch([m.T for m in mels])
            elif vocoder is not None:
                outs = [vocoder.infer_waveform(m.T) for m in mels]
            else:
                from ...dsp import inv_mel_spectrogram
                outs = [np.asarray(inv_mel_spectrogram(jnp.asarray(m),
                                                       sv2tts_audio_config()))
                        for m in mels]
            for p, out in zip(chunk, outs):
                save_wav(out, out_dir / f"vc_{Path(p).stem}.wav", 16000)
        print(f"mean RTF: {np.mean(rtfs):.3f}")


# ---------------------------------------------------------------------------
# VC preprocessing (`models/ppg2mel/preprocess.py:21-113`)
# ---------------------------------------------------------------------------

def preprocess_vc_dataset(wav_dir: Path, out_dir: Path,
                          extractor: Optional[PPGExtractor] = None,
                          encoder: Optional[SpeakerEncoderInference] = None,
                          audio_cfg=None) -> None:
    """Every wav under wav_dir → bnf/ f0/ embed/ mel/ + fid lists (split by
    utterance-id suffix as in `preprocess.py:102-109`)."""
    wav_dir, out_dir = Path(wav_dir), Path(out_dir)
    extractor = extractor or PPGExtractor(verbose=False)
    encoder = encoder or SpeakerEncoderInference()
    audio_cfg = audio_cfg or sv2tts_audio_config()
    ecfg = encoder_audio_config()
    for sub in ("bnf", "f0", "embed", "mel"):
        (out_dir / sub).mkdir(parents=True, exist_ok=True)

    fids = []
    for wav_path in sorted(wav_dir.glob("**/*.wav")):
        fid = wav_path.stem
        wav, _ = load_wav(wav_path, target_sr=16000)
        if len(wav) < 1600:
            continue
        ppg = extractor.extract_from_wav(wav)
        f0 = compute_f0(wav)
        uv, cont_lf0 = get_cont_lf0(f0)
        lf0_uv = np.stack([cont_lf0, uv], axis=1).astype(np.float32)
        embed = encoder.embed_utterance(preprocess_wav(wav, ecfg))
        # bucketed mel: arbitrary utterance lengths must not trigger a
        # per-length XLA compile on the TPU backend (melspectrogram_bucketed
        # is bit-identical to melspectrogram, one compile per ~1 s bucket)
        mel = np.asarray(melspectrogram_bucketed(wav, audio_cfg), np.float32)
        np.save(out_dir / "bnf" / f"{fid}.npy", ppg)
        np.save(out_dir / "f0" / f"{fid}.npy", lf0_uv)
        np.save(out_dir / "embed" / f"{fid}.npy", embed)
        np.save(out_dir / "mel" / f"{fid}.npy", mel)
        fids.append(fid)

    # split: utts ending 6/7 → dev, 8/9 → eval, rest train (`preprocess.py:102-109`)
    train, dev, evl = [], [], []
    for fid in fids:
        tail = fid[-1]
        (dev if tail in "67" else evl if tail in "89" else train).append(fid)
    for name, lst in (("train", train), ("dev", dev), ("eval", evl)):
        (out_dir / f"{name}_fidlist.txt").write_text("\n".join(lst) + "\n")
    print(f"VC preprocess: {len(fids)} utterances "
          f"({len(train)} train / {len(dev)} dev / {len(evl)} eval)")
