"""Synthesizer dataset preprocessing: corpora → {audio/, mels/, embeds/, train.txt}.

Parity with `/root/reference/models/synthesizer/preprocess.py` +
`preprocess_audio.py`: per-dataset registry (subfolders + transcript path +
parser), per-utterance trim → rescale → logmmse denoise → pinyin, SV2TTS mel,
length filters, pipe-separated `train.txt`, then speaker-embedding extraction
over the saved audio. Host-side thread pool feeds the jitted mel frontend.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import partial
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ...config import encoder_audio_config, sv2tts_audio_config
from ...dsp import load_wav, melspectrogram_bucketed
from ...dsp.logmmse import denoise, profile_noise
from ...text.pinyin import chinese_to_pinyin


def _transcript_general(dict_info: Dict[str, str], lines) -> None:
    """`<utt_id> <text...>` per line (`preprocess.py:73-79`)."""
    for v in lines:
        if not v.strip():
            continue
        parts = v.strip().replace("\n", "").replace("\t", " ").split(" ")
        dict_info[parts[0]] = " ".join(parts[1:])


def _transcript_magicdata(dict_info, lines):
    """`<wav_name> <spk> <text...>` (`preprocess_transcript.py` magicdata)."""
    for v in lines:
        if not v.strip():
            continue
        parts = v.strip().split("\t") if "\t" in v else v.strip().split(" ")
        parts = [p for p in " ".join(parts).split(" ") if p]
        if len(parts) >= 3:
            dict_info[parts[0].split(".")[0]] = " ".join(parts[2:])


def _transcript_aishell3(dict_info, lines):
    """aishell3 content.txt: `<wav> <char pinyin char pinyin ...>` — keep the
    hanzi (every even token) (`preprocess_transcript.py` aishell3)."""
    for v in lines:
        if not v.strip():
            continue
        parts = v.strip().split()
        if len(parts) < 2:
            continue
        utt = parts[0].split(".")[0]
        dict_info[utt] = "".join(parts[1::2])


DATA_INFO = {
    "aidatatang_200zh": dict(subfolders=["corpus/train"],
                             trans_filepath="transcript/aidatatang_200_zh_transcript.txt",
                             transcript_func=_transcript_general),
    "aidatatang_200zh_s": dict(subfolders=["corpus/train"],
                               trans_filepath="transcript/aidatatang_200_zh_transcript.txt",
                               transcript_func=_transcript_general),
    "magicdata": dict(subfolders=["train"], trans_filepath="train/TRANS.txt",
                      transcript_func=_transcript_magicdata),
    "aishell3": dict(subfolders=["train/wav"], trans_filepath="train/content.txt",
                     transcript_func=_transcript_aishell3),
    "data_aishell": dict(subfolders=["wav/train"],
                         trans_filepath="transcript/aishell_transcript_v0.8.txt",
                         transcript_func=_transcript_general),
}


def trim_top_db(wav: np.ndarray, top_db: float = 40.0,
                frame_length: int = 2048, hop_length: int = 1024) -> np.ndarray:
    """librosa.effects.trim equivalent (`preprocess_audio.py:91`)."""
    if len(wav) < frame_length:
        return wav
    n = 1 + (len(wav) - frame_length) // hop_length
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    rms = np.sqrt(np.mean(wav[idx] ** 2, axis=1))
    db = 20 * np.log10(np.maximum(rms, 1e-10) / max(rms.max(), 1e-10))
    keep = np.where(db > -top_db)[0]
    if len(keep) == 0:
        return wav
    start = keep[0] * hop_length
    end = min(len(wav), (keep[-1] + 1) * hop_length + frame_length)
    return wav[start:end]


def split_on_silences(wav_fpath, words: str, audio_cfg) -> tuple[np.ndarray, str]:
    """Load + trim + rescale + denoise + romanise (`preprocess_audio.py:86-103`)."""
    wav, _ = load_wav(wav_fpath, target_sr=audio_cfg.sample_rate)
    wav = trim_top_db(wav)
    if audio_cfg.rescale:
        wav = wav / max(np.abs(wav).max(), 1e-8) * audio_cfg.rescaling_max
    sr = audio_cfg.sample_rate
    if len(wav) > sr * 0.4:
        noise_wav = np.concatenate([wav[: int(sr * 0.15)], wav[-int(sr * 0.15):]])
        try:
            profile = profile_noise(noise_wav, sr)
            wav = denoise(wav, profile, eta=0)
        except Exception:
            pass
    res = " ".join(p for p in chinese_to_pinyin(words) if p and not p.isspace())
    return wav, res


def process_utterance(wav: np.ndarray, text: str, out_dir: Path, basename: str,
                      audio_cfg, skip_existing: bool) -> Optional[tuple]:
    """mel + audio .npy writer with min/max-length filters
    (`preprocess_audio.py:47-83`); mel saved bin-major (M, T) like the ref."""
    mel_fpath = out_dir / "mels" / f"mel-{basename}.npy"
    wav_fpath = out_dir / "audio" / f"audio-{basename}.npy"
    if skip_existing and mel_fpath.exists() and wav_fpath.exists():
        mel_frames = np.load(mel_fpath).shape[1]
        return wav_fpath.name, mel_fpath.name, f"embed-{basename}.npy", len(wav), mel_frames, text
    if len(wav) < audio_cfg.utterance_min_duration * audio_cfg.sample_rate:
        return None
    # bucketed: one compile per ~1 s length bucket, exact melspectrogram output
    mel = melspectrogram_bucketed(wav, audio_cfg)  # (T, M)
    mel_frames = mel.shape[0]
    if mel_frames > audio_cfg.max_mel_frames and audio_cfg.clip_mels_length:
        return None
    np.save(mel_fpath, mel.T, allow_pickle=False)
    np.save(wav_fpath, wav, allow_pickle=False)
    return wav_fpath.name, mel_fpath.name, f"embed-{basename}.npy", len(wav), mel_frames, text


def _preprocess_speaker(speaker_dir: Path, out_dir: Path, skip_existing: bool,
                        audio_cfg, dict_info: Dict[str, str]):
    metadata = []
    for ext in ("*.wav", "*.flac", "*.mp3"):
        for wav_fpath in sorted(speaker_dir.glob("**/" + ext)):
            words = dict_info.get(wav_fpath.stem)
            if not words:
                continue
            try:
                wav, text = split_on_silences(wav_fpath, words, audio_cfg)
            except Exception:
                continue
            sub_basename = f"{speaker_dir.name}_{wav_fpath.stem}"
            item = process_utterance(wav, text, out_dir, sub_basename, audio_cfg, skip_existing)
            if item is not None:
                metadata.append(item)
    return metadata


def preprocess_dataset(datasets_root: Path, out_dir: Path, n_processes: int = 8,
                       skip_existing: bool = False, dataset: str = "aidatatang_200zh",
                       audio_cfg=None, encoder_model_fpath=None) -> None:
    audio_cfg = (audio_cfg or sv2tts_audio_config()).clone()
    audio_cfg.merge(dict(utterance_min_duration=0.5, clip_mels_length=True))
    info = DATA_INFO[dataset]
    dataset_root = Path(datasets_root) / dataset
    input_dirs = [dataset_root / sub for sub in info["subfolders"]]
    assert all(d.exists() for d in input_dirs), f"missing input dirs under {dataset_root}"

    out_dir = Path(out_dir)
    (out_dir / "mels").mkdir(parents=True, exist_ok=True)
    (out_dir / "audio").mkdir(exist_ok=True)

    dict_info: Dict[str, str] = {}
    trans = dataset_root / info["trans_filepath"]
    assert trans.exists(), f"{trans} not exist."
    with trans.open("r", encoding="utf-8") as f:
        info["transcript_func"](dict_info, f)

    speaker_dirs = [d for ind in input_dirs for d in sorted(ind.glob("*")) if d.is_dir()]
    func = partial(_preprocess_speaker, out_dir=out_dir, skip_existing=skip_existing,
                   audio_cfg=audio_cfg, dict_info=dict_info)
    metadata_fpath = out_dir / "train.txt"
    with metadata_fpath.open("a" if skip_existing else "w", encoding="utf-8") as mf, \
            ThreadPoolExecutor(n_processes) as pool:
        for speaker_metadata in pool.map(func, speaker_dirs):
            for metadatum in speaker_metadata:
                mf.write("|".join(map(str, metadatum)) + "\n")

    with metadata_fpath.open("r", encoding="utf-8") as f:
        metadata = [line.split("|") for line in f if line.strip()]
    if metadata:
        mel_frames = sum(int(m[4]) for m in metadata)
        timesteps = sum(int(m[3]) for m in metadata)
        print(f"{len(metadata)} utterances, {mel_frames} mel frames, "
              f"{timesteps/audio_cfg.sample_rate/3600:.2f} hours")


def create_embeddings(synthesizer_root: Path, encoder_model_fpath=None,
                      n_processes: int = 4) -> None:
    """Speaker-embed every utterance (`preprocess.py:105-138`): embeds/ dir of
    embed-<utt>.npy, reusing the wav already saved by preprocess_dataset."""
    from ..encoder.inference import SpeakerEncoderInference

    synthesizer_root = Path(synthesizer_root)
    wav_dir = synthesizer_root / "audio"
    embed_dir = synthesizer_root / "embeds"
    embed_dir.mkdir(exist_ok=True)

    with (synthesizer_root / "train.txt").open("r", encoding="utf-8") as f:
        metadata = [line.split("|") for line in f if line.strip()]
    enc = (SpeakerEncoderInference.from_checkpoint(encoder_model_fpath)
           if encoder_model_fpath and Path(encoder_model_fpath).exists()
           else SpeakerEncoderInference())
    ecfg = encoder_audio_config()

    def embed_one(m):
        wav_fname, _, embed_fname = m[0], m[1], m[2]
        out = embed_dir / embed_fname
        if out.exists():
            return
        wav = np.load(wav_dir / wav_fname)
        from ...dsp import preprocess_wav as _pw
        wav = _pw(wav, ecfg)
        embed = enc.embed_utterance(wav)
        np.save(out, embed, allow_pickle=False)

    # the jitted encoder forward serialises on device anyway; thread pool
    # overlaps the numpy IO
    with ThreadPoolExecutor(n_processes) as pool:
        list(pool.map(embed_one, metadata))
    print(f"Embedded {len(metadata)} utterances")


def create_emotion_embeddings(synthesizer_root: Path, weights_path=None,
                              batch_size: int = 8) -> None:
    """Emotion-embed every utterance (`preprocess.py:140-156` create_emo):
    emo/ dir of emo-<utt>.npy (1024-d wav2vec2 embeddings consumed by the
    VITS dataset). Runs the TPU-native extractor batched per length bucket;
    writes zeros (neutral) when no pretrained weights are available."""
    from .emotion import EmotionExtractor

    synthesizer_root = Path(synthesizer_root)
    wav_dir = synthesizer_root / "audio"
    emo_dir = synthesizer_root / "emo"
    emo_dir.mkdir(exist_ok=True)

    with (synthesizer_root / "train.txt").open("r", encoding="utf-8") as f:
        metadata = [line.split("|") for line in f if line.strip()]
    todo = []
    for m in metadata:
        wav_fname = m[0]
        out = emo_dir / f"emo-{wav_fname.split('-', 1)[-1]}"
        if not out.exists():
            todo.append((wav_fname, out))
    if not todo:
        print("All emotion embeddings already exist")
        return

    ex = EmotionExtractor(weights_path=weights_path, verbose=True)
    for i in range(0, len(todo), batch_size):
        chunk = todo[i:i + batch_size]
        wavs = [np.load(wav_dir / fname) for fname, _ in chunk]
        embeds, _ = ex.extract_batch(wavs)
        for (_, out), emb in zip(chunk, embeds):
            np.save(out, emb, allow_pickle=False)
    print(f"Emotion-embedded {len(todo)} utterances "
          f"({'pretrained' if ex.available else 'neutral-zero fallback'})")
