"""Reference (PyTorch) checkpoint → mockingbird_tpu parameter conversion.

Enables the BASELINE "allclose vs reference" validation and lets users bring
community MockingBird checkpoints into this framework. Converters map torch
``state_dict`` tensors onto the flax parameter pytrees:

  * Conv1d      (out,in,k)   → (k,in,out)
  * ConvT1d     (in,out,k)   → (k,in,out) with the kernel axis reversed
                               (flax SAME conv_transpose == torch's
                               pad=(u//2+u%2), output_padding=u%2 scheme)
  * Linear      (out,in)     → (in,out)
  * weight_norm (g,v)        → WeightNorm{layer/kernel: v, kernel/scale: g}
  * GRU/LSTM    fused torch gates → flax per-gate kernels

All converters take plain numpy/torch tensors; no torch import is required
unless you call `state_dict_to_numpy`.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


def conv1d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def conv2d(w: np.ndarray) -> np.ndarray:
    # torch (out,in,kh,kw) → flax (kh,kw,in,out)
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose1d(w: np.ndarray) -> np.ndarray:
    # torch (in,out,k) → flax (k,in,out), kernel axis reversed
    return np.transpose(w[:, :, ::-1], (2, 0, 1)).copy()


def dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _fold_torch_weight_norm(sd, prefix: str) -> np.ndarray:
    """Reconstruct the effective torch weight w = g · v/||v|| (norm over all
    dims except dim 0, torch's default). torch normalizes per dim-0 slice —
    for ConvTranspose that's the INPUT channel, which has no flax WeightNorm
    equivalent, so the norm is folded and re-expressed below."""
    v = sd[f"{prefix}.weight_v"]
    g = sd[f"{prefix}.weight_g"]
    norm = np.sqrt(np.sum(v.reshape(v.shape[0], -1) ** 2, axis=1))
    norm = norm.reshape((-1,) + (1,) * (v.ndim - 1))
    return g * v / np.maximum(norm, 1e-12)


def _flax_wn_split(kernel: np.ndarray) -> tuple:
    """Effective flax kernel → (v, scale) such that WeightNorm reproduces it
    exactly: scale_j = ||kernel[..., j]||, v = kernel."""
    flat = kernel.reshape(-1, kernel.shape[-1])
    scale = np.sqrt(np.sum(flat ** 2, axis=0))
    return kernel, scale


def wn_conv1d(sd: Dict[str, np.ndarray], prefix: str) -> tuple:
    """torch weight_norm Conv1d → (wrapped-conv params, flax scale)."""
    w_eff = _fold_torch_weight_norm(sd, prefix)
    kernel, scale = _flax_wn_split(conv1d(w_eff))
    conv = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        conv["bias"] = sd[f"{prefix}.bias"]
    return conv, scale


def wn_conv_transpose1d(sd: Dict[str, np.ndarray], prefix: str) -> tuple:
    w_eff = _fold_torch_weight_norm(sd, prefix)
    kernel, scale = _flax_wn_split(conv_transpose1d(w_eff))
    conv = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        conv["bias"] = sd[f"{prefix}.bias"]
    return conv, scale


def torch_gru_to_flax(w_ih, w_hh, b_ih, b_hh, h: int) -> Dict:
    """torch GRU(Cell) fused gates [r,z,n] → flax GRUCell params.

    torch: r=σ(Wir·x+bir+Whr·h+bhr), n=tanh(Win·x+bin + r*(Whn·h+bhn)).
    flax:  r=σ(ir(x)+hr(h)),         n=tanh(in(x)     + r*(hn(h)+bn)).
    ir bias ← bir+bhr (exact: both add pre-sigmoid); hn bias ← bhn; in bias ← bin.
    """
    wir, wiz, win = w_ih[:h], w_ih[h:2*h], w_ih[2*h:]
    whr, whz, whn = w_hh[:h], w_hh[h:2*h], w_hh[2*h:]
    bir, biz, bin_ = b_ih[:h], b_ih[h:2*h], b_ih[2*h:]
    bhr, bhz, bhn = b_hh[:h], b_hh[h:2*h], b_hh[2*h:]
    return {
        "ir": {"kernel": dense(wir), "bias": bir + bhr},
        "iz": {"kernel": dense(wiz), "bias": biz + bhz},
        "in": {"kernel": dense(win), "bias": bin_},
        "hr": {"kernel": dense(whr)},
        "hz": {"kernel": dense(whz)},
        "hn": {"kernel": dense(whn), "bias": bhn},
    }


def torch_lstm_to_flax(w_ih, w_hh, b_ih, b_hh, h: int) -> Dict:
    """torch LSTM fused gates [i,f,g,o] → flax OptimizedLSTMCell params
    (dense_i no bias; dense_h carries the combined bias)."""
    def split(w):
        return w[:h], w[h:2*h], w[2*h:3*h], w[3*h:]
    wii, wif, wig, wio = split(w_ih)
    whi, whf, whg, who = split(w_hh)
    bi, bf, bg, bo = split(b_ih + b_hh)
    return {
        "ii": {"kernel": dense(wii)}, "if": {"kernel": dense(wif)},
        "ig": {"kernel": dense(wig)}, "io": {"kernel": dense(wio)},
        "hi": {"kernel": dense(whi), "bias": bi},
        "hf": {"kernel": dense(whf), "bias": bf},
        "hg": {"kernel": dense(whg), "bias": bg},
        "ho": {"kernel": dense(who), "bias": bo},
    }


def batchnorm(sd: Dict[str, np.ndarray], prefix: str) -> tuple:
    """→ (params {scale,bias}, stats {mean,var})."""
    return ({"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]})


# ---------------------------------------------------------------------------
# Tree assembly helpers — flax WeightNorm stores scale as
# params[<wn_name>]['<wrapped>/kernel/scale'] and the wrapped layer under
# params[<wn_name>]['<wrapped>']{kernel,bias}; our modules name the wrapped
# conv 'layers_0'.
# ---------------------------------------------------------------------------

def _wn_entry(tree: Dict, flax_name: str, converted: tuple) -> None:
    """Place (conv_params, scale) as flax WeightNorm stores them: the wrapped
    layer lives at a sibling scope ``<name>_conv``; the scale inside the
    wrapper scope at ``<name>/<name>_conv/kernel/scale``."""
    conv, g = converted
    tree[f"{flax_name}_conv"] = {k: np.asarray(v) for k, v in conv.items()}
    # the scale lives under the wrapper's scope as ONE flat key with slashes
    tree[flax_name] = {f"{flax_name}_conv/kernel/scale": np.asarray(g)}


# ---------------------------------------------------------------------------
# HiFi-GAN generator (`models/vocoder/hifigan/models.py:93-150`)
# ---------------------------------------------------------------------------

def convert_hifigan_generator(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """torch Generator state_dict → params for `models.vocoder.hifigan.Generator`."""
    p: Dict = {}
    _wn_entry(p, "conv_pre", wn_conv1d(sd, "conv_pre"))
    _wn_entry(p, "conv_post", wn_conv1d(sd, "conv_post"))
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        _wn_entry(p, f"ups_{i}", wn_conv_transpose1d(sd, f"ups.{i}"))
        for j in range(n_k):
            blk: Dict = {}
            flat = i * n_k + j
            if cfg.resblock == "1":
                for c in range(3):
                    _wn_entry(blk, f"convs1_{c}", wn_conv1d(sd, f"resblocks.{flat}.convs1.{c}"))
                    _wn_entry(blk, f"convs2_{c}", wn_conv1d(sd, f"resblocks.{flat}.convs2.{c}"))
            else:
                for c in range(2):
                    _wn_entry(blk, f"convs_{c}", wn_conv1d(sd, f"resblocks.{flat}.convs.{c}"))
            p[f"resblock_{i}_{j}"] = blk
    return p


# ---------------------------------------------------------------------------
# WaveRNN (`models/vocoder/wavernn/models/fatchord_version.py`)
# ---------------------------------------------------------------------------

def convert_wavernn(sd: Dict[str, np.ndarray], cfg) -> tuple:
    """torch WaveRNN state_dict → (params, batch_stats) for our WaveRNN."""
    h = cfg.rnn_dims
    p: Dict = {}
    stats: Dict = {}

    # upsample network
    up: Dict = {}
    up_stats: Dict = {}
    res: Dict = {}
    res_stats: Dict = {}
    res["conv_in"] = {"kernel": conv1d(sd["upsample.resnet.conv_in.weight"])}
    bn_p, bn_s = batchnorm(sd, "upsample.resnet.batch_norm")
    res["bn"] = bn_p
    res_stats["bn"] = bn_s
    for i in range(cfg.res_blocks):
        blk = {"conv1": {"kernel": conv1d(sd[f"upsample.resnet.layers.{i}.conv1.weight"])},
               "conv2": {"kernel": conv1d(sd[f"upsample.resnet.layers.{i}.conv2.weight"])}}
        b1p, b1s = batchnorm(sd, f"upsample.resnet.layers.{i}.batch_norm1")
        b2p, b2s = batchnorm(sd, f"upsample.resnet.layers.{i}.batch_norm2")
        blk["bn1"], blk["bn2"] = b1p, b2p
        res[f"res_{i}"] = blk
        res_stats[f"res_{i}"] = {"bn1": b1s, "bn2": b2s}
    res["conv_out"] = {"kernel": conv1d(sd["upsample.resnet.conv_out.weight"]),
                       "bias": sd["upsample.resnet.conv_out.bias"]}
    up["resnet"] = res
    up_stats["resnet"] = res_stats
    # smoothing convs: torch up_layers indices 1,3,5 are the Conv2d (1,1,(1,k))
    for li, i in enumerate(range(1, 2 * len(cfg.upsample_factors), 2)):
        w = sd[f"upsample.up_layers.{i}.weight"]  # (1,1,1,k) over (time) axis? torch kernel (1, k)
        # torch Conv2d kernel (out,in,kh,kw) with kh=1, kw=k over the TIME axis
        # of (B,1,M,T); ours convs over (B,T,M,1) with kernel (k,1)
        k = w.shape[-1]
        ours = np.transpose(w, (3, 2, 1, 0)).reshape(k, 1, 1, 1)
        up[f"up_conv_{li}"] = {"kernel": ours}
    p["upsample"] = up
    stats["upsample"] = up_stats

    p["I"] = {"kernel": dense(sd["I.weight"]), "bias": sd["I.bias"]}
    for name in ("rnn1", "rnn2"):
        p[name] = {"cell": torch_gru_to_flax(
            sd[f"{name}.weight_ih_l0"], sd[f"{name}.weight_hh_l0"],
            sd[f"{name}.bias_ih_l0"], sd[f"{name}.bias_hh_l0"], h)}
    for name in ("fc1", "fc2", "fc3"):
        p[name] = {"kernel": dense(sd[f"{name}.weight"]), "bias": sd[f"{name}.bias"]}
    return p, stats


# ---------------------------------------------------------------------------
# GE2E speaker encoder (`models/encoder/model.py`)
# ---------------------------------------------------------------------------

def convert_encoder(sd: Dict[str, np.ndarray], hidden: int = 256) -> Dict:
    """torch SpeakerEncoder state_dict → our params['model'] tree."""
    p: Dict = {}
    for layer in range(3):
        p[f"lstm_{layer}"] = torch_lstm_to_flax(
            sd[f"lstm.weight_ih_l{layer}"], sd[f"lstm.weight_hh_l{layer}"],
            sd[f"lstm.bias_ih_l{layer}"], sd[f"lstm.bias_hh_l{layer}"], hidden)
    p["linear"] = {"kernel": dense(sd["linear.weight"]), "bias": sd["linear.bias"]}
    return p


# ---------------------------------------------------------------------------
# Tacotron (`models/synthesizer/models/tacotron.py`)
# ---------------------------------------------------------------------------

def _convert_cbhg(sd: Dict[str, np.ndarray], prefix: str, K: int,
                  num_highways: int, bidir_hidden: int) -> tuple:
    p: Dict = {}
    stats: Dict = {}
    for i in range(K):
        bn_p, bn_s = batchnorm(sd, f"{prefix}.conv1d_bank.{i}.bnorm")
        p[f"bank_{i+1}"] = {"conv": {"kernel": conv1d(sd[f"{prefix}.conv1d_bank.{i}.conv.weight"])},
                            "bnorm": bn_p}
        stats[f"bank_{i+1}"] = {"bnorm": bn_s}
    for name in ("conv_project1", "conv_project2"):
        bn_p, bn_s = batchnorm(sd, f"{prefix}.{name}.bnorm")
        p[name] = {"conv": {"kernel": conv1d(sd[f"{prefix}.{name}.conv.weight"])},
                   "bnorm": bn_p}
        stats[name] = {"bnorm": bn_s}
    if f"{prefix}.pre_highway.weight" in sd:
        p["pre_highway"] = {"kernel": dense(sd[f"{prefix}.pre_highway.weight"])}
    for i in range(num_highways):
        p[f"highway_{i}"] = {
            "W1": {"kernel": dense(sd[f"{prefix}.highways.{i}.W1.weight"]),
                   "bias": sd[f"{prefix}.highways.{i}.W1.bias"]},
            "W2": {"kernel": dense(sd[f"{prefix}.highways.{i}.W2.weight"]),
                   "bias": sd[f"{prefix}.highways.{i}.W2.bias"]}}
    p["gru_fwd"] = torch_gru_to_flax(
        sd[f"{prefix}.rnn.weight_ih_l0"], sd[f"{prefix}.rnn.weight_hh_l0"],
        sd[f"{prefix}.rnn.bias_ih_l0"], sd[f"{prefix}.rnn.bias_hh_l0"], bidir_hidden)
    p["gru_bwd"] = torch_gru_to_flax(
        sd[f"{prefix}.rnn.weight_ih_l0_reverse"], sd[f"{prefix}.rnn.weight_hh_l0_reverse"],
        sd[f"{prefix}.rnn.bias_ih_l0_reverse"], sd[f"{prefix}.rnn.bias_hh_l0_reverse"],
        bidir_hidden)
    return p, stats


def _prenet(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    return {"fc1": {"kernel": dense(sd[f"{prefix}.fc1.weight"]), "bias": sd[f"{prefix}.fc1.bias"]},
            "fc2": {"kernel": dense(sd[f"{prefix}.fc2.weight"]), "bias": sd[f"{prefix}.fc2.bias"]}}


def convert_tacotron(sd: Dict[str, np.ndarray], cfg) -> tuple:
    """torch Tacotron state_dict → (params, batch_stats) for our Tacotron."""
    p: Dict = {}
    stats: Dict = {}

    enc: Dict = {"embedding": {"embedding": sd["encoder.embedding.weight"]},
                 "pre_net": _prenet(sd, "encoder.pre_net")}
    cbhg_p, cbhg_s = _convert_cbhg(sd, "encoder.cbhg", cfg.encoder_K,
                                   cfg.num_highways, cfg.encoder_dims // 2)
    enc["cbhg"] = cbhg_p
    p["encoder"] = enc
    stats["encoder"] = {"cbhg": cbhg_s}

    p["encoder_proj"] = {"kernel": dense(sd["encoder_proj.weight"])}

    if cfg.use_gst:
        g_enc: Dict = {}
        g_enc_s: Dict = {}
        for i in range(len(cfg.gst_ref_filters)):
            g_enc[f"conv_{i}"] = {"kernel": conv2d(sd[f"gst.encoder.convs.{i}.weight"]),
                                  "bias": sd[f"gst.encoder.convs.{i}.bias"]}
            bn_p, bn_s = batchnorm(sd, f"gst.encoder.bns.{i}")
            g_enc[f"bn_{i}"] = bn_p
            g_enc_s[f"bn_{i}"] = bn_s
        g_enc["gru"] = torch_gru_to_flax(
            sd["gst.encoder.gru.weight_ih_l0"], sd["gst.encoder.gru.weight_hh_l0"],
            sd["gst.encoder.gru.bias_ih_l0"], sd["gst.encoder.gru.bias_hh_l0"],
            cfg.gst_E // 2)
        p["gst"] = {"encoder": g_enc,
                    "stl": {"embed": sd["gst.stl.embed"],
                            "W_query": {"kernel": dense(sd["gst.stl.attention.W_query.weight"])},
                            "W_key": {"kernel": dense(sd["gst.stl.attention.W_key.weight"])},
                            "W_value": {"kernel": dense(sd["gst.stl.attention.W_value.weight"])}}}
        stats["gst"] = {"encoder": g_enc_s}

    dec: Dict = {"prenet": _prenet(sd, "decoder.prenet")}
    dec["attn_net"] = {
        "conv": {"kernel": conv1d(sd["decoder.attn_net.conv.weight"]),
                 "bias": sd["decoder.attn_net.conv.bias"]},
        "L": {"kernel": dense(sd["decoder.attn_net.L.weight"])},
        "W": {"kernel": dense(sd["decoder.attn_net.W.weight"]),
              "bias": sd["decoder.attn_net.W.bias"]},
        "v": {"kernel": dense(sd["decoder.attn_net.v.weight"])}}
    dec["attn_rnn"] = torch_gru_to_flax(
        sd["decoder.attn_rnn.weight_ih"], sd["decoder.attn_rnn.weight_hh"],
        sd["decoder.attn_rnn.bias_ih"], sd["decoder.attn_rnn.bias_hh"],
        cfg.decoder_dims)
    dec["rnn_input"] = {"kernel": dense(sd["decoder.rnn_input.weight"]),
                        "bias": sd["decoder.rnn_input.bias"]}
    for name in ("res_rnn1", "res_rnn2"):
        dec[name] = torch_lstm_to_flax(
            sd[f"decoder.{name}.weight_ih"], sd[f"decoder.{name}.weight_hh"],
            sd[f"decoder.{name}.bias_ih"], sd[f"decoder.{name}.bias_hh"],
            cfg.lstm_dims)
    dec["mel_proj"] = {"kernel": dense(sd["decoder.mel_proj.weight"])}
    dec["stop_proj"] = {"kernel": dense(sd["decoder.stop_proj.weight"]),
                        "bias": sd["decoder.stop_proj.bias"]}
    p["decoder"] = dec

    post_p, post_s = _convert_cbhg(sd, "postnet", cfg.postnet_K,
                                   cfg.num_highways, cfg.postnet_dims // 2)
    p["postnet"] = post_p
    stats["postnet"] = post_s
    p["post_proj"] = {"kernel": dense(sd["post_proj.weight"])}
    return p, stats
