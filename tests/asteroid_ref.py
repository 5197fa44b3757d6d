"""Functional torch replica of the forked-asteroid ``DCCRNet`` forward pass.

This is the *golden generator* for the asteroid-compat JAX model family
(``models/dccrnet.py``): a from-scratch, state_dict-driven reimplementation of
the reference's serving model (``DCCRNet_mini`` / ``DCCRN-CL-test``,
reference ``distill.py:245-247``, ``checkpoint/the_best_model.pth``).

Architecture evidence (no asteroid install needed):
- module repr embedded in reference ``test-asteroid.ipynb`` cells 22/27
  (conv/deconv geometry: kernel (5,2), stride (2,1), padding (2,0),
  output_padding (1,0), bias only on the output layer);
- torchinfo summary in cell 39 (per-layer output shapes, Identity decoder 0);
- the shipped checkpoint's 182 tensors (exact channel plan + filterbank);
- the filterbank was decomposed numerically from
  ``encoder.filterbank._filters``:
      X[k,t] = 1/sqrt(512) * sum_n w[n] x[tH+n] exp(-2i pi k (n+56)/512)
  with sqrt-Hann(400, periodic) window and DC/Nyquist rows scaled by a
  further 1/sqrt(2) (torch.stft ``normalized=True`` convention with the
  window centered in the 512-point frame).

End-to-end validation: reference ``example_CLSKD/ex_*/mixture.wav`` ->
``s0_estimate.wav`` (written by reference ``eval.py:89-101`` with this exact
checkpoint) — all 5 examples reproduce with corr > 0.9999999 and max
deviation at the PCM16 quantization floor (see ``test_dccrnet_asteroid.py``).
Two behaviors discovered empirically against those wavs:

- reference ``eval.py`` never calls ``model.eval()``, so BatchNorm runs with
  per-utterance *batch* statistics (``batch_stats=True`` replicates this);
- the iSTFT Decoder applies no window-envelope normalization (see
  :func:`stft_synthesis`).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

REF_CKPT = "/root/reference/checkpoint/the_best_model.pth"


def load_reference_state_dict(path=REF_CKPT):
    from torch.serialization import safe_globals

    with safe_globals([torch.torch_version.TorchVersion]):
        ck = torch.load(path, map_location="cpu")
    return ck


def _cmul(fn_re, fn_im, xr, xi):
    """Complex multiplication wrapper: (fn_re + i fn_im)(xr + i xi)."""
    return fn_re(xr) - fn_im(xi), fn_re(xi) + fn_im(xr)


def _bn_eval(x, p, prefix, batch_stats=False):
    """BatchNorm; ``batch_stats=True`` mimics train-mode BN (what reference
    ``eval.py`` actually runs — it never calls ``model.eval()``, so BN uses
    per-utterance batch statistics with biased variance)."""
    w = p[f"{prefix}.weight"]
    b = p[f"{prefix}.bias"]
    if batch_stats:
        dims = (0,) + tuple(range(2, x.dim()))
        rm = x.mean(dim=dims)
        rv = x.var(dim=dims, unbiased=False)
    else:
        rm = p[f"{prefix}.running_mean"]
        rv = p[f"{prefix}.running_var"]
    shape = (1, -1) + (1,) * (x.dim() - 2)
    return (x - rm.view(shape)) / torch.sqrt(rv.view(shape) + 1e-5) * w.view(
        shape
    ) + b.view(shape)


def _prelu(x, a):
    return torch.clamp(x, min=0) + a * torch.clamp(x, max=0)


def _lstm(x, p, prefix):
    """Single-layer batch_first LSTM via torch functional (seq [B,T,F])."""
    w_ih = p[f"{prefix}.weight_ih_l0"]
    w_hh = p[f"{prefix}.weight_hh_l0"]
    b_ih = p[f"{prefix}.bias_ih_l0"]
    b_hh = p[f"{prefix}.bias_hh_l0"]
    out, _ = torch._VF.lstm(
        x,
        (
            torch.zeros(1, x.shape[0], w_hh.shape[1]),
            torch.zeros(1, x.shape[0], w_hh.shape[1]),
        ),
        [w_ih, w_hh, b_ih, b_hh],
        True,  # has_biases
        1,  # num_layers
        0.0,  # dropout
        False,  # training
        False,  # bidirectional
        True,  # batch_first
    )[:1] + (None,)
    return out[0] if isinstance(out, tuple) else out


def lstm_seq(x, p, prefix):
    w_ih = p[f"{prefix}.weight_ih_l0"]
    w_hh = p[f"{prefix}.weight_hh_l0"]
    b_ih = p[f"{prefix}.bias_ih_l0"]
    b_hh = p[f"{prefix}.bias_hh_l0"]
    hid = w_hh.shape[1]
    B = x.shape[0]
    h0 = torch.zeros(1, B, hid)
    c0 = torch.zeros(1, B, hid)
    out, _, _ = torch._VF.lstm(
        x, (h0, c0), [w_ih, w_hh, b_ih, b_hh], True, 1, 0.0, False, False, True
    )
    return out


def stft_analysis(wav, filters, hop=100):
    """wav [B, T] -> (re, im) each [B, 257, frames]; filters (514,1,K)."""
    spec = F.conv1d(wav.unsqueeze(1), filters, stride=hop)
    n = filters.shape[0] // 2
    return spec[:, :n], spec[:, n:]


def stft_synthesis(re, im, filters, window, hop=100, length=None):
    """Inverse of :func:`stft_analysis`: a PLAIN transposed convolution.

    Verified against the shipped example wavs: asteroid's Decoder applies NO
    window-envelope normalization — the filterbank scaling (1/sqrt(512) rows,
    DC/Nyquist x 1/sqrt(2), sqrt-Hann window at 4x overlap) makes the
    transpose operator an exact inverse in the interior (OLA(win^2)/2 == 1);
    the first/last win-hop samples simply taper.
    """
    spec = torch.cat([re, im], dim=1)
    wav = F.conv_transpose1d(spec, filters, stride=hop).squeeze(1)  # [B,L]
    if length is not None:
        if wav.shape[-1] >= length:
            wav = wav[..., :length]
        else:
            wav = F.pad(wav, (0, length - wav.shape[-1]))
    return wav


def masker_forward(xr, xi, p, n_blocks=6, drop="last", taps=None, batch_stats=False):
    """DCCRMaskNet forward on complex spec (xr, xi) [B, 257, T].

    Returns complex mask (mr, mi) [B, 257, T] (dropped bin zero-padded back).
    ``drop`` selects which frequency bin is removed to reach n_freqs=256.
    """
    if drop == "last":
        xr_f, xi_f = xr[:, :-1], xi[:, :-1]
    else:  # drop DC
        xr_f, xi_f = xr[:, 1:], xi[:, 1:]
    # [B, 1, F, T]
    hr, hi = xr_f.unsqueeze(1), xi_f.unsqueeze(1)
    enc_outs = []
    for idx in range(n_blocks):
        pre = f"masker.encoders.{idx}"
        conv = lambda t, which: F.conv2d(
            t, p[f"{pre}.conv.{which}.weight"], stride=(2, 1), padding=(2, 0)
        )
        hr, hi = _cmul(
            lambda t: conv(t, "re_module"), lambda t: conv(t, "im_module"), hr, hi
        )
        hr = _bn_eval(hr, p, f"{pre}.norm.re_module", batch_stats)
        hi = _bn_eval(hi, p, f"{pre}.norm.im_module", batch_stats)
        hr = _prelu(hr, p[f"{pre}.activation.re_module.weight"])
        hi = _prelu(hi, p[f"{pre}.activation.im_module.weight"])
        enc_outs.append((hr, hi))
        if taps is not None:
            taps.setdefault("encoder", []).append((hr, hi))

    # RNN block (encoders.6): [B,C,F,T] -> [B,T,C*F]
    B, C, Fq, T = hr.shape
    rr = hr.reshape(B, C * Fq, T).transpose(1, 2).contiguous()
    ri = hi.reshape(B, C * Fq, T).transpose(1, 2).contiguous()
    for layer in (0, 1):
        pre = f"masker.encoders.6.rnn.rnns.{layer}"
        rr, ri = _cmul(
            lambda t: lstm_seq(t, p, f"{pre}.re_module.rnn"),
            lambda t: lstm_seq(t, p, f"{pre}.im_module.rnn"),
            rr,
            ri,
        )
        if taps is not None:
            taps.setdefault("rnn", []).append((rr, ri))
    lin = lambda t, which: F.linear(
        t,
        p[f"masker.encoders.6.linear.{which}.weight"],
        p[f"masker.encoders.6.linear.{which}.bias"],
    )
    rr, ri = _cmul(lambda t: lin(t, "re_module"), lambda t: lin(t, "im_module"), rr, ri)
    hr = rr.transpose(1, 2).reshape(B, C, Fq, T)
    hi = ri.transpose(1, 2).reshape(B, C, Fq, T)
    if taps is not None:
        taps.setdefault("encoder_rnn_out", []).append((hr, hi))

    # Decoders: zip(reversed(enc_outs[:-1] + input), [Identity, dec1..dec5])
    skips = enc_outs[:-1]  # e0..e4; plus e5 consumed first
    order = [enc_outs[5 - 1 - i] for i in range(5)]  # e4, e3, e2, e1, e0
    # decoder 0 = Identity, then cat with e5
    hr = torch.cat([hr, enc_outs[5][0]], dim=1)
    hi = torch.cat([hi, enc_outs[5][1]], dim=1)
    for idx in range(1, n_blocks):
        pre = f"masker.decoders.{idx}"
        deconv = lambda t, which: F.conv_transpose2d(
            t,
            p[f"{pre}.deconv.{which}.weight"],
            stride=(2, 1),
            padding=(2, 0),
            output_padding=(1, 0),
        )
        hr, hi = _cmul(
            lambda t: deconv(t, "re_module"), lambda t: deconv(t, "im_module"), hr, hi
        )
        hr = _bn_eval(hr, p, f"{pre}.norm.re_module", batch_stats)
        hi = _bn_eval(hi, p, f"{pre}.norm.im_module", batch_stats)
        hr = _prelu(hr, p[f"{pre}.activation.re_module.weight"])
        hi = _prelu(hi, p[f"{pre}.activation.im_module.weight"])
        if taps is not None:
            taps.setdefault("decoder", []).append((hr, hi))
        skip = order[idx - 1]
        hr = torch.cat([hr, skip[0]], dim=1)
        hi = torch.cat([hi, skip[1]], dim=1)

    # output layer: ConvTranspose2d(8 -> 1, bias) + BoundComplexMask(tanh)
    out = lambda t, which: F.conv_transpose2d(
        t,
        p[f"masker.output_layer.0.{which}.weight"],
        p[f"masker.output_layer.0.{which}.bias"],
        stride=(2, 1),
        padding=(2, 0),
        output_padding=(1, 0),
    )
    mr, mi = _cmul(lambda t: out(t, "re_module"), lambda t: out(t, "im_module"), hr, hi)
    mag = torch.sqrt(mr**2 + mi**2)
    scale = torch.tanh(mag) / mag.clamp(min=1e-38)
    mr, mi = mr * scale, mi * scale
    mr, mi = mr.squeeze(1), mi.squeeze(1)
    pad = (0, 0, 0, 1) if drop == "last" else (0, 0, 1, 0)
    mr = F.pad(mr, pad)
    mi = F.pad(mi, pad)
    return mr, mi


def dccrnet_forward(wav, sd, drop="last", taps=None, batch_stats=False):
    """Full DCCRNet forward: wav [B, L] -> enhanced [B, L] (float32)."""
    p = sd
    filters = p["encoder.filterbank._filters"]
    window = p["encoder.filterbank.torch_window"]
    L = wav.shape[-1]
    xr, xi = stft_analysis(wav, filters)
    mr, mi = masker_forward(xr, xi, p, drop=drop, taps=taps, batch_stats=batch_stats)
    er = mr * xr - mi * xi
    ei = mr * xi + mi * xr
    return stft_synthesis(er, ei, p["decoder.filterbank._filters"], window, length=L)


def read_wav(path):
    """Minimal PCM16 mono WAV reader (numpy only)."""
    import wave

    with wave.open(path, "rb") as f:
        n = f.getnframes()
        data = np.frombuffer(f.readframes(n), dtype="<i2").astype(np.float32)
        data /= 32768.0
    return data


if __name__ == "__main__":
    import sys

    sd = load_reference_state_dict()["state_dict"]
    ex = sys.argv[1] if len(sys.argv) > 1 else "ex_1038"
    mix = read_wav(f"/root/reference/example_CLSKD/{ex}/mixture.wav")
    gold = read_wav(f"/root/reference/example_CLSKD/{ex}/s0_estimate.wav")
    wav = torch.from_numpy(mix).unsqueeze(0)
    for drop in ("last", "first"):
        with torch.no_grad():
            est = dccrnet_forward(wav, sd, drop=drop, batch_stats=True)[0].numpy()
        # normalize both to unit peak (asteroid normalize_estimates rescales)
        a = est / np.max(np.abs(est))
        b = gold / np.max(np.abs(gold))
        n = min(len(a), len(b))
        corr = np.corrcoef(a[:n], b[:n])[0, 1]
        print(f"drop={drop}: corr={corr:.6f} maxdiff={np.max(np.abs(a[:n]-b[:n])):.5f}")
