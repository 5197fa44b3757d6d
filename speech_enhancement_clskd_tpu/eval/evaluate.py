"""Offline evaluation harness (behavioural equivalent of reference eval.py).

Loads a serialized student, runs full-length utterances, PIT-reorders the
estimates against the reference sources (eval.py:25-27,67 —
``PITLossWrapper(pairwise_neg_sisdr)``; identity for n_src=1), computes
per-utterance metrics (si_sdr/sdr/sir/sar/stoi[/pesq]) plus their input_*
baselines, persists one metric row per utterance (eval.py:85-88 pandas rows;
here a JSONL file), writes the summary JSON (means + *_imp improvement
deltas — eval.py:108-119) and saves n random example wav triptychs
mixture/s{i}/s{i}_estimate (eval.py:89-101).

TPU design notes:
- variable-length utterances are bucketed to the next multiple of
  ``bucket_s`` seconds and zero-padded, so XLA compiles one program per bucket
  instead of one per length (the reference instead disabled cuDNN for long
  sequences, eval.py:13);
- STOI runs batched on device; bss_eval's Toeplitz solve runs on host.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DCCRNConfig
from ..data.wav import write_wav
from ..losses.pit import pit_reorder
from ..metrics.bss import eval_metrics_sources
from ..models.dccrn import make_model
from ..utils.serialization import load_bundle

COMPUTE_METRICS = ["si_sdr", "sdr", "sir", "sar", "stoi", "pesq"]


def _bucket_len(T: int, sr: int, bucket_s: float) -> int:
    b = int(bucket_s * sr)
    return -(-T // b) * b


def evaluate_model(
    cfg: DCCRNConfig,
    variables: dict,
    dataset,
    sample_rate: int = 16000,
    n_save_ex: int = 5,
    ex_save_dir: Optional[str] = None,
    results_path: Optional[str] = None,
    bucket_s: float = 1.0,
    compute_pesq: bool = True,
    seed: int = 0,
    log_fn=print,
    bn_batch_stats: Optional[bool] = None,
    per_utt_path: Optional[str] = None,
) -> Dict[str, float]:
    """``bn_batch_stats=True`` reproduces the reference eval quirk (its
    eval.py never calls model.eval(), so BN normalizes with per-utterance
    batch statistics — see ops.complex_layers.BatchNorm).

    ``per_utt_path``: write one JSON metric row per utterance (the
    reference's pandas per-utterance frame, eval.py:85-88)."""
    model = make_model(cfg)

    fwd_cache: Dict[int, any] = {}

    def forward(mix_np: np.ndarray) -> np.ndarray:
        """Model estimates as [n_est, T] (single-output models give n_est=1)."""
        T = len(mix_np)
        L = _bucket_len(T, sample_rate, bucket_s)
        if L not in fwd_cache:
            fwd_cache[L] = jax.jit(
                lambda v, w: model.apply(
                    v, w, training=False, bn_batch_stats=bn_batch_stats
                ).wav
            )
        pad = np.zeros(L, np.float32)
        pad[:T] = mix_np
        out = np.asarray(fwd_cache[L](variables, jnp.asarray(pad[None])))[0]
        out = out[..., :T]
        return out if out.ndim == 2 else out[None]

    save_idx = (
        set(random.Random(seed).sample(range(len(dataset)), min(n_save_ex, len(dataset))))
        if ex_save_dir
        else set()
    )

    per_utt_f = None
    if per_utt_path:
        os.makedirs(os.path.dirname(os.path.abspath(per_utt_path)), exist_ok=True)
        per_utt_f = open(per_utt_path, "w")

    rows: List[Dict[str, float]] = []
    for idx in range(len(dataset)):
        item = dataset[idx]
        mix, sources = np.asarray(item[0]), np.asarray(item[1])
        utt_id = item[2] if len(item) > 2 else str(idx)
        ests = forward(mix)
        if ests.shape[0] == sources.shape[0] and sources.shape[0] > 1:
            # PIT reorder before metrics (reference eval.py:67)
            reordered, _ = pit_reorder(jnp.asarray(ests), jnp.asarray(sources))
            ests = np.asarray(reordered)
        elif sources.shape[0] > 1:
            # single-output model on a multi-source task: score vs source 0
            sources = sources[:1]
        m = eval_metrics_sources(mix, sources, ests, sample_rate,
                                 compute_pesq=compute_pesq)
        rows.append(m)
        if per_utt_f is not None:
            per_utt_f.write(json.dumps({"utt_id": str(utt_id), **m}) + "\n")
        if idx in save_idx:
            d = os.path.join(ex_save_dir, f"ex_{idx}")
            os.makedirs(d, exist_ok=True)
            write_wav(os.path.join(d, "mixture.wav"), mix, sample_rate)
            for j in range(sources.shape[0]):
                write_wav(os.path.join(d, f"s{j}.wav"), sources[j], sample_rate)
                # normalize estimate to the mixture's scale (asteroid
                # normalize_estimates behaviour, eval.py:75)
                est_j = ests[min(j, ests.shape[0] - 1)]
                scale = np.max(np.abs(mix)) / (np.max(np.abs(est_j)) + 1e-8)
                write_wav(os.path.join(d, f"s{j}_estimate.wav"),
                          est_j * scale, sample_rate)
        if (idx + 1) % 50 == 0:
            log_fn(f"eval {idx + 1}/{len(dataset)}")
    if per_utt_f is not None:
        per_utt_f.close()

    final: Dict[str, float] = {}
    for name in COMPUTE_METRICS:
        vals = [r[name] for r in rows if name in r and np.isfinite(r[name])]
        ivals = [
            r["input_" + name]
            for r in rows
            if "input_" + name in r and np.isfinite(r["input_" + name])
        ]
        if not vals:
            continue
        final[name] = float(np.mean(vals))
        if ivals:
            final[name + "_imp"] = float(np.mean(vals) - np.mean(ivals))
    if results_path:
        os.makedirs(os.path.dirname(os.path.abspath(results_path)), exist_ok=True)
        with open(results_path, "w") as f:
            json.dump(final, f, indent=2)
    return final


def evaluate_bundle(bundle_path: str, dataset, **kw) -> Dict[str, float]:
    """Evaluate either a native ``.npz`` bundle or an asteroid publishable
    torch ``.pth`` (reference distill.py:280-294 output — loaded with the
    pure-Python reader, no torch needed)."""
    if bundle_path.endswith((".pth", ".pt", ".ckpt")):
        from ..models.dccrnet import load_reference_bundle

        model, variables = load_reference_bundle(bundle_path)
        return evaluate_model(model.cfg, variables, dataset, **kw)
    cfg, variables, _ = load_bundle(bundle_path)
    return evaluate_model(cfg, variables, dataset, **kw)
