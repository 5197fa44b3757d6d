"""ABF resize semantics: torch F.interpolate(mode='nearest') exactness.

The reference resizes the propagated ReviewKD residual with
F.interpolate(y, (shape, w), mode='nearest') (framework.py:212-215), whose
semantics are out[i] = in[floor(i * n_in / n_out)].  `_nearest_axis` has
three fast paths (identity, integer-upscale repeat, crop-by-one); this test
pins every path — and every fall-through — to the exact formula.
"""

import numpy as np
import pytest

from speech_enhancement_clskd_tpu.distill.abf import _nearest_axis


def _torch_nearest_indices(n_in: int, n_out: int) -> np.ndarray:
    return (np.arange(n_out) * n_in) // n_out


@pytest.mark.parametrize("n_in", range(1, 24))
@pytest.mark.parametrize("n_out", range(1, 24))
def test_nearest_axis_matches_torch_formula(n_in, n_out):
    x = np.arange(n_in, dtype=np.float32)[None, :, None]  # [1, n_in, 1]
    got = np.asarray(_nearest_axis(x, 1, n_out))[0, :, 0]
    want = x[0, _torch_nearest_indices(n_in, n_out), 0]
    np.testing.assert_array_equal(got, want)


def test_nearest_axis_downscale_6_to_4_is_not_a_crop():
    # The advisor's counterexample: torch picks [0,1,3,4], a crop would
    # wrongly pick [0,1,2,3].
    x = np.arange(6, dtype=np.float32)[None, :, None]
    got = np.asarray(_nearest_axis(x, 1, 4))[0, :, 0]
    np.testing.assert_array_equal(got, [0.0, 1.0, 3.0, 4.0])
