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


def test_abf_fold_matches_explicit_bn_then_fuse():
    """The round-4 byte restructure (bn1 affine folded into the attention
    contraction + blend, residual logit contracted pre-upscale) must be
    numerically the same function as the straight-line reference math:
    conv1 -> bn1-normalize -> resize -> sigmoid-attention -> conv2 -> bn2."""
    import jax
    import jax.numpy as jnp

    from speech_enhancement_clskd_tpu.distill.abf import ABF, _resize_freq
    from speech_enhancement_clskd_tpu.ops.pallas.conv3x3 import _conv3x3_xla

    rng = np.random.default_rng(7)
    b, d, dp, t, cin, mid, cout = 2, 8, 4, 21, 6, 8, 10
    x = jnp.asarray(rng.standard_normal((b, d, t, cin)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((b, dp, t, mid)), jnp.float32)

    blk = ABF(mid_channels=mid, out_channels=cout, fuse=True)
    variables = blk.init(jax.random.PRNGKey(0), x, res, True)
    (out, xf), _ = blk.apply(variables, x, res, True, mutable=["batch_stats"])

    p = variables["params"]

    def bn_batch(v, name, eps=1e-5):
        def f(u):
            m = u.mean(axis=(0, 1, 2))
            var = u.var(axis=(0, 1, 2))  # biased, as normalization uses
            return (u - m) / np.sqrt(var + eps) * np.asarray(
                p[name]["scale"]
            ) + np.asarray(p[name]["bias"])
        return f(v)

    x1 = np.einsum("bdtc,co->bdto", np.asarray(x), np.asarray(p["conv1"]["kernel"])[0, 0])
    xhat = bn_batch(x1, "bn1")
    kk = np.asarray(p["att_conv"]["kernel"])[0, 0]
    bb = np.asarray(p["att_conv"]["bias"])
    y = np.asarray(_resize_freq(res, d, t))
    z = 1.0 / (1.0 + np.exp(-(
        np.einsum("bdtc,co->bdto", xhat, kk[:mid])
        + np.einsum("bdtc,co->bdto", y, kk[mid:]) + bb
    )))
    xf_ref = xhat * z[..., 0:1] + y * z[..., 1:2]
    out_ref = np.asarray(
        _conv3x3_xla(jnp.asarray(xf_ref, jnp.float32),
                     jnp.asarray(p["conv2"]["kernel"], jnp.float32))
    )
    out_ref = bn_batch(out_ref, "bn2")

    np.testing.assert_allclose(np.asarray(xf), xf_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=2e-4, atol=2e-4)
