"""Golden tests: complex conv / transpose conv / LSTM / batchnorm vs torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from speech_enhancement_clskd_tpu.ops.complex_layers import (
    BatchNorm,
    ComplexConv2d,
    ComplexConvTranspose2d,
    CPReLU,
    PReLU,
    complex_cat,
    split_complex,
)
from speech_enhancement_clskd_tpu.ops.complex_lstm import LSTM, NaiveComplexLSTM
from speech_enhancement_clskd_tpu.ops.complex_bn import ComplexBatchNorm


def to_nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_complex_conv2d_matches_torch(rng):
    B, Cin, Cout, D, T = 2, 4, 8, 16, 10
    x = rng.standard_normal((B, D, T, 2 * Cin)).astype(np.float32)
    mod = ComplexConv2d(features=2 * Cout, kernel_size=(5, 2), strides=(2, 1),
                        padding=(2, 1), causal=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))

    # torch reference: two real convs cross-combined, causal left time pad
    wr = np.transpose(np.asarray(params["params"]["wr"]), (3, 2, 0, 1))
    wi = np.transpose(np.asarray(params["params"]["wi"]), (3, 2, 0, 1))
    xt = torch.from_numpy(to_nchw(x))
    xr, xi = torch.chunk(xt, 2, 1)
    xr = F.pad(xr, [1, 0, 0, 0])
    xi = F.pad(xi, [1, 0, 0, 0])
    twr, twi = torch.from_numpy(wr), torch.from_numpy(wi)
    rr = F.conv2d(xr, twr, stride=(2, 1), padding=(2, 0))
    ii = F.conv2d(xi, twi, stride=(2, 1), padding=(2, 0))
    ri = F.conv2d(xr, twi, stride=(2, 1), padding=(2, 0))
    ir = F.conv2d(xi, twr, stride=(2, 1), padding=(2, 0))
    ref = torch.cat([rr - ii, ri + ir], 1).numpy()
    np.testing.assert_allclose(y, to_nhwc(ref), atol=1e-5, rtol=1e-4)


def test_complex_conv_transpose2d_matches_torch(rng):
    B, Cin, Cout, D, T = 2, 8, 4, 8, 10
    x = rng.standard_normal((B, D, T, 2 * Cin)).astype(np.float32)
    mod = ComplexConvTranspose2d(features=2 * Cout, kernel_size=(5, 2),
                                 strides=(2, 1), padding=(2, 0),
                                 output_padding=(1, 0))
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))

    # torch ConvTranspose2d weight layout: [Cin, Cout, kh, kw]
    wr = np.transpose(np.asarray(params["params"]["wr"]), (2, 3, 0, 1))
    wi = np.transpose(np.asarray(params["params"]["wi"]), (2, 3, 0, 1))
    xt = torch.from_numpy(to_nchw(x))
    xr, xi = torch.chunk(xt, 2, 1)
    twr, twi = torch.from_numpy(wr), torch.from_numpy(wi)
    kw = dict(stride=(2, 1), padding=(2, 0), output_padding=(1, 0))
    rr = F.conv_transpose2d(xr, twr, **kw)
    ii = F.conv_transpose2d(xi, twi, **kw)
    ri = F.conv_transpose2d(xr, twi, **kw)
    ir = F.conv_transpose2d(xi, twr, **kw)
    ref = torch.cat([rr - ii, ri + ir], 1).numpy()
    assert y.shape == to_nhwc(ref).shape  # (B, 2D, T+1, 2Cout)
    np.testing.assert_allclose(y, to_nhwc(ref), atol=1e-5, rtol=1e-4)


def test_lstm_matches_torch(rng):
    T, B, F_, H = 12, 3, 6, 5
    x = rng.standard_normal((T, B, F_)).astype(np.float32)
    mod = LSTM(hidden=H)
    params = mod.init(jax.random.PRNGKey(2), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))

    ref_lstm = torch.nn.LSTM(F_, H, num_layers=1, batch_first=False)
    sd = {
        "weight_ih_l0": torch.from_numpy(np.asarray(params["params"]["w_ih"]).T),
        "weight_hh_l0": torch.from_numpy(np.asarray(params["params"]["w_hh"]).T),
        "bias_ih_l0": torch.from_numpy(np.asarray(params["params"]["b_ih"])),
        "bias_hh_l0": torch.from_numpy(np.asarray(params["params"]["b_hh"])),
    }
    ref_lstm.load_state_dict(sd)
    with torch.no_grad():
        ref, _ = ref_lstm(torch.from_numpy(x))
    np.testing.assert_allclose(y, ref.numpy(), atol=1e-5, rtol=1e-4)


def test_naive_complex_lstm_cross_terms(rng):
    T, B, F_, H = 8, 2, 6, 8
    xr = rng.standard_normal((T, B, F_)).astype(np.float32)
    xi = rng.standard_normal((T, B, F_)).astype(np.float32)
    mod = NaiveComplexLSTM(hidden_size=2 * H, projection_dim=None)
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(xr), jnp.asarray(xi))
    yr, yi = mod.apply(params, jnp.asarray(xr), jnp.asarray(xi))

    # independently compute the 4 cross terms with the single-LSTM module
    lstm_r = LSTM(hidden=H)
    lstm_i = LSTM(hidden=H)
    pr = {"params": params["params"]["real_lstm"]}
    pi = {"params": params["params"]["imag_lstm"]}
    r2r = lstm_r.apply(pr, jnp.asarray(xr))
    i2r = lstm_r.apply(pr, jnp.asarray(xi))
    r2i = lstm_i.apply(pi, jnp.asarray(xr))
    i2i = lstm_i.apply(pi, jnp.asarray(xi))
    np.testing.assert_allclose(np.asarray(yr), np.asarray(r2r - i2i), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(r2i + i2r), atol=1e-5)


def test_batchnorm_matches_torch(rng):
    B, C, D, T = 4, 6, 8, 10
    x = rng.standard_normal((B, D, T, C)).astype(np.float32)
    mod = BatchNorm()
    vars_ = mod.init(jax.random.PRNGKey(4), jnp.asarray(x), training=True)
    y, new_state = mod.apply(
        vars_, jnp.asarray(x), training=True, mutable=["batch_stats"]
    )

    tb = torch.nn.BatchNorm2d(C)
    tb.train()
    ref = tb(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), to_nhwc(ref), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["mean"]),
        tb.running_mean.numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["batch_stats"]["var"]),
        tb.running_var.numpy(), atol=1e-4, rtol=1e-4,
    )
    # eval mode uses running stats
    y_eval = mod.apply(
        {"params": vars_["params"], "batch_stats": new_state["batch_stats"]},
        jnp.asarray(x), training=False,
    )
    tb.eval()
    ref_eval = tb(torch.from_numpy(to_nchw(x))).detach().numpy()
    np.testing.assert_allclose(
        np.asarray(y_eval), to_nhwc(ref_eval), atol=1e-4, rtol=1e-3
    )


def test_complex_batchnorm_whitens(rng):
    # with affine=False the per-channel 2x2 covariance of (re, im) must be ~I
    B, C, D, T = 8, 3, 16, 20
    z = rng.standard_normal((B, D, T, 2 * C)).astype(np.float32)
    # correlate re/im to make the test non-trivial
    z[..., C:] = 0.7 * z[..., :C] + 0.3 * z[..., C:] + 1.5
    mod = ComplexBatchNorm(affine=False, track_running_stats=False)
    vars_ = mod.init(jax.random.PRNGKey(5), jnp.asarray(z), training=True)
    y = np.asarray(mod.apply(vars_, jnp.asarray(z), training=True))
    yr, yi = y[..., :C], y[..., C:]
    for c in range(C):
        r, i = yr[..., c].ravel(), yi[..., c].ravel()
        assert abs(r.mean()) < 1e-4 and abs(i.mean()) < 1e-4
        np.testing.assert_allclose(np.mean(r * r), 1.0, atol=1e-2)
        np.testing.assert_allclose(np.mean(i * i), 1.0, atol=1e-2)
        np.testing.assert_allclose(np.mean(r * i), 0.0, atol=1e-2)


def test_complex_cat_and_split(rng):
    a = rng.standard_normal((2, 3, 4, 6)).astype(np.float32)
    b = rng.standard_normal((2, 3, 4, 8)).astype(np.float32)
    out = np.asarray(complex_cat([jnp.asarray(a), jnp.asarray(b)]))
    # real parts of a then b first, then imag parts
    np.testing.assert_array_equal(out[..., :3], a[..., :3])
    np.testing.assert_array_equal(out[..., 3:7], b[..., :4])
    np.testing.assert_array_equal(out[..., 7:10], a[..., 3:])
    np.testing.assert_array_equal(out[..., 10:], b[..., 4:])
    re, im = split_complex(jnp.asarray(a))
    np.testing.assert_array_equal(np.asarray(re), a[..., :3])
    np.testing.assert_array_equal(np.asarray(im), a[..., 3:])


def test_prelu_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 4)).astype(np.float32)
    mod = PReLU()
    params = mod.init(jax.random.PRNGKey(6), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    ref = torch.nn.PReLU()(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(y, ref, atol=1e-6)


def test_cprelu_parts(rng):
    x = rng.standard_normal((2, 5, 7, 4)).astype(np.float32)
    mod = CPReLU()
    params = mod.init(jax.random.PRNGKey(7), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    expected = np.where(x >= 0, x, 0.25 * x)
    np.testing.assert_allclose(y, expected, atol=1e-6)


def test_conv3x3_ninedot_matches_xla():
    """The 9-dot all-dot_general conv form equals the XLA conv op."""
    import numpy as np
    import jax.numpy as jnp

    from speech_enhancement_clskd_tpu.ops.pallas.conv3x3 import (
        _conv3x3_ninedot, _conv3x3_xla,
    )

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 8, 11, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_conv3x3_ninedot(x, w)),
        np.asarray(_conv3x3_xla(x, w)),
        rtol=1e-5, atol=1e-5,
    )
    # gradients agree too (the experiment must be drop-in for training)
    import jax

    g1 = jax.grad(lambda x: _conv3x3_ninedot(x, w).sum())(x)
    g2 = jax.grad(lambda x: _conv3x3_xla(x, w).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
