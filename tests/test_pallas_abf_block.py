"""Whole-ABF-block Pallas kernel vs the straight-line XLA composition.

Interpret mode runs the real kernel logic on CPU (SURVEY.md section 4 test
strategy).  Forward AND the full hand-derived block VJP are pinned against
jax.grad of the reference composition, for both the fused and the
no-fusion (deepest block) variants, on deliberately awkward geometry
(T not sublane-aligned, k=2 upscale, multiple freq tiles).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_clskd_tpu.ops.pallas.abf_block import (
    _pick_td,
    abf_block,
    abf_block_dispatchable,
)
from speech_enhancement_clskd_tpu.ops.pallas.conv3x3 import _conv3x3_xla


def _ref_block(tap, res, w1a, bvec, wxt, wy, zoff, w2):
    xhat = jnp.einsum("bdtc,cm->bdtm", tap, w1a) + bvec
    if res is None:
        xf = xhat
    else:
        k = tap.shape[1] // res.shape[1]
        y = jnp.repeat(res, k, axis=1)
        z = jax.nn.sigmoid(
            jnp.einsum("bdtc,co->bdto", tap, wxt)
            + jnp.einsum("bdtm,mo->bdto", y, wy)
            + zoff
        )
        xf = xhat * z[..., 0:1] + y * z[..., 1:2]
    return xf, _conv3x3_xla(xf, w2)


def _inputs(fuse, b=2, d=8, k=2, t=21, cs=6, m=8, o=10, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    tap = f(b, d, t, cs)
    res = f(b, d // k, t, m) if fuse else None
    return dict(
        tap=tap, res=res, w1a=f(cs, m) * 0.4, bvec=f(m) * 0.2,
        wxt=f(cs, 2) * 0.3, wy=f(m, 2) * 0.3, zoff=f(2) * 0.1,
        w2=f(3, 3, m, o) * 0.2,
    )


@pytest.mark.parametrize("fuse", [True, False])
def test_forward_matches_reference(fuse):
    kw = _inputs(fuse)
    xf, out = abf_block(**kw, interpret=True)
    xf_r, out_r = _ref_block(**kw)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xf_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("fuse", [True, False])
def test_block_vjp_matches_autodiff(fuse):
    kw = _inputs(fuse)
    rng = np.random.default_rng(1)
    gf = jnp.asarray(rng.standard_normal(kw["tap"].shape[:3] + (8,)),
                     jnp.float32)
    go = jnp.asarray(rng.standard_normal(kw["tap"].shape[:3] + (10,)),
                     jnp.float32)
    names = [k for k, v in kw.items() if v is not None]

    def loss(fn):
        def g(*args):
            d = dict(zip(names, args))
            d.setdefault("res", None)
            xf, out = fn(**d)
            return jnp.sum(xf * gf) + jnp.sum(out * go)
        return g

    args = tuple(kw[k] for k in names)
    argnums = tuple(range(len(names)))
    got = jax.grad(loss(lambda **d: abf_block(**d, interpret=True)),
                   argnums)(*args)
    want = jax.grad(loss(_ref_block), argnums)(*args)
    for name, gv, wv in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_single_tile_edge_masks():
    """d == td (one freq tile): both halo views clamp AND mask to zero —
    the conv must see zero padding, not the clamped edge rows."""
    kw = _inputs(True, d=4, k=2, t=9, cs=4, m=6, o=6)
    xf, out = abf_block(**kw, interpret=True)
    xf_r, out_r = _ref_block(**kw)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xf_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)


def test_reference_geometries_dispatchable():
    """Every ABF block of the reference teacher/student pair must have a
    viable tile, with td a multiple of the k=2 upscale."""
    t = 483
    enc_d = [128, 64, 32, 16, 8, 4]
    enc_o = [32, 64, 128, 256, 256, 256]
    cs = [16, 32, 64, 128, 128, 128]  # student packed channels (2*c)
    for d, o, c in zip(enc_d, enc_o, cs):
        k = 2 if d != 4 else 1
        td = _pick_td(d, k, t, min(c, 64), 64, o)
        assert td > 0 and td % k == 0, (d, o, td)
        assert abf_block_dispatchable(
            (32, d, t, min(c, 64)), (32, d // k, t, 64) if k > 1 else None,
            64, o,
        )
