"""Pallas TPU kernel: the whole ABF block fused — conv1-fold + bn1-affine +
resize + sigmoid-attention blend + 3x3 conv — one kernel, one block VJP.

This is the round-4 byte-reduction plan of docs/PERF.md ("What would actually
beat 1.42x"), matching reference ``framework.py:176-224`` semantics.  The
round-3 per-op kernels (``conv3x3.py``, ``attfuse.py``) each LOST in-context
because a custom-call boundary broke XLA's surrounding fusions; this kernel
subsumes the entire producer/consumer chain between the block's natural
materialization points, so the only HBM traffic left is the irreducible set:

  forward:   read tap + small residual, write xf (the propagated residual)
             and the raw conv2 output — the mid-channel map x1, the upscaled
             residual, the attention logits and the im2col patches all live
             and die in VMEM;
  backward:  read tap/res/g_xf/g_out once each, recompute x1/z/xf in VMEM
             (flash-attention style), write g_tap/g_res, accumulate every
             parameter gradient in VMEM across the sequential grid.

Math (per block; fold precomputed OUTSIDE in XLA from the bn1 affine (a, b)):

  w1a  = W1 * a            [Cs, M]   bn1-scaled 1x1 conv
  x̂    = tap @ w1a + b     (= bn1-normalized conv1 output, never in HBM)
  wxt  = w1a @ wx          [Cs, 2]   so  zx = x̂ @ wx = tap @ wxt + b @ wx
  zoff = b @ wx + att_bias
  y    = nearest_upscale_k(res)      (expanded in VMEM only)
  z    = sigmoid(tap @ wxt + y @ wy + zoff)
  xf   = x̂ * z0 + y * z1             -> written (next block's residual)
  out  = conv3x3_same(xf, W2)        -> written raw (bn2 stays in XLA)

The blend is ROW-LOCAL in freq (xf row g depends only on tap row g and res
row g//k); only the 3x3 conv mixes rows.  Each program owns ``td`` freq rows
and recomputes a 1-row halo of xf from the tap/res halo views (clamped index
maps as in ``conv3x3.py``), so the conv consumes xf entirely from VMEM and
the backward needs NO cross-program gradient exchange: the conv adjoint for
owned xf rows is complete given a g_out halo, and everything upstream of xf
is row-local.

Grid ``(B, D // td)`` — sequential on a TPU core, which is what makes the
single f32 parameter-gradient accumulators correct.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_TMP_BUDGET_BYTES = 12 * 1024 * 1024
_VMEM_LIMIT_BYTES = 96 * 1024 * 1024  # v5e: 128 MiB physical


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def abf_block_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _pad_len(t: int) -> int:
    """T padded to sublane alignment with >= 1 trailing zero column (doubles
    as the conv right-edge zero, exactly as in conv3x3.py)."""
    return ((t + 1 + 15) // 16) * 16


def _pick_td(d: int, k: int, t: int, cs: int, m: int, o: int) -> int:
    """Freq rows per program: must divide D, be a multiple of the upscale
    factor k, and keep the larger of the fwd/bwd VMEM working sets within
    budget.  0 = no tile fits (callers gate dispatch)."""
    tp = _pad_len(t)
    for td in (64, 32, 16, 8, 4, 2, 1):
        if d % td or td % k:
            continue
        rows_h = (td + 2) * tp
        fwd = rows_h * (
            cs * 2        # tap halo rows
            + m * 2       # xhat (bf16 after the f32-accum dot)
            + m * 2       # y rows
            + 3 * m * 2   # xf patches
        ) + td * tp * o * 4  # conv acc f32
        bwd = rows_h * (
            m * 2         # xf halo (read back from HBM, not recomputed)
            + 3 * m * 2   # xf patches for dw2
            + o * 2       # g_out halo
            + 3 * o * 2   # g_out patches
        ) + td * tp * (
            cs * 2        # tap own rows
            + m * 2       # y own rows
            + m * 4       # dxf f32
            + m * 4       # g_xhat f32
        )
        if max(fwd, bwd) <= _TMP_BUDGET_BYTES:
            return td
    return 0


def abf_block_dispatchable(tap_shape, res_shape, mid: int, out_ch: int) -> bool:
    """Geometry gate: ABF shapes (equal T, integer freq upscale, residual in
    mid channels) with a viable tile."""
    b, d, t, cs = tap_shape
    if res_shape is None:
        k = 1
    else:
        rb, dp, rt, rc = res_shape
        if not (rb == b and rt == t and rc == mid and dp and d % dp == 0):
            return False
        k = d // dp
    return _pick_td(d, k, t, cs, mid, out_ch) > 0


def _padt(x: jnp.ndarray, tp: int) -> jnp.ndarray:
    """[rows, T, C] -> [rows, TP, C] zero-padding time (pad cols are the conv
    right-edge zeros and keep row reshapes tile-aligned)."""
    r, t, c = x.shape
    if tp == t:
        return x
    return jnp.concatenate([x, jnp.zeros((r, tp - t, c), x.dtype)], axis=1)


def _patches(x3: jnp.ndarray, tp: int) -> jnp.ndarray:
    """im2col time-patches of [rows, TP, C] -> [rows*TP, 3C] (t-1, t, t+1
    neighbourhoods; pad cols supply the edge zeros), as in conv3x3.py."""
    rows, _, c = x3.shape
    zcol = jnp.zeros((rows, 1, c), x3.dtype)
    tm1 = jnp.concatenate([zcol, x3[:, : tp - 1]], axis=1)
    tp1 = jnp.concatenate([x3[:, 1:], zcol], axis=1)
    return jnp.concatenate([tm1, x3, tp1], axis=-1).reshape(rows * tp, 3 * c)


def _halo3(p_ref, c_ref, n_ref, i, nd):
    """Assemble [td+2, T, C] halo rows with zeroed edges from the 3 views."""
    top = jnp.where(i == 0, jnp.zeros_like(p_ref[0]), p_ref[0])
    bot = jnp.where(i == nd - 1, jnp.zeros_like(n_ref[0]), n_ref[0])
    return jnp.concatenate([top, c_ref[0], bot], axis=0)


def _recompute_xf(
    tap_p, tap_c, tap_n, res_p, res_c, res_n,
    w1a_ref, bvec_ref, wxt_ref, wy_ref, zoff_ref,
    *, fuse, k, td, tp, i, nd,
):
    """Shared fwd/bwd recomputation.  Returns (tap rows f32 [rh, Cs],
    xhat f32 [rh, M], y rows dt [rh, M] | None, z f32 [rh, 2] | None,
    xf3 dt [td+2, TP, M] with edge halo rows and pad cols zeroed)."""
    tap_h = _padt(_halo3(tap_p, tap_c, tap_n, i, nd), tp)  # [td+2, TP, Cs]
    th, _, cs = tap_h.shape
    rows = tap_h.reshape(th * tp, cs)
    m = w1a_ref.shape[-1]
    dt = tap_h.dtype
    xhat = (
        jnp.dot(rows, w1a_ref[:], preferred_element_type=jnp.float32)
        + bvec_ref[0].astype(jnp.float32)
    ).astype(dt)
    if fuse:
        rtop = jnp.where(i == 0, jnp.zeros_like(res_p[0]), res_p[0])
        rbot = jnp.where(i == nd - 1, jnp.zeros_like(res_n[0]), res_n[0])
        # halo y rows: prev block's LAST res row, own rows k-expanded, next
        # block's FIRST res row ((g//k) of the halo freq rows, since k | td)
        y3 = jnp.concatenate(
            [rtop, jnp.repeat(res_c[0], k, axis=0), rbot], axis=0
        )
        yr = _padt(y3, tp).reshape(th * tp, m)
        zlog = (
            jnp.dot(rows, wxt_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(yr, wy_ref[:], preferred_element_type=jnp.float32)
            + zoff_ref[0].astype(jnp.float32)
        )
        z = jax.nn.sigmoid(zlog)
        xfr = xhat * z[:, 0:1].astype(dt) + yr * z[:, 1:2].astype(dt)
    else:
        yr = z = None
        xfr = xhat
    xf3 = xfr.reshape(th, tp, m)
    # zero the conv padding: edge halo rows (their tap/res were zeroed but
    # x̂ = bvec there) and the time pad columns (Mosaic-friendly forms:
    # whole-row where + slice/concat, no 1-D mask vectors)
    t = tap_c.shape[2]
    top = jnp.where(i == 0, jnp.zeros_like(xf3[0:1]), xf3[0:1])
    bot = jnp.where(i == nd - 1, jnp.zeros_like(xf3[th - 1:]), xf3[th - 1:])
    xf3 = jnp.concatenate([top, xf3[1 : th - 1], bot], axis=0)
    xf3 = jnp.concatenate(
        [xf3[:, :t], jnp.zeros((th, tp - t, m), dt)], axis=1
    )
    return rows, xhat, yr, z, xf3


def _fwd_kernel(
    tap_p, tap_c, tap_n, res_p, res_c, res_n,
    w1a_ref, bvec_ref, wxt_ref, wy_ref, zoff_ref, w2_ref,
    xf_ref, out_ref, *, fuse, k, td, tp,
):
    i = pl.program_id(1)
    nd = pl.num_programs(1)
    t = tap_c.shape[2]
    o = w2_ref.shape[-1]
    m = w1a_ref.shape[-1]
    _, _, _, xf3 = _recompute_xf(
        tap_p, tap_c, tap_n, res_p, res_c, res_n,
        w1a_ref, bvec_ref, wxt_ref, wy_ref, zoff_ref,
        fuse=fuse, k=k, td=td, tp=tp, i=i, nd=nd,
    )[1:]
    p = _patches(xf3, tp)  # [(td+2)*TP, 3M]
    acc = jnp.zeros((td * tp, o), jnp.float32)
    for dd in range(3):
        y = jnp.dot(p, w2_ref[dd], preferred_element_type=jnp.float32)
        acc += y[dd * tp : dd * tp + td * tp]
    out_ref[0] = acc.reshape(td, tp, o)[:, :t].astype(out_ref.dtype)
    xf_ref[0] = xf3[1 : td + 1, :t]


def _bwd_kernel(
    tap_c, res_c, xf_p, xf_c, xf_n,
    w1a_ref, bvec_ref, wxt_ref, wy_ref, zoff_ref,
    gxf_ref, go_p, go_c, go_n, w2f_ref,
    gtap_ref, gres_ref,
    dw1a_ref, dbvec_ref, dwxt_ref, dwy_ref, dzoff_ref, dw2_ref,
    *, fuse, k, td, tp,
):
    """Blend is row-local, so everything except the conv adjoint needs only
    the OWNED rows; xf (a forward output) is read back from HBM with a 1-row
    halo instead of being recomputed from halo'd tap/res — cheaper in both
    VMEM (bigger td) and vector work."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nd = pl.num_programs(1)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw1a_ref[:] = jnp.zeros_like(dw1a_ref)
        dbvec_ref[:] = jnp.zeros_like(dbvec_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        if fuse:
            dwxt_ref[:] = jnp.zeros_like(dwxt_ref)
            dwy_ref[:] = jnp.zeros_like(dwy_ref)
            dzoff_ref[:] = jnp.zeros_like(dzoff_ref)

    t = tap_c.shape[2]
    m = w1a_ref.shape[-1]
    cs = tap_c.shape[-1]
    o = go_c.shape[-1]
    dt = tap_c.dtype

    # conv adjoint for the OWNED xf rows: SAME-conv of the g_out halo with
    # the flipped/transposed kernel (complete — includes neighbours' rows)
    g3 = _padt(_halo3(go_p, go_c, go_n, i, nd), tp)  # [td+2, TP, O]
    gp = _patches(g3, tp)  # [(td+2)*TP, 3O]
    dxf = jnp.zeros((td * tp, m), jnp.float32)
    for dd in range(3):
        y_ = jnp.dot(gp, w2f_ref[dd], preferred_element_type=jnp.float32)
        dxf += y_[dd * tp : dd * tp + td * tp]
    gxf = _padt(gxf_ref[0], tp).reshape(td * tp, m)
    dxf += gxf.astype(jnp.float32)
    # zero the phantom conv-adjoint values on the time-pad columns: those
    # positions don't exist, but x̂ = bvec there (tap rows are zero-padded),
    # so they would pollute the bvec/zoff accumulators below
    dxf3 = dxf.reshape(td, tp, m)
    dxf = jnp.concatenate(
        [dxf3[:, :t], jnp.zeros((td, tp - t, m), jnp.float32)], axis=1
    ).reshape(td * tp, m)

    # weight gradient of conv2 over the owned output rows, from the
    # materialized xf (halo views; edge rows zeroed = the conv's zero pad)
    xf3 = _padt(_halo3(xf_p, xf_c, xf_n, i, nd), tp)
    p = _patches(xf3, tp)
    go_rows = _padt(go_c[0], tp).reshape(td * tp, o)
    dim0 = (((0,), (0,)), ((), ()))
    for dd in range(3):
        dw2_ref[dd] += jax.lax.dot_general(
            p[dd * tp : dd * tp + td * tp], go_rows,
            dimension_numbers=dim0, preferred_element_type=jnp.float32,
        )

    # blend backward — row-local, owned rows only, x̂/z recomputed in-tile
    tap_o = _padt(tap_c[0], tp).reshape(td * tp, cs)
    xhat_o = (
        jnp.dot(tap_o, w1a_ref[:], preferred_element_type=jnp.float32)
        + bvec_ref[0].astype(jnp.float32)
    )
    if fuse:
        y_o = _padt(jnp.repeat(res_c[0], k, axis=0), tp).reshape(td * tp, m)
        y_f = y_o.astype(jnp.float32)
        zlog = (
            jnp.dot(tap_o, wxt_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(y_o, wy_ref[:], preferred_element_type=jnp.float32)
            + zoff_ref[0].astype(jnp.float32)
        )
        z_o = jax.nn.sigmoid(zlog)
        dz = jnp.concatenate(
            [
                jnp.sum(dxf * xhat_o, axis=-1, keepdims=True),
                jnp.sum(dxf * y_f, axis=-1, keepdims=True),
            ],
            axis=-1,
        )
        dp = z_o * (1.0 - z_o) * dz  # [rows, 2]
        wxt = wxt_ref[:].astype(jnp.float32)
        wy = wy_ref[:].astype(jnp.float32)
        g_xhat = dxf * z_o[:, 0:1]
        # blend + logit paths; dp @ W^T as rank-1 broadcasts (K=2 matmuls
        # waste the MXU)
        g_y = dxf * z_o[:, 1:2] + dp[:, 0:1] * wy[:, 0] + dp[:, 1:2] * wy[:, 1]
        gtap = (
            jnp.dot(
                g_xhat.astype(dt), w1a_ref[:].T,
                preferred_element_type=jnp.float32,
            )
            + dp[:, 0:1] * wxt[:, 0] + dp[:, 1:2] * wxt[:, 1]
        )
        # nearest-upscale adjoint: sum each k-group of rows
        gres = (
            g_y.reshape(td // k, k, tp, m).sum(axis=1)[:, :t]
        )
        gres_ref[0] = gres.astype(gres_ref.dtype)
        dwxt_ref[:] += jax.lax.dot_general(
            tap_o, dp.astype(dt), dimension_numbers=dim0,
            preferred_element_type=jnp.float32,
        )
        dwy_ref[:] += jax.lax.dot_general(
            y_o, dp.astype(dt),
            dimension_numbers=dim0, preferred_element_type=jnp.float32,
        )
        dzoff_ref[:] += jnp.sum(dp, axis=0, keepdims=True)
    else:
        g_xhat = dxf
        gtap = jnp.dot(
            g_xhat.astype(dt), w1a_ref[:].T,
            preferred_element_type=jnp.float32,
        )
    gtap_ref[0] = gtap.reshape(td, tp, cs)[:, :t].astype(gtap_ref.dtype)
    dw1a_ref[:] += jax.lax.dot_general(
        tap_o, g_xhat.astype(dt), dimension_numbers=dim0,
        preferred_element_type=jnp.float32,
    )
    dbvec_ref[:] += jnp.sum(g_xhat, axis=0, keepdims=True)


def _halo_specs(td: int, d: int, t: int, c: int):
    """(prev-row, block, next-row) views of a [B, D, T, C] operand (clamped
    at the edges; the kernel masks them to zero there)."""
    return [
        pl.BlockSpec(
            (1, 1, t, c), lambda b, i: (b, jnp.maximum(i * td - 1, 0), 0, 0)
        ),
        pl.BlockSpec((1, td, t, c), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec(
            (1, 1, t, c),
            lambda b, i: (b, jnp.minimum(i * td + td, d - 1), 0, 0),
        ),
    ]


def _small_specs(cs, m, o):
    """Parameter operand specs shared by fwd/bwd: w1a, bvec, wxt, wy, zoff."""
    return [
        pl.BlockSpec((cs, m), lambda b, i: (0, 0)),
        pl.BlockSpec((1, m), lambda b, i: (0, 0)),
        pl.BlockSpec((cs, 2), lambda b, i: (0, 0)),
        pl.BlockSpec((m, 2), lambda b, i: (0, 0)),
        pl.BlockSpec((1, 2), lambda b, i: (0, 0)),
    ]


def _fwd_raw(tap, res, w1a, bvec, wxt, wy, zoff, w2, interpret):
    bsz, d, t, cs = tap.shape
    m = w1a.shape[-1]
    o = w2.shape[-1]
    fuse = res is not None
    k = d // res.shape[1] if fuse else 1
    td = _pick_td(d, k, t, cs, m, o)
    if td == 0:
        raise ValueError(
            f"abf_block: no tile fits d={d} k={k} t={t} cs={cs} m={m} o={o}; "
            "gate dispatch with abf_block_dispatchable()"
        )
    if not fuse:  # feed the tap as a dummy residual operand (never read)
        res = jnp.zeros((bsz, d, t, m), tap.dtype)
        k = 1
    w2r = w2.reshape(3, 3 * m, o)
    return pl.pallas_call(
        partial(_fwd_kernel, fuse=fuse, k=k, td=td, tp=_pad_len(t)),
        grid=(bsz, d // td),
        in_specs=_halo_specs(td, d, t, cs)
        + _halo_specs(td // k, d // k, t, m)
        + _small_specs(cs, m, o)
        + [pl.BlockSpec((3, 3 * m, o), lambda b, i: (0, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, td, t, m), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, td, t, o), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, d, t, m), tap.dtype),
            jax.ShapeDtypeStruct((bsz, d, t, o), tap.dtype),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(tap, tap, tap, res, res, res, w1a, bvec, wxt, wy, zoff, w2r)


def _bwd_raw(tap, res, w1a, bvec, wxt, wy, zoff, w2, xf, gxf, gout, interpret):
    bsz, d, t, cs = tap.shape
    m = w1a.shape[-1]
    o = w2.shape[-1]
    fuse = res is not None
    k = d // res.shape[1] if fuse else 1
    td = _pick_td(d, k, t, cs, m, o)
    if td == 0:
        raise ValueError("abf_block: geometry not dispatchable")
    res_shape = res.shape if fuse else (bsz, d, t, m)
    if not fuse:
        res = jnp.zeros(res_shape, tap.dtype)
        k = 1
    # flip/transpose for the conv adjoint: [3, 3O, M], dd and tt reversed
    w2f = jnp.transpose(w2[::-1, ::-1], (0, 1, 3, 2)).reshape(3, 3 * o, m)
    outs = pl.pallas_call(
        partial(_bwd_kernel, fuse=fuse, k=k, td=td, tp=_pad_len(t)),
        grid=(bsz, d // td),
        in_specs=[
            pl.BlockSpec((1, td, t, cs), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, td // k, t, m), lambda b, i: (b, i, 0, 0)),
        ]
        + _halo_specs(td, d, t, m)
        + _small_specs(cs, m, o)
        + [pl.BlockSpec((1, td, t, m), lambda b, i: (b, i, 0, 0))]
        + _halo_specs(td, d, t, o)
        + [pl.BlockSpec((3, 3 * o, m), lambda b, i: (0, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, td, t, cs), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, td // k, t, m), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((cs, m), lambda b, i: (0, 0)),
            pl.BlockSpec((1, m), lambda b, i: (0, 0)),
            pl.BlockSpec((cs, 2), lambda b, i: (0, 0)),
            pl.BlockSpec((m, 2), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 2), lambda b, i: (0, 0)),
            pl.BlockSpec((3, 3 * m, o), lambda b, i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(tap.shape, tap.dtype),
            jax.ShapeDtypeStruct(res_shape, tap.dtype),
            jax.ShapeDtypeStruct((cs, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((cs, 2), jnp.float32),
            jax.ShapeDtypeStruct((m, 2), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
            jax.ShapeDtypeStruct((3, 3 * m, o), jnp.float32),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(tap, res, xf, xf, xf, w1a, bvec, wxt, wy, zoff,
      gxf, gout, gout, gout, w2f)
    gtap, gres, dw1a, dbvec, dwxt, dwy, dzoff, dw2 = outs
    dw2 = dw2.reshape(3, 3, m, o)
    return gtap, (gres if fuse else None), dw1a, dbvec, dwxt, dwy, dzoff, dw2


@lru_cache(maxsize=4)
def _abf_block_fn(fuse: bool, interpret: bool):
    if fuse:

        @jax.custom_vjp
        def f(tap, res, w1a, bvec, wxt, wy, zoff, w2):
            return _fwd_raw(tap, res, w1a, bvec, wxt, wy, zoff, w2, interpret)

        def fwd(tap, res, w1a, bvec, wxt, wy, zoff, w2):
            out = _fwd_raw(tap, res, w1a, bvec, wxt, wy, zoff, w2, interpret)
            # xf (out[0]) is saved for the backward's conv weight gradient —
            # reading it back costs nothing extra vs recomputing it from
            # halo'd tap/res, and shrinks the bwd VMEM working set
            return out, (tap, res, w1a, bvec, wxt, wy, zoff, w2, out[0])

        def bwd(saved, g):
            tap, res, w1a, bvec, wxt, wy, zoff, w2, xf = saved
            gxf, gout = g
            gtap, gres, dw1a, dbvec, dwxt, dwy, dzoff, dw2 = _bwd_raw(
                tap, res, w1a, bvec, wxt, wy, zoff, w2, xf, gxf, gout,
                interpret
            )
            return (
                gtap, gres,
                dw1a.astype(w1a.dtype),
                dbvec[0].astype(bvec.dtype),
                dwxt.astype(wxt.dtype),
                dwy.astype(wy.dtype),
                dzoff[0].astype(zoff.dtype),
                dw2.astype(w2.dtype),
            )

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def fnf(tap, w1a, bvec, w2):
        z2 = jnp.zeros((1, 2), w1a.dtype)
        return _fwd_raw(tap, None, w1a, bvec, z2, z2, z2, w2, interpret)

    def fwd_nf(tap, w1a, bvec, w2):
        out = fnf(tap, w1a, bvec, w2)
        return out, (tap, w1a, bvec, w2, out[0])

    def bwd_nf(saved, g):
        tap, w1a, bvec, w2, xf = saved
        gxf, gout = g
        z2 = jnp.zeros((1, 2), w1a.dtype)
        gtap, _, dw1a, dbvec, _, _, _, dw2 = _bwd_raw(
            tap, None, w1a, bvec, z2, z2, z2, w2, xf, gxf, gout, interpret
        )
        return (
            gtap,
            dw1a.astype(w1a.dtype),
            dbvec[0].astype(bvec.dtype),
            dw2.astype(w2.dtype),
        )

    fnf.defvjp(fwd_nf, bwd_nf)
    return fnf


def abf_block(
    tap: jnp.ndarray,
    res,
    w1a: jnp.ndarray,
    bvec: jnp.ndarray,
    wxt: jnp.ndarray,
    wy: jnp.ndarray,
    zoff: jnp.ndarray,
    w2: jnp.ndarray,
    interpret: bool = False,
):
    """Fused ABF block (see module docstring).  Returns ``(xf, out_raw)``.

    tap [B, D, T, Cs]; res [B, D/k, T, M] or None (deepest block, no fusion);
    w1a [Cs, M]; bvec [M]; wxt [Cs, 2]; wy [M, 2]; zoff [2]; w2 [3, 3, M, O].
    Small operands are cast to the tap dtype outside except the f32 bvec/zoff
    offsets which the kernel adds to the f32 matmul accumulators.
    """
    bvec2 = bvec.reshape(1, -1)
    if res is None:
        return _abf_block_fn(False, interpret)(tap, w1a, bvec2, w2)
    return _abf_block_fn(True, interpret)(
        tap, res, w1a, bvec2, wxt, wy, zoff.reshape(1, 2), w2
    )
