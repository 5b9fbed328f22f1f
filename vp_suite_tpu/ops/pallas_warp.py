r"""Pallas TPU kernel for the matmul-form multi-flow bilinear warp.

``ops/grid_sample.warp_flow_multi`` computes TrajGRU's L trajectory warps as
two contractions per flow:

    out[p, c] = sum_y A[p, y] * (sum_x B[p, x] * img[y, x, c])

The XLA einsum lowering materialises the per-flow ``[p, x, c]`` intermediate
in HBM (1.6 GB at 64x64x96 x batch 32). This kernel keeps everything in VMEM:
each program owns a 128-pixel output tile of one (batch, flow) pair, builds
the combined per-pixel sampling matrix ``M[(y,x), p] = a[y,p] * bm[x,p]`` on
the VPU, and issues ONE MXU dot ``img [C, HW] @ M [HW, PT]``. The lane dim is
always the 128-wide pixel tile — no lane-misaligned slicing (which Mosaic
rejects for 96-channel blocks) and no dynamic sublane indexing (also
rejected). Measured on [32, 64, 64, 96] x 13 flows: 8.9 ms vs 21.5 ms for the
einsum path vs 65 ms for XLA gathers.

Numerics match the einsum path (f32 accumulation either way). The backward is
a hand-written VJP: on TPU-eligible shapes two more Pallas kernels (d_img
accumulated across the flow/tile grid; d_A and d_Bm from a shared
``img @ g^T`` intermediate), otherwise the same contractions in einsum form
scanned per flow so only one intermediate is live at a time.

Reference behavior being accelerated: ``vp_suite/model_blocks/traj_gru.py:
149-164`` (L grid_sample warps).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

_PT = int(os.environ.get("VPT_WARP_PT", "512"))  # output-pixel tile.
# Larger tiles mean fewer programs (less per-program startup/dispatch) but
# more VPU factor-build work (band kernels build PT + 2RW elements per
# output pixel). Round-5 EF-TrajGRU bench sweep (ms/step, R=6 at W=64):
# PT=128: 449.6 / 256: 362.6 / **512: 344.7** / 1024: 376.9 — program
# overhead dominates below 512, the m-build above it. At PT=512 a 16x16
# layer (P=256) no longer divides the tile and takes the exact einsum
# fallback — included in the measured win.
_PT_LEGACY = 128  # legacy prebuilt-factor kernels keep the 128 tile so pixel
# counts divisible by 128 (but not 256) still hit the TPU path

# Band-limited fast path: flow offsets are learned and in practice stay small
# (a few pixels), while the dense kernels pay a full-image [H*W] contraction
# per output tile. When every sample row offset |iy - oy| <= _BAND_R - 1 the
# same warp touches only a (PT/W + 2R)-row band around each output tile — an
# exact 2.7-3x FLOP cut at 64x64.
#
# Two dispatch modes (VPT_WARP_BAND_MODE):
#   'clamp' (default): the row indices are SATURATED into the band by a
#     differentiable clip before the kernel, so the band kernels run
#     unconditionally — no `lax.cond` in the scan body. Round-4 profiling
#     attributed 45% of EF-TrajGRU's device self-time to the cond (each
#     timestep's fwd+bwd conditional is a schedule barrier: the jnp.all
#     predicate reduction must complete before either branch can start,
#     and branch bodies can't overlap with surrounding ops). Semantics:
#     trajectory row offsets saturate at ±(R-1) px per step (columns are
#     unconstrained) — identical to the exact warp whenever flows stay in
#     band, which trained MMF flows do by 2x margin (|dy| <= 3 vs R-1 = 7);
#     out-of-band offsets warp from the nearest in-band row and get zero
#     d_iy (standard clip subgradient).
#   'cond': the previous behavior — a traced `lax.cond` checks the bound at
#     runtime and falls back to the dense kernels (exact for wild flows).
_BAND_R = int(os.environ.get("VPT_WARP_BAND_R", "8"))
# narrower images get a tighter radius: at W=32 the full R=8 band covers 75%
# of the image (24/32 rows) — R=4 halves that while (R*W) % 128 still holds;
# trained MMF flows at half resolution stay well inside |dy| <= 3.
# W=64 runs R=6: the m-build outer product (the kernels' VPU bound) costs
# band_px = PT + 2RW per output pixel, so R 8->6 cuts the dominant 64x64
# layer's build by 20% — measured 382.1 -> 362.6 ms/step on the EF-TrajGRU
# bench (clamp bound R-1 = 5 still 1.7x the |dy| <= 3 envelope of trained
# MMF flows; (6*64) % 128 == 0 keeps the lane slices aligned).
_BAND_R_BY_W = {32: int(os.environ.get("VPT_WARP_BAND_R32", "4")),
                64: int(os.environ.get("VPT_WARP_BAND_R64", "6"))}
_BAND_ENABLED = os.environ.get("VPT_WARP_BAND", "1") != "0"
_BAND_MODE = os.environ.get("VPT_WARP_BAND_MODE", "clamp")


def _band_r(W):
    return _BAND_R_BY_W.get(W, _BAND_R)


# --------------------------------------------------------------------- #
# Fused warp: factors built in VMEM from fractional indices.
#
# The first-generation kernels below consume pre-built one-hot factor
# matrices A/Bm of shape [b, L, P, h] — 436 MB of HBM round trips per step
# at EF-TrajGRU's first layer, plus an equally large d_A/d_Bm pair and an
# XLA-side one-hot-construction VJP in the backward. The fused kernels
# instead take the raw fractional sample indices iy/ix ([b, L, P] f32,
# 6.8 MB) and build the factor tiles on the VPU inside the kernel; the
# hand-written backward emits d_iy/d_ix ([b, L, P]) directly, so no
# [b, L, P, h]-sized array ever exists.

def _factor_tile(i_frac, n, dtype):
    r"""[PT] fractional indices -> [n, PT] weighted one-hot factor tile
    (same math as ``grid_sample._onehot_factor``, transposed)."""
    i0 = jnp.floor(i_frac)
    w1 = i_frac - i0
    w0 = 1.0 - w1
    i1 = i0 + 1.0
    v0 = (i0 >= 0) & (i0 <= n - 1)
    v1 = (i1 >= 0) & (i1 <= n - 1)
    # tpu.iota is integer-only; compare in f32 after a cast
    iota = lax.broadcasted_iota(jnp.int32, (n, i_frac.shape[-1]), 0) \
        .astype(jnp.float32)
    fac = (w0 * v0)[None, :] * (iota == i0[None, :]) \
        + (w1 * v1)[None, :] * (iota == i1[None, :])
    return fac.astype(dtype)


def _make_fused_fwd_kernel(H, W):
    r"""One (batch, flow, pixel-tile) program, factors built in VMEM.

    idx_ref: [1, 1, 2, PT] f32 — row 0 = iy, row 1 = ix (the (iy, ix) pair
        rides the sublane dim so the tile satisfies Mosaic's (8, 128)-or-
        full-dim block rule; sublane reads use static indices)
    img_ref: [1, C, H*W] image (flattened spatial on lanes)
    out_ref: [1, 1, C, PT]
    """
    def kernel(idx_ref, img_ref, out_ref):
        a = _factor_tile(idx_ref[0, 0, 0, :], H, img_ref.dtype)
        bm = _factor_tile(idx_ref[0, 0, 1, :], W, img_ref.dtype)
        m = (a[:, None, :] * bm[None, :, :]).reshape(H * W, a.shape[-1])
        out_ref[0, 0] = jnp.dot(img_ref[0], m,
                                preferred_element_type=jnp.float32
                                ).astype(out_ref.dtype)
    return kernel


def _make_fused_dimg_kernel(H, W):
    r"""d_img[(y,x), c] += M(idx)[(y,x), p] g[c, p], accumulated over the
    (flow, tile) grid dims (out block constant there); the sampling matrix M
    is rebuilt in VMEM from the fractional indices."""
    def kernel(idx_ref, g_ref, dimg_ref):
        a = _factor_tile(idx_ref[0, 0, 0, :], H, g_ref.dtype)
        bm = _factor_tile(idx_ref[0, 0, 1, :], W, g_ref.dtype)
        m = (a[:, None, :] * bm[None, :, :]).reshape(H * W, a.shape[-1])
        contrib = lax.dot_general(m, g_ref[0, 0], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

        @pl.when(first)
        def _init():
            dimg_ref[0] = contrib

        @pl.when(jnp.logical_not(first))
        def _acc():
            dimg_ref[0] += contrib
    return kernel


def _make_fused_didx_kernel(H, W):
    r"""Index gradients from the shared intermediate t = img^T @ g:

        d_a[y, p]  = sum_x bm[x, p] t[(y,x), p]
        d_iy[p]    = sum_y d_a[y, p] (v1·[y==i1] - v0·[y==i0])
        (d_ix symmetrically via a)

    Folds the one-hot-construction VJP into the kernel, so the output is the
    tiny [PT] index gradient instead of [H, PT]/[W, PT] factor gradients.
    """
    def kernel(idx_ref, img_ref, g_ref, didx_ref):
        iy = idx_ref[0, 0, 0, :]
        ix = idx_ref[0, 0, 1, :]
        a = _factor_tile(iy, H, jnp.float32)
        bm = _factor_tile(ix, W, jnp.float32)
        # t[(y,x), p] = sum_c img[c, (y,x)] * g[c, p]
        t = lax.dot_general(img_ref[0], g_ref[0, 0], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        t = t.reshape(H, W, -1)
        d_a = jnp.sum(t * bm[None, :, :], axis=1)          # [H, PT]
        d_bm = jnp.sum(t * a[:, None, :], axis=0)          # [W, PT]

        def d_frac(d_fac, i_frac, n):
            i0 = jnp.floor(i_frac)
            i1 = i0 + 1.0
            v0 = ((i0 >= 0) & (i0 <= n - 1)).astype(jnp.float32)
            v1 = ((i1 >= 0) & (i1 <= n - 1)).astype(jnp.float32)
            iota = lax.broadcasted_iota(jnp.int32, d_fac.shape, 0) \
                .astype(jnp.float32)
            sel = (iota == i1[None, :]) * v1[None, :] \
                - (iota == i0[None, :]) * v0[None, :]
            return jnp.sum(d_fac * sel, axis=0)            # [PT]

        didx_ref[0, 0, 0, :] = d_frac(d_a, iy, H)
        didx_ref[0, 0, 1, :] = d_frac(d_bm, ix, W)
    return kernel


def _fused_eligible(iy, img):
    if jax.default_backend() != "tpu":
        return False
    P = iy.shape[-1]
    h, w = img.shape[1], img.shape[2]
    return P % _PT == 0 and h * w == P and h <= 256


# --------------------------------------------------------------------- #
# Band-limited kernels (see _BAND_R note at the top). Identical math to the
# fused kernels, but each program contracts only the image-row band
# [start, start + band_rows) around its output tile, where
# band_rows = PT/W + 2R and start = clip(tile_row0 - R, 0, H - band_rows).
# Guard (checked by the caller's lax.cond): every |iy - oy| <= R - 1, which
# together with the clip makes the band cover every in-range source row.
# All reachable band offsets are 128-aligned in flattened pixels because
# PT % 128 == 0 and (R*W) % 128 == 0 and band_px % 128 == 0 (static checks
# in _band_possible), so the dynamic lane slices satisfy Mosaic.

def _band_geom(W, PT):
    out_rows = PT // W
    band_rows = out_rows + 2 * _band_r(W)
    return out_rows, band_rows


def _band_possible(iy, img):
    r"""Static geometry check for the band kernels (P tiles = whole rows,
    band fits in the image, dynamic lane offsets provably 128-aligned)."""
    if not _BAND_ENABLED:
        return False
    h, w = img.shape[1], img.shape[2]
    if _PT % w != 0:
        return False
    out_rows, band_rows = _band_geom(w, _PT)
    return band_rows < h and (_band_r(w) * w) % 128 == 0


def _band_bounds(P, W):
    r"""Per-pixel saturation bounds for 'clamp' mode: row offsets beyond
    ±(R-1) of the output row are clipped into the band."""
    oy = (jnp.arange(P, dtype=jnp.float32) // W)[None, None, :]
    r = float(_band_r(W)) - 1.0
    return oy - r, oy + r


def _clamp_rows(iy, W):
    lo, hi = _band_bounds(iy.shape[-1], W)
    return jnp.clip(iy, lo, hi)


def _band_pred(iy, W):
    r"""Traced bool: do ALL fractional row indices stay within R-1 rows of
    their output row? NaN flows compare False -> dense fallback."""
    P = iy.shape[-1]
    oy = (jnp.arange(P, dtype=jnp.int32) // W).astype(jnp.float32)
    dy = iy - oy[None, None, :]
    r = float(_band_r(W))
    return jnp.all((dy >= -(r - 1.0)) & (dy <= r - 1.0))


def _band_start(pi, H, W, out_rows, band_rows):
    start_row = jnp.clip(pi * out_rows - _band_r(W), 0, H - band_rows)
    start_px = pl.multiple_of(start_row * W, 128)
    return start_row, start_px


def _factor_tile_band(i_frac, n_total, start_row, band_rows, dtype):
    r"""Like ``_factor_tile`` but only for the rows
    [start_row, start_row + band_rows); validity stays global."""
    i0 = jnp.floor(i_frac)
    w1 = i_frac - i0
    w0 = 1.0 - w1
    i1 = i0 + 1.0
    v0 = (i0 >= 0) & (i0 <= n_total - 1)
    v1 = (i1 >= 0) & (i1 <= n_total - 1)
    iota = lax.broadcasted_iota(jnp.int32, (band_rows, i_frac.shape[-1]), 0) \
        .astype(jnp.float32) + start_row.astype(jnp.float32)
    fac = (w0 * v0)[None, :] * (iota == i0[None, :]) \
        + (w1 * v1)[None, :] * (iota == i1[None, :])
    return fac.astype(dtype)


def _make_band_fwd_kernel(H, W):
    def kernel(idx_ref, img_ref, out_ref):
        PT = idx_ref.shape[-1]
        out_rows, band_rows = _band_geom(W, PT)
        start_row, start_px = _band_start(pl.program_id(2), H, W,
                                          out_rows, band_rows)
        a = _factor_tile_band(idx_ref[0, 0, 0, :], H, start_row, band_rows,
                              img_ref.dtype)
        bm = _factor_tile(idx_ref[0, 0, 1, :], W, img_ref.dtype)
        m = (a[:, None, :] * bm[None, :, :]).reshape(band_rows * W, PT)
        img_band = img_ref[0, :, pl.ds(start_px, band_rows * W)]
        out_ref[0, 0] = jnp.dot(img_band, m,
                                preferred_element_type=jnp.float32
                                ).astype(out_ref.dtype)
    return kernel


def _make_band_dimg_kernel(H, W):
    r"""Channel-major accumulated d_img: out [1, C, H*W] f32, zeroed on the
    first (flow, tile) visit, then each program adds its band's contribution
    through an aligned dynamic lane slice."""
    def kernel(idx_ref, g_ref, dimg_ref):
        PT = idx_ref.shape[-1]
        out_rows, band_rows = _band_geom(W, PT)
        start_row, start_px = _band_start(pl.program_id(2), H, W,
                                          out_rows, band_rows)
        a = _factor_tile_band(idx_ref[0, 0, 0, :], H, start_row, band_rows,
                              g_ref.dtype)
        bm = _factor_tile(idx_ref[0, 0, 1, :], W, g_ref.dtype)
        m = (a[:, None, :] * bm[None, :, :]).reshape(band_rows * W, PT)
        # contrib[c, q] = sum_p g[c, p] m[q, p]
        contrib = lax.dot_general(g_ref[0, 0], m, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

        @pl.when(first)
        def _zero():
            dimg_ref[0] = jnp.zeros_like(dimg_ref[0])

        cur = dimg_ref[0, :, pl.ds(start_px, band_rows * W)]
        dimg_ref[0, :, pl.ds(start_px, band_rows * W)] = cur + contrib
    return kernel


def _make_band_didx_kernel(H, W):
    r"""Band version of ``_make_fused_didx_kernel``: the shared intermediate
    ``t`` only spans the band's rows."""
    def kernel(idx_ref, img_ref, g_ref, didx_ref):
        PT = idx_ref.shape[-1]
        out_rows, band_rows = _band_geom(W, PT)
        start_row, start_px = _band_start(pl.program_id(2), H, W,
                                          out_rows, band_rows)
        iy = idx_ref[0, 0, 0, :]
        ix = idx_ref[0, 0, 1, :]
        a = _factor_tile_band(iy, H, start_row, band_rows, jnp.float32)
        bm = _factor_tile(ix, W, jnp.float32)
        img_band = img_ref[0, :, pl.ds(start_px, band_rows * W)]
        # t[(band q), p] = sum_c img[c, q] g[c, p]
        t = lax.dot_general(img_band, g_ref[0, 0], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        t = t.reshape(band_rows, W, -1)
        d_a = jnp.sum(t * bm[None, :, :], axis=1)          # [band_rows, PT]
        d_bm = jnp.sum(t * a[:, None, :], axis=0)          # [W, PT]

        def d_frac(d_fac, i_frac, n, row0):
            i0 = jnp.floor(i_frac)
            i1 = i0 + 1.0
            v0 = ((i0 >= 0) & (i0 <= n - 1)).astype(jnp.float32)
            v1 = ((i1 >= 0) & (i1 <= n - 1)).astype(jnp.float32)
            iota = lax.broadcasted_iota(jnp.int32, d_fac.shape, 0) \
                .astype(jnp.float32) + row0
            sel = (iota == i1[None, :]) * v1[None, :] \
                - (iota == i0[None, :]) * v0[None, :]
            return jnp.sum(d_fac * sel, axis=0)            # [PT]

        didx_ref[0, 0, 0, :] = d_frac(d_a, iy, H, start_row.astype(jnp.float32))
        didx_ref[0, 0, 1, :] = d_frac(d_bm, ix, W, jnp.float32(0.0))
    return kernel


def _warp_sample_pallas_band(iy, ix, img):
    b, L, P = iy.shape
    _, h, w, c = img.shape
    idx = jnp.stack([iy, ix], axis=2)                      # [b, L, 2, P]
    img2 = img.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    return pl.pallas_call(
        _make_band_fwd_kernel(h, w),
        grid=(b, L, P // _PT),
        in_specs=[
            pl.BlockSpec((1, 1, 2, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, c, h * w), lambda bi, li, pi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, c, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
        out_shape=jax.ShapeDtypeStruct((b, L, c, P), img.dtype),
    )(idx, img2)


def _warp_sample_bwd_band(iy, ix, img, g):
    b, L, P = iy.shape
    _, h, w, c = img.shape
    idx = jnp.stack([iy, ix], axis=2)                      # [b, L, 2, P]
    img2 = img.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    d_img_cm = pl.pallas_call(
        _make_band_dimg_kernel(h, w),
        grid=(b, L, P // _PT),
        in_specs=[
            pl.BlockSpec((1, 1, 2, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, 1, c, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
        ],
        out_specs=pl.BlockSpec((1, c, h * w), lambda bi, li, pi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, h * w), jnp.float32),
    )(idx, g)
    d_idx = pl.pallas_call(
        _make_band_didx_kernel(h, w),
        grid=(b, L, P // _PT),
        in_specs=[
            pl.BlockSpec((1, 1, 2, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, c, h * w), lambda bi, li, pi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, _PT),
                               lambda bi, li, pi: (bi, li, 0, pi)),
        out_shape=jax.ShapeDtypeStruct((b, L, 2, P), jnp.float32),
    )(idx, img2, g)
    d_img = d_img_cm.reshape(b, c, h, w).transpose(0, 2, 3, 1)
    return (d_idx[:, :, 0], d_idx[:, :, 1], d_img.astype(img.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def warp_sample(iy, ix, img):
    r"""Fused multi-flow bilinear warp from fractional sample indices.

    out[b, l, c, p] = sum_{y,x} A(iy)[b,l,p,y] B(ix)[b,l,p,x] img[b,y,x,c]

    with A/B the weighted one-hot bilinear factors (zero outside the image,
    torch ``grid_sample(padding_mode='zeros')`` parity — reference behavior:
    ``vp_suite/model_blocks/traj_gru.py:149-164``).

    The channel-major [b, L, c, P] output layout is the Pallas kernel's
    natural one (channels on sublanes, pixels on lanes); returning it
    directly lets the caller reach the consumer layout [b, P, L*c] with ONE
    transpose instead of two 300+ MB copies (profiled: copies around the
    warp were ~15% of the EF-TrajGRU train step).

    Args:
        iy, ix: [b, L, P] f32 fractional indices (P = h*w output pixels).
        img: [b, h, w, c].
    Returns: [b, L, c, P].
    """
    return _warp_sample_fwd_impl(iy, ix, img)


def _warp_sample_fwd_impl(iy, ix, img):
    if _fused_eligible(iy, img):
        if _band_possible(iy, img):
            if _BAND_MODE == "clamp":
                # branch-free: saturate rows into the band, band kernel always
                return _warp_sample_pallas_band(_clamp_rows(iy, img.shape[2]),
                                                ix, img)
            return lax.cond(_band_pred(iy, img.shape[2]),
                            _warp_sample_pallas_band, _warp_sample_pallas,
                            iy, ix, img)
        return _warp_sample_pallas(iy, ix, img)
    from vp_suite_tpu.ops.grid_sample import _onehot_factor
    A = _onehot_factor(iy, img.shape[1], img.dtype)
    Bm = _onehot_factor(ix, img.shape[2], img.dtype)
    return _warp_contract_einsum(A, Bm, img).transpose(0, 1, 3, 2)


def _warp_sample_pallas(iy, ix, img):
    b, L, P = iy.shape
    _, h, w, c = img.shape
    idx = jnp.stack([iy, ix], axis=2)                      # [b, L, 2, P]
    img2 = img.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    return pl.pallas_call(
        _make_fused_fwd_kernel(h, w),
        grid=(b, L, P // _PT),
        in_specs=[
            pl.BlockSpec((1, 1, 2, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, c, h * w), lambda bi, li, pi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, c, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
        out_shape=jax.ShapeDtypeStruct((b, L, c, P), img.dtype),
    )(idx, img2)


def _warp_sample_fwd(iy, ix, img):
    return _warp_sample_fwd_impl(iy, ix, img), (iy, ix, img)


def _warp_sample_bwd(res, g):
    r"""g arrives in the kernel-native [b, L, c, P] layout — no transpose."""
    iy, ix, img = res
    if _fused_eligible(iy, img):
        if _band_possible(iy, img):
            if _BAND_MODE == "clamp":
                W = img.shape[2]
                d_iy, d_ix, d_img = _warp_sample_bwd_band(
                    _clamp_rows(iy, W), ix, img, g)
                # clip subgradient: saturated rows get zero index gradient
                lo, hi = _band_bounds(iy.shape[-1], W)
                d_iy = d_iy * ((iy >= lo) & (iy <= hi)).astype(d_iy.dtype)
                return d_iy, d_ix, d_img
            return lax.cond(_band_pred(iy, img.shape[2]),
                            _warp_sample_bwd_band, _warp_sample_bwd_dense,
                            iy, ix, img, g)
        return _warp_sample_bwd_dense(iy, ix, img, g)

    # fallback: autodiff through the factor construction + einsum VJP
    def f(iy_, ix_, img_):
        from vp_suite_tpu.ops.grid_sample import _onehot_factor
        A = _onehot_factor(iy_, img_.shape[1], img_.dtype)
        Bm = _onehot_factor(ix_, img_.shape[2], img_.dtype)
        return warp_contract(A, Bm, img_).transpose(0, 1, 3, 2)
    _, vjp = jax.vjp(f, iy, ix, img)
    return vjp(g)


def _warp_sample_bwd_dense(iy, ix, img, g):
    b, L, P = iy.shape
    _, h, w, c = img.shape
    idx = jnp.stack([iy, ix], axis=2)                  # [b, L, 2, P]
    img2 = img.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    g_t = g                                            # [b, L, c, P]
    # NOTE: a merged dimg+didx kernel was tried (shared factor builds,
    # halved launches) and REGRESSED 768 -> 1033 ms/step on the bench —
    # the combined working set (m 2MB + t 4MB f32 + img + f32 acc block)
    # defeats Mosaic's double buffering. Split kernels pipeline better.
    d_img = pl.pallas_call(
        _make_fused_dimg_kernel(h, w),
        grid=(b, L, P // _PT),
        in_specs=[
            pl.BlockSpec((1, 1, 2, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, 1, c, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda bi, li, pi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), jnp.float32),
    )(idx, g_t)
    d_idx = pl.pallas_call(
        _make_fused_didx_kernel(h, w),
        grid=(b, L, P // _PT),
        in_specs=[
            pl.BlockSpec((1, 1, 2, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, c, h * w), lambda bi, li, pi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, _PT),
                               lambda bi, li, pi: (bi, li, 0, pi)),
        out_shape=jax.ShapeDtypeStruct((b, L, 2, P), jnp.float32),
    )(idx, img2, g_t)
    return (d_idx[:, :, 0], d_idx[:, :, 1],
            d_img.reshape(b, h, w, c).astype(img.dtype))


warp_sample.defvjp(_warp_sample_fwd, _warp_sample_bwd)


def _warp_kernel(a_ref, bm_ref, img_ref, out_ref):
    r"""One (batch, flow, pixel-tile) program.

    a_ref:   [1, 1, H, PT]  A^T tile (y factor, pixels on lanes)
    bm_ref:  [1, 1, W, PT]  B^T tile (x factor)
    img_ref: [1, C, H*W]    the batch item's image, flattened spatial on lanes
    out_ref: [1, 1, C, PT]

    The bilinear weights factor per pixel: the combined sampling matrix is
    M[(y, x), p] = a[y, p] * bm[x, p], built on the VPU in VMEM, and the
    whole warp collapses to ONE MXU dot img [C, HW] @ M [HW, PT] — a
    per-row loop of small dots is latency-bound instead (measured 5x
    slower than even the XLA einsum path).
    """
    h, pt = a_ref.shape[2], a_ref.shape[3]
    w = bm_ref.shape[2]
    a = a_ref[0, 0]                                      # [H, PT]
    bm = bm_ref[0, 0]                                    # [W, PT]
    m = (a[:, None, :] * bm[None, :, :]).reshape(h * w, pt)
    out_ref[0, 0] = jnp.dot(img_ref[0], m,
                            preferred_element_type=jnp.float32
                            ).astype(out_ref.dtype)


def _warp_contract_pallas(A, Bm, img):
    b, L, P, h = A.shape
    w = Bm.shape[-1]
    c = img.shape[-1]
    a_t = A.transpose(0, 1, 3, 2)      # [b, L, h, P]
    bm_t = Bm.transpose(0, 1, 3, 2)    # [b, L, w, P]
    img2 = img.transpose(0, 3, 1, 2).reshape(b, c, h * w)  # [b, c, h*w]

    out = pl.pallas_call(
        _warp_kernel,
        grid=(b, L, P // _PT_LEGACY),
        in_specs=[
            pl.BlockSpec((1, 1, h, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, 1, w, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
            # constant in (li, pi): fetched once per batch item
            pl.BlockSpec((1, c, h * w), lambda bi, li, pi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, c, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
        out_shape=jax.ShapeDtypeStruct((b, L, c, P), img.dtype),
    )(a_t, bm_t, img2)
    return out.transpose(0, 1, 3, 2)   # [b, L, P, c]


def _warp_bwd_dimg_kernel(a_ref, bm_ref, g_ref, out_ref):
    r"""d_img[(y,x), c] += M[(y,x), p_tile] @ g[p_tile, c], accumulated over
    the (flow, pixel-tile) grid steps (out block constant in those dims).

    a_ref [1,1,H,PT], bm_ref [1,1,W,PT], g_ref [1,1,C,PT] (grad, pixels on
    lanes), out_ref [1, H*W, C] f32.
    """
    h, pt = a_ref.shape[2], a_ref.shape[3]
    w = bm_ref.shape[2]
    a = a_ref[0, 0]
    bm = bm_ref[0, 0]
    m = (a[:, None, :] * bm[None, :, :]).reshape(h * w, pt)
    # [HW, PT] x [C, PT] contracting PT -> [HW, C]
    contrib = lax.dot_general(m, g_ref[0, 0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

    @pl.when(first)
    def _init():
        out_ref[0] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        out_ref[0] += contrib


def _warp_bwd_dab_kernel(img_ref, g_ref, a_ref, bm_ref, da_ref, dbm_ref):
    r"""Factor gradients from the shared intermediate T = img @ g^T:

        d_a[y, p]  = sum_x bm[x, p] * T[(y,x), p]
        d_bm[x, p] = sum_y a[y, p]  * T[(y,x), p]

    img_ref [1, H*W, C], g_ref [1,1,C,PT], a/bm as in the forward kernel.
    """
    h, pt = a_ref.shape[2], a_ref.shape[3]
    w = bm_ref.shape[2]
    t = jnp.dot(img_ref[0], g_ref[0, 0],
                preferred_element_type=jnp.float32).reshape(h, w, pt)
    a = a_ref[0, 0].astype(jnp.float32)
    bm = bm_ref[0, 0].astype(jnp.float32)
    da_ref[0, 0] = jnp.sum(t * bm[None, :, :], axis=1).astype(da_ref.dtype)
    dbm_ref[0, 0] = jnp.sum(t * a[:, None, :], axis=0).astype(dbm_ref.dtype)


def _warp_bwd_pallas(A, Bm, img, g):
    b, L, P, h = A.shape
    w = Bm.shape[-1]
    c = img.shape[-1]
    a_t = A.transpose(0, 1, 3, 2)                    # [b, L, h, P]
    bm_t = Bm.transpose(0, 1, 3, 2)                  # [b, L, w, P]
    g_t = g.transpose(0, 1, 3, 2)                    # [b, L, c, P]
    img_flat = img.reshape(b, h * w, c)

    d_img = pl.pallas_call(
        _warp_bwd_dimg_kernel,
        grid=(b, L, P // _PT_LEGACY),
        in_specs=[
            pl.BlockSpec((1, 1, h, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, 1, w, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, 1, c, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda bi, li, pi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), jnp.float32),
    )(a_t, bm_t, g_t)

    d_a_t, d_bm_t = pl.pallas_call(
        _warp_bwd_dab_kernel,
        grid=(b, L, P // _PT_LEGACY),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda bi, li, pi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, 1, h, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, 1, w, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
            pl.BlockSpec((1, 1, w, _PT_LEGACY), lambda bi, li, pi: (bi, li, 0, pi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, L, h, P), A.dtype),
            jax.ShapeDtypeStruct((b, L, w, P), Bm.dtype),
        ],
    )(img_flat, g_t, a_t, bm_t)

    d_A = d_a_t.transpose(0, 1, 3, 2)
    d_Bm = d_bm_t.transpose(0, 1, 3, 2)
    return d_A, d_Bm, d_img.reshape(b, h, w, c).astype(img.dtype)


def _warp_contract_einsum(A, Bm, img):
    def one(_, ab):
        a, bm = ab                                   # [b,p,h], [b,p,w]
        u = jnp.einsum("bpy,byxc->bpxc", a, img)     # MXU contraction
        return _, jnp.einsum("bpx,bpxc->bpc", bm, u)

    # remat per flow: keeps the [b,p,w,c] intermediate from accumulating
    # L-fold in the backward (OOM at 64x64x96 x batch 32)
    one = jax.checkpoint(one)
    _, outs = lax.scan(one, 0, (jnp.moveaxis(A, 1, 0), jnp.moveaxis(Bm, 1, 0)))
    return jnp.moveaxis(outs, 0, 1)                  # [b, L, p, c]


def _use_pallas(A):
    if jax.default_backend() != "tpu":
        return False
    b, L, P, h = A.shape
    return P % _PT_LEGACY == 0 and h <= 256


def _dispatch(A, Bm, img):
    if _use_pallas(A):
        return _warp_contract_pallas(A, Bm, img)
    return _warp_contract_einsum(A, Bm, img)


@jax.custom_vjp
def warp_contract(A, Bm, img):
    r"""out[b, l, p, c] = sum_{y,x} A[b,l,p,y] Bm[b,l,p,x] img[b,y,x,c]."""
    return _dispatch(A, Bm, img)


def _warp_fwd(A, Bm, img):
    return _dispatch(A, Bm, img), (A, Bm, img)


def _warp_bwd(res, g):
    A, Bm, img = res
    if _use_pallas(A):
        return _warp_bwd_pallas(A, Bm, img, g)

    def one(d_img, albm):
        a, bm, gl = albm                                  # [b,p,h] [b,p,w] [b,p,c]
        u = jnp.einsum("bpy,byxc->bpxc", a, img)
        d_bm = jnp.einsum("bpxc,bpc->bpx", u, gl)
        v = bm[..., None] * gl[:, :, None, :]             # [b,p,w,c]
        d_a = jnp.einsum("byxc,bpxc->bpy", img, v)
        d_img = d_img + jnp.einsum("bpy,bpxc->byxc", a, v)
        return d_img, (d_a, d_bm)

    d_img, (d_A, d_Bm) = lax.scan(
        one, jnp.zeros_like(img),
        (jnp.moveaxis(A, 1, 0), jnp.moveaxis(Bm, 1, 0), jnp.moveaxis(g, 1, 0)))
    return jnp.moveaxis(d_A, 0, 1), jnp.moveaxis(d_Bm, 0, 1), d_img


warp_contract.defvjp(_warp_fwd, _warp_bwd)


# --------------------------------------------------------------------- #
# Warp + 1x1 'ret' conv fusion.
#
# TrajGRU's h2h path is ``ret(concat_l warp_l(h))`` — a 1x1 conv over the
# L*f-channel concatenation of the warps (reference
# ``vp_suite/model_blocks/traj_gru.py:198-207``). Materialising that
# concatenation costs [b, L*f, P] of HBM per step (327 MB at the layer-1
# bench shape) plus the ret conv's reads and its VJP's writes. These kernels
# contract the ret weights INSIDE the warp grid instead: for each
# (batch, pixel-tile) the L flows accumulate ``W_l^T @ warp_l`` into a
# [3f, PT] f32 VMEM scratch (l innermost in the grid, so the block never
# leaves VMEM), and only the finished gate pre-activations [b, 3f, P] are
# written out — the warp tensor never exists in HBM, forward or backward.

def _make_warpret_fwd_kernel(H, W, L):
    r"""grid (b, P//PT, L). idx [1,1,2,PT]; img [1,F,H*W]; w [1,F,3F];
    bias [1,3F]; out [1,3F,PT]; acc scratch [3F,PT] f32."""
    def kernel(idx_ref, img_ref, w_ref, bias_ref, out_ref, acc_ref):
        a = _factor_tile(idx_ref[0, 0, 0, :], H, img_ref.dtype)
        bm = _factor_tile(idx_ref[0, 0, 1, :], W, img_ref.dtype)
        m = (a[:, None, :] * bm[None, :, :]).reshape(H * W, a.shape[-1])
        warp = jnp.dot(img_ref[0], m,
                       preferred_element_type=jnp.float32)        # [F, PT]
        # contrib[o, p] = sum_f w[f, o] * warp[f, p]
        contrib = lax.dot_general(w_ref[0], warp, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        li = pl.program_id(2)

        @pl.when(li == 0)
        def _init():
            acc_ref[...] = contrib + bias_ref[0][:, None]

        @pl.when(li != 0)
        def _acc():
            acc_ref[...] += contrib

        @pl.when(li == L - 1)
        def _flush():
            out_ref[0] = acc_ref[...].astype(out_ref.dtype)
    return kernel


def _make_warpret_dimg_kernel(H, W):
    r"""d_img[(y,x), f] += M[(y,x), p] g_l[f, p] with g_l = W_l @ d_h2h
    computed in VMEM. grid (b, L, P//PT); out [1, H*W, F] f32 (constant over
    l, p)."""
    def kernel(idx_ref, w_ref, dh_ref, dimg_ref):
        g_l = lax.dot_general(w_ref[0], dh_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [F, PT]
        g_l = g_l.astype(dh_ref.dtype)
        a = _factor_tile(idx_ref[0, 0, 0, :], H, g_l.dtype)
        bm = _factor_tile(idx_ref[0, 0, 1, :], W, g_l.dtype)
        m = (a[:, None, :] * bm[None, :, :]).reshape(H * W, a.shape[-1])
        contrib = lax.dot_general(m, g_l, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

        @pl.when(first)
        def _init():
            dimg_ref[0] = contrib

        @pl.when(jnp.logical_not(first))
        def _acc():
            dimg_ref[0] += contrib
    return kernel


def _make_warpret_didx_dw_kernel(H, W):
    r"""Index gradients (as in the plain fused kernel) plus the ret-weight
    gradient, both from the in-VMEM rebuilt factors:

        g_l   = W_l @ d_h2h                      [F, PT]
        t     = img^T g_l                        [(y,x), PT]  -> d_iy/d_ix
        warp  = img^T-contraction with M         [F, PT]
        d_W_l += warp @ d_h2h^T                  [F, 3F]

    grid (L, b, P//PT): l OUTERMOST so each d_W[l] block's revisits (the
    whole b x p sweep) are consecutive — Pallas only guarantees cross-grid
    accumulation for consecutively revisited output blocks (a (b, L, p)
    ordering was measured to corrupt d_W). img [1, H*W, F]."""
    def kernel(idx_ref, img_ref, w_ref, dh_ref, didx_ref, dw_ref):
        iy = idx_ref[0, 0, 0, :]
        ix = idx_ref[0, 0, 1, :]
        a = _factor_tile(iy, H, jnp.float32)
        bm = _factor_tile(ix, W, jnp.float32)
        g_l = lax.dot_general(w_ref[0], dh_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [F, PT]
        # t[(y,x), p] = sum_f img[(y,x), f] g_l[f, p]
        t = lax.dot_general(img_ref[0], g_l, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        t = t.reshape(H, W, -1)
        d_a = jnp.sum(t * bm[None, :, :], axis=1)          # [H, PT]
        d_bm = jnp.sum(t * a[:, None, :], axis=0)          # [W, PT]

        def d_frac(d_fac, i_frac, n):
            i0 = jnp.floor(i_frac)
            i1 = i0 + 1.0
            v0 = ((i0 >= 0) & (i0 <= n - 1)).astype(jnp.float32)
            v1 = ((i1 >= 0) & (i1 <= n - 1)).astype(jnp.float32)
            iota = lax.broadcasted_iota(jnp.int32, d_fac.shape, 0) \
                .astype(jnp.float32)
            sel = (iota == i1[None, :]) * v1[None, :] \
                - (iota == i0[None, :]) * v0[None, :]
            return jnp.sum(d_fac * sel, axis=0)            # [PT]

        didx_ref[0, 0, 0, :] = d_frac(d_a, iy, H)
        didx_ref[0, 0, 1, :] = d_frac(d_bm, ix, W)

        # d_W_l[f, o] += warp[f, p] d_h2h[o, p]
        m = (a[:, None, :] * bm[None, :, :]).reshape(H * W, a.shape[-1]) \
            .astype(img_ref.dtype)
        warp = lax.dot_general(img_ref[0], m, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [F, PT]
        dw_contrib = lax.dot_general(
            warp.astype(dh_ref.dtype), dh_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [F, 3F]
        first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

        @pl.when(first)
        def _init():
            dw_ref[0] = dw_contrib

        @pl.when(jnp.logical_not(first))
        def _acc():
            dw_ref[0] += dw_contrib
    return kernel


def _warpret_eligible(iy, img):
    if jax.default_backend() != "tpu":
        return False
    P = iy.shape[-1]
    h, w, c = img.shape[1], img.shape[2], img.shape[3]
    return P % _PT == 0 and h * w == P and h <= 256 and c % 8 == 0


@jax.custom_vjp
def warp_ret(iy, ix, img, w, bias):
    r"""Multi-flow bilinear warp fused with the 1x1 'ret' conv.

    out[b, o, p] = bias[o]
                 + sum_l sum_f w[l, f, o] * warp(img, iy[l], ix[l])[b, f, p]

    i.e. exactly ``ret_conv(concat_l warp_l)`` with channel-major output
    (reference semantics: ``vp_suite/model_blocks/traj_gru.py:198-207``).

    Args:
        iy, ix: [b, L, P] f32 fractional sample indices.
        img: [b, h, w, f].
        w: [L, f, O] ret weights (O = 3f for TrajGRU).
        bias: [O].
    Returns: [b, O, P] in img.dtype.
    """
    return _warpret_fwd_impl(iy, ix, img, w, bias)


def _warpret_fwd_impl(iy, ix, img, w, bias):
    if _warpret_eligible(iy, img):
        return _warpret_pallas(iy, ix, img, w, bias)
    warped = warp_sample(iy, ix, img)                      # [b, L, f, P]
    out = jnp.einsum("blfp,lfo->bop", warped.astype(jnp.float32),
                     w.astype(jnp.float32))
    return (out + bias.astype(jnp.float32)[None, :, None]).astype(img.dtype)


def _warpret_pallas(iy, ix, img, w, bias):
    from jax.experimental.pallas import tpu as pltpu
    b, L, P = iy.shape
    _, h, ww, f = img.shape
    O = w.shape[-1]
    idx = jnp.stack([iy, ix], axis=2)                      # [b, L, 2, P]
    img2 = img.transpose(0, 3, 1, 2).reshape(b, f, h * ww)
    return pl.pallas_call(
        _make_warpret_fwd_kernel(h, ww, L),
        grid=(b, P // _PT, L),
        in_specs=[
            pl.BlockSpec((1, 1, 2, _PT), lambda bi, pi, li: (bi, li, 0, pi)),
            pl.BlockSpec((1, f, h * ww), lambda bi, pi, li: (bi, 0, 0)),
            pl.BlockSpec((1, f, O), lambda bi, pi, li: (li, 0, 0)),
            pl.BlockSpec((1, O), lambda bi, pi, li: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, O, _PT), lambda bi, pi, li: (bi, 0, pi)),
        out_shape=jax.ShapeDtypeStruct((b, O, P), img.dtype),
        scratch_shapes=[pltpu.VMEM((O, _PT), jnp.float32)],
    )(idx, img2, w.astype(img.dtype), bias.reshape(1, O).astype(jnp.float32))


def _warpret_fwd(iy, ix, img, w, bias):
    return _warpret_fwd_impl(iy, ix, img, w, bias), (iy, ix, img, w, bias)


def _warpret_bwd(res, g):
    iy, ix, img, w, bias = res
    if _warpret_eligible(iy, img):
        b, L, P = iy.shape
        _, h, ww, f = img.shape
        O = w.shape[-1]
        idx = jnp.stack([iy, ix], axis=2)
        w_c = w.astype(img.dtype)
        g_c = g.astype(img.dtype)                          # [b, O, P]
        img_flat = img.reshape(b, h * ww, f)
        d_img = pl.pallas_call(
            _make_warpret_dimg_kernel(h, ww),
            grid=(b, L, P // _PT),
            in_specs=[
                pl.BlockSpec((1, 1, 2, _PT), lambda bi, li, pi: (bi, li, 0, pi)),
                pl.BlockSpec((1, f, O), lambda bi, li, pi: (li, 0, 0)),
                pl.BlockSpec((1, O, _PT), lambda bi, li, pi: (bi, 0, pi)),
            ],
            out_specs=pl.BlockSpec((1, h * ww, f), lambda bi, li, pi: (bi, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h * ww, f), jnp.float32),
        )(idx, w_c, g_c)
        d_idx, d_w = pl.pallas_call(
            _make_warpret_didx_dw_kernel(h, ww),
            grid=(L, b, P // _PT),
            in_specs=[
                pl.BlockSpec((1, 1, 2, _PT), lambda li, bi, pi: (bi, li, 0, pi)),
                pl.BlockSpec((1, h * ww, f), lambda li, bi, pi: (bi, 0, 0)),
                pl.BlockSpec((1, f, O), lambda li, bi, pi: (li, 0, 0)),
                pl.BlockSpec((1, O, _PT), lambda li, bi, pi: (bi, 0, pi)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 2, _PT), lambda li, bi, pi: (bi, li, 0, pi)),
                pl.BlockSpec((1, f, O), lambda li, bi, pi: (li, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, L, 2, P), jnp.float32),
                jax.ShapeDtypeStruct((L, f, O), jnp.float32),
            ],
        )(idx, img_flat, w_c, g_c)
        d_bias = jnp.sum(g.astype(jnp.float32), axis=(0, 2))
        return (d_idx[:, :, 0], d_idx[:, :, 1],
                d_img.reshape(b, h, ww, f).astype(img.dtype),
                d_w.astype(w.dtype), d_bias.astype(bias.dtype))

    def fallback(iy_, ix_, img_, w_, bias_):
        warped = warp_sample(iy_, ix_, img_)
        out = jnp.einsum("blfp,lfo->bop", warped.astype(jnp.float32),
                         w_.astype(jnp.float32))
        return (out + bias_.astype(jnp.float32)[None, :, None]) \
            .astype(img_.dtype)
    _, vjp = jax.vjp(fallback, iy, ix, img, w, bias)
    return vjp(g)


warp_ret.defvjp(_warpret_fwd, _warpret_bwd)
