r"""Pallas kernel equivalence tests (interpret mode on CPU).

The fused ConvLSTM gate/peephole kernel must match the plain-XLA math in both
forward and custom-VJP backward. On CPU, pallas_call runs in interpret mode
(patched in below); the same kernels compile with Mosaic on TPU.
"""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def _pin_warp_tile():
    r"""Pin the warp pixel tile to the 256 these interpret tests were
    written around: the production default is 512 (TPU-measured sweet spot,
    see ``pallas_warp._PT``) and direct kernel calls on the tests' 16x16
    (P=256) images would read past the block. In production the dispatch
    guards ``P % _PT == 0`` and takes the exact fallback instead."""
    from vp_suite_tpu.ops import pallas_warp as pw
    orig = pw._PT
    pw._PT = 256
    yield
    pw._PT = orig


@pytest.fixture()
def pallas_interpret():
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    import vp_suite_tpu.ops.pallas_cells as pc
    importlib.reload(pc)
    yield pc
    pl.pallas_call = orig
    importlib.reload(pc)


def _data(c=8, h=16, w=16, b=2):
    rng = np.random.default_rng(0)
    return (jnp.asarray(rng.standard_normal((b, h, w, 4 * c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32)))


def test_fused_forward_matches_reference(pallas_interpret):
    pc = pallas_interpret
    gates, c, wci, wcf, wco = _data()
    h_ref, c_ref = pc.convlstm_gate_reference(gates, c, wci, wcf, wco)
    h_out, c_out = pc.convlstm_gate_fuse(gates, c, wci, wcf, wco)
    assert np.abs(np.asarray(h_out) - np.asarray(h_ref)).max() < 1e-5
    assert np.abs(np.asarray(c_out) - np.asarray(c_ref)).max() < 1e-5


def test_fused_backward_matches_reference(pallas_interpret):
    pc = pallas_interpret
    args = _data()

    def loss(fn):
        def f(*a):
            hh, cn = fn(*a)
            return jnp.sum(hh ** 2) + 0.5 * jnp.sum(cn * cn)
        return f

    gp = jax.grad(loss(pc.convlstm_gate_fuse), argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss(pc.convlstm_gate_reference), argnums=tuple(range(5)))(*args)
    for a, b in zip(gp, gr):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4


def test_warp_kernel_matches_einsum_interpret():
    r"""The Pallas warp kernel (interpret mode) must match the einsum path."""
    from vp_suite_tpu.ops import pallas_warp as pw
    rng = np.random.default_rng(1)
    b, L, h, w, c = 2, 3, 16, 16, 8
    P = h * w  # 256: 128-divisible, kernel-eligible shape
    A = jnp.asarray(rng.random((b, L, P, h)).astype(np.float32))
    Bm = jnp.asarray(rng.random((b, L, P, w)).astype(np.float32))
    img = jnp.asarray(rng.random((b, h, w, c)).astype(np.float32))
    ref = pw._warp_contract_einsum(A, Bm, img)

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    try:
        got = pw._warp_contract_pallas(A, Bm, img)
    finally:
        pl.pallas_call = orig
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-4


def test_warp_custom_vjp_matches_autodiff():
    r"""The hand-written warp VJP must match autodiff through the einsum form."""
    from vp_suite_tpu.ops import pallas_warp as pw
    rng = np.random.default_rng(2)
    b, L, h, w, c = 2, 3, 5, 7, 4
    P = h * w  # odd shape: einsum path on every backend
    A = jnp.asarray(rng.random((b, L, P, h)).astype(np.float32))
    Bm = jnp.asarray(rng.random((b, L, P, w)).astype(np.float32))
    img = jnp.asarray(rng.random((b, h, w, c)).astype(np.float32))

    def via_custom(a, bm, i):
        return jnp.sum(pw.warp_contract(a, bm, i) ** 2)

    def via_autodiff(a, bm, i):
        return jnp.sum(pw._warp_contract_einsum(a, bm, i) ** 2)

    gc = jax.grad(via_custom, argnums=(0, 1, 2))(A, Bm, img)
    ga = jax.grad(via_autodiff, argnums=(0, 1, 2))(A, Bm, img)
    for x, y in zip(gc, ga):
        assert np.abs(np.asarray(x) - np.asarray(y)).max() < 1e-4


def test_warp_bwd_kernels_match_einsum_bwd_interpret():
    r"""The Pallas backward kernels (interpret mode) must match the
    einsum-form VJP."""
    from vp_suite_tpu.ops import pallas_warp as pw
    rng = np.random.default_rng(4)
    b, L, h, w, c = 2, 3, 16, 16, 8
    P = h * w
    A = jnp.asarray(rng.random((b, L, P, h)).astype(np.float32))
    Bm = jnp.asarray(rng.random((b, L, P, w)).astype(np.float32))
    img = jnp.asarray(rng.random((b, h, w, c)).astype(np.float32))
    g = jnp.asarray(rng.random((b, L, P, c)).astype(np.float32))
    ref = pw._warp_bwd((A, Bm, img), g)  # einsum path (CPU: _use_pallas False)

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    try:
        got = pw._warp_bwd_pallas(A, Bm, img, g)
    finally:
        pl.pallas_call = orig
    for r, q in zip(ref, got):
        assert np.abs(np.asarray(r) - np.asarray(q)).max() < 1e-4


def _interpret_pallas():
    r"""Context: force interpret mode on pl.pallas_call."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        orig = pl.pallas_call

        def patched(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)

        pl.pallas_call = patched
        try:
            yield
        finally:
            pl.pallas_call = orig
    return ctx()


def _fused_inputs(seed=5):
    rng = np.random.default_rng(seed)
    b, L, h, w, c = 2, 3, 16, 16, 8
    iy = jnp.asarray((rng.random((b, L, h * w)) * (h + 4) - 2).astype(np.float32))
    ix = jnp.asarray((rng.random((b, L, h * w)) * (w + 4) - 2).astype(np.float32))
    img = jnp.asarray(rng.random((b, h, w, c)).astype(np.float32))
    return iy, ix, img


def test_fused_warp_fwd_matches_fallback_interpret():
    r"""The fused (factors-in-VMEM) forward kernel must match the
    onehot+einsum fallback, including out-of-range samples (zero padding)."""
    from vp_suite_tpu.ops import pallas_warp as pw
    from vp_suite_tpu.ops.grid_sample import _onehot_factor
    iy, ix, img = _fused_inputs()
    A = _onehot_factor(iy, img.shape[1], img.dtype)
    Bm = _onehot_factor(ix, img.shape[2], img.dtype)
    ref = pw._warp_contract_einsum(A, Bm, img).transpose(0, 1, 3, 2)
    with _interpret_pallas():
        got = pw._warp_sample_pallas(iy, ix, img)  # [b, L, c, P]
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-4


def test_fused_warp_bwd_matches_autodiff_interpret():
    r"""The single fused backward kernel must produce d_iy/d_ix/d_img equal
    to autodiff through the factor construction + einsum contraction."""
    from vp_suite_tpu.ops import pallas_warp as pw
    from vp_suite_tpu.ops.grid_sample import _onehot_factor
    iy, ix, img = _fused_inputs(seed=6)
    rng = np.random.default_rng(7)
    b, L, P = iy.shape
    g = jnp.asarray(rng.random((b, L, img.shape[-1], P)).astype(np.float32))

    def f(iy_, ix_, img_):
        A = _onehot_factor(iy_, img_.shape[1], img_.dtype)
        Bm = _onehot_factor(ix_, img_.shape[2], img_.dtype)
        return pw._warp_contract_einsum(A, Bm, img_).transpose(0, 1, 3, 2)

    _, vjp = jax.vjp(f, iy, ix, img)
    ref = vjp(g)
    orig_elig = pw._fused_eligible
    pw._fused_eligible = lambda *a: True
    try:
        with _interpret_pallas():
            got = pw._warp_sample_bwd((iy, ix, img), g)
    finally:
        pw._fused_eligible = orig_elig
    for r, q in zip(ref, got):
        assert np.abs(np.asarray(r) - np.asarray(q)).max() < 1e-4


def test_warp_sample_fallback_matches_gather():
    r"""warp_sample's fallback path must equal the gather-form grid_sample
    composition on non-eligible shapes (CPU backend)."""
    from vp_suite_tpu.ops.grid_sample import warp_flow_multi, warp_flow
    rng = np.random.default_rng(8)
    b, h, w, c, L = 2, 9, 11, 4, 3
    img = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    flows = jnp.asarray((rng.standard_normal((b, h, w, 2 * L)) * 3).astype(np.float32))
    out = warp_flow_multi(img, flows)
    ref = jnp.concatenate([warp_flow(img, flows[..., 2 * l:2 * l + 2])
                           for l in range(L)], -1)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-4

    f1 = lambda im, fl: jnp.sum(warp_flow_multi(im, fl) ** 2)
    f2 = lambda im, fl: jnp.sum(jnp.concatenate(
        [warp_flow(im, fl[..., 2 * l:2 * l + 2]) for l in range(L)], -1) ** 2)
    g1 = jax.grad(f1, argnums=(0, 1))(img, flows)
    g2 = jax.grad(f2, argnums=(0, 1))(img, flows)
    for a, bb in zip(g1, g2):
        assert np.abs(np.asarray(a) - np.asarray(bb)).max() < 1e-4


def test_warp_ret_fwd_matches_fallback_interpret():
    r"""The warp+ret fused forward kernel must equal warp_sample + einsum
    ret contraction (the CPU fallback path)."""
    from vp_suite_tpu.ops import pallas_warp as pw
    iy, ix, img = _fused_inputs(seed=9)
    rng = np.random.default_rng(10)
    L, f = iy.shape[1], img.shape[-1]
    W = jnp.asarray((rng.random((L, f, 3 * f)) - 0.5).astype(np.float32))
    bias = jnp.asarray(rng.random((3 * f,)).astype(np.float32))
    ref = pw._warpret_fwd_impl(iy, ix, img, W, bias)  # fallback on CPU
    orig = pw._warpret_eligible
    pw._warpret_eligible = lambda *a: True
    try:
        with _interpret_pallas():
            got = pw._warpret_pallas(iy, ix, img, W, bias)
    finally:
        pw._warpret_eligible = orig
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-4


def test_warp_ret_bwd_matches_autodiff_interpret():
    r"""The warp+ret backward kernels (d_img; d_iy/d_ix + d_W) must equal
    autodiff through the fallback composition."""
    from vp_suite_tpu.ops import pallas_warp as pw
    iy, ix, img = _fused_inputs(seed=11)
    rng = np.random.default_rng(12)
    b, L, P = iy.shape
    f = img.shape[-1]
    W = jnp.asarray((rng.random((L, f, 3 * f)) - 0.5).astype(np.float32))
    bias = jnp.asarray(rng.random((3 * f,)).astype(np.float32))
    g = jnp.asarray(rng.random((b, 3 * f, P)).astype(np.float32))

    def fallback(iy_, ix_, img_, w_, bias_):
        warped = pw.warp_sample(iy_, ix_, img_)
        out = jnp.einsum("blfp,lfo->bop", warped, w_)
        return out + bias_[None, :, None]

    _, vjp = jax.vjp(fallback, iy, ix, img, W, bias)
    ref = vjp(g)
    orig = pw._warpret_eligible
    pw._warpret_eligible = lambda *a: True
    try:
        with _interpret_pallas():
            got = pw._warpret_bwd((iy, ix, img, W, bias), g)
    finally:
        pw._warpret_eligible = orig
    for r, q, name in zip(ref, got, ["d_iy", "d_ix", "d_img", "d_w", "d_bias"]):
        assert np.abs(np.asarray(r) - np.asarray(q)).max() < 1e-4, name


# --------------------------------------------------------------------- #
# Band-limited warp kernels (locality fast path)

def _band_inputs(seed=13, h=16, w=16, c=8, b=2, L=3, r=2, wild_x=True):
    r"""Inputs whose row offsets satisfy the band guard |iy - oy| <= R-1
    (column indices stay unrestricted, incl. out-of-range)."""
    rng = np.random.default_rng(seed)
    P = h * w
    oy = np.repeat(np.arange(h, dtype=np.float32), w)[None, None, :]
    dy = (rng.random((b, L, P)) * 2.0 - 1.0) * (r - 1)
    iy = jnp.asarray((oy + dy).astype(np.float32))
    span = (w + 4, -2) if wild_x else (w - 1, 0)
    ix = jnp.asarray((rng.random((b, L, P)) * span[0] + span[1]).astype(np.float32))
    img = jnp.asarray(rng.random((b, h, w, c)).astype(np.float32))
    return iy, ix, img


def _with_band_geometry(pw, pt, r):
    import contextlib

    @contextlib.contextmanager
    def ctx():
        orig = pw._PT, pw._BAND_R
        pw._PT, pw._BAND_R = pt, r
        try:
            with _interpret_pallas():
                yield
        finally:
            pw._PT, pw._BAND_R = orig
    return ctx()


def test_band_warp_fwd_matches_dense_interpret():
    r"""Band forward kernel == onehot+einsum fallback when the row-offset
    guard holds (PT=64 -> 4-row tiles, R=2 -> 8-row bands on a 16x16 img)."""
    from vp_suite_tpu.ops import pallas_warp as pw
    from vp_suite_tpu.ops.grid_sample import _onehot_factor
    iy, ix, img = _band_inputs()
    A = _onehot_factor(iy, img.shape[1], img.dtype)
    Bm = _onehot_factor(ix, img.shape[2], img.dtype)
    ref = pw._warp_contract_einsum(A, Bm, img).transpose(0, 1, 3, 2)
    with _with_band_geometry(pw, 64, 2):
        assert bool(pw._band_pred(iy, img.shape[2]))
        got = pw._warp_sample_pallas_band(iy, ix, img)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-4


def test_band_warp_bwd_matches_autodiff_interpret():
    from vp_suite_tpu.ops import pallas_warp as pw
    from vp_suite_tpu.ops.grid_sample import _onehot_factor
    iy, ix, img = _band_inputs(seed=14)
    rng = np.random.default_rng(15)
    b, L, P = iy.shape
    g = jnp.asarray(rng.random((b, L, img.shape[-1], P)).astype(np.float32))

    def f(iy_, ix_, img_):
        A = _onehot_factor(iy_, img_.shape[1], img_.dtype)
        Bm = _onehot_factor(ix_, img_.shape[2], img_.dtype)
        return pw._warp_contract_einsum(A, Bm, img_).transpose(0, 1, 3, 2)

    _, vjp = jax.vjp(f, iy, ix, img)
    ref = vjp(g)
    with _with_band_geometry(pw, 64, 2):
        got = pw._warp_sample_bwd_band(iy, ix, img, g)
    for r, q, name in zip(ref, got, ["d_iy", "d_ix", "d_img"]):
        assert np.abs(np.asarray(r) - np.asarray(q)).max() < 1e-4, name


def test_band_pred_guard():
    r"""The runtime guard: true within R-1 rows, false beyond or on NaN."""
    from vp_suite_tpu.ops import pallas_warp as pw
    iy, ix, img = _band_inputs(seed=16)
    w = img.shape[2]
    orig = pw._BAND_R
    pw._BAND_R = 2
    try:
        assert bool(pw._band_pred(iy, w))
        assert not bool(pw._band_pred(iy.at[0, 0, 5].add(3.0), w))
        assert not bool(pw._band_pred(iy.at[0, 0, 5].set(jnp.nan), w))
    finally:
        pw._BAND_R = orig


def test_warp_sample_clamp_mode_interpret():
    r"""'clamp' mode (the branch-free default): the full custom-vjp
    warp_sample equals the dense einsum reference applied to band-saturated
    row indices — exactly the reference warp for in-band flows — and its
    VJP equals autodiff through clip + dense warp (zero d_iy where
    saturated)."""
    from vp_suite_tpu.ops import pallas_warp as pw
    from vp_suite_tpu.ops.grid_sample import _onehot_factor

    def ref_fn(iy_, ix_, img_):
        A = _onehot_factor(iy_, img_.shape[1], img_.dtype)
        Bm = _onehot_factor(ix_, img_.shape[2], img_.dtype)
        return pw._warp_contract_einsum(A, Bm, img_).transpose(0, 1, 3, 2)

    iy_s, ix, img = _band_inputs(seed=18)
    iy_l = iy_s.at[1, 2, 37].add(9.0).at[0, 1, 5].add(-6.0)  # out-of-band
    orig_elig, orig_mode = pw._fused_eligible, pw._BAND_MODE
    orig_poss = pw._band_possible
    pw._fused_eligible = lambda *a: True
    # the 16x16 test geometry fails the (R*W) % 128 lane-alignment check
    # (which real shapes satisfy); interpret mode has no alignment rule
    pw._band_possible = lambda *a: True
    pw._BAND_MODE = "clamp"
    try:
        with _with_band_geometry(pw, 64, 2):
            W = img.shape[2]
            for iy in (iy_s, iy_l):
                want = ref_fn(pw._clamp_rows(iy, W), ix, img)
                got = pw.warp_sample(iy, ix, img)
                assert np.abs(np.asarray(want) - np.asarray(got)).max() < 1e-4
            # in-band == the EXACT unclamped warp
            exact = ref_fn(iy_s, ix, img)
            got_s = pw.warp_sample(iy_s, ix, img)
            assert np.abs(np.asarray(exact) - np.asarray(got_s)).max() < 1e-4

            # VJP == autodiff through clip + dense warp
            rng = np.random.default_rng(19)
            b, L, P = iy_l.shape
            g = jnp.asarray(rng.random((b, L, img.shape[-1], P)).astype(np.float32))
            _, vjp_ref = jax.vjp(
                lambda y, x, i: ref_fn(pw._clamp_rows(y, W), x, i),
                iy_l, ix, img)
            ref_grads = vjp_ref(g)
            _, vjp_got = jax.vjp(pw.warp_sample, iy_l, ix, img)
            got_grads = vjp_got(g)
            for r, q, name in zip(ref_grads, got_grads,
                                  ["d_iy", "d_ix", "d_img"]):
                assert np.abs(np.asarray(r) - np.asarray(q)).max() < 1e-4, name
            assert float(np.asarray(got_grads[0])[1, 2, 37]) == 0.0
            assert float(np.asarray(got_grads[0])[0, 1, 5]) == 0.0
    finally:
        pw._fused_eligible = orig_elig
        pw._band_possible = orig_poss
        pw._BAND_MODE = orig_mode


def test_warp_sample_cond_dispatch_interpret():
    r"""Full warp_sample with the band geometry active: the lax.cond must
    route small flows through the band kernels and large flows through the
    dense kernels, both matching the einsum fallback."""
    from vp_suite_tpu.ops import pallas_warp as pw
    from vp_suite_tpu.ops.grid_sample import _onehot_factor

    def ref_fn(iy_, ix_, img_):
        A = _onehot_factor(iy_, img_.shape[1], img_.dtype)
        Bm = _onehot_factor(ix_, img_.shape[2], img_.dtype)
        return pw._warp_contract_einsum(A, Bm, img_).transpose(0, 1, 3, 2)

    iy_s, ix, img = _band_inputs(seed=17)
    iy_l = iy_s.at[1, 2, 37].add(7.0)   # violates the guard -> dense branch
    orig_elig = pw._fused_eligible
    pw._fused_eligible = lambda *a: True
    try:
        with _with_band_geometry(pw, 64, 2):
            for iy in (iy_s, iy_l):
                want = ref_fn(iy, ix, img)
                got = jax.lax.cond(pw._band_pred(iy, img.shape[2]),
                                   pw._warp_sample_pallas_band,
                                   pw._warp_sample_pallas, iy, ix, img)
                assert np.abs(np.asarray(want) - np.asarray(got)).max() < 1e-4
    finally:
        pw._fused_eligible = orig_elig
