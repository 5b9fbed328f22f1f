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
