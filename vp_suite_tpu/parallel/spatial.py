r"""Spatially-sharded convolutions via explicit halo exchange (``shard_map``).

Why this exists: XLA's SPMD partitioner miscompiles spatially-sharded convs
two ways on this jax/XLA version (silent wrong forward under sp x tp; doubled
conv d_kernel under sp train — see :mod:`vp_suite_tpu.parallel.mesh` and the
pinning tests in ``tests/test_parallel.py``). Those bugs live in XLA's conv
partitioning/halo pass. This module SIDESTEPS that pass entirely: each conv
runs as a ``shard_map`` region — every device holds a contiguous block of
image ROWS, exchanges the ``O(kernel)`` boundary rows with its mesh
neighbours via ``ppermute`` (one ICI hop), and runs a plain LOCAL conv. XLA
never partitions a conv; it only sees per-device convs and explicit
collectives, and ``shard_map``'s transpose rules give exact gradients (the
halo rows' cotangents ppermute back to their owners).

Scope: ``conv2d`` / ``conv_transpose2d`` in
:mod:`vp_suite_tpu.model_blocks._functional` (the EF-family / recurrent-cell
conv path) consult :func:`active_spatial` and route here when a spatial
context is active. Supported geometry is the "shape-preserving modulo
stride" family every model in the zoo uses — conv: ``kh - 2*ph in [1, s]``
(H_out = H/s); convT: ``op = s + 2*p - kh`` (H_out = H*s) — with
``padding_mode='constant'`` and dilation 1. Anything else raises.

Use :func:`spatial_halo_convs` around model tracing (the flag is baked into
the traced program):

    mesh = make_mesh_nd({"data": 2, "sp": 4})
    with spatial_halo_convs(mesh):
        step = jax.jit(train_step)      # convs trace to shard_map regions
        state, metrics = step(state, sharded_batch)

Equivalence (forward AND one optimizer step) vs single-device is pinned on
the 8-CPU mesh in ``tests/test_spatial.py``.
"""
from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

_ACTIVE = None  # (mesh, axis_name) while a spatial_halo_convs context is open


def active_spatial():
    r"""The (mesh, axis_name) of the open spatial context, or None. Read at
    TRACE time by the functional conv helpers."""
    return _ACTIVE


@contextmanager
def spatial_halo_convs(mesh, axis: str = "sp"):
    r"""Routes ``_functional.conv2d/conv_transpose2d`` through the halo-
    exchange path for ops traced inside this context (no-op if the mesh's
    ``axis`` has size 1)."""
    global _ACTIVE
    if axis not in mesh.axis_names or mesh.shape[axis] <= 1:
        yield
        return
    prev, _ACTIVE = _ACTIVE, (mesh, axis)
    try:
        yield
    finally:
        _ACTIVE = prev


def _fetch_halos(xl, top, bottom, axis, n):
    r"""Neighbour boundary rows for a local block ``[n, hl, w, c]``: the
    previous shard's ``top`` bottom rows and the next shard's ``bottom`` top
    rows. Non-circular ``ppermute`` — edge shards receive ZEROS, which is
    exactly constant zero-padding at the global image border."""
    parts = []
    if top:
        down = [(i, i + 1) for i in range(n - 1)]
        parts.append(lax.ppermute(xl[:, -top:], axis, down))
    parts.append(xl)
    if bottom:
        up = [(i + 1, i) for i in range(n - 1)]
        parts.append(lax.ppermute(xl[:, :bottom], axis, up))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else xl


def _check_slab(hl, top, bottom, h, n):
    r"""Halos come from IMMEDIATE neighbours only (one ppermute hop), so each
    local slab must cover its exports; and 1-row slabs CHECK-crash XLA:CPU's
    algebraic simplifier when it transposes the local conv for the gradient,
    so the practical floor is 2 rows per shard."""
    if hl < 2 or top > hl or bottom > hl:
        raise ValueError(
            f"spatial axis too fine for this layer: H={h} over {n} shards "
            f"leaves {hl} row(s) per device (halo needs top={top}, "
            f"bottom={bottom}, floor is 2 rows). Use a smaller sp axis or a "
            f"larger image.")


def _check_conv_geometry(kh, s, p):
    if not (1 <= kh - 2 * p <= s):
        raise NotImplementedError(
            f"spatial halo conv supports kh - 2*ph in [1, stride] "
            f"(H_out = H/stride); got kh={kh}, stride={s}, ph={p}")


def halo_conv2d(x, kernel, bias, stride, padding, mesh, axis):
    r"""Global-view NHWC conv with H sharded over ``mesh[axis]``: shard_map
    region = halo exchange + local conv. Geometry: see module doc."""
    from vp_suite_tpu.nn.layers import _pair
    s, p = _pair(stride), _pair(padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    _check_conv_geometry(kh, s[0], p[0])
    n = mesh.shape[axis]
    hl = x.shape[1] // n
    if hl % s[0]:
        raise ValueError(f"local row block {x.shape[1]}/{n} must be divisible "
                         f"by stride {s[0]}")
    top = p[0]
    bottom = max(0, kh - s[0] - p[0])
    _check_slab(hl, top, bottom, x.shape[1], n)
    pad_b = kh - s[0] - p[0] - bottom  # <= 0: negative padding crops

    def local(xl, k):
        xh = _fetch_halos(xl, top, bottom, axis, n)
        return lax.conv_general_dilated(
            xh, k.astype(xl.dtype), window_strides=s,
            padding=[(0, pad_b), (p[1], p[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    spec = P(None, axis, None, None)
    y = _shard_mapped(local, mesh, axis, spec)(x, kernel)
    return y if bias is None else y + bias.astype(x.dtype)


def halo_conv_transpose2d(x, kernel, bias, stride, padding, output_padding,
                          mesh, axis):
    r"""Global-view NHWC transposed conv (torch semantics) with H sharded
    over ``mesh[axis]``. Requires ``op = s + 2p - kh`` (H_out = H*s)."""
    from vp_suite_tpu.nn.layers import _pair
    s, p, op = _pair(stride), _pair(padding), _pair(output_padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    if op[0] != s[0] + 2 * p[0] - kh:
        raise NotImplementedError(
            f"spatial halo convT supports output_padding = stride + 2*pad - kh "
            f"(H_out = H*stride); got kh={kh}, s={s[0]}, p={p[0]}, op={op[0]}")
    n = mesh.shape[axis]
    hl = x.shape[1] // n
    # input halo rows needed so every local output row's (dilated) window is
    # in range: top rt covers the kh-1-p look-back, bottom rb the p look-ahead
    rt = -(-(kh - 1 - p[0]) // s[0])          # ceil
    rb = (p[0] - 1) // s[0] + 1 if p[0] >= 1 else 0
    _check_slab(hl, rt, rb, x.shape[1], n)
    # local conv over the dilated padded block must emit exactly hl*s rows
    # aligned to this shard's slab: fold the crop into (possibly negative)
    # conv padding
    pt = (kh - 1 - p[0]) - rt * s[0]
    dil_len = (rt + hl + rb - 1) * s[0] + 1
    pb = hl * s[0] - (dil_len + pt - kh + 1)
    # negative padding would CROP — legal HLO, but XLA:CPU's algebraic
    # simplifier CHECK-fails transposing a negative-pad dilated conv (grad
    # path). Pad non-negatively and slice the slab out instead.
    crop_t, crop_b = max(0, -pt), max(0, -pb)
    pt, pb = pt + crop_t, pb + crop_b
    flipped = jnp.flip(kernel, axis=(0, 1))

    def local(xl, k):
        xh = _fetch_halos(xl, rt, rb, axis, n)
        y = lax.conv_general_dilated(
            xh, k.astype(xl.dtype), window_strides=(1, 1),
            padding=[(pt, pb), (kw - 1 - p[1], kw - 1 - p[1] + op[1])],
            lhs_dilation=s,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, crop_t:y.shape[1] - crop_b]

    spec = P(None, axis, None, None)
    y = _shard_mapped(local, mesh, axis, spec)(x, flipped)
    return y if bias is None else y + bias.astype(x.dtype)


def _shard_mapped(fn, mesh, axis, io_spec):
    r"""Wraps ``fn(x_local, kernel)`` as a shard_map that is MANUAL
    over ``axis`` only: activations sharded on rows, params replicated.
    Other mesh axes (e.g. 'data') stay auto, so GSPMD keeps partitioning the
    batch dim across them as usual."""
    return jax.shard_map(fn, mesh=mesh, axis_names={axis},
                         in_specs=(io_spec, P()), out_specs=io_spec)
