r"""Pallas TPU kernels for the hot recurrent-cell elementwise blocks.

The ConvLSTM scan body is two parts: the hidden-half convolution (left to XLA
— it lowers onto the MXU) and the gate/peephole elementwise chain
(sigmoid/tanh/multiply over 6 arrays). This module fuses the latter into one
VMEM-resident Pallas kernel with a custom VJP whose backward pass is also a
single kernel (recomputing activations instead of saving them — the same
FLOPs-for-HBM trade as the scan-level remat).

Math (Shi ConvLSTM, reference ``conv_lstm_hzzone.py:62-68``):
    i = σ(gi + wci*c);  f = σ(gf + wcf*c)
    c' = f*c + i*tanh(gc)
    o = σ(go + wco*c');  h = o*tanh(c')

Layouts: gates [b, h, w, 4c] (i, f, c, o), c [b, h, w, c],
peepholes [h, w, c]. Grid tiles over (batch, h-blocks); the channel dim rides
the 128-wide vector lanes.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h, w, c, dtype_bytes=4, budget=6 * 1024 * 1024):
    r"""Pick an h-tile so the working set (gates + c + outs + peepholes)
    stays well under VMEM."""
    th = h
    while th > 1 and th * w * c * dtype_bytes * 8 > budget:
        th //= 2
    return max(th, 1)


def _fwd_kernel(gates_ref, c_ref, wci_ref, wcf_ref, wco_ref, h_out_ref, c_out_ref):
    gates = gates_ref[0]
    c = c_ref[0]
    wci = wci_ref[...]
    wcf = wcf_ref[...]
    wco = wco_ref[...]
    cdim = c.shape[-1]
    gi = gates[..., 0 * cdim:1 * cdim]
    gf = gates[..., 1 * cdim:2 * cdim]
    gc = gates[..., 2 * cdim:3 * cdim]
    go = gates[..., 3 * cdim:4 * cdim]
    i = jax.nn.sigmoid(gi + wci * c)
    f = jax.nn.sigmoid(gf + wcf * c)
    c_new = f * c + i * jnp.tanh(gc)
    o = jax.nn.sigmoid(go + wco * c_new)
    h_out_ref[0] = o * jnp.tanh(c_new)
    c_out_ref[0] = c_new


def _bwd_kernel(gates_ref, c_ref, wci_ref, wcf_ref, wco_ref, dh_ref, dc_out_ref,
                dgates_ref, dc_in_ref):
    r"""Recomputes the forward activations and emits (dgates, dc_in).
    Peephole gradients are reduced outside (cheap XLA reduction over batch)."""
    gates = gates_ref[0]
    c = c_ref[0]
    wci = wci_ref[...]
    wcf = wcf_ref[...]
    wco = wco_ref[...]
    dh = dh_ref[0]
    dc_out = dc_out_ref[0]
    cdim = c.shape[-1]
    gi = gates[..., 0 * cdim:1 * cdim]
    gf = gates[..., 1 * cdim:2 * cdim]
    gc = gates[..., 2 * cdim:3 * cdim]
    go = gates[..., 3 * cdim:4 * cdim]

    i = jax.nn.sigmoid(gi + wci * c)
    f = jax.nn.sigmoid(gf + wcf * c)
    g = jnp.tanh(gc)
    c_new = f * c + i * g
    o = jax.nn.sigmoid(go + wco * c_new)
    t2 = jnp.tanh(c_new)

    dzo = dh * t2 * o * (1.0 - o)
    dc2 = dc_out + dh * o * (1.0 - t2 * t2) + dzo * wco
    dzi = dc2 * g * i * (1.0 - i)
    dzf = dc2 * c * f * (1.0 - f)
    dgc = dc2 * i * (1.0 - g * g)
    dc_in = dc2 * f + dzi * wci + dzf * wcf

    dgates_ref[0] = jnp.concatenate([dzi, dzf, dgc, dzo], axis=-1)
    dc_in_ref[0] = dc_in


def _block_specs(b, h, w, c, th):
    r"""(in_specs, out_specs, grid) shared by fwd and bwd."""
    grid = (b, pl.cdiv(h, th))
    gates_spec = pl.BlockSpec((1, th, w, 4 * c), lambda ib, ih: (ib, ih, 0, 0),
                              memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, th, w, c), lambda ib, ih: (ib, ih, 0, 0),
                          memory_space=pltpu.VMEM)
    peep_spec = pl.BlockSpec((th, w, c), lambda ib, ih: (ih, 0, 0),
                             memory_space=pltpu.VMEM)
    return grid, gates_spec, c_spec, peep_spec


def _fwd_call(gates, c, wci, wcf, wco):
    b, h, w, cdim = c.shape
    th = _pick_th(h, w, cdim)
    grid, gates_spec, c_spec, peep_spec = _block_specs(b, h, w, cdim, th)
    h_new, c_new = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[gates_spec, c_spec, peep_spec, peep_spec, peep_spec],
        out_specs=[c_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct(c.shape, c.dtype),
                   jax.ShapeDtypeStruct(c.shape, c.dtype)],
    )(gates, c, wci, wcf, wco)
    return h_new, c_new


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def convlstm_gate_fuse(gates, c, wci, wcf, wco):
    r"""Fused ConvLSTM gate/peephole block. Returns (h_new, c_new)."""
    return _fwd_call(gates, c, wci, wcf, wco)


def _vjp_fwd(gates, c, wci, wcf, wco):
    out = _fwd_call(gates, c, wci, wcf, wco)
    return out, (gates, c, wci, wcf, wco, out[1])


def _vjp_bwd(residuals, cotangents):
    gates, c, wci, wcf, wco, c_new = residuals
    dh, dc_out = cotangents
    b, h, w, cdim = c.shape
    th = _pick_th(h, w, cdim)
    grid, gates_spec, c_spec, peep_spec = _block_specs(b, h, w, cdim, th)
    dgates, dc_in = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[gates_spec, c_spec, peep_spec, peep_spec, peep_spec,
                  c_spec, c_spec],
        out_specs=[gates_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct(gates.shape, gates.dtype),
                   jax.ShapeDtypeStruct(c.shape, c.dtype)],
    )(gates, c, wci, wcf, wco, dh, dc_out)
    # peephole grads: batch reductions (XLA fuses these)
    dzi = dgates[..., 0 * cdim:1 * cdim]
    dzf = dgates[..., 1 * cdim:2 * cdim]
    dzo = dgates[..., 3 * cdim:4 * cdim]
    dwci = jnp.sum(dzi * c, axis=0)
    dwcf = jnp.sum(dzf * c, axis=0)
    dwco = jnp.sum(dzo * c_new, axis=0)
    return dgates, dc_in, dwci, dwcf, dwco


convlstm_gate_fuse.defvjp(_vjp_fwd, _vjp_bwd)


def convlstm_gate_reference(gates, c, wci, wcf, wco):
    r"""Plain-XLA version (for equivalence testing and as fallback)."""
    cdim = c.shape[-1]
    gi, gf, gc, go = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(gi + wci * c)
    f = jax.nn.sigmoid(gf + wcf * c)
    c_new = f * c + i * jnp.tanh(gc)
    o = jax.nn.sigmoid(go + wco * c_new)
    return o * jnp.tanh(c_new), c_new
