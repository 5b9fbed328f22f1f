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

TPU note: the 4-gate conv output ``[b, h, w, 4c]`` is split into four
separate ``[b, h, w, c]`` operands OUTSIDE the kernel (XLA fuses the slices
into the conv epilogue) — in-kernel slicing along the lane dimension at
non-128-aligned offsets fails Mosaic verification. Grid tiles over
(batch, h-blocks); the channel dim rides the 128-wide vector lanes.
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h, w, c, dtype_bytes=4, budget=10 * 1024 * 1024):
    r"""Pick an h-tile so the working set stays under the 16M scoped-VMEM
    limit: up to 15 block operands/outputs (bwd kernel), double-buffered by
    the pipeline → ~32 block-sized buffers."""
    th = h
    while th > 1 and th * w * c * dtype_bytes * 32 > budget:
        th //= 2
    return max(th, 1)


def _fwd_kernel(gi_ref, gf_ref, gc_ref, go_ref, c_ref, wci_ref, wcf_ref, wco_ref,
                h_out_ref, c_out_ref):
    # compute internally in f32 (bf16 transcendentals trip Mosaic's verifier)
    dt = c_ref.dtype
    f32 = jnp.float32
    c = c_ref[...].astype(f32)
    wci = wci_ref[...].astype(f32)
    wcf = wcf_ref[...].astype(f32)
    wco = wco_ref[...].astype(f32)
    i = jax.nn.sigmoid(gi_ref[...].astype(f32) + wci * c)
    f = jax.nn.sigmoid(gf_ref[...].astype(f32) + wcf * c)
    c_new = f * c + i * jnp.tanh(gc_ref[...].astype(f32))
    o = jax.nn.sigmoid(go_ref[...].astype(f32) + wco * c_new)
    h_out_ref[...] = (o * jnp.tanh(c_new)).astype(dt)
    c_out_ref[...] = c_new.astype(dt)


def _bwd_kernel(gi_ref, gf_ref, gc_ref, go_ref, c_ref, wci_ref, wcf_ref, wco_ref,
                dh_ref, dc_out_ref,
                dzi_ref, dzf_ref, dgc_ref, dzo_ref, dc_in_ref):
    r"""Recomputes forward activations; emits per-gate pre-activation grads and
    dc_in. Peephole grads are batch-reductions done outside (XLA)."""
    dt = c_ref.dtype
    f32 = jnp.float32
    c = c_ref[...].astype(f32)
    wci = wci_ref[...].astype(f32)
    wcf = wcf_ref[...].astype(f32)
    wco = wco_ref[...].astype(f32)
    dh = dh_ref[...].astype(f32)
    dc_out = dc_out_ref[...].astype(f32)

    i = jax.nn.sigmoid(gi_ref[...].astype(f32) + wci * c)
    f = jax.nn.sigmoid(gf_ref[...].astype(f32) + wcf * c)
    g = jnp.tanh(gc_ref[...].astype(f32))
    c_new = f * c + i * g
    o = jax.nn.sigmoid(go_ref[...].astype(f32) + wco * c_new)
    t2 = jnp.tanh(c_new)

    dzo = dh * t2 * o * (1.0 - o)
    dc2 = dc_out + dh * o * (1.0 - t2 * t2) + dzo * wco
    dzi = dc2 * g * i * (1.0 - i)
    dzf = dc2 * c * f * (1.0 - f)
    dgc = dc2 * i * (1.0 - g * g)

    dzi_ref[...] = dzi.astype(dt)
    dzf_ref[...] = dzf.astype(dt)
    dgc_ref[...] = dgc.astype(dt)
    dzo_ref[...] = dzo.astype(dt)
    dc_in_ref[...] = (dc2 * f + dzi * wci + dzf * wcf).astype(dt)


def _specs(b, h, w, c, th):
    grid = (b, pl.cdiv(h, th))
    x_spec = pl.BlockSpec((1, th, w, c), lambda ib, ih: (ib, ih, 0, 0),
                          memory_space=pltpu.VMEM)
    peep_spec = pl.BlockSpec((th, w, c), lambda ib, ih: (ih, 0, 0),
                             memory_space=pltpu.VMEM)
    return grid, x_spec, peep_spec


def _split_gates(gates):
    c = gates.shape[-1] // 4
    return (gates[..., 0 * c:1 * c], gates[..., 1 * c:2 * c],
            gates[..., 2 * c:3 * c], gates[..., 3 * c:4 * c])


def _fwd_call(gates, c, wci, wcf, wco):
    b, h, w, cdim = c.shape
    th = _pick_th(h, w, cdim)
    grid, x_spec, peep_spec = _specs(b, h, w, cdim, th)
    gi, gf, gc, go = _split_gates(gates)
    h_new, c_new = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[x_spec] * 5 + [peep_spec] * 3,
        out_specs=[x_spec, x_spec],
        out_shape=[jax.ShapeDtypeStruct(c.shape, c.dtype),
                   jax.ShapeDtypeStruct(c.shape, c.dtype)],
    )(gi, gf, gc, go, c, wci, wcf, wco)
    return h_new, c_new


@jax.custom_vjp
def convlstm_gate_fuse(gates, c, wci, wcf, wco):
    r"""Fused ConvLSTM gate/peephole block. gates [b,h,w,4c] (i,f,c,o);
    returns (h_new, c_new)."""
    return _fwd_call(gates, c, wci, wcf, wco)


def _vjp_fwd(gates, c, wci, wcf, wco):
    out = _fwd_call(gates, c, wci, wcf, wco)
    return out, (gates, c, wci, wcf, wco, out[1])


def _vjp_bwd(residuals, cotangents):
    gates, c, wci, wcf, wco, c_new = residuals
    dh, dc_out = cotangents
    b, h, w, cdim = c.shape
    th = _pick_th(h, w, cdim)
    grid, x_spec, peep_spec = _specs(b, h, w, cdim, th)
    gi, gf, gc, go = _split_gates(gates)
    dzi, dzf, dgc, dzo, dc_in = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[x_spec] * 5 + [peep_spec] * 3 + [x_spec] * 2,
        out_specs=[x_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct(c.shape, c.dtype)] * 5,
    )(gi, gf, gc, go, c, wci, wcf, wco, dh, dc_out)
    dgates = jnp.concatenate([dzi, dzf, dgc, dzo], axis=-1)
    # peephole grads: batch reductions (XLA fuses these)
    dwci = jnp.sum(dzi * c, axis=0)
    dwcf = jnp.sum(dzf * c, axis=0)
    dwco = jnp.sum(dzo * c_new, axis=0)
    return dgates, dc_in, dwci, dwcf, dwco


convlstm_gate_fuse.defvjp(_vjp_fwd, _vjp_bwd)


def convlstm_gate_reference(gates, c, wci, wcf, wco):
    r"""Plain-XLA version (for equivalence testing and as fallback)."""
    gi, gf, gc, go = _split_gates(gates)
    i = jax.nn.sigmoid(gi + wci * c)
    f = jax.nn.sigmoid(gf + wcf * c)
    c_new = f * c + i * jnp.tanh(gc)
    o = jax.nn.sigmoid(go + wco * c_new)
    return o * jnp.tanh(c_new), c_new
