r"""Fully-fused ConvLSTM scan: hidden conv + gates + carry in ONE Pallas kernel.

The VERDICT-r3 experiment (three rounds deferred): fuse the ConvLSTM cell's
hidden-half convolution AND the gate/peephole elementwise chain into a single
whole-scan kernel whose (h, c) carry lives in VMEM across all timesteps —
instead of XLA's per-step pattern (conv kernel -> gates epilogue -> h/c round
trip through HBM -> next step).

Design (see CLAUDE.md "Pallas / Mosaic lessons" for the constraints driving
it):

- grid = (b, T), T innermost: each batch item's T steps run consecutively on
  one core, so the carry persists in scratch; the ``h_last``/``c_last``
  output blocks are revisited consecutively (the cross-grid accumulation
  rule).
- The carry ``h`` is kept as a flat ``[sh*sw, enc]`` VMEM scratch. The 3x3
  conv contracts ALL taps in ONE MXU dot (XLA's im2col form, K = 9*enc):
  the 9 shifted views are built with ``pltpu.roll`` over the fused
  row index (shift dy*sw+dx) + an iota mask for the zero-padding border,
  then lane-concatenated into ``[sh*sw, 9*enc]``. A per-tap loop of 9
  small dots measured latency-bound in the warp kernels (CLAUDE.md);
  fragmenting K to enc also halves MXU utilization.
- Gate splitting: the dot output ``[sh*sw, 4*enc]`` cannot be lane-sliced at
  enc offsets (128-alignment rule, enc is 64/96 here). The weight matrix is
  instead pre-TRANSPOSED so the dot emits gates channel-major
  ``[4*enc, sh*sw]`` (dot(W_t [4enc, 9enc], im2col^T [9enc, sh*sw])) — gate
  blocks then split on the SUBLANE axis, where static enc-multiple offsets
  are legal... which would put sh*sw on lanes. Simpler and measured-safe:
  emit 4 separate dots, one per gate, K = 9*enc each (full-K utilization,
  N = enc) — K is what matters for MXU efficiency here; N = 64/96 costs
  lane padding identically in the XLA conv.
- bf16 dot inputs, f32 accumulation + f32 elementwise (bf16 transcendentals
  trip Mosaic), bf16 carry/outputs.

Forward only: the backward pass would need the reverse-scan VJP machinery of
``ops/scan_vjp.py`` plus saved gate residuals; whether to build it is gated
on this kernel's measured forward win (record-a-negative protocol).

Decode mode (inputs=None, bias-only input half) is the first target: it is
the forecaster half of the flagship and the whole of inference, where no
backward exists and XLA's per-step structure is pure overhead.
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_mask(sh, sw, dy, dx):
    r"""[sh*sw, 1] f32 mask: 1 where source pixel (y+dy-1, x+dx-1) is inside
    the image (zero-padding semantics for the rolled flat layout)."""
    rows = lax.broadcasted_iota(jnp.int32, (sh * sw, 1), 0)
    y = rows // sw + (dy - 1)
    x = rows % sw + (dx - 1)
    ok = (y >= 0) & (y < sh) & (x >= 0) & (x < sw)
    return ok.astype(jnp.float32)


def _make_scan_kernel(sh, sw, enc, seq_len, has_x, xc=0):
    r"""Kernel over grid (b, T). Scratch: h2 [sh*sw, enc] bf16, c [sh*sw, enc]
    f32. Streams per-step i2h blocks when ``has_x`` (input half precomputed
    by one batched XLA conv — its K is 9*in_c and batched over b*t, already
    optimal there); decode mode folds the bias instead."""

    def kernel(*refs):
        if has_x:
            (i2h_ref, h0_ref, c0_ref, wh_ref, bias_ref,
             wci_ref, wcf_ref, wco_ref,
             hseq_ref, hlast_ref, clast_ref, h2, c_s) = refs
        else:
            (h0_ref, c0_ref, wh_ref, bias_ref, wci_ref, wcf_ref, wco_ref,
             hseq_ref, hlast_ref, clast_ref, h2, c_s) = refs
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            h2[...] = h0_ref[0]
            c_s[...] = c0_ref[0].astype(jnp.float32)

        # --- im2col of the carry: [sh*sw, 9*enc], one roll+mask per tap ---
        hv = h2[...]
        cols = []
        for dy in range(3):
            for dx in range(3):
                shift = (dy - 1) * sw + (dx - 1)
                # pltpu.roll wants a non-negative shift; -shift mod rows is
                # the same rotation
                v = pltpu.roll(hv, (-shift) % (sh * sw), 0) if shift else hv
                cols.append(v * _shift_mask(sh, sw, dy, dx).astype(hv.dtype))
        im2col = jnp.concatenate(cols, axis=1)          # [sh*sw, 9*enc]

        f32 = jnp.float32
        c = c_s[...]
        wci = wci_ref[...].astype(f32)
        wcf = wcf_ref[...].astype(f32)
        wco = wco_ref[...].astype(f32)

        def gate(gid):
            z = jnp.dot(im2col, wh_ref[gid], preferred_element_type=f32)
            z = z + bias_ref[gid].astype(f32)
            if has_x:
                z = z + i2h_ref[0, 0, gid].astype(f32)
            return z

        gi, gf, gc, go = gate(0), gate(1), gate(2), gate(3)
        i = jax.nn.sigmoid(gi + wci * c)
        f = jax.nn.sigmoid(gf + wcf * c)
        c_new = f * c + i * jnp.tanh(gc)
        o = jax.nn.sigmoid(go + wco * c_new)
        h_new = o * jnp.tanh(c_new)

        h2[...] = h_new.astype(h2.dtype)
        c_s[...] = c_new
        hseq_ref[0, 0] = h_new.astype(hseq_ref.dtype)
        hlast_ref[0] = h_new.astype(hlast_ref.dtype)
        clast_ref[0] = c_new.astype(clast_ref.dtype)

    return kernel


def _prep_weights(h_kernel, bias, enc):
    r"""[3, 3, enc, 4*enc] -> [4, 9*enc, enc] per-gate im2col matrices (tap
    order (dy, dx) matching the kernel's concat), bias -> [4, 1, enc]."""
    w = h_kernel.reshape(9 * h_kernel.shape[2], 4, enc)  # [(dy dx cin), 4, enc]
    w = jnp.moveaxis(w, 1, 0)                            # [4, 9*enc, enc]
    b = bias.reshape(4, 1, enc)
    return w, b


@functools.partial(jax.jit, static_argnames=("seq_len", "interpret"))
def convlstm_scan_fused(i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco,
                        seq_len: int, interpret: bool = False):
    r"""Whole-scan fused ConvLSTM (FORWARD; see module doc).

    Args:
        i2h_t: [T, b, sh, sw, 4*enc] precomputed input half (time-major), or
            None (decode mode — bias-only input).
        h0, c0: [b, sh, sw, enc] initial states (loaded into the carry at
            each batch item's t=0 — the forecaster half passes the encoder's
            final states here).
        h_kernel: [3, 3, enc, 4*enc] hidden-half conv kernel (gate order
            i, f, c, o on the last axis).
        bias: [4*enc].
        wci, wcf, wco: [sh, sw, enc] peepholes.
        seq_len: T.

    Returns: (h_seq [T, b, sh, sw, enc], (h_last, c_last)).
    """
    b, sh, sw, enc = h0.shape
    dt = h0.dtype
    w4, b4 = _prep_weights(h_kernel.astype(dt), bias, enc)
    peep2 = [w.reshape(sh * sw, enc).astype(dt) for w in (wci, wcf, wco)]
    has_x = i2h_t is not None

    grid = (b, seq_len)
    flat_spec = pl.BlockSpec((1, sh * sw, enc), lambda ib, it: (ib, 0, 0),
                             memory_space=pltpu.VMEM)
    peep_spec = pl.BlockSpec((sh * sw, enc), lambda ib, it: (0, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((4, 9 * enc, enc), lambda ib, it: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((4, 1, enc), lambda ib, it: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    hseq_spec = pl.BlockSpec((1, 1, sh * sw, enc),
                             lambda ib, it: (it, ib, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [flat_spec, flat_spec, w_spec, b_spec,
                peep_spec, peep_spec, peep_spec]
    args = [h0.reshape(b, sh * sw, enc), c0.reshape(b, sh * sw, enc).astype(dt),
            w4, b4] + peep2
    if has_x:
        i2h4 = i2h_t.reshape(seq_len, b, sh * sw, 4, enc)
        i2h4 = jnp.moveaxis(i2h4, 3, 2).astype(dt)  # [T, b, 4, sh*sw, enc]
        in_specs = [pl.BlockSpec((1, 1, 4, sh * sw, enc),
                                 lambda ib, it: (it, ib, 0, 0, 0),
                                 memory_space=pltpu.VMEM)] + in_specs
        args = [i2h4] + args

    kernel = _make_scan_kernel(sh, sw, enc, seq_len, has_x)
    h_seq, h_last, c_last = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[hseq_spec, flat_spec, flat_spec],
        out_shape=[jax.ShapeDtypeStruct((seq_len, b, sh * sw, enc), dt),
                   jax.ShapeDtypeStruct((b, sh * sw, enc), dt),
                   jax.ShapeDtypeStruct((b, sh * sw, enc), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((sh * sw, enc), dt),
                        pltpu.VMEM((sh * sw, enc), jnp.float32)],
        interpret=interpret,
    )(*args)
    h_seq = h_seq.reshape(seq_len, b, sh, sw, enc)
    return h_seq, (h_last.reshape(b, sh, sw, enc),
                   c_last.reshape(b, sh, sw, enc).astype(dt))
