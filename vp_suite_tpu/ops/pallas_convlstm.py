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

Training: a custom VJP. The primal (inference) call saves nothing; under
differentiation the forward additionally streams out the per-step gate
pre-activations and pre-update cells (the same residual set as the XLA
'gates' remat policy), and the backward is a second lean reverse-time
kernel — grid (b, T) walked backwards with the (dh, dc) carry in VMEM —
emitting per-gate pre-activation grads ``dz`` plus (dh0, dc0). Weight,
bias and peephole gradients are bulk XLA contractions OUTSIDE the kernel
(round-3 TrajGRU lesson: rebuilding operands in-kernel for d_W costs ~10x
more MXU than materialising the residual for one big XLA matmul; keeping
the kernel lean also keeps the VMEM working set under the double-buffering
budget — the merged-kernel regression lesson).
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


#: Per-kernel VMEM budget. The default scoped limit (16M) OOMs at the 64x64
#: flagship layer (measured: 25.45M needed — f32 roll temps + the 9-tap
#: im2col + 4 f32 gate accumulators); 64M leaves the same headroom ratio
#: while staying well under the chip's physical VMEM. NOTE: sized for the
#: v5e target (128M physical VMEM); pre-v4 generations with 16M physical
#: VMEM cannot run the 64x64 shapes regardless of this cap (ADVICE r4).
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _shift_mask(sh, sw, dy, dx):
    r"""[sh*sw, 1] f32 mask: 1 where source pixel (y+dy-1, x+dx-1) is inside
    the image (zero-padding semantics for the rolled flat layout)."""
    rows = lax.broadcasted_iota(jnp.int32, (sh * sw, 1), 0)
    y = rows // sw + (dy - 1)
    x = rows % sw + (dx - 1)
    ok = (y >= 0) & (y < sh) & (x >= 0) & (x < sw)
    return ok.astype(jnp.float32)


def _im2col_flat(v, sh, sw, flip=False):
    r"""9-tap im2col over the flat row layout: [sh*sw, c] -> [sh*sw, 9*c].
    ``flip=True`` builds the TRANSPOSED-conv gathering (reflected taps) used
    by the backward pass.

    Rolls run in f32: Mosaic's ``tpu.dynamic_rotate`` only supports 32-bit
    element types on real hardware ("Rotate with non-32-bit data" compile
    error; interpret mode silently accepts bf16). Each tap casts back to
    ``v.dtype`` immediately, so the concatenated im2col stays bf16-sized."""
    out_dt = v.dtype
    v = v.astype(jnp.float32)
    cols = []
    for dy in range(3):
        for dx in range(3):
            shift = (dy - 1) * sw + (dx - 1)
            if flip:
                roll_by = shift % (sh * sw)
                mask = _shift_mask(sh, sw, 2 - dy, 2 - dx)
            else:
                roll_by = (-shift) % (sh * sw)
                mask = _shift_mask(sh, sw, dy, dx)
            # pltpu.roll wants a non-negative shift
            rolled = pltpu.roll(v, roll_by, 0) if roll_by else v
            cols.append((rolled * mask).astype(out_dt))
    return jnp.concatenate(cols, axis=1)


def _make_scan_kernel(sh, sw, enc, seq_len, has_x, save_gates=False):
    r"""Kernel over grid (b, T). Scratch: h2 [sh*sw, enc] bf16, c [sh*sw, enc]
    f32. Streams per-step i2h blocks when ``has_x`` (input half precomputed
    by one batched XLA conv — its K is 9*in_c and batched over b*t, already
    optimal there); decode mode folds the bias instead. ``save_gates``
    additionally streams out the per-step gate pre-activations and pre-update
    cell (training residuals)."""

    def kernel(*refs):
        refs = list(refs)
        i2h_ref = refs.pop(0) if has_x else None
        (h0_ref, c0_ref, wh_ref, bias_ref, wci_ref, wcf_ref, wco_ref) = \
            refs[:7]
        outs = refs[7:]
        hseq_ref, hlast_ref, clast_ref = outs[:3]
        if save_gates:
            gseq_ref, cprev_ref = outs[3:5]
            h2, c_s = outs[5:]
        else:
            h2, c_s = outs[3:]
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            h2[...] = h0_ref[0]
            c_s[...] = c0_ref[0].astype(jnp.float32)

        # im2col of the carry: [sh*sw, 9*enc] (one roll+mask per tap, one
        # full-K MXU dot per gate)
        im2col = _im2col_flat(h2[...], sh, sw)

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
        if save_gates:
            cprev_ref[0, 0] = c.astype(cprev_ref.dtype)
            for gid, z in enumerate((gi, gf, gc, go)):
                gseq_ref[0, 0, gid] = z.astype(gseq_ref.dtype)
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


def _make_bwd_kernel(sh, sw, enc, seq_len):
    r"""Reverse-time backward: grid (b, T) with index maps walking t from
    T-1 down to 0; (dh, dc) carry in VMEM scratch. Emits per-gate
    pre-activation grads ``dz`` and the initial-state grads; weight/bias/
    peephole grads are bulk XLA contractions outside (lean-kernel rule)."""

    def kernel(g_ref, cprev_ref, dhseq_ref, dhlast_ref, dclast_ref,
               w4t_ref, wci_ref, wcf_ref, wco_ref,
               dz_ref, dh0_ref, dc0_ref, dh_s, dc_s):
        it = pl.program_id(1)
        f32 = jnp.float32

        @pl.when(it == 0)
        def _():
            dh_s[...] = dhlast_ref[0].astype(f32)
            dc_s[...] = dclast_ref[0].astype(f32)

        c = cprev_ref[0, 0].astype(f32)
        wci = wci_ref[...].astype(f32)
        wcf = wcf_ref[...].astype(f32)
        wco = wco_ref[...].astype(f32)
        gi = g_ref[0, 0, 0].astype(f32)
        gf = g_ref[0, 0, 1].astype(f32)
        gc = g_ref[0, 0, 2].astype(f32)
        go = g_ref[0, 0, 3].astype(f32)

        i = jax.nn.sigmoid(gi + wci * c)
        f = jax.nn.sigmoid(gf + wcf * c)
        g = jnp.tanh(gc)
        c_new = f * c + i * g
        o = jax.nn.sigmoid(go + wco * c_new)
        t2 = jnp.tanh(c_new)

        dh = dh_s[...] + dhseq_ref[0, 0].astype(f32)
        dzo = dh * t2 * o * (1.0 - o)
        dc2 = dc_s[...] + dh * o * (1.0 - t2 * t2) + dzo * wco
        dzi = dc2 * g * i * (1.0 - i)
        dzf = dc2 * c * f * (1.0 - f)
        dgc = dc2 * i * (1.0 - g * g)

        # dh_prev: transposed conv of the gate grads (flipped-tap im2col,
        # one full-K dot per gate)
        dt = dz_ref.dtype
        dh_prev = jnp.zeros((sh * sw, enc), f32)
        for gid, dz in enumerate((dzi, dzf, dgc, dzo)):
            dzb = dz.astype(dt)
            dz_ref[0, 0, gid] = dzb
            flip = _im2col_flat(dzb, sh, sw, flip=True)
            dh_prev = dh_prev + jnp.dot(flip, w4t_ref[gid],
                                        preferred_element_type=f32)

        dc_next = dc2 * f + dzi * wci + dzf * wcf
        dh_s[...] = dh_prev
        dc_s[...] = dc_next
        dh0_ref[0] = dh_prev.astype(dh0_ref.dtype)
        dc0_ref[0] = dc_next.astype(dc0_ref.dtype)

    return kernel


def _prep_weights(h_kernel, bias, enc):
    r"""[3, 3, enc, 4*enc] -> [4, 9*enc, enc] per-gate im2col matrices (tap
    order (dy, dx) matching the kernel's concat), bias -> [4, 1, enc]."""
    w = h_kernel.reshape(9 * h_kernel.shape[2], 4, enc)  # [(dy dx cin), 4, enc]
    w = jnp.moveaxis(w, 1, 0)                            # [4, 9*enc, enc]
    b = bias.reshape(4, 1, enc)
    return w, b


def _fwd_call(i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco,
              seq_len, interpret, save_gates):
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
    gseq_spec = pl.BlockSpec((1, 1, 4, sh * sw, enc),
                             lambda ib, it: (it, ib, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [flat_spec, flat_spec, w_spec, b_spec,
                peep_spec, peep_spec, peep_spec]
    args = [h0.reshape(b, sh * sw, enc), c0.reshape(b, sh * sw, enc).astype(dt),
            w4, b4] + peep2
    if has_x:
        i2h4 = i2h_t.reshape(seq_len, b, sh * sw, 4, enc)
        i2h4 = jnp.moveaxis(i2h4, 3, 2).astype(dt)  # [T, b, 4, sh*sw, enc]
        in_specs = [gseq_spec] + in_specs
        args = [i2h4] + args

    out_specs = [hseq_spec, flat_spec, flat_spec]
    out_shape = [jax.ShapeDtypeStruct((seq_len, b, sh * sw, enc), dt),
                 jax.ShapeDtypeStruct((b, sh * sw, enc), dt),
                 jax.ShapeDtypeStruct((b, sh * sw, enc), jnp.float32)]
    if save_gates:
        out_specs += [gseq_spec,
                      pl.BlockSpec((1, 1, sh * sw, enc),
                                   lambda ib, it: (it, ib, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((seq_len, b, 4, sh * sw, enc), dt),
                      jax.ShapeDtypeStruct((seq_len, b, sh * sw, enc), dt)]

    kernel = _make_scan_kernel(sh, sw, enc, seq_len, has_x,
                               save_gates=save_gates)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((sh * sw, enc), dt),
                        pltpu.VMEM((sh * sw, enc), jnp.float32)],
        # the f32 roll temps + 9-tap im2col + 4 gate accumulators exceed the
        # default 16M scoped-vmem budget at 64x64 (25.45M measured OOM);
        # raise the cap for this kernel (v5e VMEM is far larger)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(*args)
    h_seq, h_last, c_last = outs[:3]
    h_seq = h_seq.reshape(seq_len, b, sh, sw, enc)
    result = (h_seq, (h_last.reshape(b, sh, sw, enc),
                      c_last.reshape(b, sh, sw, enc).astype(dt)))
    if save_gates:
        return result, (outs[3], outs[4])  # gates_seq, cprev_seq (flat)
    return result


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _scan_fused(i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco,
                seq_len, interpret):
    return _fwd_call(i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco,
                     seq_len, interpret, save_gates=False)


def _scan_fused_fwd(i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco,
                    seq_len, interpret):
    result, (gates_seq, cprev_seq) = _fwd_call(
        i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco,
        seq_len, interpret, save_gates=True)
    h_seq, (h_last, c_last) = result
    res = (gates_seq, cprev_seq, h_seq, h0, c_last,
           h_kernel, bias, wci, wcf, wco, i2h_t is not None)
    return result, res


def _scan_fused_bwd(seq_len, interpret, res, cotangents):
    from vp_suite_tpu.model_blocks._functional import conv2d

    (gates_seq, cprev_seq, h_seq, h0, c_last,
     h_kernel, bias, wci, wcf, wco, has_x) = res
    dh_seq, (dh_last, dc_last) = cotangents
    b, sh, sw, enc = h0.shape
    dt = h0.dtype
    f32 = jnp.float32

    # per-gate transposed im2col weights [4, 9*enc_out, enc_in]
    w4, _ = _prep_weights(h_kernel.astype(dt), jnp.zeros((4 * enc,), f32), enc)
    w4t = jnp.moveaxis(w4.reshape(4, 9, enc, enc), 2, 3).reshape(4, 9 * enc, enc)

    peep2 = [w.reshape(sh * sw, enc).astype(dt) for w in (wci, wcf, wco)]
    grid = (b, seq_len)
    rev = seq_len - 1
    gseq_spec = pl.BlockSpec((1, 1, 4, sh * sw, enc),
                             lambda ib, it: (rev - it, ib, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    tseq_spec = pl.BlockSpec((1, 1, sh * sw, enc),
                             lambda ib, it: (rev - it, ib, 0, 0),
                             memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, sh * sw, enc), lambda ib, it: (ib, 0, 0),
                             memory_space=pltpu.VMEM)
    peep_spec = pl.BlockSpec((sh * sw, enc), lambda ib, it: (0, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((4, 9 * enc, enc), lambda ib, it: (0, 0, 0),
                          memory_space=pltpu.VMEM)

    kernel = _make_bwd_kernel(sh, sw, enc, seq_len)
    dz_seq, dh0, dc0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[gseq_spec, tseq_spec, tseq_spec, flat_spec, flat_spec,
                  w_spec, peep_spec, peep_spec, peep_spec],
        out_specs=[gseq_spec, flat_spec, flat_spec],
        out_shape=[jax.ShapeDtypeStruct((seq_len, b, 4, sh * sw, enc), dt),
                   jax.ShapeDtypeStruct((b, sh * sw, enc), f32),
                   jax.ShapeDtypeStruct((b, sh * sw, enc), f32)],
        scratch_shapes=[pltpu.VMEM((sh * sw, enc), f32),
                        pltpu.VMEM((sh * sw, enc), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(gates_seq, cprev_seq,
      dh_seq.reshape(seq_len, b, sh * sw, enc).astype(dt),
      dh_last.reshape(b, sh * sw, enc).astype(dt),
      dc_last.reshape(b, sh * sw, enc).astype(dt),
      w4t, *peep2)

    # bulk XLA contractions for the remaining grads (lean-kernel rule):
    # dz back to the conv layout [T*b, sh, sw, 4*enc], gate blocks on channels
    dz_conv = jnp.moveaxis(dz_seq, 2, 3).reshape(seq_len * b, sh, sw, 4 * enc)
    h_prev = jnp.concatenate([h0[None], h_seq[:-1]], axis=0) \
        .reshape(seq_len * b, sh, sw, enc)
    _, kernel_vjp = jax.vjp(
        lambda k: conv2d(h_prev, k.astype(dt), None, 1, 1), h_kernel)
    d_h_kernel, = kernel_vjp(dz_conv)
    d_bias = jnp.sum(dz_conv.astype(f32), axis=(0, 1, 2)) \
        .astype(bias.dtype)

    dz_f = dz_seq.astype(f32)
    cprev_f = cprev_seq.astype(f32)
    cnew_f = jnp.concatenate(
        [cprev_f[1:], c_last.reshape(1, b, sh * sw, enc).astype(f32)], axis=0)
    d_wci = jnp.sum(dz_f[:, :, 0] * cprev_f, axis=(0, 1)).reshape(sh, sw, enc)
    d_wcf = jnp.sum(dz_f[:, :, 1] * cprev_f, axis=(0, 1)).reshape(sh, sw, enc)
    d_wco = jnp.sum(dz_f[:, :, 3] * cnew_f, axis=(0, 1)).reshape(sh, sw, enc)

    d_i2h = None
    if has_x:
        d_i2h = jnp.moveaxis(dz_seq, 2, 3) \
            .reshape(seq_len, b, sh, sw, 4 * enc).astype(dt)
    return (d_i2h, dh0.reshape(b, sh, sw, enc).astype(dt),
            dc0.reshape(b, sh, sw, enc).astype(dt),
            d_h_kernel.astype(h_kernel.dtype), d_bias,
            d_wci.astype(wci.dtype), d_wcf.astype(wcf.dtype),
            d_wco.astype(wco.dtype))


_scan_fused.defvjp(_scan_fused_fwd, _scan_fused_bwd)


@functools.partial(jax.jit, static_argnames=("seq_len", "interpret"))
def convlstm_scan_fused(i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco,
                        seq_len: int, interpret: bool = False):
    r"""Whole-scan fused ConvLSTM (differentiable; see module doc).

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

    Returns: (h_seq [T, b, sh, sw, enc], (h_last, c_last)). The primal
    (inference) call saves nothing extra; under ``jax.grad`` the forward
    streams out gate/cell residuals and the backward runs the reverse-time
    kernel (module doc).
    """
    return _scan_fused(i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco,
                       seq_len, interpret)
