r"""Convolutional LSTM (Shi et al.) — TPU-native scan implementation.

Capability parity with the reference block
(``vp_suite/model_blocks/conv_lstm_hzzone.py:7-71``): peephole ConvLSTM with a
single 4-gate convolution over ``concat([x, h])``, zero-input decode mode, and
``(outputs, (h, c))`` sequence API.

TPU-first restructuring (numerically identical):

- The input half of the 4-gate convolution is hoisted out of the time loop and
  executed as ONE batched conv over all ``b*t`` frames (large MXU matmul),
  instead of per-step convs inside a Python loop
  (reference hot loop: ``conv_lstm_hzzone.py:52-69``).
- The recurrence itself is a ``jax.lax.scan`` whose carry (h, c) stays
  chip-resident; the per-step work is the hidden-half conv + the fused
  peephole/gate elementwise block (optionally a Pallas kernel, see
  ``vp_suite_tpu/ops/pallas_cells.py``).

Parameter layout matches a reshaped torch checkpoint:
``kernel [kh, kw, in+enc, 4*enc]`` (gate order i, f, c, o on the last axis),
peepholes ``wci/wcf/wco [state_h, state_w, enc]``.
"""
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from vp_suite_tpu.base.base_model_block import VPModelBlock
from vp_suite_tpu.model_blocks._functional import conv2d, make_conv_params


class ConvLSTMShi(VPModelBlock):
    NAME = "ConvLSTM (Shi et al.)"
    PAPER_REFERENCE = "https://arxiv.org/abs/1506.04214"
    CODE_REFERENCE = "https://github.com/Hzzone/Precipitation-Nowcasting"
    MATCHES_REFERENCE = "Yes"

    in_channels: int
    enc_channels: int
    state_h: int
    state_w: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_pallas: bool = False  #: fuse the gate/peephole elementwise block with Pallas.
    remat: bool = True        #: rematerialize the scan body in backward (HBM saver).
    remat_policy: str = "gates"  #: 'full' recomputes everything; 'gates' saves the
    #: per-step gate pre-activations so the backward pass skips the hidden-half
    #: conv recompute (trades ~HBM for ~half the remat FLOPs); 'scan_vjp' uses
    #: the hand-written recurrence VJP (``ops/scan_vjp.py``) — same residuals
    #: as 'gates' but with an explicit reverse-scan backward, skipping XLA's
    #: checkpoint-buffer zero-inits/copies (profiled ~7 ms/step on the
    #: flagship bench).
    scan_unroll: int = 0  #: lax.scan unroll factor. 0 = auto: FULL unroll for
    #: short sequences (<= 20 steps) — straight-line code has no while-loop
    #: state buffers, so XLA skips their zero-inits/copies and the per-step
    #: dynamic slices (flagship bench: 96.0 -> 93.3 ms/step) — and unroll=1
    #: otherwise (PARTIAL unroll measured strictly worse: 99.5 ms at 8,
    #: 104 ms at 2; it pays bigger programs without removing the loop).
    time_major: bool = False  #: inputs/outputs are [t, b, ...] — skips the two
    #: per-layer [b,t]<->[t,b] transposes around the scan (the EF stack runs
    #: time-major end to end; profiled ~13% of the flagship step was these
    #: copies).
    use_fused_scan: bool = False  #: run the WHOLE recurrence as one Pallas
    #: kernel (``ops/pallas_convlstm.py``): grid (b, T) with the (h, c)
    #: carry resident in VMEM across timesteps, hidden conv as an in-kernel
    #: im2col dot. Differentiable (custom VJP: reverse-time kernel + bulk
    #: XLA weight grads — 'gates'-policy residuals). Requires k3 s1 p1;
    #: falls back to the XLA scan when preconditions don't hold. Opt-in
    #: pending TPU A/B measurement (scripts/run_round4_tpu.sh).
    hoist_i2h: bool = True  #: precompute the input-half conv for all steps as
    #: one batched conv (default). False runs the torch-style fused
    #: conv(concat([x, h])) per step instead — cheaper when ``in_channels``
    #: is small relative to ``4*enc`` (the hoisted activations [t, b, sh, sw,
    #: 4enc] then cost more HBM to stream than the conv costs to compute).

    @nn.compact
    def __call__(self, inputs, states, seq_len: int):
        r"""Runs the cell over a sequence.

        Args:
            inputs: [b, t, h, w, in_c] ([t, b, ...] when ``time_major``) or
                None (decode mode: zero inputs).
            states: (h, c) each [b, state_h, state_w, enc] or None (zero init).
            seq_len: number of steps (must equal t when inputs given).

        Returns: (outputs [b, t, state_h, state_w, enc] ([t, b, ...] when
        ``time_major``), (h, c)).
        """
        enc = self.enc_channels
        kernel, bias = make_conv_params(self, "conv", self.in_channels + enc, 4 * enc,
                                        self.kernel_size)
        wci = self.param("wci", nn.initializers.zeros, (self.state_h, self.state_w, enc))
        wcf = self.param("wcf", nn.initializers.zeros, (self.state_h, self.state_w, enc))
        wco = self.param("wco", nn.initializers.zeros, (self.state_h, self.state_w, enc))

        x_kernel = kernel[:, :, :self.in_channels, :]
        h_kernel = kernel[:, :, self.in_channels:, :]

        if states is None:
            if inputs is None:
                raise ValueError("ConvLSTMShi received None for both inputs and states")
            b = inputs.shape[1] if self.time_major else inputs.shape[0]
            h0 = jnp.zeros((b, self.state_h, self.state_w, enc), dtype=inputs.dtype)
            c0 = jnp.zeros_like(h0)
        else:
            h0, c0 = states
            b = h0.shape[0]
        # keep the whole recurrence in the activation dtype (mixed precision)
        wci = wci.astype(h0.dtype)
        wcf = wcf.astype(h0.dtype)
        wco = wco.astype(h0.dtype)

        # hoisted input-to-hidden conv over all timesteps at once (one big
        # MXU-friendly batched conv); bias folded into this half.
        # the un-hoisted (concat) form needs x and h on the same spatial grid
        # (spatial axes are 2, 3 in both [t, b, ...] and [b, t, ...] layouts)
        concat_ok = (inputs is not None and self.stride == 1
                     and inputs.shape[2] == self.state_h
                     and inputs.shape[3] == self.state_w)
        hoist = inputs is not None and (self.hoist_i2h or self.use_fused_scan
                                        or not concat_ok)
        raw_xs = inputs is not None and not hoist
        if hoist:
            bt = inputs.shape[0] * inputs.shape[1]
            x_flat = inputs.reshape(bt, *inputs.shape[2:])
            i2h = conv2d(x_flat, x_kernel, bias, self.stride, self.padding)
            if self.time_major:
                # [t, b, ...] flattening is scan-order already: no transpose
                i2h_t = i2h.reshape(seq_len, b, self.state_h, self.state_w, 4 * enc)
            else:
                i2h = i2h.reshape(b, seq_len, self.state_h, self.state_w, 4 * enc)
                i2h_t = jnp.moveaxis(i2h, 1, 0)  # [t, b, sh, sw, 4enc]
        elif raw_xs:
            # un-hoisted: the scan consumes the RAW frames and each step runs
            # the torch-style fused conv over concat([x, h]) — cheaper when
            # in_channels << 4*enc (streaming the hoisted [t, b, sh, sw,
            # 4enc] activations costs more HBM than the conv costs to
            # compute; the concat conv also contracts over in+enc at once)
            i2h_t = inputs if self.time_major else jnp.moveaxis(inputs, 1, 0)
        else:
            # decode mode: no xs at all — materializing broadcast_to(bias,
            # [t, b, sh, sw, 4enc]) as scan inputs costs a ~167 MB HBM write
            # + per-step dynamic-slice reads (profiled ~8 ms/step on the
            # flagship bench); the bias rides the per-step hidden conv instead
            i2h_t = None

        if (self.use_fused_scan and not raw_xs and self.kernel_size == 3
                and self.stride == 1 and self.padding == 1):
            import jax as _jax
            from vp_suite_tpu.ops.pallas_convlstm import convlstm_scan_fused
            if i2h_t is None:
                i2h_in, k_bias = None, bias
            else:
                # hoist path already folded the bias into i2h
                i2h_in, k_bias = i2h_t, jnp.zeros_like(bias)
            outputs, (h_last, c_last) = convlstm_scan_fused(
                i2h_in, h0, c0, h_kernel, k_bias, wci, wcf, wco,
                seq_len=seq_len,
                interpret=_jax.default_backend() != "tpu")
            if not self.time_major:
                outputs = jnp.moveaxis(outputs, 0, 1)
            return outputs, (h_last, c_last)

        if (self.remat_policy == "scan_vjp" and not self.use_pallas
                and self.scan_unroll in (0, 1) and not raw_xs):
            from vp_suite_tpu.ops.scan_vjp import convlstm_scan
            outputs, (h_last, c_last) = convlstm_scan(
                i2h_t, bias, h0, c0, h_kernel, wci, wcf, wco,
                self.stride, self.padding, seq_len)
            if not self.time_major:
                outputs = jnp.moveaxis(outputs, 0, 1)
            return outputs, (h_last, c_last)

        def step(carry, i2h_step):
            h, c = carry
            if raw_xs:
                gates = conv2d(jnp.concatenate([i2h_step, h], axis=-1), kernel,
                               bias, self.stride, self.padding)
            else:
                step_bias = None if i2h_step is not None else bias
                conv_h = conv2d(h, h_kernel, step_bias, self.stride, self.padding)
                gates = conv_h if i2h_step is None else i2h_step + conv_h
            if self.remat_policy == "gates":
                from jax.ad_checkpoint import checkpoint_name
                gates = checkpoint_name(gates, "convlstm_gates")
            if self.use_pallas:
                from vp_suite_tpu.ops.pallas_cells import convlstm_gate_fuse
                h_new, c_new = convlstm_gate_fuse(gates, c, wci, wcf, wco)
            else:
                gi, gf, gc, go = jnp.split(gates, 4, axis=-1)
                i = jax.nn.sigmoid(gi + wci * c)
                f = jax.nn.sigmoid(gf + wcf * c)
                c_new = f * c + i * jnp.tanh(gc)
                o = jax.nn.sigmoid(go + wco * c_new)
                h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        if self.remat:
            if self.remat_policy == "gates":
                step = jax.checkpoint(
                    step, policy=jax.checkpoint_policies.save_only_these_names(
                        "convlstm_gates"))
            else:
                step = jax.checkpoint(step)
        from vp_suite_tpu.model_blocks._functional import auto_unroll
        (h_last, c_last), outputs = lax.scan(step, (h0, c0), i2h_t,
                                             length=seq_len,
                                             unroll=auto_unroll(
                                                 self.scan_unroll, seq_len))
        if not self.time_major:
            outputs = jnp.moveaxis(outputs, 0, 1)  # [b, t, sh, sw, enc]
        return outputs, (h_last, c_last)
