r"""SimVP-lite: a ONE-SHOT fully convolutional video predictor (TPU-native
extra).

No analog in ``/root/reference/vp_suite/models`` (documented as an extra in
the registry, like ``min-conv-rnn`` and ``pred-former``). Motivation: every
reference model decodes the future FRAME BY FRAME — either a sequential cell
chain or an autoregressive rollout, both of which serialize the chip behind
T small steps. The SimVP line (Gao et al., CVPR 2022) shows a plain
encoder–translator–decoder CNN that emits the WHOLE horizon in one forward
pass is competitive with the recurrent zoo. That shape is ideal for TPU:

- all time dims fold into batch (encoder/decoder) or channels (translator),
  so every conv is one LARGE static-shape MXU contraction — no ``lax.scan``
  anywhere in the model;
- the translator mixes time as channels, so "temporal modeling" costs the
  same matmul FLOPs as spatial mixing instead of a serial dependency chain;
- one-shot emission means train-step FLOPs scale with ``pred_frames`` only
  through tensor sizes, not through program length (compile time and HBM
  live-range both stay flat).

Structure (channels-last NTHWC throughout):

- **encoder** (per frame, time folded into batch): two stride-2 3x3 convs
  ``c -> hid_s/2 -> hid_s`` with GroupNorm+SiLU — latents at H/4 x W/4;
- **translator**: concatenate the ``t_in`` context latents on CHANNELS
  (``[b, h', w', t_in*hid_s]``), 1x1-project to ``hid_t``, run ``n_trans``
  residual bottleneck blocks (1x1 reduce -> 3x3 -> 1x1 expand, GN+SiLU) —
  dense convs, not the paper's grouped Inception mix, because grouped /
  depthwise convs are VPU-bound on TPU while dense 3x3s run on the MXU —
  then 1x1-project to ``out_frames*hid_s``;
- **decoder** (per output frame, time folded into batch): two stride-2
  transposed convs ``hid_s -> hid_s/2 -> hid_s/2`` (k4 s2 p1: exact 2x),
  skip-adding the LAST context frame's first encoder feature (the paper's
  enc1 skip, broadcast over the horizon since t_out != t_in here), then a
  3x3 readout to ``c``.

Horizons beyond ``out_frames`` roll out autoregressively in CHUNKS of
``out_frames`` (a static Python loop; the common case is one chunk).
Params are torch-checkpoint-mappable like the rest of the package
(conv [kh,kw,in,out]; see tests/helpers/weight_convert.py).
"""
import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.model_blocks._functional import conv2d, conv_transpose2d, \
    group_norm, make_conv_params


class SimVP(VPModel):
    r"""One-shot encoder–translator–decoder conv predictor (see module doc)."""
    NAME = "SimVP-lite (one-shot conv translator)"
    PAPER_REFERENCE = "https://arxiv.org/abs/2206.05099"
    CODE_REFERENCE = None
    MATCHES_REFERENCE = "N/A (no reference analog; TPU-native extra)"
    CAN_HANDLE_ACTIONS = False

    hid_s: int = 64      #: per-frame spatial channels (encoder/decoder).
    hid_t: int = 256     #: translator channels.
    n_trans: int = 4     #: translator bottleneck blocks.
    #: context window the translator consumes (its 1x1 input projection is
    #: ``in_frames*hid_s`` wide, so — like UNet-3D's ``temporal_dim`` — this is
    #: model ARCHITECTURE, not a run kwarg; longer contexts use the LAST
    #: ``in_frames`` frames). Set it to the run's ``context_frames`` at
    #: creation to consume the full context.
    in_frames: int = 2
    out_frames: int = 10  #: one-shot horizon; longer rollouts chunk by this.
    gn_groups: int = 8   #: GroupNorm groups.

    @property
    def MIN_CONTEXT_FRAMES(self):  # noqa: N802  (same pattern as UNet-3D)
        return self.in_frames

    def _gn(self, name, c):
        scale = self.param(f"{name}_scale", nn.initializers.ones, (c,))
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (c,))
        return lambda x: group_norm(x, scale, bias, min(self.gn_groups, c))

    @nn.compact
    def __call__(self, x, pred_frames: int = 1, actions=None,
                 train: bool = False, **kwargs):
        b = x.shape[0]
        c, ih, iw = self.img_shape
        if x.shape[2:] != (ih, iw, c):
            raise ValueError(f"input image does not match specified size "
                             f"(input: {x.shape[2:]}, required: {(ih, iw, c)})")
        if ih % 4 or iw % 4:
            raise ValueError(f"img size {(ih, iw)} must be divisible by 4")
        t_in = self.in_frames
        if x.shape[1] < t_in:
            raise ValueError(f"SimVP(in_frames={t_in}) needs at least {t_in} "
                             f"context frames, got {x.shape[1]}")
        x = x[:, -t_in:]  # the translator consumes the LAST in_frames frames
        hs, ht, t_out = self.hid_s, self.hid_t, self.out_frames
        eh, ew = ih // 4, iw // 4
        dt = jnp.dtype(self.compute_dtype)
        act = jax.nn.silu

        # --- params (translator input width is t_in*hs: fixed per run, like
        # the reference's context-frames-sized layers) ---
        e1_k, e1_b = make_conv_params(self, "enc1", c, hs // 2, 3)
        e2_k, e2_b = make_conv_params(self, "enc2", hs // 2, hs, 3)
        gn_e1, gn_e2 = self._gn("enc1_gn", hs // 2), self._gn("enc2_gn", hs)
        pin_k, pin_b = make_conv_params(self, "trans_in", t_in * hs, ht, 1)
        blocks = []
        for li in range(self.n_trans):
            rk, rb = make_conv_params(self, f"t{li}_red", ht, ht // 2, 1)
            mk, mb = make_conv_params(self, f"t{li}_mid", ht // 2, ht // 2, 3)
            xk, xb = make_conv_params(self, f"t{li}_exp", ht // 2, ht, 1)
            blocks.append((rk, rb, mk, mb, xk, xb,
                           self._gn(f"t{li}_gn1", ht // 2),
                           self._gn(f"t{li}_gn2", ht // 2)))
        pout_k, pout_b = make_conv_params(self, "trans_out", ht, t_out * hs, 1)
        d1_k, d1_b = make_conv_params(self, "dec1", hs, hs // 2, 4)
        d2_k, d2_b = make_conv_params(self, "dec2", hs // 2, hs // 2, 4)
        gn_d1, gn_d2 = self._gn("dec1_gn", hs // 2), self._gn("dec2_gn", hs // 2)
        ro_k, ro_b = make_conv_params(self, "readout", hs // 2, c, 3)

        def one_shot(window):  # [b, t_in, ih, iw, c] -> [b, t_out, ih, iw, c]
            f = window.astype(dt).reshape((b * t_in, ih, iw, c))
            s1 = act(gn_e1(conv2d(f, e1_k, e1_b, 2, 1)))    # [b*t, h/2, w/2]
            z = act(gn_e2(conv2d(s1, e2_k, e2_b, 2, 1)))    # [b*t, eh, ew, hs]
            # time -> channels: [b, eh, ew, t_in*hs]
            z = z.reshape(b, t_in, eh, ew, hs)
            z = jnp.moveaxis(z, 1, 3).reshape(b, eh, ew, t_in * hs)
            z = conv2d(z, pin_k, pin_b, 1, 0)
            for (rk, rb, mk, mb, xk, xb, gn1, gn2) in blocks:
                y = act(gn1(conv2d(z, rk, rb, 1, 0)))
                y = act(gn2(conv2d(y, mk, mb, 1, 1)))
                z = z + conv2d(y, xk, xb, 1, 0)
            z = conv2d(z, pout_k, pout_b, 1, 0)             # [b, eh, ew, t_out*hs]
            # channels -> time, fold into batch for the per-frame decoder
            z = z.reshape(b, eh, ew, t_out, hs)
            z = jnp.moveaxis(z, 3, 1).reshape(b * t_out, eh, ew, hs)
            y = act(gn_d1(conv_transpose2d(z, d1_k, d1_b, 2, 1)))
            # enc1 skip of the LAST context frame, broadcast over the horizon
            skip = s1.reshape(b, t_in, ih // 2, iw // 2, hs // 2)[:, -1]
            y = y + jnp.repeat(skip, t_out, axis=0)
            y = act(gn_d2(conv_transpose2d(y, d2_k, d2_b, 2, 1)))
            y = conv2d(y, ro_k, ro_b, 1, 1)
            return y.astype(jnp.float32).reshape(b, t_out, ih, iw, c)

        body = jax.checkpoint(one_shot) if (self.remat and
                                            pred_frames > t_out) else one_shot
        window, preds = x, []
        for _ in range(math.ceil(pred_frames / t_out)):
            chunk = body(window)
            preds.append(chunk)
            window = jnp.concatenate([window, chunk], axis=1)[:, -t_in:]
        return jnp.concatenate(preds, axis=1)[:, :pred_frames], None
