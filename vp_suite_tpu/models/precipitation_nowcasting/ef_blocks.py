r"""Encoder-Forecaster skeleton (Shi et al.) — TPU-native.

Capability parity with ``vp_suite/models/precipitation_nowcasting/ef_blocks.py``:
multi-stage encoder (conv subnet → recurrent block per stage) and forecaster
(recurrent block → deconv subnet per stage, reversed), with per-layer
hyperparameter validation and conv-arithmetic state sizing
(``ef_blocks.py:134-172``).

TPU-first notes: stage conv subnets run batched over ``b*t`` frames (one big
MXU conv per stage — the reference does the same reshape,
``ef_blocks.py:67-71``); the recurrent blocks carry their state through
``lax.scan`` internally (see ``model_blocks/conv_lstm_shi.py``).
"""
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.nn.layers import Conv2d, ConvTranspose2d, max_pool_2d
from vp_suite_tpu.utils.models import conv_output_shape, convtransp_output_shape


class ConvStage(nn.Module):
    r"""A conv subnet stage built from string-keyed layer specs, mirroring the
    reference's ``_make_layers`` (``ef_blocks.py:15-49``). Layer names choose
    the op and activation: 'conv*', 'deconv*', 'pool*', 'identity';
    '*leaky*' → LeakyReLU(0.2), '*relu*' → ReLU."""
    layers: Tuple  # tuple of (name, spec-tuple)

    @nn.compact
    def __call__(self, x):
        for layer_name, v in self.layers:
            if "identity" in layer_name:
                continue
            elif "pool" in layer_name:
                x = max_pool_2d(x, window=v[0], strides=v[1], padding=v[2])
                continue
            elif "deconv" in layer_name:
                x = ConvTranspose2d(features=v[1], kernel_size=v[2], strides=v[3],
                                    padding=v[4], name=layer_name)(x)
            elif "conv" in layer_name:
                x = Conv2d(features=v[1], kernel_size=v[2], strides=v[3],
                           padding=v[4], name=layer_name)(x)
            else:
                raise NotImplementedError(f"unknown layer spec name: {layer_name}")
            if "relu" in layer_name:
                x = jax.nn.relu(x)
            elif "leaky" in layer_name:
                x = jax.nn.leaky_relu(x, negative_slope=0.2)
        return x


def apply_stage_batched(stage, x):
    r"""Applies a ConvStage to [b, t, h, w, c] as one batched [b*t] conv."""
    b, t = x.shape[:2]
    y = stage(x.reshape(b * t, *x.shape[2:]))
    return y.reshape(b, t, *y.shape[1:])


class EncoderForecasterBase(VPModel):
    r"""Abstract Encoder-Forecaster model; concrete subclasses provide the
    conv specs and rnn blocks via :meth:`_build_encoder_decoder`
    (parity: ``ef_blocks.py:117-187``)."""
    NAME = "Encoder-Forecaster Structure (Shi et al.)"

    num_layers: int = 3
    interleaved_forecast: Optional[bool] = None  #: run the forecaster as ONE
    #: per-step loop (cell step + stage deconv together) instead of per-stage
    #: batched deconvs between whole-sequence scans. Numerically identical —
    #: except under TrajGRU ``zoneout > 0`` (default 0.0), where the per-step
    #: rng stream draws masks in a different order than the staged form's
    #: single whole-sequence draw. Motivation:
    #: the staged form makes XLA re-lay each [t, b, h, w, c] stage output
    #: between the batched deconv's layout and the (fully unrolled) scan's
    #: per-step layout (~8 x ~1 ms relayout copies per flagship train step,
    #: see STATUS.md); interleaving keeps every per-step tensor inside one
    #: consistently-laid-out subgraph. Only profitable when the per-layer
    #: scans would fully unroll anyway (pred_frames <= 20).
    #: Default ``None`` = auto: interleave iff the sequence is inside the
    #: full-unroll regime (<= 20 steps, same cap as ``auto_unroll``) AND no
    #: rnn block uses zoneout — the round-5 TPU A/B made this the winner
    #: (flagship 93.3 -> 77.2 ms/step, EF-TrajGRU 429.7 -> 382.1; STATUS.md).
    interleaved_encode: Optional[bool] = None  #: same per-step restructuring
    #: for the encoder (stage conv + cell step per context frame). Separate
    #: flag: the encoder's stage convs batch over REAL frames, so interleaving
    #: them trades the t-times-larger MXU convs for the layout win — the
    #: trade-off can differ from the forecaster's. ``None`` = same auto rule.

    _INTERLEAVE_MAX_STEPS = 20  # matches _functional.auto_unroll's cap

    def _resolve_interleave(self, flag, rnns, n_steps: int) -> bool:
        r"""Auto-resolve an interleave flag: explicit True/False wins; None
        interleaves iff the per-layer scans would fully unroll anyway and no
        block draws zoneout masks (keeps the staged/interleaved rng parity)."""
        if flag is not None:
            return flag
        if n_steps > self._INTERLEAVE_MAX_STEPS:
            return False
        return all(getattr(rnn, "zoneout", 0.0) == 0.0 for rnn in rnns)

    def _per_layer_params(self):
        r"""(name, value) pairs of enc_*/dec_* hyperparameters for length
        validation (parity: ``ef_blocks.py:134-143``)."""
        return [(f_name, getattr(self, f_name)) for f_name in self.__dataclass_fields__
                if f_name.startswith("enc_") or f_name.startswith("dec_")]

    def _compute_state_sizes(self):
        for param, val in self._per_layer_params():
            ok = True
            if param in ["enc_c", "dec_c"] and len(val) != 2 * self.num_layers:
                ok = False
            elif param not in ["enc_c", "dec_c"] and not param.endswith("_names") \
                    and len(val) != self.num_layers:
                ok = False
            elif param.endswith("_names") and len(val) != self.num_layers:
                ok = False
            if not ok:
                raise AttributeError(f"Specified {self.num_layers} layers, but len of "
                                     f"attribute '{param}' doesn't match that ({val}).")

        next_h, next_w = self.img_h, self.img_w
        enc_rnn_state_h, enc_rnn_state_w = [], []
        for n in range(self.num_layers):
            next_h, next_w = conv_output_shape((next_h, next_w), self.enc_conv_k[n],
                                               self.enc_conv_s[n], self.enc_conv_p[n])
            enc_rnn_state_h.append(next_h)
            enc_rnn_state_w.append(next_w)

        dec_rnn_state_h, dec_rnn_state_w = [next_h], [next_w]
        for n in range(self.num_layers - 1):
            next_h, next_w = convtransp_output_shape((next_h, next_w), self.dec_conv_k[n],
                                                     self.dec_conv_s[n], self.dec_conv_p[n])
            dec_rnn_state_h.append(next_h)
            dec_rnn_state_w.append(next_w)

        final_h, final_w = convtransp_output_shape((next_h, next_w), self.dec_conv_k[-1],
                                                   self.dec_conv_s[-1], self.dec_conv_p[-1])
        if (self.img_h, self.img_w) != (final_h, final_w):
            hidden_sizes = list(zip(enc_rnn_state_h, enc_rnn_state_w)) \
                + list(zip(dec_rnn_state_h, dec_rnn_state_w))
            raise AttributeError(f"Model layer hyperparameters yield wrong output size: "
                                 f"{(final_h, final_w)} (expected: {(self.img_h, self.img_w)}). "
                                 f"All hidden sizes: {hidden_sizes}")
        return enc_rnn_state_h, enc_rnn_state_w, dec_rnn_state_h, dec_rnn_state_w

    def setup(self):
        (self.enc_rnn_state_h, self.enc_rnn_state_w,
         self.dec_rnn_state_h, self.dec_rnn_state_w) = self._compute_state_sizes()
        enc_convs, enc_rnns, dec_convs, dec_rnns = self._build_encoder_decoder()
        self.enc_stages = [ConvStage(layers=tuple(spec.items()), name=f"enc_stage{i+1}")
                           for i, spec in enumerate(enc_convs)]
        self.enc_rnns_list = enc_rnns
        self.dec_stages = [ConvStage(layers=tuple(spec.items()), name=f"dec_stage{i+1}")
                           for i, spec in enumerate(dec_convs)]
        self.dec_rnns_list = dec_rnns

    def _build_encoder_decoder(self):
        raise NotImplementedError

    def encode(self, x):
        r"""Encoder: per stage, batched conv subnet then recurrent block
        (parity: ``ef_blocks.py:67-82``). ``x`` is time-major [t, b, ...];
        the whole stack stays time-major so the per-layer scans consume and
        produce their natural layout with zero transposes. Returns per-stage
        final states."""
        t = x.shape[0]
        if self._resolve_interleave(self.interleaved_encode, self.enc_rnns_list, t):
            # per-step loop (see interleaved_forecast): stage conv + cell
            # step per frame, carries threaded across the Python time loop.
            # Zero-init (states=None) on the first step == the scan's h0.
            states = [None] * len(self.enc_rnns_list)
            for ti in range(t):
                cur = x[ti:ti + 1]
                for i, (stage, rnn) in enumerate(zip(self.enc_stages,
                                                     self.enc_rnns_list)):
                    cur = apply_stage_batched(stage, cur)
                    cur, states[i] = rnn(cur, states[i], 1)
            return tuple(states)
        hidden_states = []
        cur = x
        for stage, rnn in zip(self.enc_stages, self.enc_rnns_list):
            cur = apply_stage_batched(stage, cur)
            cur, state = rnn(cur, None, t)
            hidden_states.append(state)
        return tuple(hidden_states)

    def forecast(self, hidden_states, pred_frames: int):
        r"""Forecaster: reversed stages, rnn seeded with encoder state, zero
        input on the deepest stage (parity: ``ef_blocks.py:100-114``).
        Time-major throughout, like :meth:`encode`."""
        n = self.num_layers
        if self._resolve_interleave(self.interleaved_forecast, self.dec_rnns_list,
                                    pred_frames):
            # one per-step loop: cell step + stage conv together so XLA lays
            # out the whole step consistently (no batched-conv <-> scan-slice
            # relayout copies). Same params, same math as the staged form.
            states = [hidden_states[n - 1 - i] for i in range(n)]
            frames = []
            for _ in range(pred_frames):
                cur = None
                for i in range(n):
                    cur, states[i] = self.dec_rnns_list[i](cur, states[i], 1)
                    cur = apply_stage_batched(self.dec_stages[i], cur)
                frames.append(cur[0])
            return jnp.stack(frames, 0)
        cur, _ = self.dec_rnns_list[0](None, hidden_states[-1], pred_frames)
        cur = apply_stage_batched(self.dec_stages[0], cur)
        for i in range(1, n):
            cur, _ = self.dec_rnns_list[i](cur, hidden_states[n - 1 - i], pred_frames)
            cur = apply_stage_batched(self.dec_stages[i], cur)
        return cur

    def __call__(self, x, pred_frames: int = 1, actions=None, train: bool = False, **kwargs):
        # one [b,t]<->[t,b] transpose at each end of the model; everything
        # in between runs time-major
        states = self.encode(jnp.moveaxis(x, 0, 1))
        preds = self.forecast(states, pred_frames)
        return jnp.moveaxis(preds, 0, 1), None
