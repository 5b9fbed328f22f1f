r"""MinConvRNN: a time-PARALLEL convolutional recurrent video predictor.

A TPU-native EXTRA beyond the reference's model zoo (no analog in
``/root/reference/vp_suite/models``; documented as such in the registry).
Motivation: every reference model steps its recurrence sequentially over
time — on TPU that serializes the MXU behind a chain of small steps. Recent
minimal-RNN work (minGRU/minLSTM-style gating; retrieved refs in PAPERS.md:
"Minimal Convolutional RNNs Accelerate Spatiotemporal Learning",
"Convolutional State Space Models") observes that if the gates depend only
on the INPUT (not the hidden state), the recurrence becomes element-wise
LINEAR in ``h``:

    h_t = f_t * h_{t-1} + (1 - f_t) * g_t,   f_t, g_t = convs(x_t)

which a ``jax.lax.associative_scan`` evaluates in O(log T) depth — the whole
context window is encoded in parallel (gate convs run as ONE batched conv
over ``[b*t]``, scan does log-depth element-wise combines), instead of T
sequential cell steps. Autoregressive decode (where step t+1 needs the
model's own frame t) remains a short ``lax.scan``.

Structure: strided conv encoder (H/4) -> N gated linear-recurrence layers
(3x3 gate convs, 1x1 out conv, residual) -> transposed-conv decoder.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.model_blocks._functional import conv2d, conv_transpose2d, \
    make_conv_params


def linear_recurrence_scan(f, u, h0=None):
    r"""Evaluates ``h_t = f_t * h_{t-1} + u_t`` for stacked ``[t, ...]``
    inputs via ``associative_scan`` (log-depth in t). ``h0`` defaults to
    zeros. Exact (not approximate): the recurrence is associative in the
    (decay, update) pair representation — composition
    ``(fa, ua) then (fb, ub) = (fb*fa, fb*ua + ub)``."""
    if h0 is not None:
        u = u.at[0].add(f[0] * h0)

    def combine(a, b):
        fa, ua = a
        fb, ub = b
        return fa * fb, ub + fb * ua

    _, h = lax.associative_scan(combine, (f, u), axis=0)
    return h


class MinConvRNN(VPModel):
    r"""Time-parallel minimal conv RNN (TPU-native extra; see module doc)."""
    NAME = "MinConvRNN (time-parallel)"
    PAPER_REFERENCE = "https://arxiv.org/abs/2006.12077"  # minimal-RNN line
    CODE_REFERENCE = None
    MATCHES_REFERENCE = "N/A (no reference analog; TPU-native extra)"
    CAN_HANDLE_ACTIONS = False

    NON_CONFIG_VARS = VPModel.NON_CONFIG_VARS + ["context_mesh"]

    num_layers: int = 2
    hidden_dim: int = 64
    context_mesh: object = None  #: a Mesh with a 'seq' axis: the CONTEXT
    #: window's time dimension shards over it (``ops/scan_parallel`` —
    #: blockwise associative scan + one aggregate all_gather per layer).
    #: The recurrence is associative, so this is exact; everything else in
    #: the context pass is frame-parallel and shards with it. The reference
    #: cannot express this axis at all (strictly sequential time loops).

    @nn.compact
    def __call__(self, x, pred_frames: int = 1, actions=None,
                 train: bool = False, **kwargs):
        b, t_in = x.shape[:2]
        c, ih, iw = self.img_shape
        if x.shape[2:] != (ih, iw, c):
            raise ValueError(f"input image does not match specified size "
                             f"(input: {x.shape[2:]}, required: {(ih, iw, c)})")
        hd = self.hidden_dim
        eh, ew = ih // 4, iw // 4

        # --- params ---
        e1_k, e1_b = make_conv_params(self, "enc1", c, hd // 2, 3)
        e2_k, e2_b = make_conv_params(self, "enc2", hd // 2, hd, 3)
        layers = []
        for li in range(self.num_layers):
            fk, fb = make_conv_params(self, f"l{li}_f", hd, hd, 3)
            gk, gb = make_conv_params(self, f"l{li}_g", hd, hd, 3)
            ok, ob = make_conv_params(self, f"l{li}_out", hd, hd, 1)
            layers.append((fk, fb, gk, gb, ok, ob))
        # k4 s2 p1 transposed convs upsample exactly 2x (k3 gives 2H-1)
        d1_k, d1_b = make_conv_params(self, "dec1", hd, hd // 2, 4)
        d2_k, d2_b = make_conv_params(self, "dec2", hd // 2, c, 4)

        def encode(frames):  # [n, ih, iw, c] -> [n, eh, ew, hd]
            y = jax.nn.relu(conv2d(frames, e1_k, e1_b, 2, 1))
            return jax.nn.relu(conv2d(y, e2_k, e2_b, 2, 1))

        def decode(z):  # [n, eh, ew, hd] -> [n, ih, iw, c]
            y = jax.nn.relu(conv_transpose2d(z, d1_k, d1_b, 2, 1))
            return conv_transpose2d(y, d2_k, d2_b, 2, 1)

        def gates(z, fk, fb, gk, gb):
            f = jax.nn.sigmoid(conv2d(z, fk, fb, 1, 1))
            g = jnp.tanh(conv2d(z, gk, gb, 1, 1))
            return f, (1.0 - f) * g

        # ---- context: ALL timesteps in parallel --------------------------
        z = encode(x.reshape((b * t_in, ih, iw, c)))
        z = z.reshape((b, t_in) + z.shape[1:])
        z = jnp.moveaxis(z, 1, 0)  # time-major [t, b, eh, ew, hd]
        h_lasts = []
        for (fk, fb, gk, gb, ok, ob) in layers:
            zf = z.reshape((t_in * b,) + z.shape[2:])
            f, u = gates(zf, fk, fb, gk, gb)
            shape = (t_in, b) + z.shape[2:]
            if self.context_mesh is not None and t_in % \
                    self.context_mesh.shape.get("seq", t_in + 1) == 0:
                from vp_suite_tpu.ops.scan_parallel import \
                    linear_recurrence_scan_sharded
                h = linear_recurrence_scan_sharded(
                    f.reshape(shape), u.reshape(shape), self.context_mesh,
                    axis="seq")
            else:
                h = linear_recurrence_scan(f.reshape(shape), u.reshape(shape))
            h_lasts.append(h[-1])
            out = conv2d(h.reshape((t_in * b,) + z.shape[2:]), ok, ob, 1, 0)
            z = z + out.reshape(shape)

        # ---- decode: short autoregressive scan ---------------------------
        first = decode(z[-1])

        def step(carry, _):
            hs, frame = carry
            zz = encode(frame)
            new_hs = []
            for (fk, fb, gk, gb, ok, ob), hprev in zip(layers, hs):
                f, u = gates(zz, fk, fb, gk, gb)
                h = f * hprev + u  # same recurrence, one step
                new_hs.append(h)
                zz = zz + conv2d(h, ok, ob, 1, 0)
            nxt = decode(zz)
            return (new_hs, nxt), nxt

        if pred_frames > 1:
            if self.remat:
                step = jax.checkpoint(step)
            (_, _), rest = lax.scan(step, (h_lasts, first), None,
                                    length=pred_frames - 1)
            preds = jnp.concatenate([first[None], rest], axis=0)
        else:
            preds = first[None]
        return jnp.moveaxis(preds, 0, 1), None
