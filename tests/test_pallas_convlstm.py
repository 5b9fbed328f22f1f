r"""Fused whole-scan ConvLSTM kernel vs the plain-JAX scan (interpret mode).

``ops/pallas_convlstm.py`` keeps the (h, c) carry in VMEM across all
timesteps and contracts the hidden conv as one im2col dot per gate. These
tests pin forward equivalence against the reference scan math (the same
recurrence ``ConvLSTMShi`` runs) in both decode mode (no inputs) and
input-driven mode, on CPU via the Pallas interpreter.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vp_suite_tpu.ops.pallas_convlstm import convlstm_scan_fused


def _ref_scan(i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco, seq_len):
    r"""Reference recurrence (mirrors ConvLSTMShi's step math)."""
    from vp_suite_tpu.model_blocks._functional import conv2d

    h, c = h0, c0
    outs = []
    for t in range(seq_len):
        gates = conv2d(h, h_kernel, bias, 1, 1)
        if i2h_t is not None:
            gates = gates + i2h_t[t]
        gi, gf, gc, go = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(gi + wci * c)
        f = jax.nn.sigmoid(gf + wcf * c)
        c = f * c + i * jnp.tanh(gc)
        o = jax.nn.sigmoid(go + wco * c)
        h = o * jnp.tanh(c)
        outs.append(h)
    return jnp.stack(outs), (h, c)


def _setup(t=3, b=2, sh=8, sw=8, enc=4, with_x=True, seed=0, with_state=False):
    rng = np.random.RandomState(seed)
    f32 = jnp.float32
    if with_state:
        h0 = jnp.asarray(rng.randn(b, sh, sw, enc) * 0.3, f32)
        c0 = jnp.asarray(rng.randn(b, sh, sw, enc) * 0.3, f32)
    else:
        h0 = jnp.zeros((b, sh, sw, enc), f32)
        c0 = jnp.zeros_like(h0)
    h_kernel = jnp.asarray(rng.randn(3, 3, enc, 4 * enc) * 0.3, f32)
    bias = jnp.asarray(rng.randn(4 * enc) * 0.1, f32)
    wci, wcf, wco = (jnp.asarray(rng.randn(sh, sw, enc) * 0.1, f32)
                     for _ in range(3))
    i2h = jnp.asarray(rng.randn(t, b, sh, sw, 4 * enc) * 0.3, f32) \
        if with_x else None
    return i2h, h0, c0, h_kernel, bias, wci, wcf, wco


@pytest.mark.parametrize("with_x,with_state", [(False, False), (True, False),
                                               (False, True), (True, True)])
def test_fused_scan_matches_reference(with_x, with_state):
    t = 3
    args = _setup(t=t, with_x=with_x, with_state=with_state)
    ref_seq, (ref_h, ref_c) = _ref_scan(*args, seq_len=t)
    with jax.default_matmul_precision("highest"):
        h_seq, (h_last, c_last) = convlstm_scan_fused(*args, seq_len=t,
                                                      interpret=True)
    # kernel output is [T, b, ...] time-major
    np.testing.assert_allclose(np.asarray(h_seq),
                               np.asarray(ref_seq), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(ref_h), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_last), np.asarray(ref_c), atol=2e-5)


@pytest.mark.parametrize("with_x", [False, True])
def test_fused_scan_gradients_match(with_x):
    r"""Custom VJP: grads through the fused scan (reverse-time kernel + bulk
    XLA weight/bias/peephole contractions) equal autodiff through the
    reference recurrence, for every differentiable input."""
    t = 3
    args = _setup(t=t, with_x=with_x, with_state=True)
    argnums = tuple(j for j in range(8) if with_x or j != 0)

    def loss_ref(*a):
        seq, (h, c) = _ref_scan(*a, seq_len=t)
        return jnp.sum(seq ** 2) + jnp.sum(h * c)

    def loss_fused(*a):
        seq, (h, c) = convlstm_scan_fused(*a, seq_len=t, interpret=True)
        return jnp.sum(seq ** 2) + jnp.sum(h * c)

    with jax.default_matmul_precision("highest"):
        gr = jax.grad(loss_ref, argnums=argnums)(*args)
        gf = jax.grad(loss_fused, argnums=argnums)(*args)
    names = ["i2h", "h0", "c0", "h_kernel", "bias", "wci", "wcf", "wco"]
    for j, a, b in zip(argnums, gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad mismatch: {names[j]}")


def test_ef_convlstm_fused_scan_training_step():
    r"""The EF model trains through the fused path: one value_and_grad step
    produces finite loss and gradients matching the default path."""
    from vp_suite_tpu.models import MODEL_CLASSES

    kwargs = dict(img_shape=(3, 16, 16), action_size=0,
                  tensor_value_range=(0.0, 1.0))
    base = MODEL_CLASSES["convlstm-shi"](**kwargs)
    fused = MODEL_CLASSES["convlstm-shi"](**kwargs, use_fused_scan=True)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 3, 16, 16, 3), jnp.float32)
    tgt = jnp.asarray(rng.rand(2, 2, 16, 16, 3), jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, pred_frames=2)

    def loss(model):
        def f(params):
            preds, _ = model.apply({"params": params}, x, pred_frames=2)
            return jnp.mean((preds - tgt) ** 2)
        return f

    with jax.default_matmul_precision("highest"):
        l_ref, g_ref = jax.value_and_grad(loss(base))(variables["params"])
        l_f, g_f = jax.value_and_grad(loss(fused))(variables["params"])
    assert abs(float(l_ref) - float(l_f)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


def test_ef_convlstm_fused_scan_forward_matches():
    r"""Model-level opt-in: EF_ConvLSTM(use_fused_scan=True) inference equals
    the default XLA-scan forward (kernel runs interpreted off-TPU). Covers
    both halves: hoisted-i2h encoder cells AND bias-only forecaster cells
    with the encoder's (h, c) as initial state."""
    from vp_suite_tpu.models import MODEL_CLASSES

    kwargs = dict(img_shape=(3, 16, 16), action_size=0,
                  tensor_value_range=(0.0, 1.0))
    base = MODEL_CLASSES["convlstm-shi"](**kwargs)
    fused = MODEL_CLASSES["convlstm-shi"](**kwargs, use_fused_scan=True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 3, 16, 16, 3), jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, pred_frames=2)
    with jax.default_matmul_precision("highest"):
        ref, _ = base.apply(variables, x, pred_frames=2)
        out, _ = fused.apply(variables, x, pred_frames=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_scan_batch_independence():
    r"""Each batch item's carry must reset at t=0 (grid order (b, T)):
    permuting the batch permutes the outputs."""
    t = 2
    i2h, h0, c0, *rest = _setup(t=t, b=3)
    with jax.default_matmul_precision("highest"):
        out1, _ = convlstm_scan_fused(i2h, h0, c0, *rest, seq_len=t,
                                      interpret=True)
        out2, _ = convlstm_scan_fused(i2h[:, ::-1], h0, c0, *rest, seq_len=t,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out1[:, ::-1]), np.asarray(out2),
                               atol=1e-6)
