r"""Hand-written ConvLSTM scan VJP vs autodiff of the plain recurrence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vp_suite_tpu.ops.scan_vjp import convlstm_scan


def _plain_scan(i2h_t, bias, h0, c0, h_kernel, wci, wcf, wco,
                stride, padding, seq_len):
    from vp_suite_tpu.model_blocks._functional import conv2d
    decode = i2h_t is None

    def step(carry, i2h_step):
        h, c = carry
        conv_h = conv2d(h, h_kernel, bias if decode else None, stride, padding)
        gates = conv_h if decode else i2h_step + conv_h
        gi, gf, gc, go = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(gi + wci * c)
        f = jax.nn.sigmoid(gf + wcf * c)
        c_new = f * c + i * jnp.tanh(gc)
        o = jax.nn.sigmoid(go + wco * c_new)
        return (o * jnp.tanh(c_new), c_new), o * jnp.tanh(c_new)

    (h_last, c_last), ys = jax.lax.scan(step, (h0, c0), i2h_t, length=seq_len)
    return ys, (h_last, c_last)


def _inputs(decode, seed=0, t=4, b=2, sh=8, sw=8, f=4):
    rng = np.random.default_rng(seed)
    arr = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)
    i2h_t = None if decode else arr(t, b, sh, sw, 4 * f)
    return dict(i2h_t=i2h_t, bias=arr(4 * f), h0=arr(b, sh, sw, f),
                c0=arr(b, sh, sw, f), h_kernel=arr(3, 3, f, 4 * f),
                wci=arr(sh, sw, f), wcf=arr(sh, sw, f), wco=arr(sh, sw, f))


@pytest.mark.parametrize("decode", [False, True])
def test_scan_vjp_forward_matches(decode):
    kw = _inputs(decode)
    args = (kw["i2h_t"], kw["bias"], kw["h0"], kw["c0"], kw["h_kernel"],
            kw["wci"], kw["wcf"], kw["wco"], 1, 1, 4)
    ys_a, (h_a, c_a) = convlstm_scan(*args)
    ys_b, (h_b, c_b) = _plain_scan(*args)
    np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_b), atol=1e-6)


@pytest.mark.parametrize("decode", [False, True])
def test_scan_vjp_grads_match_autodiff(decode):
    kw = _inputs(decode)
    diff_args = (kw["i2h_t"], kw["bias"], kw["h0"], kw["c0"], kw["h_kernel"],
                 kw["wci"], kw["wcf"], kw["wco"])
    if decode:
        diff_args = diff_args[1:]

    def loss_of(fn):
        def loss(*a):
            if decode:
                a = (None,) + a
            ys, (h_last, c_last) = fn(*a, 1, 1, 4)
            return (jnp.sum(ys * ys) + jnp.sum(h_last) +
                    jnp.sum(jnp.tanh(c_last)))
        return loss

    n = len(diff_args)
    g_ours = jax.grad(loss_of(convlstm_scan), argnums=tuple(range(n)))(*diff_args)
    g_ref = jax.grad(loss_of(_plain_scan), argnums=tuple(range(n)))(*diff_args)
    names = (["i2h_t"] if not decode else []) + \
        ["bias", "h0", "c0", "h_kernel", "wci", "wcf", "wco"]
    for name, a, b in zip(names, g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=1e-4, err_msg=name)


def test_scan_vjp_model_matches_default_policy():
    r"""EF-ConvLSTM forward + grads identical under remat_policy='scan_vjp'."""
    from vp_suite_tpu.models import MODEL_CLASSES
    kw = dict(img_shape=(3, 16, 16), action_size=0,
              tensor_value_range=(0.0, 1.0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 5, 16, 16, 3)).astype(np.float32))
    m1 = MODEL_CLASSES["convlstm-shi"](**kw)
    m2 = MODEL_CLASSES["convlstm-shi"](**kw, remat_policy="scan_vjp")
    p = m1.init(jax.random.PRNGKey(0), x, pred_frames=2)
    y1, _ = m1.apply(p, x, pred_frames=2)
    y2, _ = m2.apply(p, x, pred_frames=2)
    assert float(jnp.abs(y1 - y2).max()) < 1e-6

    def loss(params, m):
        y, _ = m.apply(params, x, pred_frames=2)
        return jnp.sum(y * y)

    g1 = jax.grad(loss)(p, m1)
    g2 = jax.grad(loss)(p, m2)
    mx = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g1, g2)))
    assert mx < 1e-4
