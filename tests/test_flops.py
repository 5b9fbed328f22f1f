r"""Jaxpr FLOP counter (``utils/flops.py``): exact on matmul/conv/scan/remat
compositions — the basis of the bench's ``mfu`` field (XLA cost_analysis
counts scan bodies once, which under-reports recurrent models)."""
import jax
import jax.numpy as jnp
from jax import lax

from vp_suite_tpu.utils.flops import count_flops


def test_scan_multiplies_by_length():
    def f(x):
        out, _ = lax.scan(lambda c, _: (c @ c, None), x, None, length=10)
        return out
    assert count_flops(f, jnp.ones((128, 128))) == 10 * 2 * 128 ** 3


def test_conv_flops():
    def g(x, k):
        return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = count_flops(g, jnp.ones((2, 8, 8, 3)), jnp.ones((3, 3, 3, 16)))
    assert got == 2 * 2 * 64 * 16 * 9 * 3


def test_grad_counts_backward_and_remat():
    def h(x):
        body = jax.checkpoint(lambda c, _: (jnp.tanh(c @ c), None))
        out, _ = lax.scan(body, x, None, length=4)
        return jnp.sum(out)
    fwd = 4 * 2 * 64 ** 3
    got = count_flops(jax.grad(h), jnp.ones((64, 64)))
    assert got == 4 * fwd  # fwd + remat recompute + two backward matmuls


def test_jitted_function_is_traversed():
    f = jax.jit(lambda a, b: a @ b)
    assert count_flops(f, jnp.ones((32, 64)), jnp.ones((64, 16))) \
        == 2 * 32 * 64 * 16
