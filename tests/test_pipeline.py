r"""GPipe pipeline-parallelism tests (virtual 8-device CPU mesh).

Verifies the ``parallel/pipeline.py`` schedule against serial execution:
forward equivalence, gradient equivalence through the ``ppermute`` chain,
and the degenerate single-stage path. A tier the reference lacks entirely
(single-device; SURVEY.md §2.9).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vp_suite_tpu.parallel.mesh import make_mesh_nd
from vp_suite_tpu.parallel.pipeline import (gpipe_apply, microbatch,
                                            stack_stage_params)

S, M, MB, IMG, C = 4, 8, 2, 8, 4  # stages, microbatches, microbatch size


def _stage_fn(params, x):
    y = jax.lax.conv_general_dilated(
        x, params["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.tanh(y + params["b"])


def _make_params(rng, n_stages):
    return [{"w": jnp.asarray(rng.randn(3, 3, C, C) * 0.3, jnp.float32),
             "b": jnp.asarray(rng.randn(C) * 0.1, jnp.float32)}
            for _ in range(n_stages)]


def _serial(params_list, x):
    for p in params_list:
        x = _stage_fn(p, x)
    return x


def test_gpipe_forward_matches_serial():
    rng = np.random.RandomState(0)
    params_list = _make_params(rng, S)
    x = jnp.asarray(rng.rand(M * MB, IMG, IMG, C), jnp.float32)

    ref = _serial(params_list, x)

    mesh = make_mesh_nd({"pp": S})
    stacked = stack_stage_params(params_list)
    out = gpipe_apply(_stage_fn, stacked, microbatch(x, M), mesh)
    out = out.reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-6, rtol=1e-6)


def test_gpipe_grads_match_serial():
    r"""jax.grad through the pipeline (scan + ppermute + psum) must equal
    the serial gradients — per stage, including the first and last."""
    rng = np.random.RandomState(1)
    params_list = _make_params(rng, S)
    x = jnp.asarray(rng.rand(M * MB, IMG, IMG, C), jnp.float32)
    tgt = jnp.asarray(rng.rand(M * MB, IMG, IMG, C), jnp.float32)

    def serial_loss(params_list, x):
        return jnp.mean((_serial(params_list, x) - tgt) ** 2)

    ref_grads = jax.grad(serial_loss)(params_list, x)

    mesh = make_mesh_nd({"pp": S})

    def pipe_loss(stacked, x):
        out = gpipe_apply(_stage_fn, stacked, microbatch(x, M), mesh)
        return jnp.mean((out.reshape(tgt.shape) - tgt) ** 2)

    pipe_grads = jax.grad(pipe_loss)(stack_stage_params(params_list), x)

    for i in range(S):
        for k in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(ref_grads[i][k]), np.asarray(pipe_grads[k][i]),
                atol=1e-6, rtol=1e-5, err_msg=f"stage {i} {k}")


def test_gpipe_single_stage_degenerates_to_vmap():
    rng = np.random.RandomState(2)
    params_list = _make_params(rng, 1)
    x = jnp.asarray(rng.rand(4 * MB, IMG, IMG, C), jnp.float32)
    mesh = make_mesh_nd({"pp": 1})
    out = gpipe_apply(_stage_fn, stack_stage_params(params_list),
                      microbatch(x, 4), mesh)
    ref = _serial(params_list, x)
    np.testing.assert_allclose(np.asarray(ref),
                               np.asarray(out.reshape(ref.shape)), atol=1e-6)


def test_microbatch_validates_divisibility():
    with pytest.raises(ValueError, match="not divisible"):
        microbatch(jnp.zeros((5, 2)), 2)
