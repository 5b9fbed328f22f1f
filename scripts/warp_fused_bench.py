r"""Microbenchmark: pre-built-factor warp kernels vs fused factor-in-VMEM.

Compares on the EF-TrajGRU layer-1 shape ([32, 64, 64, C], 13 flows, bf16):
  old: XLA builds A/Bm one-hot factors in HBM -> warp_contract Pallas kernels
  new: warp_sample builds factor tiles in VMEM from fractional indices
forward-only and forward+backward (grad wrt img and indices/factors).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from vp_suite_tpu.utils.utils import enable_compilation_cache
from vp_suite_tpu.ops import pallas_warp as pw
from vp_suite_tpu.ops.grid_sample import _onehot_factor

enable_compilation_cache()

B, H, W, C, L = 32, 64, 64, 96, 13
P = H * W


def time_fn(fn, *args, n=10):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    out = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(out)))

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = jax.tree_util.tree_leaves(fn_j(*args))[0]
        float(np.asarray(jnp.sum(o)))
        return time.perf_counter() - t0

    t_n, t_2n = run(n), run(2 * n)
    return (t_2n - t_n) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype=dtype)
    iy = jnp.asarray(rng.random((B, L, P)) * (H + 4) - 2, dtype=jnp.float32)
    ix = jnp.asarray(rng.random((B, L, P)) * (W + 4) - 2, dtype=jnp.float32)

    def old_fwd(iy_, ix_, img_):
        A = _onehot_factor(iy_, H, img_.dtype)
        Bm = _onehot_factor(ix_, W, img_.dtype)
        return pw.warp_contract(A, Bm, img_)

    def new_fwd(iy_, ix_, img_):
        return pw.warp_sample(iy_, ix_, img_)

    print(f"backend={jax.default_backend()} shape=[{B},{H},{W},{C}] L={L}")
    print(f"old fwd : {time_fn(old_fwd, iy, ix, img):8.2f} ms")
    print(f"new fwd : {time_fn(new_fwd, iy, ix, img):8.2f} ms")

    def grad_of(f):
        def loss(iy_, ix_, img_):
            return jnp.sum(f(iy_, ix_, img_).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))

    print(f"old f+b : {time_fn(grad_of(old_fwd), iy, ix, img):8.2f} ms")
    print(f"new f+b : {time_fn(grad_of(new_fwd), iy, ix, img):8.2f} ms")


if __name__ == "__main__":
    main()
