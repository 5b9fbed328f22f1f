r"""Microbenchmark: bilinear warp strategies on TPU.

TrajGRU spends most of its step on L=13 flow warps per layer. This compares
gather formulations on the layer-1 shape ([32, 64, 64, 96], 13 flows) to pick
the fastest lowering. Timing uses the marginal (T(2N)-T(N))/N host-fetch-sync
method (jax.block_until_ready is a no-op on the axon backend).
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from vp_suite_tpu.utils.utils import enable_compilation_cache

enable_compilation_cache()

B, H, W, C, L = 32, 64, 64, 96, 13


def time_fn(fn, *args, n=10):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    float(np.asarray(jnp.sum(out)))  # compile+sync

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn_j(*args)
        float(np.asarray(jnp.sum(o)))
        return time.perf_counter() - t0

    t_n, t_2n = run(n), run(2 * n)
    return (t_2n - t_n) / n * 1e3  # ms


def unnorm(flow):
    xx = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    yy = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    ix = xx + flow[..., 0]
    iy = yy + flow[..., 1]
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx1, wy1 = ix - ix0, iy - iy0
    return ix0, iy0, wx1, wy1


def warp_current(img, flows):
    r"""Current impl: per-flow advanced-indexing gathers (4 each)."""
    from vp_suite_tpu.ops.grid_sample import warp_flow
    outs = [warp_flow(img, flows[..., 2 * j:2 * j + 2]) for j in range(L)]
    return jnp.concatenate(outs, axis=-1)


def warp_flat_take(img, flows):
    r"""Flattened spatial axis + take_along_axis, all L folded into one axis."""
    f = flows.reshape(B, H, W, L, 2)
    f = jnp.moveaxis(f, 3, 1)  # [B, L, H, W, 2]
    ix0, iy0, wx1, wy1 = unnorm(f.reshape(B * L, H, W, 2))
    img_flat = jnp.repeat(img.reshape(B, 1, H * W, C), 1, axis=1)  # [B,1,HW,C]

    def corner(iy_, ix_):
        valid = (ix_ >= 0) & (ix_ <= W - 1) & (iy_ >= 0) & (iy_ <= H - 1)
        iyc = jnp.clip(iy_, 0, H - 1).astype(jnp.int32)
        ixc = jnp.clip(ix_, 0, W - 1).astype(jnp.int32)
        idx = (iyc * W + ixc).reshape(B, L * H * W)  # [B, LHW]
        vals = jnp.take_along_axis(img_flat[:, 0], idx[..., None], axis=1)
        return vals.reshape(B * L, H, W, C) * valid[..., None].astype(img.dtype)

    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    out = (corner(iy0, ix0) * (wy0 * wx0)[..., None]
           + corner(iy0, ix0 + 1) * (wy0 * wx1)[..., None]
           + corner(iy0 + 1, ix0) * (wy1 * wx0)[..., None]
           + corner(iy0 + 1, ix0 + 1) * (wy1 * wx1)[..., None])
    out = out.reshape(B, L, H, W, C)
    return jnp.moveaxis(out, 1, 3).reshape(B, H, W, L * C)


def warp_one_gather(img, flows):
    r"""All 4 corners AND all L flows in a single take_along_axis call."""
    f = flows.reshape(B, H, W, L, 2)
    f = jnp.moveaxis(f, 3, 1)  # [B, L, H, W, 2]
    ix0, iy0, wx1, wy1 = unnorm(f.reshape(B * L, H, W, 2))
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    cs = [(iy0, ix0, wy0 * wx0), (iy0, ix0 + 1.0, wy0 * wx1),
          (iy0 + 1.0, ix0, wy1 * wx0), (iy0 + 1.0, ix0 + 1.0, wy1 * wx1)]
    idxs, weights = [], []
    for iy_, ix_, w_ in cs:
        valid = (ix_ >= 0) & (ix_ <= W - 1) & (iy_ >= 0) & (iy_ <= H - 1)
        iyc = jnp.clip(iy_, 0, H - 1).astype(jnp.int32)
        ixc = jnp.clip(ix_, 0, W - 1).astype(jnp.int32)
        idxs.append((iyc * W + ixc).reshape(B, L * H * W))
        weights.append((w_ * valid.astype(img.dtype)).reshape(B, L * H * W))
    idx = jnp.concatenate(idxs, axis=1)        # [B, 4LHW]
    wgt = jnp.concatenate(weights, axis=1)     # [B, 4LHW]
    img_flat = img.reshape(B, H * W, C)
    vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)  # [B,4LHW,C]
    vals = (vals * wgt[..., None]).reshape(B, 4, L, H, W, C).sum(axis=1)
    return jnp.moveaxis(vals, 1, 3).reshape(B, H, W, L * C)


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    flows = jnp.asarray((rng.rand(B, H, W, 2 * L) * 8 - 4).astype(np.float32)) \
        .astype(jnp.bfloat16)

    r_cur = np.asarray(jax.jit(warp_current)(img, flows), dtype=np.float32)
    for name, fn in [("flat_take", warp_flat_take), ("one_gather", warp_one_gather)]:
        r = np.asarray(jax.jit(fn)(img, flows), dtype=np.float32)
        # reorder: current is concat over L of [.., C]; variants interleave the
        # same way via moveaxis+reshape -> identical layout
        err = np.abs(r - r_cur).max()
        print(f"{name}: max abs diff vs current = {err:.4f}")

    for name, fn in [("current(13x4 gathers)", warp_current),
                     ("flat_take(4 gathers)", warp_flat_take),
                     ("one_gather(1 gather)", warp_one_gather)]:
        ms = time_fn(fn, img, flows)
        print(f"{name:26s} {ms:8.2f} ms")

    # gradient path (the scatter-add side)
    for name, fn in [("current grad", warp_current), ("flat_take grad", warp_flat_take),
                     ("one_gather grad", warp_one_gather)]:
        g = lambda a, b: jnp.sum(fn(a, b) ** 2)
        grad_fn = jax.grad(g, argnums=(0, 1))
        ms = time_fn(lambda a, b: grad_fn(a, b)[0], img, flows)
        print(f"{name:26s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()


def _onehot_factors(flows):
    r"""Weighted one-hot factor matrices A [B,L,P,H], Bm [B,L,P,W] such that
    bilinear-warp(h, flow_l)[p, c] = sum_{y,x} A[l,p,y] Bm[l,p,x] h[y,x,c]."""
    f = flows.reshape(B, H, W, L, 2)
    f = jnp.moveaxis(f, 3, 1)                      # [B, L, H, W, 2]
    ix0, iy0, wx1, wy1 = unnorm(f)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    iy1, ix1 = iy0 + 1.0, ix0 + 1.0
    ii = jnp.arange(H, dtype=flows.dtype)
    def fac(i0, i1, w0, w1, n):
        v0 = (i0 >= 0) & (i0 <= n - 1)
        v1 = (i1 >= 0) & (i1 <= n - 1)
        a = (w0 * v0)[..., None] * (ii[:n] == i0[..., None]).astype(flows.dtype) \
          + (w1 * v1)[..., None] * (ii[:n] == i1[..., None]).astype(flows.dtype)
        return a.reshape(B, L, H * W, n)
    return fac(iy0, iy1, wy0, wy1, H), fac(ix0, ix1, wx0, wx1, W)


def warp_einsum(img, flows):
    r"""Warp as two MXU contractions per flow (scan over L keeps U small)."""
    A, Bm = _onehot_factors(flows)                  # [B,L,P,H], [B,L,P,W]
    h = img                                         # [B,H,W,C]
    def one(carry, ab):
        a, bm = ab                                  # [B,P,H], [B,P,W]
        u = jnp.einsum("bpy,byxc->bpxc", a, h)      # MXU matmul
        o = jnp.einsum("bpx,bpxc->bpc", bm, u)      # mul+reduce
        return carry, o
    _, outs = jax.lax.scan(one, 0,
                           (jnp.moveaxis(A, 1, 0), jnp.moveaxis(Bm, 1, 0)))
    outs = jnp.moveaxis(outs, 0, 1).reshape(B, L, H, W, C)
    return jnp.moveaxis(outs, 1, 3).reshape(B, H, W, L * C)


def extra():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    flows = jnp.asarray((rng.rand(B, H, W, 2 * L) * 8 - 4).astype(np.float32)) \
        .astype(jnp.bfloat16)
    r_ein = np.asarray(jax.jit(warp_einsum)(img, flows), dtype=np.float32)
    r_ref = np.asarray(jax.jit(warp_flat_take)(img, flows), dtype=np.float32)
    print("einsum vs flat_take max diff:", np.abs(r_ein - r_ref).max())
    print(f"einsum fwd  {time_fn(warp_einsum, img, flows):8.2f} ms")
    g = lambda a, b: jnp.sum(warp_einsum(a, b) ** 2)
    grad_fn = jax.grad(g, argnums=(0, 1))
    print(f"einsum grad {time_fn(lambda a, b: grad_fn(a, b)[0], img, flows):8.2f} ms")


if __name__ == "__main__" and "extra" in sys.argv:
    extra()
