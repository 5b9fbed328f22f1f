r"""Bilinear grid sampling (flow warping) for NHWC tensors.

TPU-native replacement for ``torch.nn.functional.grid_sample`` as used by
TrajGRU's trajectory warping (reference: ``vp_suite/model_blocks/traj_gru.py:
149-164``). Torch semantics reproduced: ``align_corners=False``, zero padding
outside the image, bilinear interpolation.

Implemented as a pure gather + weighted-sum so XLA fuses it with surrounding
elementwise work; all shapes static. This is also the fallback path for the
Pallas warp kernel in ``vp_suite_tpu.ops.pallas_cells``.
"""
import jax.numpy as jnp


def grid_sample(img, grid):
    r"""Samples ``img`` at normalized grid locations.

    Args:
        img: [b, h, w, c] input.
        grid: [b, h_out, w_out, 2] with (x, y) in [-1, 1]
            (torch convention: last dim is (x=width coord, y=height coord)).

    Returns: [b, h_out, w_out, c] sampled output, zeros outside the image.
    """
    b, h, w, c = img.shape
    x = grid[..., 0]
    y = grid[..., 1]
    # align_corners=False unnormalization: ix = ((x + 1) * W - 1) / 2
    ix = ((x + 1.0) * w - 1.0) / 2.0
    iy = ((y + 1.0) * h - 1.0) / 2.0

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    # bilinear weights
    wx1 = ix - ix0
    wx0 = 1.0 - wx1
    wy1 = iy - iy0
    wy0 = 1.0 - wy1

    def gather(iy_, ix_):
        # zero padding: mask out-of-bounds, clamp indices for the gather
        valid = (ix_ >= 0) & (ix_ <= w - 1) & (iy_ >= 0) & (iy_ <= h - 1)
        ixc = jnp.clip(ix_, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_, 0, h - 1).astype(jnp.int32)
        # [b, h_out, w_out] indices into [b, h, w, c]
        batch_idx = jnp.arange(b)[:, None, None]
        vals = img[batch_idx, iyc, ixc]  # [b, h_out, w_out, c]
        return vals * valid[..., None].astype(img.dtype)

    out = (gather(iy0, ix0) * (wy0 * wx0)[..., None]
           + gather(iy0, ix1) * (wy0 * wx1)[..., None]
           + gather(iy1, ix0) * (wy1 * wx0)[..., None]
           + gather(iy1, ix1) * (wy1 * wx1)[..., None])
    return out


def warp_flow(img, flow):
    r"""Warps ``img`` along a dense flow field (TrajGRU ``_warp`` semantics,
    reference ``traj_gru.py:149-164``).

    Args:
        img: [b, h, w, c].
        flow: [b, h, w, 2] pixel-space offsets, channel order (dx, dy).

    Returns: [b, h, w, c].
    """
    b, h, w, _ = flow.shape
    xx = jnp.arange(w, dtype=img.dtype)[None, None, :]
    yy = jnp.arange(h, dtype=img.dtype)[None, :, None]
    vx = xx + flow[..., 0]
    vy = yy + flow[..., 1]
    # normalize to [-1, 1] (torch: 2*v/max(dim-1,1) - 1)
    gx = 2.0 * vx / max(w - 1, 1) - 1.0
    gy = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    return grid_sample(img, grid)
