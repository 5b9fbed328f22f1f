r"""PredFormer-lite: a patch-transformer video predictor (TPU-native extra).

No analog in ``/root/reference/vp_suite/models`` (documented as an extra in
the registry, like ``min-conv-rnn``). Motivation: every reference model is
convolutional-recurrent; a factorized space-time transformer is the
MXU-DENSE counterpoint — all FLOPs are large batched matmuls (QKV/attention/
MLP), there is no sequential cell chain inside a step, and the parameter
tensors are exactly the 2-D matrices that Megatron-style tp and ZeRO fsdp
shard best.

Structure (factorized ViViT-style encoder, one-frame head, AR rollout):

- patchify each frame (``patch_size`` p) with one linear: [b, t, h, w, c]
  -> tokens [b, t, n, dim];
- learned spatial + temporal position embeddings (temporal sized by
  ``max_frames`` and sliced, so any context length <= max_frames works);
- ``depth`` pre-LN blocks of FACTORIZED attention: spatial MHA (tokens
  within a frame) then temporal MHA (each site over time) then an MLP;
- head: LayerNorm + linear on the LAST frame's tokens (temporal attention
  has mixed the whole window into them) -> one predicted frame; the
  autoregressive rollout is a Python loop over ``pred_frames`` (params
  shared; XLA unrolls and pipelines it) whose window shifts in TOKEN space
  — each new prediction is patch-embedded once, never re-encoded.

``remat`` checkpoints each block; ``compute_dtype=bfloat16`` runs the whole
token stream in bf16 (params/outputs f32).
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vp_suite_tpu.base.base_model import VPModel


class _Block(nn.Module):
    r"""Pre-LN factorized space-time attention block."""
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # [b, t, n, d]
        b, t, n, d = x.shape
        dt = self.dtype or x.dtype

        # spatial: attend over n within each frame
        y = nn.LayerNorm(dtype=dt, name="ln_s")(x)
        y = y.reshape(b * t, n, d)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=dt, name="attn_s")(y, y)
        x = x + y.reshape(b, t, n, d)
        # temporal: attend over t at each spatial site
        y = nn.LayerNorm(dtype=dt, name="ln_t")(x)
        y = jnp.swapaxes(y, 1, 2).reshape(b * n, t, d)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=dt, name="attn_t")(y, y)
        x = x + jnp.swapaxes(y.reshape(b, n, t, d), 1, 2)
        # MLP
        y = nn.LayerNorm(dtype=dt, name="ln_m")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=dt, name="mlp1")(y)
        y = nn.Dense(self.dim, dtype=dt, name="mlp2")(jax.nn.gelu(y))
        return x + y


class PredFormer(VPModel):
    r"""Factorized space-time transformer video predictor (see module doc)."""
    NAME = "PredFormer-lite (space-time transformer)"
    PAPER_REFERENCE = "https://arxiv.org/abs/2103.15691"  # factorized ViViT line
    CODE_REFERENCE = None
    MATCHES_REFERENCE = "N/A (no reference analog; TPU-native extra)"
    CAN_HANDLE_ACTIONS = False

    patch_size: int = 8
    dim: int = 256
    depth: int = 4
    heads: int = 4
    mlp_ratio: int = 4
    max_frames: int = 32  #: temporal position-embedding capacity (>= context).

    @nn.compact
    def __call__(self, x, pred_frames: int = 1, actions=None,
                 train: bool = False, **kwargs):
        b, t_in = x.shape[:2]
        c, ih, iw = self.img_shape
        if x.shape[2:] != (ih, iw, c):
            raise ValueError(f"input image does not match specified size "
                             f"(input: {x.shape[2:]}, required: {(ih, iw, c)})")
        p = self.patch_size
        if ih % p or iw % p:
            raise ValueError(f"img size {(ih, iw)} must divide patch_size {p}")
        if t_in > self.max_frames:
            raise ValueError(f"context {t_in} exceeds max_frames "
                             f"{self.max_frames}")
        gh, gw = ih // p, iw // p
        n = gh * gw
        dt = jnp.dtype(self.compute_dtype)

        embed = nn.Dense(self.dim, dtype=dt, name="embed")
        blocks = [(nn.remat(_Block) if self.remat else _Block)(
            dim=self.dim, heads=self.heads, mlp_ratio=self.mlp_ratio,
            dtype=dt, name=f"block{li}") for li in range(self.depth)]
        ln_out = nn.LayerNorm(dtype=dt, name="ln_out")
        head = nn.Dense(p * p * c, dtype=dt, name="head")
        pos_s = self.param("pos_spatial", nn.initializers.normal(0.02),
                           (1, 1, n, self.dim))
        pos_t = self.param("pos_temporal", nn.initializers.normal(0.02),
                           (1, self.max_frames, 1, self.dim))

        def patch_embed(frames):  # [b, t, h, w, c] -> [b, t, n, dim]
            t = frames.shape[1]
            z = frames.astype(dt).reshape(b, t, gh, p, gw, p, c)
            z = jnp.moveaxis(z, 3, 4).reshape(b, t, n, p * p * c)
            return embed(z)

        def predict_next(window):  # tokens [b, t_in, n, dim] -> [b, h, w, c]
            z = window + pos_s.astype(dt) + pos_t[:, :t_in].astype(dt)
            for blk in blocks:
                z = blk(z)
            y = head(ln_out(z[:, -1]))                  # [b, n, p*p*c]
            y = y.reshape(b, gh, gw, p, p, c)
            y = jnp.moveaxis(y, 2, 3).reshape(b, ih, iw, c)
            return y

        window = patch_embed(x)
        preds = []
        for _ in range(pred_frames):
            nxt = predict_next(window)
            preds.append(nxt.astype(jnp.float32)[:, None])
            window = jnp.concatenate(
                [window[:, 1:], patch_embed(nxt[:, None])], axis=1)
        return jnp.concatenate(preds, axis=1), None
