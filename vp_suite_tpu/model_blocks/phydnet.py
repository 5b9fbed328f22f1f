r"""PhyDNet building blocks (PhyCell, K2M) — TPU-native.

Capability parity with the reference
(``vp_suite/model_blocks/phydnet.py:13-363``): PDE-constrained PhyCell with a
physical predictor F (conv → GroupNorm → 1x1 conv) and a sigmoid correction
gate; the kernel→moment K2M transform used for the moment-regularization loss;
and the GroupNorm divisor helper.

The reference keeps hidden state mutably on the module
(``phydnet.py:95-111``); here state is explicit — cells are param factories
returning pure step closures, and the multi-layer stacks are driven by the
model's ``lax.scan``.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import factorial

from vp_suite_tpu.model_blocks._functional import conv2d, group_norm, make_conv_params


def find_divisor_for_group_norm(x: int):
    r"""Finds a divisor of ``x`` close to sqrt(x) (parity:
    ``model_blocks/phydnet.py:348-363``)."""
    sq = math.floor(math.sqrt(x))
    while True:
        if x // sq == x / sq:
            return x // sq
        sq -= 1


def make_phycell_cell(module, name, input_dim, action_conditional, action_size,
                      hidden_dim, kernel_size, use_bias=True):
    r"""Creates a PhyCell cell's params on ``module``; returns a step closure
    ``step(frame, action, hidden) -> next_hidden``
    (reference math: ``phydnet.py:49-62``)."""
    import flax.linen as nn
    k = kernel_size if isinstance(kernel_size, tuple) else (kernel_size, kernel_size)
    pad = (k[0] // 2, k[1] // 2)
    groups = find_divisor_for_group_norm(hidden_dim)

    f1_k, f1_b = make_conv_params(module, f"{name}_F_conv1", input_dim, hidden_dim, k)
    gn_scale = module.param(f"{name}_F_bn1_scale", nn.initializers.ones, (hidden_dim,))
    gn_bias = module.param(f"{name}_F_bn1_bias", nn.initializers.zeros, (hidden_dim,))
    f2_k, f2_b = make_conv_params(module, f"{name}_F_conv2", hidden_dim, input_dim, 1)
    cg_k, cg_b = make_conv_params(module, f"{name}_convgate", 2 * input_dim, input_dim,
                                  (3, 3), use_bias=use_bias)
    fa_k = fa_b = ha_k = ha_b = None
    if action_conditional:
        fa_k, fa_b = make_conv_params(module, f"{name}_frame_action_conv",
                                      input_dim + action_size, input_dim, 1)
        ha_k, ha_b = make_conv_params(module, f"{name}_hidden_action_conv",
                                      input_dim + action_size, input_dim, 1)

    def step(frame, action, hidden):
        if action_conditional:
            h, w = frame.shape[1:3]
            inflated = jnp.broadcast_to(action[:, None, None, :],
                                        (action.shape[0], h, w, action.shape[-1]))
            frame = conv2d(jnp.concatenate([frame, inflated], axis=-1), fa_k, fa_b, 1, 0)
            hidden = conv2d(jnp.concatenate([hidden, inflated], axis=-1), ha_k, ha_b, 1, 0)
        combined = jnp.concatenate([frame, hidden], axis=-1)
        gate = jax.nn.sigmoid(conv2d(combined, cg_k, cg_b, 1, (1, 1)))
        # physical predictor F: conv -> GroupNorm -> 1x1 conv
        fh = conv2d(hidden, f1_k, f1_b, 1, pad)
        fh = group_norm(fh, gn_scale, gn_bias, groups)
        fh = conv2d(fh, f2_k, f2_b, 1, 0)
        hidden_tilde = hidden + fh                                 # prediction
        return hidden_tilde + gate * (frame - hidden_tilde)        # correction

    step.f_conv1_kernel = lambda: f1_k  # exposed for the moment loss
    return step


def k2m_matrices(shape):
    r"""Moment matrices M_l for each kernel axis (parity:
    ``phydnet.py:223-238``): row i of M is ((arange(l)-(l-1)//2)**i)/i!."""
    mats = []
    for l in shape:
        m = np.zeros((l, l))
        for i in range(l):
            m[i] = ((np.arange(l) - (l - 1) // 2) ** i) / factorial(i)
        mats.append(jnp.asarray(m, dtype=jnp.float32))
    return mats


def k2m(kernels, mats):
    r"""Kernel → moment transform for a batch of 2-D kernels.

    Args:
        kernels: [n, kh, kw] conv kernels.
        mats: list of two moment matrices from :func:`k2m_matrices`.

    Returns: [n, kh, kw] moment matrices. Equivalent to the reference's
    ``K2M.forward`` (``phydnet.py:277-299``):
    ``out[n,i,j] = sum_{p,q} M0[i,p] M1[j,q] k[n,p,q]``.
    """
    m0, m1 = mats
    return jnp.einsum("ip,jq,npq->nij", m0, m1, kernels)


def moment_constraints(channels, kernel_size):
    r"""The per-channel one-hot moment constraints (parity:
    ``models/phydnet.py:66-71``): channel ind targets moment (i, j)."""
    kh, kw = kernel_size
    con = np.zeros((channels, kh, kw), dtype=np.float32)
    ind = 0
    for i in range(kh):
        for j in range(kw):
            if ind < channels:
                con[ind, i, j] = 1.0
            ind += 1
    return jnp.asarray(con)


def moment_loss(f_conv1_kernel, constraints, kernel_size, moment_scale=1.0):
    r"""Moment-regularization loss over all input channels of the PhyCell's
    first F conv (parity: ``models/phydnet.py:126-133``).

    Args:
        f_conv1_kernel: [kh, kw, in_dim, hidden] (our layout).
        constraints: [hidden, kh, kw].
    """
    mats = k2m_matrices(kernel_size)
    # [kh, kw, in, hid] -> per input channel b: filters [hid, kh, kw]
    kern = jnp.transpose(f_conv1_kernel, (2, 3, 0, 1))  # [in, hid, kh, kw]

    def per_in_channel(filters):
        m = k2m(filters, mats)
        return jnp.mean((m - constraints) ** 2)

    losses = jax.vmap(per_in_channel)(kern)
    return jnp.sum(losses)
