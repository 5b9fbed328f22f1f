r"""Analytic FLOP counting by walking jaxprs.

XLA's ``compiled.cost_analysis()`` counts a ``lax.scan``/``while`` body ONCE
regardless of trip count (verified: a 10-step scan of a 128x128 matmul
reports one matmul), which under-reports every recurrent model here by the
sequence length. This walker recurses into control-flow and call primitives
with the correct multipliers:

- ``scan``: body count x ``length``
- ``while``: body count x 1 (trip count unknowable — callers should prefer
  scans, which all models here use)
- ``pallas_call``: kernel jaxpr count x number of grid programs
- call/remat/custom-vjp wrappers: recursed transparently (so counting a
  GRAD jaxpr includes rematerialised recompute — i.e. EXECUTED FLOPs, the
  right denominator-mate for hardware utilisation)

Counted ops: ``dot_general`` and ``conv_general_dilated`` (2 FLOPs/MAC).
Elementwise FLOPs are ignored (<2% for the models here and conventionally
excluded from MFU).
"""
import math

import jax


def _dot_flops(eqn):
    d = eqn.params["dimension_numbers"]
    (lc, _rc), (lb, _rb) = d
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    contract = math.prod(lhs[i] for i in lc)
    return 2 * math.prod(out) * contract


def _conv_flops(eqn):
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape      # kernel
    out = eqn.outvars[0].aval.shape
    kernel_spatial = [rhs[i] for i in dn.rhs_spec[2:]]
    in_feat = rhs[dn.rhs_spec[1]]       # per-group input features (grouped
    # convs already have the group divisor folded into this dim)
    return 2 * math.prod(out) * math.prod(kernel_spatial) * in_feat


def _grid_size(eqn):
    gm = eqn.params.get("grid_mapping")
    if gm is not None and getattr(gm, "grid", None):
        return math.prod(int(g) for g in gm.grid)
    grid = eqn.params.get("grid")
    if grid:
        return math.prod(int(g) for g in grid)
    return 1


def _sub_jaxprs(eqn):
    r"""(jaxpr, multiplier) pairs for call-like primitives."""
    name = eqn.primitive.name
    p = eqn.params
    if name == "scan":
        return [(p["jaxpr"].jaxpr, int(p["length"]))]
    if name == "while":
        return [(p["body_jaxpr"].jaxpr, 1), (p["cond_jaxpr"].jaxpr, 1)]
    if name == "cond":
        # branches can be heterogeneous (e.g. the band-limited vs dense warp
        # kernels differ ~3x in FLOPs and which one runs is data-dependent):
        # count the CHEAPEST branch so reported FLOPs/MFU are a lower bound
        # ("at least this much useful work"), never an overstatement
        return [(min(p["branches"],
                     key=lambda b: count_jaxpr_flops(b.jaxpr)).jaxpr, 1)]
    if name == "pallas_call":
        return [(p["jaxpr"], _grid_size(eqn))]
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in p:
            j = p[key]
            return [(getattr(j, "jaxpr", j), 1)]
    return []


def count_jaxpr_flops(jaxpr):
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        else:
            for sub, mult in _sub_jaxprs(eqn):
                total += mult * count_jaxpr_flops(sub)
    return total


def count_flops(fn, *args, **kwargs):
    r"""Executed matmul/conv FLOPs of one call of ``fn`` (traced abstractly).

    For a train step this includes the backward and any rematerialised
    recompute — divide by step time and peak FLOP/s for hardware FLOP
    utilisation.
    """
    closed = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return count_jaxpr_flops(closed.jaxpr)
