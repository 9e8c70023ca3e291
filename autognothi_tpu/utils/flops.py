"""Analytic FLOP counting by walking a traced jaxpr.

Why not `compiled.cost_analysis()`: XLA's cost model counts a `lax.scan`
body ONCE regardless of trip count (measured: the 12-layer scanned BERT
encoder reported ~1/12 of its true FLOPs), so the perf report
(pipeline/measure_performance.py, parity with the reference's
torch.profiler `with_flops`, /root/reference/scripts/measure_performance.py:286-303)
derives FLOPs here instead: matmul / conv FLOPs from operand shapes,
multiplied through scan trip counts.

Like torch.profiler's `with_flops`, only matmul-class ops are counted
(2*M*N*K per dot, 2*out*kernel per conv) — elementwise work is ignored, so
the two frameworks' GFLOP cells are directly comparable.
"""

from __future__ import annotations

import math
from typing import Any

import jax
from jax.extend import core as jcore


def _prod(xs) -> float:
    return float(math.prod(xs)) if xs else 1.0


def _dot_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
    (l_contract, r_contract), (l_batch, _r_batch) = eqn.params[
        "dimension_numbers"
    ]
    batch = _prod([lhs[i] for i in l_batch])
    k = _prod([lhs[i] for i in l_contract])
    skip_l = set(l_batch) | set(l_contract)
    skip_r = set(_r_batch) | set(r_contract)
    m = _prod([d for i, d in enumerate(lhs) if i not in skip_l])
    n = _prod([d for i, d in enumerate(rhs) if i not in skip_r])
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape  # <C_out, C_in/groups, *kernel_spatial>
    return 2.0 * _prod(out) * _prod(rhs[1:])


def _sub_jaxprs(value: Any):
    if isinstance(value, jcore.ClosedJaxpr):
        yield value.jaxpr
    elif isinstance(value, jcore.Jaxpr):
        yield value
    elif isinstance(value, (tuple, list)):
        for item in value:
            yield from _sub_jaxprs(item)


def jaxpr_flops(jaxpr: jcore.Jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            body = eqn.params["jaxpr"]
            total += float(eqn.params["length"]) * jaxpr_flops(body.jaxpr)
        elif name == "cond":
            branches = [jaxpr_flops(b.jaxpr) for b in eqn.params["branches"]]
            total += max(branches) if branches else 0.0
        elif name in ("custom_jvp_call", "custom_vjp_call",
                      "custom_vjp_call_jaxpr"):
            # count only the primal computation, not the saved bwd rule
            inner = eqn.params.get("call_jaxpr") or eqn.params.get("fun_jaxpr")
            for sub in _sub_jaxprs(inner):
                total += jaxpr_flops(sub)
        elif name == "pallas_call":
            # the kernel body jaxpr describes ONE grid step; multiply by the
            # grid product (the fused block kernels run grid=(batch,))
            grid = getattr(eqn.params.get("grid_mapping"), "grid", ()) or ()
            steps = _prod([g for g in grid if isinstance(g, int)])
            for sub in _sub_jaxprs(eqn.params.get("jaxpr")):
                total += steps * jaxpr_flops(sub)
        else:
            # pjit / remat / while / pallas grids etc.: count each contained
            # jaxpr once (while trip counts are not static; unused in the
            # measured models)
            for value in eqn.params.values():
                for sub in _sub_jaxprs(value):
                    total += jaxpr_flops(sub)
    return total


def fn_flops(fn, *args, **kwargs) -> float:
    """FLOPs of one forward evaluation of `fn(*args, **kwargs)`."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return jaxpr_flops(closed.jaxpr)
