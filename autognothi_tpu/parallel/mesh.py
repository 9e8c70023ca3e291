"""Device mesh construction and sharding rules.

The reference is single-device (SURVEY §2.9); all parallelism here is new,
TPU-native capability:

- 1-D or 2-D `jax.sharding.Mesh` over ("data", "model");
- the *coalition* axis (batch x n_mask_samples masked forwards — the
  workload's scaling dimension, train_explainer.py:153-171) shards along
  "data";
- optional Megatron-style tensor parallelism for ViT-L / BERT-L: QKV and MLP
  up-projections shard their output features, the attention/MLP down
  projections shard their input features, so each layer needs exactly one
  all-reduce per block — inserted automatically by GSPMD from these
  NamedSharding annotations, riding ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..recipes.types import Params


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    """Mesh over ("data", "model").  model_parallel=1 -> pure data/coalition
    parallelism."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


# ---------------------------------------------------------- param shardings

_TP_OUT_FEATURES = (
    # torch-layout (out, in) weights whose OUT features shard over "model"
    "attention.self.query.weight",
    "attention.self.key.weight",
    "attention.self.value.weight",
    "intermediate.dense.weight",
)
_TP_OUT_BIAS = (
    "attention.self.query.bias",
    "attention.self.key.bias",
    "attention.self.value.bias",
    "intermediate.dense.bias",
)
_TP_IN_FEATURES = (
    # (out, in) weights whose IN features shard over "model" (row parallel)
    "attention.output.dense.weight",
    "output.dense.weight",
)


def param_pspec(name: str, ndim: int) -> P:
    """Megatron-style PartitionSpec for a flat param name (replicated when no
    rule matches).  Biases of row-parallel layers stay replicated."""
    for suffix in _TP_OUT_FEATURES:
        if name.endswith(suffix):
            return P("model", None)
    for suffix in _TP_OUT_BIAS:
        if name.endswith(suffix):
            return P("model")
    for suffix in _TP_IN_FEATURES:
        if name.endswith(suffix):
            return P(None, "model")
    return P(*([None] * ndim)) if ndim else P()


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place a flat param dict onto the mesh per `param_pspec`."""
    out: Params = {}
    for name, value in params.items():
        spec = param_pspec(name, value.ndim)
        out[name] = jax.device_put(value, NamedSharding(mesh, spec))
    return out


def replicate_params(params: Params, mesh: Mesh) -> Params:
    sharding = NamedSharding(mesh, P())
    return {k: jax.device_put(v, sharding) for k, v in params.items()}


def shard_batch(tree, mesh: Mesh):
    """Shard every array's leading (batch / coalition) axis along "data"."""

    def place(x):
        x = jnp.asarray(x)
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def setup_data_parallel():
    """Trainer helper: when >1 device is visible, return (mesh, place_params,
    place_batch); on a single device return (None, identity, identity).

    place_params replicates a flat param dict; place_batch shards every
    array's leading axis along "data" when divisible by the mesh size (falls
    back to replication for ragged final batches so the same compiled step
    still runs)."""
    n = len(jax.devices())
    if n < 2:
        identity = lambda tree: tree  # noqa: E731
        return None, identity, identity
    mesh = make_mesh(n, model_parallel=1)

    def place_params(tree):
        return replicate_params(tree, mesh) if isinstance(tree, dict) else (
            jax.device_put(tree, NamedSharding(mesh, P()))
        )

    def place_batch(tree):
        def place(x):
            x = jnp.asarray(x)
            if x.ndim and x.shape[0] % n == 0:
                spec = P("data", *([None] * (x.ndim - 1)))
            else:
                spec = P(*([None] * x.ndim))
            return jax.device_put(x, NamedSharding(mesh, spec))

        return jax.tree.map(place, tree)

    return mesh, place_params, place_batch


def sharded_serving_fn(fn, mesh: Mesh):
    """Wrap a batch-parallel serving forward `fn(params, xs) -> pytree`
    in shard_map over the "data" axis: params replicated, xs and every
    output split on their leading axis.

    WHY shard_map and not plain GSPMD jit: a pallas_call whose operands are
    GSPMD-sharded gets REPLICATED behind all-gathers (custom calls carry no
    partitioning rule — measured: 5 all-gathers + replicated output on the
    8-device mesh, tests/test_pallas_gspmd.py).  Inside shard_map each
    device traces the kernels on its LOCAL batch shard, so the fused
    Pallas serving path actually scales with chips."""
    try:
        from jax import shard_map as smap  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as smap

    def wrapped(params, xs):
        p_specs = jax.tree.map(lambda _: P(), params)
        x_spec = P("data", *([None] * (xs.ndim - 1)))
        outs = jax.eval_shape(fn, params, xs)
        o_specs = jax.tree.map(
            lambda s: P("data", *([None] * (len(s.shape) - 1))), outs)
        return smap(fn, mesh=mesh, in_specs=(p_specs, x_spec),
                    out_specs=o_specs, check_vma=False)(params, xs)

    return jax.jit(wrapped)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Edge-pad `axis` up to a multiple (static shapes for SPMD)."""
    size = arr.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, target - size)
    return np.pad(arr, pad, mode="edge")
