"""AOT export of the trained final model to a StableHLO artifact.

Deployment extension beyond the reference (whose deployment surface is the
file-based demos, /root/reference/scripts/run_image_explanation.py:33 and
run_text_explanation.py:22): `export_final` serializes the final
(prediction + Shapley-attribution) model — program AND trained weights —
into ONE self-contained artifact that any JAX process can load and call
without this framework, the model code, or the checkpoint files:

    python ./main.py export_final <exp> --into final.jaxexp --batch-size 8

    # later, anywhere (no autognothi_tpu needed beyond this 20-line loader):
    from autognothi_tpu.pipeline.export import load_exported
    fw = load_exported("final.jaxexp")
    probs, attr = fw(xs)          # fixed <batch, ...> input, like serve.py

Design notes:
- the artifact is a tiny container: `jax.export` blob (the program, weights
  as RUNTIME ARGUMENTS) + npz of the flat param dict.  Weights must NOT be
  baked in as constants: XLA constant-folds through them on the host, and
  for the int8 serving path the folded weight-quantization (host rounding
  of scales + int8 casts) measurably diverges from the on-device math the
  serving path runs (attr |d| up to 7.5e-2 on the mini gate model —
  BASELINE.md r3).  With weights as arguments the artifact is bit-identical
  to `pipeline/serve.py`;
- default trace is the pure-XLA path (`pallas_override("0")`) in the
  checkpoint's own precision (`quant_override("none")`): Mosaic custom
  calls would pin the bytes to one exact chip generation, while a
  StableHLO-only artifact cross-compiles; by default it is lowered for
  BOTH `tpu` and `cpu` so one file serves either backend;
- fixed batch, matching the serving layer's fixed-shape slab contract
  (pad the last request like `pipeline/serve.py` does);
- the KernelSHAP baseline's final is host-side WLS (`fw_final_host`) and
  cannot be exported — fails closed with a clear error.
"""

from __future__ import annotations

import io
import pathlib
import struct
from typing import Callable, Sequence, Tuple

import numpy as np

from .env import ExpEnv
from .resources import get_recipe, load_epoch_model

DEFAULT_PLATFORMS = ("tpu", "cpu")
_MAGIC = b"AGTPEXP1"


def _pack(program: bytes, params: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in params.items()})
    return (_MAGIC + struct.pack("<Q", len(program)) + bytes(program)
            + buf.getvalue())


def _unpack(blob: bytes):
    if blob[:8] != _MAGIC:
        raise ValueError("not an export_final artifact (bad magic)")
    n = struct.unpack("<Q", blob[8:16])[0]
    program = bytearray(blob[16:16 + n])
    with np.load(io.BytesIO(blob[16 + n:])) as z:
        params = {k: z[k] for k in z.files}
    return program, params


def export_final(env: ExpEnv, into: pathlib.Path, batch_size: int = 8,
                 platforms: Sequence[str] = DEFAULT_PLATFORMS,
                 kernels: bool = False) -> dict:
    """Serialize the final model at a fixed batch size; returns metadata.

    `kernels=True` embeds the fused Pallas block kernels (and the int8
    serving path when AUTOGNOTHI_INT8=1) instead of the portable XLA math:
    the artifact then contains Mosaic custom calls, runs at the measured
    serving throughput, and is pinned to `platforms=["tpu"]`.
    """
    import jax
    from jax import export as jexport

    from ..models.common import pallas_override, quant_override

    recipe, m_config = get_recipe(env.config)
    if recipe.fw_final_host:
        raise SystemExit(
            f"net kind {env.config.net.kind!r} computes its final "
            "explanation on the host (KernelSHAP WLS) — there is no device "
            "program to export")
    if kernels:
        if list(platforms) != ["tpu"]:
            raise SystemExit(
                "--kernels embeds Mosaic custom calls — the artifact only "
                "lowers for tpu (pass --platforms tpu)")
        import os

        modes = ("2", "int8" if os.environ.get("AUTOGNOTHI_INT8") == "1"
                 else "none")
    else:
        modes = ("0", "none")
    _, final_params = load_epoch_model(env, recipe, "final")
    misc = recipe.load_misc(env.model_path, m_config)
    null = np.asarray(recipe.gen_null(m_config, misc))
    if batch_size == 0:
        # batch-polymorphic artifact: one lowering serves ANY batch.  The
        # XLA path traces cleanly with a symbolic leading dim; the Pallas
        # kernels cannot (static grids/block shapes).
        if kernels:
            raise SystemExit("--kernels needs a fixed --batch-size "
                             "(Pallas grids are static)")
        batch_dim = jexport.symbolic_shape("b")[0]
    else:
        batch_dim = batch_size
    in_spec = jax.ShapeDtypeStruct((batch_dim,) + null.shape[1:],
                                   null.dtype)
    param_specs = {
        k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
        for k, v in final_params.items()
    }

    def fw(params, xs):
        with pallas_override(modes[0]), quant_override(modes[1]):
            return recipe.fw_final(m_config, params, xs)

    env.log(f"[[[ export_final: batch {batch_size}, input "
            f"{in_spec.shape} {in_spec.dtype}, platforms "
            f"{list(platforms)}, kernels={kernels} ]]]")
    exported = jexport.export(jax.jit(fw), platforms=list(platforms))(
        param_specs, in_spec)
    blob = _pack(exported.serialize(), final_params)
    into = pathlib.Path(into)
    into.write_bytes(blob)
    meta = {
        "path": str(into),
        "bytes": len(blob),
        "batch_size": batch_size or "symbolic",
        "platforms": list(platforms),
        "in_shape": [d if isinstance(d, int) else str(d)
                     for d in in_spec.shape],
        "in_dtype": str(in_spec.dtype),
        "kernels": kernels,
        "quant": modes[1],
        "n_params": len(final_params),
    }
    env.log(f"[[[ export_final: wrote {meta['bytes']} bytes -> {into} ]]]")
    return meta


def load_exported(path: pathlib.Path) -> Callable[[np.ndarray], Tuple]:
    """Deserialize an `export_final` artifact into a callable.

    The callable takes the fixed-shape input batch and returns whatever the
    recipe's `fw_final` returns (probabilities/logits, attributions).  The
    bundled weights ride along as call arguments (see module docstring for
    why they are not constants).
    """
    import jax
    from jax import export as jexport

    program, params = _unpack(pathlib.Path(path).read_bytes())
    exported = jexport.deserialize(program)
    # jit the exported program with the weights as call ARGUMENTS (one
    # executable per input shape/dtype; no host constant-folding through
    # the weight-quant chain — module docstring)
    pcall = jax.jit(exported.call)

    def call(xs):
        return pcall(params, xs)

    # self-description for callers that must match the program's fixed
    # shape (pipeline/serve.py slabs requests to exactly this batch):
    # the xs aval is the last flattened input (params dict leaves precede)
    in_aval = exported.in_avals[-1]
    call.in_shape = tuple(
        d if isinstance(d, int) else None for d in in_aval.shape)
    call.in_dtype = np.dtype(in_aval.dtype)
    call.platforms = tuple(exported.platforms)
    # serving integration points: the jitted (params, xs) entry (so callers
    # can fuse pre-processing like u8 dequant into the same executable) and
    # the bundled weights themselves
    call.pcall = pcall
    call.params = params
    return call
