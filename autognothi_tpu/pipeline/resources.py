"""Recipe registry, dataset dispatch and checkpoint I/O.

Checkpoints: one `.ckpt` file per (section, epoch) named
`{section}-epoch-{e}.ckpt` exactly like the reference (/root/reference/
scripts/resources.py:195-209), but the payload is an `.npz` of the flat
param dict (torch-free, memory-mappable).  Retention keeps epoch 0, the
final epoch, and epochs matching the `ckpt_when` cadence DSL; the previous
non-matching epoch is deleted after each save (resources.py:189-217).
"""

from __future__ import annotations

import os
import pathlib
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.loader import (
    CvTransformResize,
    CvTransforms,
    DatasetLoader,
    load_cv_samples,
    load_imagenette,
    load_nlp_samples,
    load_yelp_polarity,
    load_yelp_polarity_mini,
)
from ..recipes.types import ModelRecipe, Params
from ..utils.seeding import guard_never
from ..utils.strings import ranged_modulo_test
from .config import Config_Dataset, Config_Train, ExpConfig


def get_recipe(config: ExpConfig) -> Tuple[ModelRecipe, Any]:
    kind = config.net.kind
    if kind == "vanilla_vit":
        from ..recipes.vanilla_vit import vanilla_vit_recipe

        recipe = vanilla_vit_recipe()
    elif kind == "vanilla_bert":
        from ..recipes.vanilla_bert import vanilla_bert_recipe

        recipe = vanilla_bert_recipe()
    elif kind == "ltt_bert":
        from ..recipes.ltt_bert import ltt_bert_recipe

        recipe = ltt_bert_recipe()
    elif kind == "ltt_vit":
        from ..recipes.ltt_vit import ltt_vit_recipe

        recipe = ltt_vit_recipe()
    elif kind == "froyo_bert":
        from ..recipes.froyo_bert import froyo_bert_recipe

        recipe = froyo_bert_recipe()
    elif kind == "froyo_vit":
        from ..recipes.froyo_vit import froyo_vit_recipe

        recipe = froyo_vit_recipe()
    elif kind == "duo_vanilla_bert":
        from ..recipes.duo_vanilla_bert import duo_vanilla_bert_recipe

        recipe = duo_vanilla_bert_recipe()
    elif kind == "duo_vanilla_vit":
        from ..recipes.duo_vanilla_vit import duo_vanilla_vit_recipe

        recipe = duo_vanilla_vit_recipe()
    elif kind == "kernel_shap_bert":
        from ..recipes.kernel_shap_bert import kernel_shap_bert_recipe

        recipe = kernel_shap_bert_recipe()
    else:
        guard_never(kind)
    if config.net.version != recipe.version:
        raise ValueError(
            f"mismatch recipe version: (config) {config.net.version} != "
            f"(code) {recipe.version}"
        )
    return recipe, config.net.params


def load_id_dataset(kind: str, img_px_size: Optional[int] = None) -> DatasetLoader:
    if kind == "nlp_samples":
        return load_nlp_samples()
    if kind == "yelp_polarity_mini":
        return load_yelp_polarity_mini()
    if kind == "yelp_polarity":
        return load_yelp_polarity(train_size=560000, test_size=38000, test_seed=42)
    if kind == "imagenette":
        assert img_px_size is not None
        return load_imagenette(
            train_size=9469, test_size=3925, test_seed=42,
            transforms=CvTransforms(
                resize=CvTransformResize(height=img_px_size, width=img_px_size)
            ),
        )
    if kind == "cv_samples":
        assert img_px_size is not None
        return load_cv_samples(img_px_size=img_px_size)
    raise ValueError(f"unknown dataset kind: {kind}")


def load_cfg_dataset(cfg: Config_Dataset, root_dir: pathlib.Path) -> DatasetLoader:
    if cfg.kind == "nlp_samples":
        return load_nlp_samples()
    if cfg.kind == "yelp_polarity_mini":
        return load_yelp_polarity_mini()
    if cfg.kind == "yelp_polarity":
        return load_yelp_polarity(
            train_size=cfg.train_size, test_size=cfg.test_size,
            test_seed=cfg.test_seed,
        )
    if cfg.kind == "imagenette":
        return load_imagenette(
            train_size=cfg.train_size, test_size=cfg.test_size,
            test_seed=cfg.test_seed, transforms=cfg.transforms,
        )
    if cfg.kind == "cv_samples":
        return load_cv_samples(
            train_size=cfg.train_size, test_size=cfg.test_size,
            img_px_size=cfg.img_px_size, num_classes=cfg.num_classes,
            seed=cfg.seed,
        )
    guard_never(cfg.kind)


# --------------------------------------------------------- checkpoint I/O


def _ckpt_path(path: pathlib.Path, section: str, epoch: int) -> pathlib.Path:
    return path / f"{section}-epoch-{epoch}.ckpt"


def _opt_path(path: pathlib.Path, section: str, epoch: int) -> pathlib.Path:
    # sibling of the param file; latest_epoch's exact-name probe never
    # matches it, so opt files are invisible to stage/resume detection
    return path / f"{section}-epoch-{epoch}.opt.ckpt"


def opt_ckpt_enabled() -> bool:
    """AUTOGNOTHI_CKPT_OPT=1 — checkpoint optimizer state alongside params
    so a preempted-and-resumed run is BIT-IDENTICAL to an uninterrupted one
    (epoch seeds and lr schedules are already derived/stateless; Adam
    moments are the only training state the reference rebuilds from zero on
    resume, scripts parity — SURVEY §2.5 — hence opt-in)."""
    return os.environ.get("AUTOGNOTHI_CKPT_OPT", "0") == "1"


def _orbax_backend() -> bool:
    """`AUTOGNOTHI_CKPT_BACKEND=orbax` switches checkpoint payloads from npz
    files to Orbax directories (sharded-array capable, multi-host ready).
    Paths and retention semantics are identical; loading auto-detects either
    format, so the two can be mixed within one experiment directory."""
    return os.environ.get("AUTOGNOTHI_CKPT_BACKEND", "npz") == "orbax"


def _remove_ckpt(file: pathlib.Path) -> None:
    if file.is_dir():  # orbax checkpoints are directories
        import shutil

        shutil.rmtree(file)
    elif file.exists():
        file.unlink()


def _remove_ckpt_collective(file: pathlib.Path, tag: str) -> None:
    """SPMD-safe delete: trainers run collectively, and concurrent rmtree
    of one orbax directory races to FileNotFoundError — only process 0
    deletes, everyone else waits at the barrier."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            _remove_ckpt(file)
        multihost_utils.sync_global_devices(f"agt_rm_{tag}")
    else:
        _remove_ckpt(file)


def save_params(file: pathlib.Path, params: Params) -> None:
    if _orbax_backend():
        import jax
        import orbax.checkpoint as ocp

        # every process calls this collectively (the trainers are SPMD);
        # only one may clear the target, the rest must wait for it
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            if jax.process_index() == 0:
                _remove_ckpt(file)
            multihost_utils.sync_global_devices("agt_ckpt_clear")
        else:
            _remove_ckpt(file)
        # leaves stay as-is: jax.Arrays — including multi-host sharded ones
        # that NO single host could materialize — save natively (each
        # process writes its own shards; orbax coordinates the commit)
        ocp.PyTreeCheckpointer().save(str(file.resolve()), dict(params))
        return
    arrays = {}
    for k, v in params.items():
        if getattr(v, "is_fully_addressable", True) is False:
            raise ValueError(
                f"param {k!r} is sharded across hosts — npz checkpoints "
                "gather to one host and cannot hold it; set "
                "AUTOGNOTHI_CKPT_BACKEND=orbax")
        arrays[k] = np.asarray(v)
    # atomic: a kill mid-write (preemption) must never leave a truncated
    # .ckpt that the resume scan (load_epoch_ckpt) would try to load —
    # os.replace makes the file appear fully written or not at all
    tmp = file.with_name(file.name + ".tmp")
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, file)
    finally:
        tmp.unlink(missing_ok=True)


def _is_torch_archive(file: pathlib.Path) -> bool:
    """npz and torch checkpoints are both zip files; torch's carries a
    `data.pkl` entry."""
    import zipfile

    if not zipfile.is_zipfile(file):
        return False
    with zipfile.ZipFile(file) as z:
        return any(name.endswith("data.pkl") for name in z.namelist())


def load_params_file(file: pathlib.Path) -> Dict[str, np.ndarray]:
    """Load a checkpoint: npz (native), an Orbax directory, or a torch-saved
    state dict — the migration path for checkpoints trained with the torch
    reference (their key layout matches ours by construction, see models/*)."""
    if file.is_dir():
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(str(file.resolve()))
        out = {}
        for k, v in restored.items():
            if getattr(v, "is_fully_addressable", True) is False:
                # multi-host: orbax re-assembled the array SHARDED across
                # processes (sharding read from the ckpt); gather the global
                # value — callers re-place params via the mesh helpers
                from jax.experimental import multihost_utils

                v = multihost_utils.process_allgather(v, tiled=True)
            out[k] = np.asarray(v)
        return out
    if _is_torch_archive(file):
        import torch

        obj = torch.load(file, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        return {k: v.detach().cpu().numpy() for k, v in obj.items()}
    with np.load(file, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def latest_epoch(
    path: pathlib.Path, section: str, max_epochs: int
) -> Optional[int]:
    """Newest checkpointed epoch (existence probe only — no payload load)."""
    for epoch in range(max_epochs, -1, -1):
        if _ckpt_path(path, section, epoch).exists():
            return epoch
    return None


def load_epoch_ckpt(
    path: pathlib.Path, section: str, max_epochs: int, required: bool = False
) -> Tuple[Optional[int], Optional[Dict[str, np.ndarray]]]:
    """Scan epochs downward for the newest checkpoint (resources.py:150-168)."""
    epoch = latest_epoch(path, section, max_epochs)
    if epoch is not None:
        return epoch, load_params_file(_ckpt_path(path, section, epoch))
    if required:
        raise FileNotFoundError(f"no checkpoint found for '{section}' under '{path}'")
    return None, None


def get_epoch_ckpts(path: pathlib.Path, section: str, max_epochs: int) -> List[int]:
    return [
        e for e in range(max_epochs + 1) if _ckpt_path(path, section, e).exists()
    ]


def save_epoch_ckpt(
    path: pathlib.Path,
    section: str,
    cfg: Config_Train,
    epoch: int,
    params: Params,
    opt_state: Any = None,
) -> bool:
    """Save; then delete the previous epoch's file unless retention keeps it.
    With AUTOGNOTHI_CKPT_OPT=1 and an `opt_state`, the optimizer state is
    checkpointed alongside (exact resume — see opt_ckpt_enabled)."""

    def should_keep(ep: int) -> bool:
        return ep == 0 or ep == cfg.epochs or ranged_modulo_test(cfg.ckpt_when)(ep)

    file = _ckpt_path(path, section, epoch)
    # pre-clear ONLY an orbax directory occupying the path (a file cannot
    # atomically replace a dir); for plain files os.replace in save_params
    # overwrites atomically — unconditionally deleting first would re-open
    # the kill-between-unlink-and-replace window the atomic write closes.
    if file.is_dir():
        _remove_ckpt_collective(file, "preclear")
    save_params(file, params)
    if opt_state is not None and opt_ckpt_enabled():
        save_opt_state(path, section, epoch, opt_state)

    if not should_keep(epoch - 1):
        _remove_ckpt_collective(_ckpt_path(path, section, epoch - 1), "prev")
    # the previous opt file goes regardless of retention: exact resume only
    # ever continues from the NEWEST epoch; param files kept by cadence are
    # for analysis/migration, not resume points
    _remove_ckpt_collective(_opt_path(path, section, epoch - 1), "prev_opt")
    return True


def save_opt_state(path: pathlib.Path, section: str, epoch: int,
                   opt_state: Any) -> None:
    """Persist an optax state pytree as an indexed-leaf checkpoint (same
    atomic writer/backends as params)."""
    import jax

    leaves = jax.tree_util.tree_leaves(opt_state)
    save_params(_opt_path(path, section, epoch),
                {f"leaf_{i:05d}": leaf for i, leaf in enumerate(leaves)})


def maybe_restore_opt_state(path: pathlib.Path, section: str, epoch: int,
                            template: Any) -> Any:
    """Exact-resume: reload the optimizer state saved at `epoch`, mapped
    onto `template`'s structure and shardings (the freshly built optax
    state).  Returns `template` untouched when the knob is off, at epoch 0,
    or when no opt file exists (reference-parity rebuild-from-zero)."""
    import jax

    file = _opt_path(path, section, epoch)
    if not opt_ckpt_enabled() or epoch <= 0 or not (
            file.exists() or file.is_dir()):
        return template
    arrays = load_params_file(file)
    loaded = [arrays[k] for k in sorted(arrays)]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(loaded) != len(t_leaves):
        raise ValueError(
            f"optimizer checkpoint {file.name} has {len(loaded)} leaves, "
            f"the rebuilt optimizer expects {len(t_leaves)} — config, "
            "freeze-mask or AUTOGNOTHI_PP changed since it was written "
            "(pp stage-shards the moments, so pp and sequential opt "
            "checkpoints are not interchangeable); delete it to resume "
            "with fresh moments")
    placed = []
    for got, want in zip(loaded, t_leaves):
        if np.shape(got) != np.shape(want):
            raise ValueError(
                f"optimizer checkpoint {file.name} leaf shape {np.shape(got)}"
                f" != expected {np.shape(want)}")
        sharding = getattr(want, "sharding", None)
        arr = jnp.asarray(got, dtype=getattr(want, "dtype", None))
        # re-commit only multi-device layouts (mesh runs); a fresh optax
        # state's scalars (count) are single-device UNCOMMITTED — pinning
        # them would make jit reject the mixed-device argument list
        if sharding is not None and len(sharding.device_set) > 1:
            arr = jax.device_put(arr, sharding)
        placed.append(arr)
    return jax.tree_util.tree_unflatten(treedef, placed)


def load_epoch_model(
    env, recipe: ModelRecipe, section: str
) -> Tuple[int, Params]:
    """Newest checkpointed params for a section, as device arrays."""
    config: ExpConfig = env.config
    if section == "classifier":
        max_epochs = config.train_classifier.epochs
    elif section == "surrogate":
        max_epochs = config.train_surrogate.epochs
    elif section == "explainer":
        max_epochs = config.train_explainer.epochs
    elif section == "final":
        max_epochs = 0
    else:
        guard_never(section)
    epoch, arrays = load_epoch_ckpt(env.model_path, section, max_epochs,
                                    required=True)
    params = {k: jnp.asarray(v) for k, v in arrays.items()}
    return epoch, params
