"""Pretrained checkpoint acquisition (parity: /root/reference/params/
loader.py:61-285).

Maps the named base models to HF hub ids, downloads via `transformers`
(uses the local HF cache when offline), and converts the torch state dict to
a flat numpy dict consumed by the recipes' `conv_pretrained_classifier`
rules.  Locally fine-tuned `ft_*` models are stored in this package's
`store/<name>/` as internal-layout `params.npz` + `tokenizer/` (written by
`pretrain_classifier`), replacing the reference's round-trip through HF
layout (params/loader.py:135-182) with a direct load.

`random_init` (extension) returns (None, None): the caller initializes fresh
params from the experiment seed — the zero-egress path used by tests.
"""

from __future__ import annotations

import os
import pathlib
from typing import Any, Dict, Optional, Tuple

import numpy as np

# writable store for locally fine-tuned ft_* bases: pip installs can be
# read-only (site-packages), so writes go to AUTOGNOTHI_ZOO or the user
# cache; the in-package store/ stays as a read-only fallback so bases that
# shipped with a source checkout keep loading.
_STORE = pathlib.Path(
    os.environ.get("AUTOGNOTHI_ZOO")
    or pathlib.Path.home() / ".cache" / "autognothi" / "zoo"
)
_PKG_STORE = pathlib.Path(__file__).parent / "store"

BERT_HUB_IDS = {
    "bert_tayp": ("textattack/bert-base-uncased-yelp-polarity", "seqcls"),
    "prj_bert_mini": ("prajjwal1/bert-mini", "bare"),
    "prj_bert_small": ("prajjwal1/bert-small", "bare"),
    "prj_bert_medium": ("prajjwal1/bert-medium", "bare"),
    "gg_bert_base": ("google-bert/bert-base-uncased", "bare"),
    "gg_bert_large": ("google-bert/bert-large-uncased", "bare"),
}

VIT_HUB_IDS = {
    "gg_vit_tiny": ("WinKawaks/vit-tiny-patch16-224", "imgcls"),
    "gg_vit_small": ("WinKawaks/vit-small-patch16-224", "imgcls"),
    "gg_vit_base": ("google/vit-base-patch16-224", "imgcls"),
    "gg_vit_large": ("google/vit-large-patch16-224", "imgcls"),
}


def _torch_sd_to_numpy(model) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _load_local_ft(name: str) -> Tuple[Dict[str, np.ndarray], Any]:
    store = _STORE / name
    if not (store / "params.npz").exists() and (
            _PKG_STORE / name / "params.npz").exists():
        store = _PKG_STORE / name  # read-only fallback (source checkouts)
    if not (store / "params.npz").exists():
        raise FileNotFoundError(
            f"fine-tuned base model '{name}' not found under {_STORE / name} "
            f"(or the bundled {_PKG_STORE / name}) — run "
            f"`pretrain_classifier` on the corresponding ft_ experiment first"
        )
    with np.load(store / "params.npz", allow_pickle=False) as data:
        params = {k: data[k] for k in data.files}
    tokenizer = None
    tk_dir = store / "tokenizer"
    if tk_dir.exists():
        from ..data.tokenizer import load_tokenizer

        tokenizer = load_tokenizer(tk_dir)
    return params, tokenizer


def save_local_ft(name: str, params: Dict[str, Any], tokenizer=None) -> pathlib.Path:
    """Export a fine-tuned classifier into the zoo store (used by
    `pretrain_classifier`, parity: scripts/pretrain_classifier.py:57-63)."""
    store = _STORE / name
    store.mkdir(parents=True, exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in params.items()}
    # atomic: a kill mid-write must not leave a truncated params.npz that
    # _load_local_ft's existence probe would accept (and that shadows any
    # valid bundled copy) — same tmp+replace pattern as checkpoint saves
    target = store / "params.npz"
    tmp = store / "params.npz.tmp"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, target)
    finally:
        tmp.unlink(missing_ok=True)
    if tokenizer is not None and hasattr(tokenizer, "save"):
        tokenizer.save(store / "tokenizer")
    elif tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        tokenizer.save_pretrained(str(store / "tokenizer"))
    return store


def load_params(
    base_model: str, num_labels: int
) -> Tuple[Optional[Dict[str, np.ndarray]], Any]:
    """-> (flat numpy state dict or None for random init, tokenizer or None)."""
    if base_model == "random_init":
        return None, None

    if base_model.startswith("ft_"):
        return _load_local_ft(base_model)

    if base_model in BERT_HUB_IDS:
        hub_id, flavor = BERT_HUB_IDS[base_model]
        from transformers import AutoTokenizer

        if flavor == "seqcls":
            from transformers import BertForSequenceClassification

            model = BertForSequenceClassification.from_pretrained(
                hub_id, num_labels=num_labels
            )
        else:
            from transformers import BertModel

            model = BertModel.from_pretrained(hub_id)
        tokenizer = AutoTokenizer.from_pretrained(hub_id)
        return _torch_sd_to_numpy(model), tokenizer

    if base_model in VIT_HUB_IDS:
        hub_id, _ = VIT_HUB_IDS[base_model]
        from transformers import ViTForImageClassification

        model = ViTForImageClassification.from_pretrained(hub_id)
        return _torch_sd_to_numpy(model), None

    raise ValueError(f"unknown base model: {base_model}")


def preload_all_params() -> None:
    for name in list(BERT_HUB_IDS) + list(VIT_HUB_IDS):
        load_params(name, num_labels=2)
