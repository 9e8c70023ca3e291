"""Scrape the `.reports/` JSON of every experiment into one TSV table
(parity: /root/reference/playground/grab_results.py).

Run: python playground/grab_results.py [experiment-name-prefix]
"""

from __future__ import annotations

import json
import pathlib
import sys
from typing import Callable, Dict, List, Optional, Union

Value = Union[int, float, None]
# [filename] -> [column] -> (report json) -> value
Rules = Dict[str, Dict[str, Callable[[dict], Union[int, float]]]]

EXPERIMENTS = pathlib.Path(__file__).parent.parent / "experiments"

RULES: Rules = {
    "cls_acc.json": {
        "cls_acc": lambda d: sum(d["accuracy"]) / len(d["accuracy"]),
    },
    "accuracy.json": {
        "srg_acc": lambda d: sum(d["accuracy"]) / len(d["accuracy"]),
    },
    "branches_cka.json": {
        "cka_linear_0": lambda d: d["all"]["linear_cka_avg"][0],
        "cka_linear_n": lambda d: d["all"]["linear_cka_avg"][-1],
        "cka_kernel_0": lambda d: d["all"]["kernel_cka_avg"][0],
        "cka_kernel_n": lambda d: d["all"]["kernel_cka_avg"][-1],
    },
    "faithfulness.json": {
        "insertion_auc": lambda d: d["insertion"]["auc"],
        "deletion_auc": lambda d: d["deletion"]["auc"],
    },
    "performance.json": {
        **{
            f"params_all_{tag}": (lambda t: lambda d: d[t]["params_all"])(t)
            for tag, t in [("cls", "classifier"), ("srg", "surrogate"),
                           ("exp", "explainer"), ("fin", "final")]
        },
        **{
            f"gflops_{tag}": (lambda t: lambda d: d[t]["gflops"])(t)
            for tag, t in [("cls", "classifier"), ("srg", "surrogate"),
                           ("exp", "explainer"), ("fin", "final")]
        },
        **{
            f"inf_tm_{tag}": (lambda t: lambda d: d[t]["time_avg"])(t)
            for tag, t in [("cls", "classifier"), ("srg", "surrogate"),
                           ("exp", "explainer"), ("fin", "final")]
        },
    },
    "train_resources.json": {
        "trn_tm_srg": lambda d: d["srg_tm"]["avg"],
        "trn_tm_exp": lambda d: d["exp_tm"]["avg"],
        "trn_mem_srg": lambda d: d["srg_mem"]["avg"],
        "trn_mem_exp": lambda d: d["exp_mem"]["avg"],
    },
    "dual_task_similarity.json": {
        "dual_cos_sim": lambda d: sum(d["cos_sim_avg"]) / len(d["cos_sim_avg"]),
    },
}


def get_result(exp_name: str, rules: Rules) -> Dict[str, Value]:
    reports = EXPERIMENTS / exp_name / ".reports"
    out: Dict[str, Value] = {}
    for filename, columns in rules.items():
        try:
            data = json.loads((reports / filename).read_text())
        except Exception:
            data = {}
        for col, rule in columns.items():
            try:
                out[col] = rule(data)
            except Exception:
                out[col] = None
    return out


def main(prefix: Optional[str] = None) -> None:
    names = sorted(
        p.name for p in EXPERIMENTS.iterdir()
        if p.is_dir() and (prefix is None or p.name.startswith(prefix))
    )
    rows = {name: get_result(name, RULES) for name in names}
    if not rows:
        print("no experiments found")
        return
    columns = list(next(iter(rows.values())).keys())
    print("\t".join(["experiment"] + columns))
    for name, row in rows.items():
        cells = [name] + [
            "" if row[c] is None else f"{row[c]:.6g}" for c in columns
        ]
        print("\t".join(cells))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
