"""Hardware quality gate for the int8 teacher sweep.

The explainer trainer's no-grad teacher (the B*M masked surrogate
forwards, 80% of the step — playground/bench_train_breakdown.py) can run
W8A8 (AUTOGNOTHI_INT8_TEACHER).  Quantization noise lands in the
TRAINING TARGETS v_s, so the risk is trained-explainer quality, not
serving numerics.  This gate trains the mini ViT experiment twice on the
real chip — identical seed, teacher bf16 vs int8 — and diffs every
faithfulness AUC cell of the resulting reports.

    python playground/teacher_quality_gate.py [--atol 0.02]

PASS = worst |AUC diff| < atol (default 0.02: two full trainings with
perturbed gradients diverge stochastically; the question is comparable
explainer quality, not bit equality).
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import pathlib
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))


def flatten_aucs(report: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in report.items():
        if isinstance(v, dict):
            out.update(flatten_aucs(v, f"{prefix}{k}."))
        elif k == "auc":
            out[f"{prefix}{k}"] = float(v)
    return out


def final_attributions(exp: pathlib.Path):
    """fw_final attributions of the run's trained final ckpt on a fixed
    batch — the sensitive metric: faithfulness AUC only sees the player
    RANKING (at mini dims, 16 players x 3 stops, it is fully quantized
    and both runs tie exactly even though their params differ)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.pipeline.env import ExpEnv
    from autognothi_tpu.pipeline.resources import get_recipe, load_epoch_model

    env = ExpEnv(exp)
    recipe, m_config = get_recipe(env.config)
    _, params = load_epoch_model(env, recipe, "final")
    xs = jax.random.normal(jax.random.PRNGKey(42),
                           (4, 3, m_config.img_px_size, m_config.img_px_size))
    _logits, phi = jax.jit(
        lambda p, x: recipe.fw_final(m_config, p, x))(params, xs)
    return np.asarray(phi, dtype=np.float64)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--atol", type=float, default=0.02)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from tests.test_train_all_e2e import MINI_VIT_HPARAMS

    hp = copy.deepcopy(MINI_VIT_HPARAMS)
    root = pathlib.Path(tempfile.mkdtemp(prefix="teacher_gate_"))
    runs = {}
    for label, flag in (("bf16", "0"), ("int8", "1")):
        exp = root / label
        exp.mkdir(parents=True)
        (exp / ".hparams.json").write_text(json.dumps(hp, indent=2))
        # MIN_HIDDEN=0 pins the fused-kernel width floor open regardless
        # of the ambient env (fused_dims_ok DEFAULTS to 0; the knob is an
        # escape hatch) — if a floor were active, the mini config's hidden
        # size would route to XLA and the gate would compare two identical
        # runs (verified: at MIN_HIDDEN=128 the teacher outputs match to
        # 6e-8 across flags)
        env = dict(os.environ, AUTOGNOTHI_INT8_TEACHER=flag,
                   AUTOGNOTHI_FUSED_MIN_HIDDEN="0")
        r = subprocess.run(
            [sys.executable, str(pathlib.Path(__file__).parent.parent
                                 / "main.py"), "run_all", str(exp)],
            env=env, capture_output=True, text=True, timeout=3000,
        )
        if r.returncode != 0:
            print(r.stdout[-1000:])
            print(r.stderr[-2000:])
            raise SystemExit(f"run_all ({label}) failed rc={r.returncode}")
        report = json.loads((exp / ".reports" / "faithfulness.json")
                            .read_text())
        runs[label] = flatten_aucs(report)
        runs[label + "_phi"] = final_attributions(exp)
        print(f"[teacher_gate] {label}: trained + measured "
              f"({len(runs[label])} AUC cells)", flush=True)

    worst, worst_k = 0.0, ""
    for k in runs["bf16"]:
        d = abs(runs["bf16"][k] - runs["int8"][k])
        print(f"{k:<45} bf16={runs['bf16'][k]:.6f} "
              f"int8={runs['int8'][k]:.6f} d={d:.2e}")
        if d > worst:
            worst, worst_k = d, k
    import numpy as np

    pa, pb = runs["bf16_phi"], runs["int8_phi"]
    dphi = float(np.max(np.abs(pa - pb)))
    scale = float(np.max(np.abs(pa)) + 1e-12)
    k = max(1, pa.shape[-1] // 2)
    top_a = np.argsort(-pa, axis=-1)[..., :k]
    top_b = np.argsort(-pb, axis=-1)[..., :k]
    overlap = float(np.mean([
        len(set(x) & set(y)) / k
        for x, y in zip(top_a.reshape(-1, k), top_b.reshape(-1, k))]))
    print(f"\ntrained-attribution diff: max|dphi|={dphi:.3e} "
          f"(rel {dphi / scale:.3e}), top-{k} rank overlap={overlap:.3f}")
    if dphi == 0.0:
        print("[teacher_gate] ERROR: bit-identical trained attributions — "
              "the int8 teacher did not engage (check kernel gating)")
        raise SystemExit(2)
    status = "PASS" if worst < args.atol and overlap >= 0.8 else "FAIL"
    print(f"\n[teacher_gate] worst AUC |d|={worst:.3e} at {worst_k} "
          f"(atol {args.atol}); rank overlap {overlap:.3f} (>= 0.8)"
          f"\n[teacher_gate] {status}")
    if not args.keep:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
    raise SystemExit(0 if status == "PASS" else 1)


if __name__ == "__main__":
    main()
