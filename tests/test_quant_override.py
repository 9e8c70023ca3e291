"""Trace-time quant scoping (models.common.quant_override) and the
int8-teacher wiring in the fused explainer train step.

The override lets one traced program mix precisions: the frozen no-grad
teacher sweep (surrogate coalition forwards — the bulk of the step's
FLOPs) can run the W8A8 kernels while the differentiated explainer
forward is pinned to bf16 (exact custom_vjp gradients).  Replaces the
single-precision training loop of the torch reference
(/root/reference/scripts/train_explainer.py:148-206).
"""

import numpy as np
import pytest

import autognothi_tpu.models.common as common
from autognothi_tpu.models.common import quant_mode, quant_override


@pytest.fixture
def tpu_pallas(monkeypatch):
    """Pretend the fused-kernel path is live (CPU CI has no TPU)."""
    monkeypatch.setattr(common, "pallas_mode", lambda: "2")


def test_default_mode_off_on_cpu():
    # conftest pins the CPU platform: no kernels -> never int8
    assert quant_mode() == "none"
    with quant_override("int8"):
        assert quant_mode() == "none"  # platform-gated even under override


def test_override_scoping(tpu_pallas, monkeypatch):
    monkeypatch.setenv("AUTOGNOTHI_INT8", "1")
    assert quant_mode() == "int8"
    with quant_override("none"):  # explainer fwd pins bf16
        assert quant_mode() == "none"
        with quant_override("int8"):  # nested teacher scope re-enables
            assert quant_mode() == "int8"
        assert quant_mode() == "none"
    assert quant_mode() == "int8"


def test_override_enables_without_global_flag(tpu_pallas, monkeypatch):
    monkeypatch.setenv("AUTOGNOTHI_INT8", "0")
    assert quant_mode() == "none"
    with quant_override("int8"):
        assert quant_mode() == "int8"
    assert quant_mode() == "none"


def test_override_restored_on_exception(tpu_pallas, monkeypatch):
    monkeypatch.setenv("AUTOGNOTHI_INT8", "0")
    with pytest.raises(RuntimeError):
        with quant_override("int8"):
            raise RuntimeError("boom")
    assert quant_mode() == "none"


def test_dense_serving_int8_close_to_fp32(tpu_pallas):
    """dense_serving switches the explainer-head denses to W8A8 under the
    serving quant mode; values must track the fp32 dense closely."""
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.common import dense, dense_serving

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 32).astype(np.float32)) * 0.5
    w = jnp.asarray(rng.randn(48, 32).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.randn(48).astype(np.float32)) * 0.1

    assert np.allclose(dense_serving(x, w, b), dense(x, w, b))  # off: alias
    with quant_override("int8"):
        q = dense_serving(x, w, b)
    ref = dense(x, w, b)
    rel = float(jnp.max(jnp.abs(q - ref))) / float(jnp.max(jnp.abs(ref)))
    assert 0 < rel < 0.02, rel  # int8 path actually taken AND accurate


def test_dense_serving_grads_are_full_precision(tpu_pallas):
    """Differentiating through the int8 path must yield the fp32 dense's
    gradients (custom_vjp), not round()'s zeros."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autognothi_tpu.models.common import dense, dense_serving

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 16).astype(np.float32)) * 0.5
    w = jnp.asarray(rng.randn(24, 16).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.randn(24).astype(np.float32)) * 0.1

    with quant_override("int8"):
        gq = jax.grad(lambda x, w: jnp.sum(dense_serving(x, w, b) ** 2),
                      argnums=(0, 1))(x, w)
    gr = jax.grad(lambda x, w: jnp.sum(dense(x, w, b) ** 2),
                  argnums=(0, 1))(x, w)
    for q, r in zip(gq, gr):
        assert float(jnp.max(jnp.abs(q))) > 0
        rel = float(jnp.max(jnp.abs(q - r))) / float(jnp.max(jnp.abs(r)))
        assert rel < 0.05, rel


def test_teacher_quant_env(monkeypatch):
    from autognothi_tpu.parallel import train_step as ts

    # default ON since r3 (measured +4.4% step; trained-quality gated by
    # playground/teacher_quality_gate.py) — "0" opts out
    monkeypatch.delenv("AUTOGNOTHI_INT8_TEACHER", raising=False)
    assert ts._teacher_quant() == "int8"
    monkeypatch.setenv("AUTOGNOTHI_INT8_TEACHER", "0")
    assert ts._teacher_quant() == "none"
    monkeypatch.setenv("AUTOGNOTHI_INT8_TEACHER", "1")
    assert ts._teacher_quant() == "int8"


def test_train_step_runs_with_teacher_flag(monkeypatch):
    """The fused step must trace and run with the teacher flag set even on
    CPU (where quant_mode() falls back to 'none'), and produce the same
    loss as with the flag unset — the flag is a pure perf knob here."""
    from tests.test_parallel import _mini_cfg, _run_step, _step_inputs

    cfg = _mini_cfg()
    recipe, n_players, exp_p, srg_p, null, xs = _step_inputs(cfg, batch=2)

    losses = []
    for flag in ("0", "1"):
        monkeypatch.setenv("AUTOGNOTHI_INT8_TEACHER", flag)
        _, loss = _run_step(
            recipe, cfg, n_players, exp_p, srg_p, null, xs
        )
        losses.append(loss)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
