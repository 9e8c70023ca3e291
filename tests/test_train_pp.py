"""Opt-in pipeline-parallel classifier training (AUTOGNOTHI_PP).

The full fine-tune path (pretrain_classifier / unfreeze_all) runs with the
encoder depth stage-sharded over a ("data", "pipe") mesh and must land on
the same checkpoint as the sequential trainer (the mini configs train
dropout-free, so the runs differ only by program structure), resume through
the flat-dict checkpoint contract, and fail closed on bad knobs.
"""

import copy
import json
import pathlib
from types import SimpleNamespace

import numpy as np
import pytest

from autognothi_tpu.pipeline.resources import load_params_file
from tests.test_train_all_e2e import MINI_VIT_HPARAMS


@pytest.fixture(autouse=True)
def _no_persistent_cache():
    """Compile this module's programs fresh: the XLA:CPU thunk runtime can
    ABORT (silent SIGABRT mid-device_get) when executing a CACHE-LOADED
    executable that mixes grad all-reduces with pipeline collective-permutes
    — the pp trainer steps here are exactly that shape.  Measured (r5): the
    same test passes fresh-compiled and aborts on a same-host cache hit,
    reproducibly; the r5 joint-teacher-sharding revert hit the same class
    (BASELINE.md).  Freshly compiled programs are unaffected, so only this
    module opts out of the suite-wide persistent cache (conftest.py)."""
    import jax

    old = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", old)


def _mk_exp(root: pathlib.Path, name: str, hparams: dict) -> pathlib.Path:
    exp = root / name
    exp.mkdir(parents=True)
    (exp / ".hparams.json").write_text(json.dumps(hparams, indent=2))
    return exp


def _vit_hparams(epochs: int = 2, batch_size: int = 8) -> dict:
    hp = copy.deepcopy(MINI_VIT_HPARAMS)
    hp["train_classifier"] = {
        "epochs": epochs, "ckpt_when": "_:%1==0", "lr": 1e-3,
        "batch_size": batch_size,
    }
    hp["train_surrogate"] = {
        "epochs": epochs, "ckpt_when": "_:%1==0", "lr": 1e-3,
        "batch_size": batch_size,
    }
    return hp


def _train(exp: pathlib.Path, monkeypatch, pp=None) -> None:
    from autognothi_tpu.pipeline.env import ExpEnv
    from autognothi_tpu.pipeline.train_all import conv_pretrained_classifier
    from autognothi_tpu.pipeline.train_classifier import train_classifier

    if pp is None:
        monkeypatch.delenv("AUTOGNOTHI_PP", raising=False)
    else:
        monkeypatch.setenv("AUTOGNOTHI_PP", str(pp))
    env = ExpEnv(exp)
    if not (exp / "classifier-epoch-0.ckpt").exists():
        conv_pretrained_classifier(env)
    train_classifier(env, unfreeze_all=True)
    monkeypatch.delenv("AUTOGNOTHI_PP", raising=False)


def _load(exp: pathlib.Path, epoch: int) -> dict:
    return load_params_file(exp / f"classifier-epoch-{epoch}.ckpt")


def _assert_params_close(a: dict, b: dict) -> None:
    # Forward and grads agree to float-assoc noise (the logged per-batch
    # losses match to 6-7 digits in both runs), but Adam's m/(sqrt(v)+eps)
    # normalization amplifies that noise to a fraction of one lr-sized
    # (1e-3) update per step (measured: up to ~2e-4 after 3 steps).  A
    # schedule bug (wrong microbatch order, dropped stage, stale slab)
    # perturbs the LOSS, so it diverges at full update scale (>=1e-3/step)
    # and still fails at this tolerance.
    for k in sorted(a):
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), rtol=5e-3, atol=5e-4,
            err_msg=k)


def test_pp_trainer_vit_matches_sequential(tmp_path, monkeypatch):
    """Same seed, same data: the pp fine-tune must reproduce the sequential
    trainer's checkpoint (dropout 0 -> the only differences are float
    association inside the pipelined vs scanned encoder)."""
    hp = _vit_hparams(epochs=2)
    seq = _mk_exp(tmp_path, "seq", hp)
    ppd = _mk_exp(tmp_path, "pp", hp)

    _train(seq, monkeypatch, pp=None)
    _train(ppd, monkeypatch, pp=2)

    a, b = _load(seq, 2), _load(ppd, 2)
    assert set(a) == set(b)  # pp is invisible on disk: same flat keys
    _assert_params_close(a, b)


def test_pp_trainer_bert_matches_sequential(tmp_path, monkeypatch):
    """Text track through pp_bert_classifier_fwd."""
    import autognothi_tpu.data.loader as dl
    from autognothi_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
    from tests.test_bert_e2e import make_bert_hparams

    samples = json.loads(
        (pathlib.Path(dl.__file__).parent / "nlp_samples.json").read_text())
    vocab = build_vocab([s["inputs"] for s in samples], max_size=400)
    hp = make_bert_hparams(len(vocab))
    hp["train_classifier"] = {
        "epochs": 1, "ckpt_when": "_:%1==0", "lr": 1e-3, "batch_size": 8,
    }

    dirs = {}
    for name in ("seq", "pp"):
        exp = _mk_exp(tmp_path, name, hp)
        WordPieceTokenizer(vocab).save(exp / "tokenizer")
        dirs[name] = exp

    _train(dirs["seq"], monkeypatch, pp=None)
    _train(dirs["pp"], monkeypatch, pp=2)

    a, b = _load(dirs["seq"], 1), _load(dirs["pp"], 1)
    assert set(a) == set(b)
    _assert_params_close(a, b)


def test_pp_trainer_resume_from_flat_ckpt(tmp_path, monkeypatch):
    """A pp run resumes from the flat epoch checkpoint (re-split on load) —
    and matches a sequential run resumed at the same boundary.  Both
    references are interrupted-and-resumed: resume rebuilds Adam moments
    from zero (reference behavior, SURVEY §2.5), so an uninterrupted run is
    NOT the right comparison."""
    hp1, hp2 = _vit_hparams(epochs=1), _vit_hparams(epochs=2)
    dirs = {}
    for name, pp in (("pp", 2), ("seq", None)):
        exp = _mk_exp(tmp_path, name, hp1)
        _train(exp, monkeypatch, pp=pp)
        assert (exp / "classifier-epoch-1.ckpt").exists()
        (exp / ".hparams.json").write_text(json.dumps(hp2, indent=2))
        _train(exp, monkeypatch, pp=pp)  # resumes at epoch 2
        dirs[name] = exp

    a, b = _load(dirs["seq"], 2), _load(dirs["pp"], 2)
    assert set(a) == set(b)
    _assert_params_close(a, b)


def test_pp_exact_resume_is_bit_identical(tmp_path, monkeypatch):
    """AUTOGNOTHI_CKPT_OPT=1 composes with AUTOGNOTHI_PP: interrupt the pp
    fine-tune before its final epoch, resume, and the final checkpoint is
    BIT-IDENTICAL to an uninterrupted pp run — the stage-sharded Adam
    moments round-trip through the indexed-leaf opt checkpoint and the
    flat param dict re-splits exactly (host-side np round trips)."""
    from autognothi_tpu.pipeline import train_classifier as tc
    from autognothi_tpu.pipeline import training
    from autognothi_tpu.pipeline.training import TrainingInterrupted

    monkeypatch.setenv("AUTOGNOTHI_CKPT_OPT", "1")
    hp = _vit_hparams(epochs=2)
    a = _mk_exp(tmp_path, "a", hp)
    _train(a, monkeypatch, pp=2)  # uninterrupted

    b = _mk_exp(tmp_path, "b", hp)
    real_cosine = tc.cosine_lr

    def trip_at_final_epoch(base_lr, epoch, total):
        if epoch == 2:
            training._SHUTDOWN["requested"] = True
        return real_cosine(base_lr, epoch, total)

    monkeypatch.setattr(tc, "cosine_lr", trip_at_final_epoch)
    with pytest.raises(TrainingInterrupted):
        _train(b, monkeypatch, pp=2)
    assert (b / "classifier-epoch-1.opt.ckpt").exists()

    monkeypatch.setattr(tc, "cosine_lr", real_cosine)
    training._SHUTDOWN["requested"] = False
    _train(b, monkeypatch, pp=2)  # resume: redo the final epoch exactly

    pa, pb = _load(a, 2), _load(b, 2)
    assert set(pa) == set(pb)
    for k in sorted(pa):
        np.testing.assert_array_equal(
            np.asarray(pa[k]), np.asarray(pb[k]), err_msg=k)


def _train_surrogate_subprocess(exp: pathlib.Path, pp) -> None:
    """Run train_surrogate in a CHILD interpreter, retried once.

    The pp surrogate step is where the XLA:CPU native abort strikes when it
    strikes (BASELINE r5: flaky silent SIGABRT mid-suite; isolated runs
    always pass; neither the cache opt-out nor the raised collective
    timeout fully eliminated it).  In-process, that abort kills pytest with
    no report; in a child it becomes an attributable non-zero exit, and one
    retry absorbs the flake the way bench.py's child retry does."""
    import os
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from autognothi_tpu.pipeline.env import ExpEnv;"
        "from autognothi_tpu.pipeline.train_surrogate import train_surrogate;"
        f"train_surrogate(ExpEnv({str(exp)!r}))"
    )
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="")
    env.pop("AUTOGNOTHI_PP", None)
    if pp is not None:
        env["AUTOGNOTHI_PP"] = str(pp)
    last = None
    for _ in range(2):
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              cwd=pathlib.Path(__file__).parent.parent,
                              capture_output=True, text=True, timeout=900)
        if proc.returncode == 0:
            return
        last = proc
    raise AssertionError(
        f"train_surrogate child failed twice (rc={last.returncode}):\n"
        f"{last.stderr[-2000:]}")


def test_pp_surrogate_matches_sequential(tmp_path, monkeypatch):
    """Surrogate stage under pp: the KL-distilled student (a full backbone
    copy) trains stage-sharded and must land on the sequential checkpoint.
    The teacher rides its own (non-pipelined) executable in both runs.
    Training runs in child interpreters (_train_surrogate_subprocess) so
    the known flaky XLA:CPU native abort cannot kill the suite."""
    from autognothi_tpu.pipeline.env import ExpEnv
    from autognothi_tpu.pipeline.train_all import conv_classifier_surrogate

    hp = _vit_hparams(epochs=1)
    dirs = {}
    for name, pp in (("seq", None), ("pp", 2)):
        exp = _mk_exp(tmp_path, name, hp)
        _train(exp, monkeypatch, pp=None)  # identical sequential classifier
        conv_classifier_surrogate(ExpEnv(exp))
        _train_surrogate_subprocess(exp, pp)
        dirs[name] = exp

    a = load_params_file(dirs["seq"] / "surrogate-epoch-1.ckpt")
    b = load_params_file(dirs["pp"] / "surrogate-epoch-1.ckpt")
    assert set(a) == set(b)
    _assert_params_close(a, b)


def _explainer_prefix(tmp_path, monkeypatch, hp) -> pathlib.Path:
    """Train the sequential classifier + surrogate once and convert up to
    explainer-epoch-0 — the shared prefix both explainer runs start from
    (cloned with copytree so seq/pp diverge only in train_explainer)."""
    from autognothi_tpu.pipeline.env import ExpEnv
    from autognothi_tpu.pipeline.train_all import (
        conv_classifier_surrogate,
        conv_surrogate_explainer,
    )
    from autognothi_tpu.pipeline.train_surrogate import train_surrogate

    base = _mk_exp(tmp_path, "prefix", hp)
    _train(base, monkeypatch, pp=None)
    env = ExpEnv(base)
    conv_classifier_surrogate(env)
    train_surrogate(env)
    conv_surrogate_explainer(env)
    return base


def _explainer_hp() -> dict:
    hp = _vit_hparams(epochs=1)
    hp["train_explainer"] = {
        "epochs": 2, "ckpt_when": "_:%1==0", "lr": 1e-3, "batch_size": 8,
        "n_mask_samples": 2, "lambda_efficiency": 0.0, "lambda_norm": 0.0,
    }
    return hp


def test_pp_explainer_matches_sequential(tmp_path, monkeypatch):
    """Explainer stage under pp — THE hot loop, and the one vanilla tower
    trained full-depth from scratch.  Same seed, same data: the pp run
    (backbone stage-sharded, teacher sweep on the pipe mesh's "data" axis)
    must land on the sequential trainer's checkpoint."""
    import shutil

    from autognothi_tpu.pipeline.env import ExpEnv
    from autognothi_tpu.pipeline.train_explainer import train_explainer

    base = _explainer_prefix(tmp_path, monkeypatch, _explainer_hp())
    dirs = {}
    for name, pp in (("seq", None), ("pp", 2)):
        exp = tmp_path / name
        shutil.copytree(base, exp)
        if pp is None:
            monkeypatch.delenv("AUTOGNOTHI_PP", raising=False)
        else:
            monkeypatch.setenv("AUTOGNOTHI_PP", str(pp))
        train_explainer(ExpEnv(exp))
        monkeypatch.delenv("AUTOGNOTHI_PP", raising=False)
        dirs[name] = exp

    a = load_params_file(dirs["seq"] / "explainer-epoch-2.ckpt")
    b = load_params_file(dirs["pp"] / "explainer-epoch-2.ckpt")
    assert set(a) == set(b)  # pp is invisible on disk: same flat keys
    _assert_params_close(a, b)


def test_pp_explainer_exact_resume_bit_identical(tmp_path, monkeypatch):
    """AUTOGNOTHI_CKPT_OPT=1 composes with the pp explainer: interrupt
    before the final epoch, resume, and the final checkpoint is
    BIT-IDENTICAL to an uninterrupted pp run (stage-sharded Adam moments
    round-trip; the flat param dict re-splits exactly)."""
    import shutil

    from autognothi_tpu.pipeline import train_explainer as te
    from autognothi_tpu.pipeline import training
    from autognothi_tpu.pipeline.env import ExpEnv
    from autognothi_tpu.pipeline.train_explainer import train_explainer
    from autognothi_tpu.pipeline.training import TrainingInterrupted

    monkeypatch.setenv("AUTOGNOTHI_CKPT_OPT", "1")
    base = _explainer_prefix(tmp_path, monkeypatch, _explainer_hp())
    monkeypatch.setenv("AUTOGNOTHI_PP", "2")

    a = tmp_path / "a"
    shutil.copytree(base, a)
    train_explainer(ExpEnv(a))  # uninterrupted

    b = tmp_path / "b"
    shutil.copytree(base, b)
    real_cosine = te.cosine_lr

    def trip_at_final_epoch(base_lr, epoch, total):
        if epoch == 2:
            training._SHUTDOWN["requested"] = True
        return real_cosine(base_lr, epoch, total)

    monkeypatch.setattr(te, "cosine_lr", trip_at_final_epoch)
    with pytest.raises(TrainingInterrupted):
        train_explainer(ExpEnv(b))
    assert (b / "explainer-epoch-1.opt.ckpt").exists()

    monkeypatch.setattr(te, "cosine_lr", real_cosine)
    training._SHUTDOWN["requested"] = False
    train_explainer(ExpEnv(b))  # resume: redo the final epoch exactly

    pa = load_params_file(a / "explainer-epoch-2.ckpt")
    pb = load_params_file(b / "explainer-epoch-2.ckpt")
    assert set(pa) == set(pb)
    for k in sorted(pa):
        np.testing.assert_array_equal(
            np.asarray(pa[k]), np.asarray(pb[k]), err_msg=k)


def test_pp_fail_closed():
    from autognothi_tpu.pipeline.pp_trainer import _pp_context

    env = SimpleNamespace(log=lambda *_: None)
    cfg = lambda kind: SimpleNamespace(net=SimpleNamespace(kind=kind))  # noqa: E731

    with pytest.raises(ValueError, match="unsupported net kind"):
        _pp_context(env, cfg("ltt_vit"), None, {}, lambda n: True, 2, 2, 8)

    m_cfg = SimpleNamespace(num_hidden_layers=2)
    with pytest.raises(ValueError, match="does not divide"):
        _pp_context(env, cfg("vanilla_vit"), m_cfg, {}, lambda n: True,
                    3, 2, 8)

    # 8 devices / pipe 2 -> data 4; 4 % (4 x 2) != 0
    with pytest.raises(ValueError, match="batch_size=4"):
        _pp_context(env, cfg("vanilla_vit"), m_cfg, {}, lambda n: True,
                    2, 2, 4)


def test_pp_env_parse(monkeypatch):
    from autognothi_tpu.parallel.pipeline import pp_config_from_env

    for off in (None, "", "0", "1"):
        if off is None:
            monkeypatch.delenv("AUTOGNOTHI_PP", raising=False)
        else:
            monkeypatch.setenv("AUTOGNOTHI_PP", off)
        assert pp_config_from_env() is None

    monkeypatch.setenv("AUTOGNOTHI_PP", "2")
    assert pp_config_from_env() == (2, 2, 1)  # microbatches default to pipe
    monkeypatch.setenv("AUTOGNOTHI_PP_MICROBATCHES", "4")
    assert pp_config_from_env() == (2, 4, 1)
    monkeypatch.setenv("AUTOGNOTHI_PP_TP", "")  # env VAR= idiom == unset
    assert pp_config_from_env() == (2, 4, 1)
    monkeypatch.setenv("AUTOGNOTHI_PP_TP", "2")
    assert pp_config_from_env() == (2, 4, 2)
    monkeypatch.setenv("AUTOGNOTHI_PP_TP", "0")
    with pytest.raises(ValueError):
        pp_config_from_env()
    monkeypatch.setenv("AUTOGNOTHI_PP_TP", "1")
    monkeypatch.setenv("AUTOGNOTHI_PP_MICROBATCHES", "0")
    with pytest.raises(ValueError):
        pp_config_from_env()
    # PP_TP without PP must fail closed, not silently train without TP
    monkeypatch.delenv("AUTOGNOTHI_PP", raising=False)
    monkeypatch.delenv("AUTOGNOTHI_PP_MICROBATCHES", raising=False)
    monkeypatch.setenv("AUTOGNOTHI_PP_TP", "4")
    with pytest.raises(ValueError, match="requires AUTOGNOTHI_PP"):
        pp_config_from_env()


def test_pp_tp_explainer_step_matches_sequential():
    """Full 3-D composition on the production path: setup_pp_explainer with
    tp=2 builds ONE jitted step (coalition sampling + Megatron-sharded
    teacher sweep + pipelined fwd/bwd with TP inside each stage + AdamW)
    over a ("data", "pipe", "model") = (2, 2, 2) mesh, and its loss must
    match the sequential fused step on identical inputs and key (the only
    differences are float reassociation from the pipeline microbatching and
    the TP all-reduces)."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from autognothi_tpu.models.vit import (
        init_vit_classifier,
        init_vit_explainer,
    )
    from autognothi_tpu.parallel.train_step import make_explainer_train_step
    from autognothi_tpu.pipeline.pp_trainer import setup_pp_explainer
    from autognothi_tpu.pipeline.training import make_optimizer
    from autognothi_tpu.recipes.vanilla_vit import vanilla_vit_recipe
    from tests.test_pipeline_parallel import _mini_cfg

    cfg = _mini_cfg()
    recipe = vanilla_vit_recipe()
    n_players = recipe.n_players(cfg)
    n_mask_samples = 4
    batch = 8
    exp0 = {k: np.asarray(v) for k, v in init_vit_explainer(
        jax.random.PRNGKey(21), cfg).items()}
    srg0 = {k: np.asarray(v) for k, v in init_vit_classifier(
        jax.random.PRNGKey(22), cfg).items()}
    xs = np.random.RandomState(23).randn(
        batch, 3, cfg.img_px_size, cfg.img_px_size).astype(np.float32)
    nil = jnp.zeros((1, 3, cfg.img_px_size, cfg.img_px_size))
    null, _ = jax.jit(lambda p, x, m: recipe.fw_surrogate(cfg, p, x, m))(
        srg0, nil, jnp.ones((1, n_players), jnp.int32))
    key = jax.random.PRNGKey(24)
    lr = jnp.asarray(1e-3)
    ltt_full = jnp.asarray(cfg.num_hidden_layers, jnp.int32)

    # sequential reference: the fused single-program step
    tx, opt0 = make_optimizer(exp0, recipe.trainable(cfg, "explainer"))
    seq_step = make_explainer_train_step(recipe, cfg, n_players,
                                         n_mask_samples, tx)
    ones_mask = jax.tree.map(lambda _: jnp.ones(()), exp0)
    _, _, seq_loss = seq_step(exp0, opt0, srg0, null, jnp.asarray(xs), key,
                              lr, ones_mask, ltt_full)

    # dp=2 x pp=2 x tp=2 through the production setup function
    fake_env = SimpleNamespace(log=lambda *_: None)
    fake_cfg = SimpleNamespace(
        net=SimpleNamespace(kind="vanilla_vit"),
        train_explainer=SimpleNamespace(batch_size=batch,
                                        n_mask_samples=n_mask_samples),
    )
    (ep, srg_p, _etx, eopt, estep, eeval, eplace, to_flat) = \
        setup_pp_explainer(fake_env, fake_cfg, cfg, exp0, srg0, recipe,
                           2, 2, tp=2)
    # teacher weights Megatron-sharded over "model" (not replicated)
    tspec = srg_p["vit.encoder.layers.0.attention.self.query.weight"] \
        .sharding.spec
    assert "model" in tuple(tspec), tspec
    pp_mask = jax.tree.map(lambda _: jnp.ones(()), ep)
    ep2, eopt2, pp_loss = estep(ep, eopt, srg_p, null, eplace(jnp.asarray(xs)),
                                key, lr, pp_mask, ltt_full)
    np.testing.assert_allclose(float(pp_loss), float(seq_loss), rtol=5e-3)
    # stacked weights keep the ("pipe", "model", ...) brick layout through
    # the update, and the flat-dict checkpoint contract round-trips
    spec = ep2[1]["attention.self.query.weight"].sharding.spec
    assert tuple(spec)[:2] == ("pipe", "model"), spec
    flat = to_flat(ep2)
    assert set(flat) == set(exp0)
    # eval step runs on the same layout
    ev = eeval(ep2, srg_p, null, eplace(jnp.asarray(xs)), key, ltt_full)
    assert np.isfinite(float(ev)), float(ev)
