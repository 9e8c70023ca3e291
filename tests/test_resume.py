"""Resumable-stage semantics: interrupted runs pick up at the newest
checkpoint with per-epoch re-derived seeds (SURVEY §5.3/§5.4)."""

import json
import pathlib

from tests.test_train_all_e2e import MINI_VIT_HPARAMS


def test_training_resumes_from_latest_epoch(tmp_path: pathlib.Path):
    import copy

    from autognothi_tpu.pipeline.env import ExpEnv
    from autognothi_tpu.pipeline.train_all import train_all

    hp = copy.deepcopy(MINI_VIT_HPARAMS)
    hp["train_explainer"]["epochs"] = 3
    exp = tmp_path / "resume"
    exp.mkdir()
    (exp / ".hparams.json").write_text(json.dumps(hp))

    env = ExpEnv(exp)
    train_all(env)
    assert (exp / "explainer-epoch-3.ckpt").exists()
    assert (exp / "final-epoch-0.ckpt").exists()

    # simulate an interruption: final + last explainer epoch lost
    (exp / "final-epoch-0.ckpt").unlink()
    (exp / "explainer-epoch-3.ckpt").unlink()

    env2 = ExpEnv(exp)
    train_all(env2)
    assert (exp / "explainer-epoch-3.ckpt").exists()
    assert (exp / "final-epoch-0.ckpt").exists()
    log = (exp / ".log.txt").read_text()
    # stage detection resumed at 5 (explainer partially trained), and the
    # resumed run trained ONLY epoch 3 (not 1/2) in the second pass
    assert "current stage: 5 / 7" in log


def test_ckpt_retention_follows_cadence(tmp_path: pathlib.Path):
    import copy

    from autognothi_tpu.pipeline.env import ExpEnv
    from autognothi_tpu.pipeline.train_all import train_all

    hp = copy.deepcopy(MINI_VIT_HPARAMS)
    hp["train_explainer"]["epochs"] = 4
    hp["train_explainer"]["ckpt_when"] = "_:%2==0"  # keep even epochs
    exp = tmp_path / "cadence"
    exp.mkdir()
    (exp / ".hparams.json").write_text(json.dumps(hp))

    train_all(ExpEnv(exp))
    kept = sorted(
        int(p.name.split("-epoch-")[1].split(".")[0])
        for p in exp.glob("explainer-epoch-*.ckpt")
    )
    # epoch 0 (initial), evens by cadence, final epoch
    assert kept == [0, 2, 4]
