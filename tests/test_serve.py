"""Explanation server: end-to-end HTTP round trip over a trained final."""

import json
import pathlib
import urllib.request

import numpy as np
import pytest

from tests.test_train_all_e2e import MINI_VIT_HPARAMS


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    exp = tmp_path_factory.mktemp("serve") / "vit_mini"
    exp.mkdir()
    (exp / ".hparams.json").write_text(json.dumps(MINI_VIT_HPARAMS, indent=2))

    from autognothi_tpu.pipeline.env import ExpEnv
    from autognothi_tpu.pipeline.serve import serve_in_thread
    from autognothi_tpu.pipeline.train_all import train_all

    env = ExpEnv(exp)
    train_all(env)
    server, service, thread = serve_in_thread(env, port=0, batch_size=2)
    yield server, service
    server.shutdown()


def _post(server, path, payload):
    host, port = server.server_address
    req = urllib.request.Request(
        f"http://{host}:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_healthz(served):
    server, _ = served
    host, port = server.server_address
    with urllib.request.urlopen(f"http://{host}:{port}/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"status": "ok"}


def test_explain_images_round_trip(served):
    server, _ = served
    images = np.random.RandomState(0).randn(3, 3, 16, 16).tolist()
    status, body = _post(server, "/explain", {"images": images})
    assert status == 200
    logits = np.asarray(body["logits"])
    attr = np.asarray(body["attributions"])
    assert logits.shape == (3, 3)  # batch 3 (> server batch 2: chunked+padded)
    assert attr.shape == (3, 3, 4)
    np.testing.assert_allclose(logits.sum(axis=1), np.ones(3), atol=1e-4)


def test_explain_bad_payload(served):
    server, _ = served
    status, body = _post(server, "/explain", {"bogus": 1})
    assert status == 400
    assert "texts" in body["error"]


def test_explain_empty_batch(served):
    server, _ = served
    status, body = _post(server, "/explain", {"images": []})
    assert status == 200
    assert body == {"logits": [], "attributions": []}
