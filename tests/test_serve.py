"""Serving tests: healthz, generate, error handling — through real HTTP."""

import json
import threading
import urllib.request

import pytest

from videotuna_tpu.core.config import load_configs
from videotuna_tpu.cli.serve import serve


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = load_configs(["configs/000_tiny/tiny_t2v.yaml"])
    cfg["inference"]["savedir"] = str(tmp_path_factory.mktemp("serve"))
    srv = serve(cfg, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestServe:
    def test_healthz(self, server):
        code, body = _get(server + "/healthz")
        assert code == 200
        assert body["status"] == "ok"
        assert body["model"] == "OpenSoraFlow"

    def test_generate(self, server):
        code, body = _post(server + "/generate",
                           {"prompt": "a tiny robot", "seed": 5})
        assert code == 200, body
        assert len(body["videos"]) == 1
        assert body["videos"][0].endswith(".mp4")
        assert body["time_sec"] > 0

    def test_unknown_route(self, server):
        code, _ = _post(server + "/nope", {})
        assert code == 404

    def test_bad_request_survives(self, server):
        """Malformed input → 500 with error body; server keeps serving."""
        code, body = _post(server + "/generate", {"frames": "not-a-number"})
        assert code == 500
        assert "error" in body
        code, _ = _get(server + "/healthz")
        assert code == 200
