"""Data-backend factory + webhook/hub publishing surface.

Covers the SimpleTuner-parity host-side stack: storage backends and the
multidatabackend.json factory (reference third_party/flux/data_backend/
factory.py), webhook progress POSTs (webhooks/handler.py) against a real
local HTTP server, and hub-publishing staging (publishing/huggingface.py).
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from videotuna_tpu.data.backends import (
    CSVURLBackend, LocalBackend, configure_multi_databackend,
    init_backend_config, make_backend)
from videotuna_tpu.training.publish import (
    HubManager, WebhookCallback, WebhookConfig, WebhookHandler)


# ---------------------------------------------------------------------------
# backends
# ---------------------------------------------------------------------------

def test_local_backend_roundtrip(tmp_path):
    b = LocalBackend(instance_data_dir=str(tmp_path))
    p = tmp_path / "sub" / "a.txt"
    b.write(str(p), "hello")
    assert b.exists(str(p))
    assert b.read(str(p)) == b"hello"
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    b.np_save(arr, str(tmp_path / "a.npy"))
    b.np_save(arr, str(tmp_path / "a.npy.gz"), compress=True)
    np.testing.assert_array_equal(b.np_load(str(tmp_path / "a.npy")), arr)
    # gz magic is auto-detected on load
    np.testing.assert_array_equal(b.np_load(str(tmp_path / "a.npy.gz")),
                                  arr)
    (tmp_path / "x.png").write_bytes(b"z")
    files = b.list_files(["png"])
    assert files == [str(tmp_path / "x.png")]
    b.delete(str(p))
    assert not b.exists(str(p))


def test_csv_backend_local_rows_and_fetch_gate(tmp_path):
    local = tmp_path / "v.mp4"
    local.write_bytes(b"vid")
    csvf = tmp_path / "list.csv"
    csvf.write_text("url,caption\n"
                    f"{local},a cat\n"
                    "https://example.com/x.mp4,a dog\n")
    b = CSVURLBackend("c", str(csvf), str(tmp_path / "cache"))
    assert b.read(str(local)) == b"vid"
    assert b.get_caption(str(local)) == "a cat"
    assert b.list_files(["mp4"]) == [str(local),
                                     "https://example.com/x.mp4"]
    # remote URL without allow_fetch: explicit error, no network attempt
    with pytest.raises(FileNotFoundError):
        b.read("https://example.com/x.mp4")
    # a pre-populated cache entry is served without egress
    b.write("https://example.com/x.mp4", b"cached")
    assert b.read("https://example.com/x.mp4") == b"cached"


def test_multidatabackend_factory(tmp_path):
    cfg = [
        {"id": "img", "type": "local", "dataset_type": "image",
         "instance_data_dir": str(tmp_path),
         "cache_dir_vae": str(tmp_path / "vae_cache")},
        {"id": "off", "type": "local", "disabled": True},
        {"id": "text", "type": "local", "dataset_type": "text_embeds",
         "default": True, "cache_dir": str(tmp_path / "txt_cache")},
    ]
    backends = configure_multi_databackend(cfg)
    assert set(backends) == {"img", "text"}
    assert backends["img"]["cache"] is not None
    assert backends["text"].get("default_text_embeds") is True
    # json-file form parses identically
    p = tmp_path / "multidatabackend.json"
    p.write_text(json.dumps(cfg))
    assert set(configure_multi_databackend(str(p))) == {"img", "text"}


def test_factory_validation_errors(tmp_path):
    with pytest.raises(ValueError, match="unknown type"):
        init_backend_config({"id": "x", "type": "ftp"})
    with pytest.raises(ValueError, match="caption_filter_list"):
        init_backend_config({"id": "x", "type": "local",
                             "dataset_type": "image",
                             "caption_filter_list": ["bad"]})
    with pytest.raises(ValueError, match="duplicate"):
        configure_multi_databackend(
            [{"id": "a", "type": "local"}, {"id": "a", "type": "local"}])
    with pytest.raises(ValueError, match="none marked"):
        configure_multi_databackend(
            [{"id": "t1", "type": "local", "dataset_type": "text_embeds"},
             {"id": "t2", "type": "local",
              "dataset_type": "text_embeds"}])
    # S3 without boto3 fails at construction with the actionable message
    with pytest.raises(ImportError, match="boto3"):
        make_backend({"id": "s3", "type": "aws",
                      "aws_bucket_name": "b"})


# ---------------------------------------------------------------------------
# webhooks — real POSTs against a local HTTP server
# ---------------------------------------------------------------------------

@pytest.fixture()
def http_sink():
    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append(
                {"path": self.path,
                 "content_type": self.headers.get("Content-Type", ""),
                 "body": self.rfile.read(n)})
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/hook", received
    srv.shutdown()


def test_webhook_config_validation():
    with pytest.raises(ValueError, match="Invalid webhook type"):
        WebhookConfig({"webhook_type": "slack"})
    with pytest.raises(ValueError, match="webhook_url"):
        WebhookConfig({"webhook_type": "discord"})
    with pytest.raises(ValueError, match="callback_url"):
        WebhookConfig({"webhook_type": "raw"})


def test_raw_webhook_posts_json(http_sink):
    url, received = http_sink
    h = WebhookHandler({"webhook_type": "raw", "callback_url": url},
                       background=False)
    h.send_raw({"message": {"loss": 0.5}}, "progress_update", job_id="j1")
    # discord-style send is a no-op on a raw handler
    h.send("ignored")
    assert len(received) == 1
    body = json.loads(received[0]["body"])
    assert body["message_type"] == "progress_update"
    assert body["job_id"] == "j1"
    assert body["message"] == {"loss": 0.5}
    assert "timestamp" in body


def test_discord_webhook_message_and_images(http_sink):
    url, received = http_sink
    h = WebhookHandler({"webhook_type": "discord", "webhook_url": url,
                        "message_prefix": "run7"}, background=False)
    h.send("hello world")
    img = np.zeros((8, 8, 3), np.uint8)
    h.send("with image", images=[img])
    # level filtering: debug below default info level is dropped
    h.send("debug spam", message_level="debug")
    assert len(received) == 2
    assert b"`(run7)` hello world" in received[0]["body"]
    assert received[1]["content_type"].startswith("multipart/form-data")
    assert b"image/png" in received[1]["body"]


def test_webhook_background_queue_flush(http_sink):
    url, received = http_sink
    h = WebhookHandler({"webhook_type": "raw", "callback_url": url},
                       background=True)
    for i in range(5):
        h.send_progress_update("train", i * 20, 100, i)
    h.flush()
    assert len(received) == 5
    assert json.loads(received[-1]["body"])["message"][
        "current_estimated_index"] == 4


def test_webhook_callback_cadence(http_sink):
    url, received = http_sink
    h = WebhookHandler({"webhook_type": "raw", "callback_url": url},
                       background=False)
    cb = WebhookCallback(h, total_steps=100, every=10)
    for step in range(1, 31):
        cb(step, {"loss": 1.0 / step})
    assert len(received) == 3  # steps 10, 20, 30
    body = json.loads(received[-1]["body"])
    assert body["message"]["progress"] == 30
    assert "loss" in body["message"]["metrics"]


# ---------------------------------------------------------------------------
# hub publishing
# ---------------------------------------------------------------------------

def test_hub_manager_stage(tmp_path, monkeypatch):
    wdir = tmp_path / "ckpt"
    wdir.mkdir()
    (wdir / "model.safetensors").write_bytes(b"w")
    adir = tmp_path / "assets"
    adir.mkdir()
    (adir / "val0.mp4").write_bytes(b"v")
    hub = HubManager({"output_dir": str(tmp_path), "hub_model_id": "me/m",
                      "learning_rate": 1e-4, "train_batch_size": 2,
                      "model_type": "lora",
                      "pretrained_model_name_or_path": "base/model"})
    hub.set_validation_prompts(["a cat surfing"], ["cat"])
    staged = hub.stage(weights_dir=str(wdir), assets_dir=str(adir),
                       steps=123)
    card = (staged / "README.md").read_text()
    assert "base_model: base/model" in card
    assert "- lora" in card
    assert "a cat surfing" in card and "123 steps" in card
    assert (staged / "weights" / "model.safetensors").exists()
    assert (staged / "assets" / "val0.mp4").exists()
    meta = json.loads((staged / "hub_meta.json").read_text())
    assert meta["repo_id"] == "me/m"
    assert "123 steps" in meta["commit_message"]

    # upload degrades to staged-only without hub lib/token (zero egress)
    monkeypatch.delenv("HF_TOKEN", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path / "nohome"))
    out = hub.upload_model(weights_dir=str(wdir), steps=123)
    assert out["uploaded"] is False
    assert out["staged"] == str(staged)
