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


class TestBatchingService:
    """Micro-batching: same-geometry concurrent requests coalesce into one
    sampler call; mixed geometry splits into separate batches."""

    def _make(self, calls, max_batch=4, max_wait_ms=120.0):
        from videotuna_tpu.cli.serve import BatchingInferenceService

        class Stub(BatchingInferenceService):
            def __init__(self):
                # skip model construction entirely
                import threading as _t
                self.config = {"inference": {"savedir": "/tmp/x"}}
                self.lock = _t.Lock()
                self.requests_served = 0
                import collections
                self.max_batch = max_batch
                self.max_wait = max_wait_ms / 1000.0
                self.max_queue = 32
                self.request_timeout = 30.0
                self.requests_rejected = 0
                self.requests_timed_out = 0
                self._inflight = 0
                self._inflight_lock = _t.Lock()
                self._queue = collections.deque()
                self._cv = _t.Condition()
                self._running = True
                self._worker = _t.Thread(target=self._loop, daemon=True)
                self._worker.start()

            def _infer(self, cfg):
                prompts = cfg["inference"]["prompts_list"]
                calls.append(list(prompts))
                return {"videos": [f"v-{p}.mp4" for p in prompts]}

        return Stub()

    def test_same_geometry_coalesces(self):
        calls = []
        svc = self._make(calls)
        results = {}

        def worker(i):
            results[i] = svc.generate({"prompt": f"p{i}", "height": 64})

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=10)
        svc.shutdown()
        assert len(calls) <= 2                       # coalesced (≥2 per)
        assert sum(len(c) for c in calls) == 3
        for i in range(3):
            assert results[i]["videos"] == [f"v-p{i}.mp4"]
            assert results[i]["batched_with"] >= 1

    def test_mixed_geometry_splits(self):
        calls = []
        svc = self._make(calls, max_wait_ms=60.0)
        results = {}

        def worker(i, h):
            results[i] = svc.generate({"prompt": f"p{i}", "height": h})

        ts = [threading.Thread(target=worker, args=(0, 64)),
              threading.Thread(target=worker, args=(1, 128))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=10)
        svc.shutdown()
        # different geometries must never share a batch
        for c in calls:
            assert len(c) == 1
        assert sorted(sum(calls, [])) == ["p0", "p1"]


class TestBackpressure:
    """Queue-depth limits and per-request deadlines (production
    hardening — VERDICT r2 weak-6)."""

    def test_queue_full_raises_busy(self):
        from videotuna_tpu.cli.serve import (BatchingInferenceService,
                                             ServiceBusy)
        calls = []
        svc = TestBatchingService()._make(calls)
        svc.max_queue = 0
        with pytest.raises(ServiceBusy):
            svc.generate({"prompt": "p"})
        assert svc.requests_rejected == 1

    def test_request_deadline_times_out(self):
        from videotuna_tpu.cli.serve import ServiceTimeout
        calls = []
        holder = TestBatchingService()._make(calls)
        # stall the worker with a slow inference, then enqueue a second
        # request with a tiny deadline
        import time as _time
        orig = holder._infer

        def slow(cfg):
            _time.sleep(1.0)
            return orig(cfg)
        holder._infer = slow
        holder.request_timeout = 0.1
        t1 = threading.Thread(
            target=lambda: holder.generate({"prompt": "a"}))
        # the first may also time out (shared deadline) — we only assert
        # the second surfaces ServiceTimeout
        errs = []

        def second():
            try:
                holder.generate({"prompt": "b", "height": 999})
            except ServiceTimeout:
                errs.append("timeout")
        t1.start()
        t2 = threading.Thread(target=second)
        t2.start()
        t1.join(timeout=5)
        t2.join(timeout=5)
        assert "timeout" in errs
        assert holder.requests_timed_out >= 1

    def test_metrics_endpoint(self, server):
        with urllib.request.urlopen(f"{server}/metrics") as r:
            m = json.loads(r.read())
        assert {"requests_served", "requests_rejected",
                "requests_timed_out", "queue_depth",
                "max_queue"} <= set(m)


class TestContinuousBatching:
    """HTTP-level continuous batching: requests board the rolling denoise
    batch mid-flight (serving/continuous.py engine behind the service)."""

    def _service(self, tmp_path, slots=2):
        import jax
        import jax.numpy as jnp
        from videotuna_tpu.cli.serve import ContinuousBatchingService
        from videotuna_tpu.schedulers import FlowMatchSchedule

        class TinyFlow:
            latent_channels = 4
            scheduler = FlowMatchSchedule.create(num_steps=3, shift=1.0)
            params = {}

            def latent_shape(self, b, f, h, w):
                return (b, f, h // 8, w // 8, 4)

            def denoise_apply(self, params, x, t, cond):
                y = cond["y"].mean(axis=(1, 2))
                return jnp.tanh(x) + y.reshape(-1, 1, 1, 1, 1) * 0.1

            def encode_text(self, params, texts):
                v = float(len(texts[0]))
                return {"y": jnp.full((1, 2, 4), v / 100.0)}

            def decode_latents(self, params, z):
                # tiny 'VAE': upsample to pixels in [0,1]
                z = jnp.clip(z * 0.1 + 0.5, 0, 1)
                return jnp.repeat(jnp.repeat(z[..., :3], 8, 2), 8, 3)

        cfg = {"inference": {"height": 32, "width": 32, "frames": 2,
                             "savedir": str(tmp_path),
                             "unconditional_guidance_scale": 3.0}}
        return ContinuousBatchingService(cfg, slots=slots, flow=TinyFlow())

    def test_concurrent_requests_complete(self, tmp_path):
        import threading
        svc = self._service(tmp_path, slots=2)
        results, errors = {}, {}

        def worker(i):
            try:
                results[i] = svc.generate(
                    {"prompt": f"prompt {i}", "seed": i})
            except Exception as e:  # noqa: BLE001
                errors[i] = e

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]            # 4 requests > 2 slots
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        svc.shutdown()
        assert not errors, errors
        assert sorted(results) == [0, 1, 2, 3]
        for r in results.values():
            assert r["continuous"] and len(r["videos"]) == 1
        import os
        assert all(os.path.exists(r["videos"][0])
                   for r in results.values())

    def test_geometry_mismatch_rejected(self, tmp_path):
        svc = self._service(tmp_path)
        try:
            import pytest
            with pytest.raises(ValueError, match="fixed geometry"):
                svc.generate({"prompt": "x", "height": 64})
        finally:
            svc.shutdown()

    def test_per_request_negative_prompt_honored(self, tmp_path):
        """Review fix: the uncond cache is keyed by negative_prompt, so a
        later request's negative prompt actually changes its guidance."""
        import numpy as np
        svc = self._service(tmp_path, slots=1)
        try:
            r1 = svc.generate({"prompt": "same", "seed": 7,
                               "negative_prompt": "aa"})
            r2 = svc.generate({"prompt": "same", "seed": 7,
                               "negative_prompt": "aaaaaaaaaa"})
            from videotuna_tpu.data.video_io import load_video
            v1 = load_video(r1["videos"][0]).astype(np.float32)
            v2 = load_video(r2["videos"][0]).astype(np.float32)
            assert float(np.abs(v1 - v2).max()) > 1.0   # uint8 scale
        finally:
            svc.shutdown()

    def test_abandoned_requests_never_board(self, tmp_path):
        """Review fix: a timed-out (abandoned) request is skipped by
        _admit and never consumes a slot or chip time."""
        import threading
        svc = self._service(tmp_path, slots=2)
        try:
            dead = {"req": {"prompt": "dead", "seed": 0},
                    "event": threading.Event(), "result": None,
                    "error": None, "abandoned": True, "t0": 0.0}
            with svc._cv:
                svc._pending.append(dead)
            svc._admit()
            assert svc.engine.n_active == 0
            assert not svc._slot_items
        finally:
            svc.shutdown()


class TestMeshServing:
    """Multi-chip serving: inference.mesh shards the resident weights
    over the (dp, fsdp) mesh and samples under the mesh context."""

    def test_sharded_service_generates(self, tmp_path):
        import jax
        from videotuna_tpu.cli.serve import InferenceService
        cfg = load_configs(["configs/000_tiny/tiny_t2v.yaml"])
        cfg["inference"]["savedir"] = str(tmp_path)
        cfg["inference"]["mesh"] = {"dp": 2, "fsdp": 4}
        svc = InferenceService(cfg)
        assert svc.mesh is not None and svc.mesh.size == 8
        # at least one big param actually sharded over fsdp
        shardings = [x.sharding for x in jax.tree.leaves(svc.flow.params)
                     if hasattr(x, "sharding")]
        assert any(not s.is_fully_replicated for s in shardings), \
            "no parameter was sharded over the mesh"
        out = svc.generate({"prompt": "a sharded tiny robot", "seed": 1})
        assert len(out["videos"]) == 1
        assert out["videos"][0].endswith(".mp4")
