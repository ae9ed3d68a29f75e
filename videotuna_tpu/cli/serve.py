"""Minimal inference server: POST /generate → mp4.

The reference has no serving layer (inference is batch CLI only); this adds
the production-serving surface the TPU deployment needs: one process owns
the compiled sampler (weights stay resident, jit cache warm), requests are
serialized through a lock (single chip) or dispatched per mesh.

    python -m videotuna_tpu.cli.serve --config configs/... --port 8000

    curl -X POST localhost:8000/generate \
         -H 'Content-Type: application/json' \
         -d '{"prompt": "a red panda", "seed": 3}'
    → {"video": "<path>", "time_sec": ...}

    GET /healthz → {"status": "ok", "model": "<flow class>"}
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from videotuna_tpu.core.config import apply_inference_mapping, load_configs
from videotuna_tpu.core.registry import instantiate, populate


class InferenceService:
    """Owns the flow + compiled sampler; thread-safe generate()."""

    def __init__(self, config: Dict[str, Any]):
        populate()
        self.config = config
        self.flow = instantiate(config["flow"])
        ckpt = config["flow"].get("pretrained")
        if ckpt:
            self.flow.from_pretrained(ckpt)
        else:
            self.flow.init_params(
                seed=int(config.get("inference", {}).get("seed", 0)))
        self.lock = threading.Lock()
        self.requests_served = 0

    def generate(self, request: Dict[str, Any]) -> Dict[str, Any]:
        cfg = {"inference": dict(self.config.get("inference", {}))}
        inf = cfg["inference"]
        for k in ("prompt", "seed", "height", "width", "frames",
                  "unconditional_guidance_scale", "negative_prompt", "fps"):
            if k in request:
                inf[k] = request[k]
        inf.setdefault("savedir", "results/serve")
        inf["bs"] = 1
        inf["n_samples_prompt"] = int(request.get("n_samples", 1))
        t0 = time.perf_counter()
        with self.lock:                      # one chip, one request
            result = self.flow.inference(cfg)
        self.requests_served += 1
        return {"videos": result["videos"],
                "time_sec": round(time.perf_counter() - t0, 3)}


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):   # quiet
            pass

        def _json(self, code: int, payload: Dict[str, Any]):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "model": type(service.flow).__name__,
                    "requests_served": service.requests_served,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                request = json.loads(self.rfile.read(n) or b"{}")
                self._json(200, service.generate(request))
            except Exception as e:  # noqa: BLE001 — report, keep serving
                self._json(500, {"error": str(e)})

    return Handler


def serve(config: Dict[str, Any], port: int = 8000,
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    service = InferenceService(config)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    server.service = service
    return server


def main(argv=None):
    ap = argparse.ArgumentParser("videotuna-tpu serve")
    ap.add_argument("--config", "-b", action="append", required=True)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    config = apply_inference_mapping(load_configs(args.config,
                                                  args.overrides))
    server = serve(config, args.port, args.host)
    print(f"[videotuna-tpu] serving {config['flow']['target']} "
          f"on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
