"""Webhook progress reporting + Hugging Face Hub publishing.

Capability parity with the reference's vendored SimpleTuner surface
(/root/reference/videotuna/third_party/flux/webhooks/handler.py:18
``WebhookHandler`` — discord/raw POSTs with log-level filtering and image
attachments; webhooks/config.py:27 ``WebhookConfig`` validation;
webhooks/mixin.py:8 progress updates; publishing/huggingface.py:17
``HubManager`` — model card + checkpoint upload with retries).

TPU framing: the webhook is a *host-side* side channel and must never
block device dispatch — the train loop enqueues and a daemon thread does
the POSTs, so a slow or dead endpoint costs the step nothing (the
reference POSTs synchronously inside the training loop). Rank gating uses
``jax.process_index()`` instead of an accelerator object. Hub upload is
staged-first: the model card, weights and validation assets are always
materialized into an export directory (inspectable, rsync-able), and the
actual network push runs only when huggingface_hub + a token are present
— this environment has zero egress, so the staging path IS the product.
"""

from __future__ import annotations

import base64
import json
import logging
import os
import queue
import threading
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

LOG_LEVELS = {"critical": 0, "error": 1, "warning": 2, "info": 3,
              "debug": 4}
SUPPORTED_WEBHOOKS = ("discord", "raw")


def _is_main_process() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def _png_bytes(image: np.ndarray) -> bytes:
    """HWC uint8 RGB -> PNG (cv2 host path; PIL not required)."""
    import cv2
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 if img.max() <= 1.5 else img,
                      0, 255).astype(np.uint8)
    ok, buf = cv2.imencode(".png", img[..., ::-1])  # RGB -> BGR
    if not ok:
        raise ValueError("PNG encode failed")
    return buf.tobytes()


class WebhookConfig:
    """Load + validate a webhook config (reference webhooks/config.py:27):
    webhook_type must be discord|raw; discord requires webhook_url, raw
    requires callback_url. Accepts a path or an already-parsed dict."""

    def __init__(self, config: Any):
        if isinstance(config, (str, Path)):
            with open(config) as f:
                self.values: Dict[str, Any] = json.load(f)
        else:
            self.values = dict(config)
        wtype = self.values.get("webhook_type")
        if wtype not in SUPPORTED_WEBHOOKS:
            raise ValueError(
                f"Invalid webhook type {wtype!r}. Supported: "
                f"{list(SUPPORTED_WEBHOOKS)}")
        if wtype == "discord" and not self.values.get("webhook_url"):
            raise ValueError(
                "Discord webhook config is missing 'webhook_url'.")
        if wtype == "raw" and not self.values.get("callback_url"):
            raise ValueError("Raw webhook config is missing 'callback_url'.")
        self.webhook_type = wtype

    def __getattr__(self, name):
        return self.values.get(name, None)


class WebhookHandler:
    """POST progress/messages to a discord or raw endpoint.

    Sends are enqueued and drained by a daemon thread (``background=True``,
    the default) so a slow endpoint never stalls the step loop; tests and
    shutdown call :meth:`flush`. Discord messages with >10 images are
    chunked like the reference (handler.py:141-146)."""

    def __init__(self, config: Any, project_name: str = "videotuna-tpu",
                 background: bool = True, timeout: float = 10.0):
        self.config = config if isinstance(config, WebhookConfig) \
            else WebhookConfig(config)
        self.webhook_type = self.config.webhook_type
        self.webhook_url = (self.config.values.get("webhook_url")
                            or self.config.values.get("callback_url"))
        prefix = self.config.values.get("message_prefix") or project_name
        self.message_prefix = f"`({prefix})` "
        self.log_level = LOG_LEVELS.get(
            self.config.values.get("log_level") or "info", 3)
        self.timeout = timeout
        self.stored_response = None
        self._queue: "queue.Queue" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        if background:
            self._thread = threading.Thread(target=self._drain, daemon=True)
            self._thread.start()

    # -- plumbing ------------------------------------------------------------
    def _check_level(self, level: str) -> bool:
        return LOG_LEVELS.get(level, 3) <= self.log_level

    def _drain(self):
        while True:
            args = self._queue.get()
            if args is None:
                return
            self._post(*args)
            self._queue.task_done()

    def _submit(self, *args):
        if self._thread is not None:
            self._queue.put(args)
        else:
            self._post(*args)

    def flush(self, timeout: float = 30.0):
        """Block until every queued send has been attempted."""
        if self._thread is not None:
            deadline = time.time() + timeout
            while not self._queue.empty() and time.time() < deadline:
                time.sleep(0.01)
            self._queue.join()

    def _post(self, payload: Dict[str, Any], files: Optional[Dict],
              store_response: bool):
        import requests
        try:
            if files:
                r = requests.post(self.webhook_url, data=payload,
                                  files=files, timeout=self.timeout)
            else:
                r = requests.post(self.webhook_url, json=payload,
                                  timeout=self.timeout)
            r.raise_for_status()
            if store_response:
                self.stored_response = dict(r.headers)
        except Exception as e:  # endpoint problems never break training
            logger.error("Could not send webhook request: %s", e)

    # -- public sends ----------------------------------------------------
    def send(self, message: str,
             images: Optional[Sequence[np.ndarray]] = None,
             message_level: str = "info",
             store_response: bool = False) -> None:
        """Discord-style text (+ optional image) message."""
        if self.webhook_type != "discord" or not _is_main_process():
            return
        if not self._check_level(message_level):
            return
        if images is not None and not isinstance(images, (list, tuple)):
            images = [images]
        chunks = [images[i:i + 9] for i in range(0, len(images), 9)] \
            if images and len(images) > 10 else [images]
        for chunk in chunks:
            files = {f"file{i}": (f"image{i}.png", _png_bytes(img),
                                  "image/png")
                     for i, img in enumerate(chunk)} if chunk else None
            self._submit({"content": f"{self.message_prefix}{message}"},
                         files, store_response)

    def send_raw(self, structured_data: Dict[str, Any], message_type: str,
                 message_level: str = "info",
                 job_id: Optional[str] = None) -> None:
        """Structured JSON POST (reference handler.py:149-171)."""
        if self.webhook_type != "raw" or not _is_main_process():
            return
        if not self._check_level(message_level):
            return
        payload = dict(structured_data)
        payload["message_type"] = message_type
        payload["job_id"] = job_id
        payload["timestamp"] = int(time.time())
        self._submit(payload, None, False)

    def send_progress_update(self, kind: str, progress: int, total: int,
                             current: int,
                             job_id: Optional[str] = None) -> None:
        """Progress ping (reference webhooks/mixin.py:14-31)."""
        if total == 1:
            return
        self.send_raw(
            {"message": {"progress_type": kind, "progress": progress,
                         "total_elements": total,
                         "current_estimated_index": current}},
            "progress_update", job_id=job_id)


class WebhookCallback:
    """Trainer callback ``(step, metrics, state)`` posting train progress
    every ``every`` steps through a raw webhook — the mixin's
    progress_update wired into this framework's callback protocol."""

    def __init__(self, handler: WebhookHandler, total_steps: int,
                 every: int = 50, job_id: Optional[str] = None):
        self.handler = handler
        self.total = int(total_steps)
        self.every = max(1, int(every))
        self.job_id = job_id

    def __call__(self, step: int, metrics: Dict[str, Any], state=None):
        if step % self.every:
            return
        pct = int(100 * step / max(1, self.total))
        payload = {"message": {"progress_type": "train", "progress": pct,
                               "total_elements": self.total,
                               "current_estimated_index": step,
                               "metrics": {k: float(v) for k, v in
                                           metrics.items()
                                           if np.isscalar(v) or
                                           getattr(v, "ndim", 1) == 0}}}
        self.handler.send_raw(payload, "progress_update",
                              job_id=self.job_id)


# ---------------------------------------------------------------------------
# Hub publishing
# ---------------------------------------------------------------------------

MODEL_CARD_TEMPLATE = """---
license: {license}
base_model: {base_model}
tags:
{tags}
---

# {repo_id}

{description}

Trained with videotuna-tpu for {steps} steps (lr {lr}, batch {batch},
grad-accum {accum}).

## Validation prompts

{prompts}

## Usage

```python
from videotuna_tpu.flows import load_flow
flow = load_flow("{repo_id}")
video = flow.inference(prompt="{first_prompt}")
```
"""


class HubManager:
    """Stage (and, when possible, upload) a trained model to the Hub
    (reference publishing/huggingface.py:17 + metadata.py save_model_card).

    ``stage()`` always works: writes README.md (model card), copies
    weights and validation assets into ``<output_dir>/hub_export``.
    ``upload_model()`` additionally pushes via huggingface_hub with 3
    retries — it degrades to the staged directory with a logged reason
    when the library or token is unavailable (zero-egress environments)."""

    def __init__(self, config: Dict[str, Any],
                 repo_id: Optional[str] = None):
        self.config = dict(config)
        self.repo_id = (repo_id or self.config.get("hub_model_id")
                        or self.config.get("tracker_project_name")
                        or "videotuna-tpu-model")
        self.output_dir = Path(self.config.get("output_dir", "."))
        self.export_dir = self.output_dir / "hub_export"
        self.validation_prompts: List[str] = []
        self.validation_shortnames: List[str] = []

    def set_validation_prompts(self, prompts: Sequence[str],
                               shortnames: Optional[Sequence[str]] = None):
        self.validation_prompts = list(prompts)
        self.validation_shortnames = list(shortnames or
                                          [f"v{i}" for i in
                                           range(len(prompts))])

    def _load_hub_token(self) -> Optional[str]:
        token = os.environ.get("HF_TOKEN")
        if token:
            return token
        p = Path.home() / ".cache/huggingface/token"
        return p.read_text().strip() if p.exists() else None

    def commit_message(self, steps: int = 0, epochs: int = 0) -> str:
        return (f"Trained for {epochs} epochs and {steps} steps.\n"
                f"Learning rate {self.config.get('learning_rate')}, batch "
                f"size {self.config.get('train_batch_size')}, and "
                f"{self.config.get('gradient_accumulation_steps', 1)} "
                f"gradient accumulation steps.\n"
                f"Base model: "
                f"{self.config.get('pretrained_model_name_or_path')}")

    def save_model_card(self, repo_folder: Optional[Path] = None,
                        steps: int = 0) -> Path:
        folder = Path(repo_folder or self.export_dir)
        folder.mkdir(parents=True, exist_ok=True)
        tags = ["video-generation", "diffusion", "jax", "tpu",
                "videotuna-tpu"]
        if "lora" in str(self.config.get("model_type", "")):
            tags.append("lora")
        prompts = "\n".join(
            f"- **{s}**: {p}" for s, p in
            zip(self.validation_shortnames, self.validation_prompts)) \
            or "- (none recorded)"
        card = MODEL_CARD_TEMPLATE.format(
            license=self.config.get("license", "other"),
            base_model=self.config.get("pretrained_model_name_or_path",
                                       "unknown"),
            tags="\n".join(f"- {t}" for t in tags),
            repo_id=self.repo_id,
            description=self.config.get(
                "model_card_description",
                "Video diffusion model trained with the videotuna-tpu "
                "framework."),
            steps=steps,
            lr=self.config.get("learning_rate", "?"),
            batch=self.config.get("train_batch_size", "?"),
            accum=self.config.get("gradient_accumulation_steps", 1),
            prompts=prompts,
            first_prompt=(self.validation_prompts[0]
                          if self.validation_prompts else "a video"))
        path = folder / "README.md"
        path.write_text(card)
        return path

    def stage(self, weights_dir: Optional[str] = None,
              assets_dir: Optional[str] = None, steps: int = 0) -> Path:
        """Materialize the full publishable bundle locally."""
        import shutil
        self.export_dir.mkdir(parents=True, exist_ok=True)
        self.save_model_card(steps=steps)
        for src, dst in ((weights_dir, "weights"), (assets_dir, "assets")):
            if src and Path(src).exists():
                shutil.copytree(src, self.export_dir / dst,
                                dirs_exist_ok=True)
        (self.export_dir / "hub_meta.json").write_text(json.dumps(
            {"repo_id": self.repo_id,
             "commit_message": self.commit_message(steps=steps)}, indent=2))
        return self.export_dir

    def upload_model(self, weights_dir: Optional[str] = None,
                     assets_dir: Optional[str] = None, steps: int = 0,
                     webhook_handler: Optional[WebhookHandler] = None
                     ) -> Dict[str, Any]:
        """Stage, then push with 3 retries (huggingface.py:105-118)."""
        staged = self.stage(weights_dir, assets_dir, steps=steps)
        if webhook_handler:
            webhook_handler.send(
                f"Uploading model to Hugging Face Hub as `{self.repo_id}`.")
        token = self._load_hub_token()
        try:
            from huggingface_hub import create_repo, upload_folder
        except ImportError:
            logger.warning(
                "huggingface_hub not installed — model staged at %s, "
                "not uploaded", staged)
            return {"uploaded": False, "staged": str(staged),
                    "reason": "huggingface_hub not installed"}
        if not token:
            logger.warning("no HF token — model staged at %s, not "
                           "uploaded", staged)
            return {"uploaded": False, "staged": str(staged),
                    "reason": "no token"}
        last_err = None
        for attempt in range(3):
            try:
                repo = create_repo(repo_id=self.repo_id, exist_ok=True,
                                   token=token).repo_id
                upload_folder(repo_id=repo, folder_path=str(staged),
                              commit_message=self.commit_message(
                                  steps=steps), token=token)
                if webhook_handler:
                    webhook_handler.send(
                        f"Model is now available on the Hub as `{repo}`.")
                return {"uploaded": True, "repo_id": repo,
                        "staged": str(staged)}
            except Exception as e:
                last_err = e
                if webhook_handler:
                    webhook_handler.send(
                        f"(attempt {attempt + 1}/3) Error uploading "
                        f"model: {e}. Retrying...")
        return {"uploaded": False, "staged": str(staged),
                "reason": str(last_err)}
