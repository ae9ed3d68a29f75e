"""Pluggable storage backends + the multi-backend dataloader factory.

Capability parity with the reference's vendored SimpleTuner data-backend
stack (/root/reference/videotuna/third_party/flux/data_backend/base.py:8 —
``BaseDataBackend`` ABC; local.py / aws.py / csv_url_list.py — the three
concrete stores; factory.py:56 ``init_backend_config`` + configure_multi_
databackend — the ``multidatabackend.json`` surface that wires datasets,
VAE-latent caches and text-embed caches together).

TPU framing: backends are a *host-side* abstraction — they never appear
inside jit. Every read resolves to a numpy array (or bytes) on the host;
the device only ever sees the static-shape batches the bucket sampler
emits. Compressed array storage uses numpy's own container (npy + gzip)
rather than torch pickles, and the S3/URL backends degrade to explicit
errors instead of silent hangs when their optional dependency or network
egress is unavailable (this environment has neither).
"""

from __future__ import annotations

import csv
import gzip
import io
import json
import logging
import os
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .buckets import ArrayCache

logger = logging.getLogger(__name__)

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".webm", ".mkv")


class DataBackend(ABC):
    """Read/write/list surface every store implements
    (reference base.py:8-107, minus the torch-pickle helpers — arrays are
    stored as .npy/.npy.gz, loadable with zero framework imports)."""

    id: str = "default"

    @abstractmethod
    def read(self, identifier) -> bytes: ...

    @abstractmethod
    def write(self, identifier, data) -> None: ...

    @abstractmethod
    def delete(self, identifier) -> None: ...

    @abstractmethod
    def exists(self, identifier) -> bool: ...

    @abstractmethod
    def list_files(self, file_extensions: Sequence[str] = (),
                   instance_data_dir: Optional[str] = None) -> List[str]: ...

    # -- shared helpers -----------------------------------------------------
    def read_image(self, identifier) -> np.ndarray:
        """Decode to HWC uint8 (cv2 host path, like data/video_io.py)."""
        import cv2
        buf = np.frombuffer(self.read(identifier), dtype=np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError(f"undecodable image: {identifier}")
        return img[..., ::-1].copy()  # BGR -> RGB

    def read_image_batch(self, identifiers: Sequence,
                         delete_problematic_images: bool = False
                         ) -> Tuple[List, List[np.ndarray]]:
        ok_ids, images = [], []
        for ident in identifiers:
            try:
                images.append(self.read_image(ident))
                ok_ids.append(ident)
            except Exception as e:  # mirrors reference's salvage loop
                logger.warning("read_image_batch: %s -> %s", ident, e)
                if delete_problematic_images:
                    try:
                        self.delete(ident)
                    except Exception:
                        pass
        return ok_ids, images

    def np_save(self, array: np.ndarray, identifier,
                compress: bool = False) -> None:
        buf = io.BytesIO()
        np.save(buf, np.asarray(array))
        data = buf.getvalue()
        if compress:
            data = gzip.compress(data)
        self.write(identifier, data)

    def np_load(self, identifier) -> np.ndarray:
        data = self.read(identifier)
        if data[:2] == b"\x1f\x8b":  # gzip magic — auto-decompress
            data = gzip.decompress(data)
        return np.load(io.BytesIO(data), allow_pickle=False)


class LocalBackend(DataBackend):
    """Plain filesystem store (reference data_backend/local.py)."""

    def __init__(self, id: str = "local",
                 instance_data_dir: Optional[str] = None,
                 compress_cache: bool = False):
        self.id = id
        self.instance_data_dir = instance_data_dir
        self.compress_cache = compress_cache

    def read(self, identifier) -> bytes:
        with open(identifier, "rb") as f:
            return f.read()

    def write(self, identifier, data) -> None:
        p = Path(identifier)
        p.parent.mkdir(parents=True, exist_ok=True)
        if isinstance(data, str):
            data = data.encode()
        tmp = p.with_suffix(p.suffix + ".tmp")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)  # atomic — a crashed writer never half-caches

    def delete(self, identifier) -> None:
        Path(identifier).unlink(missing_ok=True)

    def exists(self, identifier) -> bool:
        return Path(identifier).exists()

    def list_files(self, file_extensions: Sequence[str] = (),
                   instance_data_dir: Optional[str] = None) -> List[str]:
        root = Path(instance_data_dir or self.instance_data_dir or ".")
        exts = tuple(e if e.startswith(".") else "." + e
                     for e in file_extensions) or None
        out = [str(p) for p in sorted(root.rglob("*"))
               if p.is_file() and (exts is None
                                   or p.suffix.lower() in exts)]
        return out


class CSVURLBackend(DataBackend):
    """CSV of (url, caption) rows with a local download cache
    (reference data_backend/csv_url_list.py). Rows whose URL is already a
    local path are served directly; remote URLs are fetched only when
    ``allow_fetch`` is set (this environment has zero egress — the default
    surfaces a clear error instead of a hang)."""

    def __init__(self, id: str, csv_file: str, csv_cache_dir: str,
                 url_column: str = "url", caption_column: str = "caption",
                 allow_fetch: bool = False):
        self.id = id
        self.csv_file = csv_file
        self.cache_dir = Path(csv_cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.url_column, self.caption_column = url_column, caption_column
        self.allow_fetch = allow_fetch
        with open(csv_file, newline="") as f:
            rows = list(csv.DictReader(f))
        self.urls = [r[url_column] for r in rows]
        self.captions = {r[url_column]: r.get(caption_column, "")
                         for r in rows}

    def _local_path(self, url: str) -> Path:
        if "://" not in url:
            return Path(url)
        name = ArrayCache.key_of("url", url) + Path(url).suffix
        return self.cache_dir / name

    def read(self, identifier) -> bytes:
        p = self._local_path(identifier)
        if not p.exists():
            if "://" in identifier and self.allow_fetch:
                import requests
                r = requests.get(identifier, timeout=30)
                r.raise_for_status()
                p.write_bytes(r.content)
            else:
                raise FileNotFoundError(
                    f"{identifier} not in cache {self.cache_dir} and "
                    f"allow_fetch={self.allow_fetch}")
        return p.read_bytes()

    def write(self, identifier, data) -> None:
        p = self._local_path(identifier)
        if isinstance(data, str):
            data = data.encode()
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)

    def delete(self, identifier) -> None:
        self._local_path(identifier).unlink(missing_ok=True)

    def exists(self, identifier) -> bool:
        return self._local_path(identifier).exists()

    def list_files(self, file_extensions: Sequence[str] = (),
                   instance_data_dir: Optional[str] = None) -> List[str]:
        exts = tuple(e if e.startswith(".") else "." + e
                     for e in file_extensions)
        return [u for u in self.urls
                if not exts or Path(u).suffix.lower() in exts]

    def get_caption(self, url: str) -> str:
        return self.captions.get(url, "")


class S3Backend(DataBackend):
    """S3-compatible object store (reference data_backend/aws.py). The
    boto3 dependency is optional and absent in this image — construction
    fails loudly with the exact knob to flip rather than at first read."""

    def __init__(self, id: str, aws_bucket_name: str,
                 aws_data_prefix: str = "",
                 aws_endpoint_url: Optional[str] = None,
                 aws_region_name: Optional[str] = None,
                 aws_access_key_id: Optional[str] = None,
                 aws_secret_access_key: Optional[str] = None):
        try:
            import boto3  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "S3Backend requires boto3, which is not installed in this "
                "environment; use a `local` or `csv` backend, or install "
                "boto3 where egress exists") from e
        import boto3
        self.id = id
        self.bucket = aws_bucket_name
        self.prefix = aws_data_prefix
        self.client = boto3.client(
            "s3", endpoint_url=aws_endpoint_url,
            region_name=aws_region_name,
            aws_access_key_id=aws_access_key_id,
            aws_secret_access_key=aws_secret_access_key)

    def _key(self, identifier) -> str:
        return str(Path(self.prefix) / identifier) if self.prefix \
            else str(identifier)

    def read(self, identifier) -> bytes:
        return self.client.get_object(
            Bucket=self.bucket, Key=self._key(identifier))["Body"].read()

    def write(self, identifier, data) -> None:
        if isinstance(data, str):
            data = data.encode()
        self.client.put_object(Bucket=self.bucket,
                               Key=self._key(identifier), Body=data)

    def delete(self, identifier) -> None:
        self.client.delete_object(Bucket=self.bucket,
                                  Key=self._key(identifier))

    def exists(self, identifier) -> bool:
        try:
            self.client.head_object(Bucket=self.bucket,
                                    Key=self._key(identifier))
            return True
        except Exception:
            return False

    def list_files(self, file_extensions: Sequence[str] = (),
                   instance_data_dir: Optional[str] = None) -> List[str]:
        exts = tuple(e if e.startswith(".") else "." + e
                     for e in file_extensions)
        paginator = self.client.get_paginator("list_objects_v2")
        out = []
        for page in paginator.paginate(Bucket=self.bucket,
                                       Prefix=instance_data_dir
                                       or self.prefix):
            for obj in page.get("Contents", []):
                k = obj["Key"]
                if not exts or Path(k).suffix.lower() in exts:
                    out.append(k)
        return out


# ---------------------------------------------------------------------------
# multidatabackend.json factory
# ---------------------------------------------------------------------------

_BACKEND_TYPES = {"local": LocalBackend, "csv": CSVURLBackend,
                  "aws": S3Backend}
_DATASET_TYPES = ("image", "video", "conditioning", "text_embeds",
                  "image_embeds")


def init_backend_config(entry: Dict[str, Any]) -> Dict[str, Any]:
    """Validate one multidatabackend entry (reference factory.py:56-200's
    checks, minus torch/accelerator state): required id/type, dataset_type
    whitelist, caption_filter_list only on text datasets."""
    if "id" not in entry:
        raise ValueError(f"backend entry missing 'id': {entry}")
    btype = entry.get("type", "local")
    if btype not in _BACKEND_TYPES:
        raise ValueError(
            f"backend {entry['id']}: unknown type {btype!r} "
            f"(supported: {sorted(_BACKEND_TYPES)})")
    dtype = entry.get("dataset_type", "image")
    if dtype not in _DATASET_TYPES:
        raise ValueError(
            f"backend {entry['id']}: unknown dataset_type {dtype!r} "
            f"(supported: {_DATASET_TYPES})")
    if "caption_filter_list" in entry and dtype != "text_embeds":
        raise ValueError(
            f"caption_filter_list is only valid for text_embeds datasets; "
            f"set on {dtype} dataset {entry['id']}")
    return entry


def make_backend(entry: Dict[str, Any]) -> DataBackend:
    """Instantiate one store from its config entry."""
    entry = init_backend_config(entry)
    btype = entry.get("type", "local")
    cls = _BACKEND_TYPES[btype]
    kwargs: Dict[str, Any] = {"id": entry["id"]}
    if btype == "local":
        kwargs["instance_data_dir"] = entry.get("instance_data_dir")
        kwargs["compress_cache"] = bool(entry.get("compress_cache", False))
    elif btype == "csv":
        kwargs.update(
            csv_file=entry["csv_file"],
            csv_cache_dir=entry.get("csv_cache_dir", "csv_cache"),
            url_column=entry.get("csv_url_column", "url"),
            caption_column=entry.get("csv_caption_column", "caption"),
            allow_fetch=bool(entry.get("allow_fetch", False)))
    elif btype == "aws":
        kwargs.update(
            aws_bucket_name=entry["aws_bucket_name"],
            aws_data_prefix=entry.get("aws_data_prefix", ""),
            aws_endpoint_url=entry.get("aws_endpoint_url"),
            aws_region_name=entry.get("aws_region_name"),
            aws_access_key_id=entry.get("aws_access_key_id"),
            aws_secret_access_key=entry.get("aws_secret_access_key"))
    return cls(**kwargs)


def configure_multi_databackend(config: Any) -> Dict[str, Dict[str, Any]]:
    """Build every enabled backend from a multidatabackend.json path or an
    already-parsed list (reference factory.py ``configure_multi_databackend``
    — the orchestration entry). Returns ``{id: bundle}`` where each bundle
    carries the store, its dataset_type, an ArrayCache for its embed/latent
    cache dir when configured, and the raw entry for downstream knobs
    (crop, resolution, caption_strategy, repeats...).

    Exactly one text_embeds backend may be marked ``default: true`` when
    several exist; disabled entries are skipped; duplicate ids are errors —
    the three invariants the reference enforces across its 1.4k-line
    factory."""
    if isinstance(config, (str, Path)):
        with open(config) as f:
            entries = json.load(f)
    else:
        entries = list(config)
    out: Dict[str, Dict[str, Any]] = {}
    default_text: Optional[str] = None
    for entry in entries:
        if entry.get("disabled") or entry.get("disable", False):
            logger.info("backend %s disabled — skipping",
                        entry.get("id"))
            continue
        entry = init_backend_config(entry)
        if entry["id"] in out:
            raise ValueError(f"duplicate backend id {entry['id']!r}")
        store = make_backend(entry)
        dtype = entry.get("dataset_type", "image")
        cache_dir = entry.get("cache_dir") or entry.get("cache_dir_vae")
        bundle = {
            "id": entry["id"],
            "backend": store,
            "dataset_type": dtype,
            "cache": ArrayCache(cache_dir) if cache_dir else None,
            "config": entry,
        }
        if dtype == "text_embeds" and entry.get("default"):
            if default_text is not None:
                raise ValueError(
                    f"multiple default text_embeds backends: "
                    f"{default_text} and {entry['id']}")
            default_text = entry["id"]
        out[entry["id"]] = bundle
    text_ids = [k for k, v in out.items()
                if v["dataset_type"] == "text_embeds"]
    if len(text_ids) > 1 and default_text is None:
        raise ValueError(
            f"{len(text_ids)} text_embeds backends but none marked "
            f"default: true — ambiguous prompt-embed routing")
    if default_text is None and text_ids:
        default_text = text_ids[0]
    if default_text is not None:
        out[default_text]["default_text_embeds"] = True
    return out
