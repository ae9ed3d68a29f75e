"""VBench-style quality metrics, computed in JAX.

Parity with the reference's vendored VBench fork (SURVEY.md §2.8:
eval/scripts/evaluation.py:14-39 lists 16 dimensions). Dimensions that
require pretrained perception backbones (ViCLIP/UMT/GRiT/tag2Text) accept a
feature-extractor callable — by default a deterministic downsampled-pixel
embedder so the harness runs offline; plug a real CLIP params tree for
leaderboard-grade numbers.

Implemented dimensions:
- temporal_flickering        FAITHFUL: (255 − mean inter-frame MAE)/255
- dynamic_degree             FAITHFUL: full JAX RAFT + the VBench scoring
                             rules (needs converted raft-things weights)
- dynamic_degree_proxy       correlation-flow stand-in (no weights)
- motion_smoothness          FAITHFUL: AMT-S frame interpolation + the
                             VBench residual protocol (needs converted
                             amt-s weights)
- motion_smoothness_proxy    2nd-order temporal difference (no weights)
- subject_consistency        FAITHFUL: DINO ViT-B/16 CLS features + the
                             VBench (prev+first)/2 clamped-cosine formula
                             (needs converted dino_vitb16 weights)
- subject_consistency_proxy  pooled-pixel feature cosine (no weights)
- background_consistency     FAITHFUL: CLIP frame features + the same
                             formula (eval/vbench/background_consistency
                             .py:15-57; needs a converted CLIPScorer)
- background_consistency_proxy  frame-border cosine (no weights)
- imaging_quality_proxy      local-contrast / saturation heuristic
- aesthetic_quality(_proxy)  LAION MLP over CLIP (real) / heuristic

All metrics map a video (T, H, W, 3) float in [-1, 1] → scalar in [0, 1].
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.evalkit.correlation import estimate_flow

FeatureFn = Callable[[jnp.ndarray], jnp.ndarray]   # (T,H,W,3)→(T,D)


def default_features(video: jnp.ndarray, grid: int = 8) -> jnp.ndarray:
    """Deterministic per-frame embedding: grid-pooled colors + gradients."""
    t, h, w, c = video.shape
    ph, pw = max(h // grid, 1), max(w // grid, 1)
    pooled = jax.lax.reduce_window(
        video, 0.0, jax.lax.add, (1, ph, pw, 1), (1, ph, pw, 1),
        "VALID") / (ph * pw)
    return pooled.reshape(t, -1)


def _cos(a, b, eps=1e-8):
    num = jnp.sum(a * b, -1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + eps
    return num / den


def temporal_flickering(video: jnp.ndarray) -> jnp.ndarray:
    """FAITHFUL VBench protocol (eval/vbench/temporal_flickering.py:21-44):
    mean absolute difference between consecutive frames in 0–255 units,
    scored as (255 − MAE)/255. Model-free in VBench too, so this carries
    the real dimension name."""
    if video.shape[0] < 2:
        return jnp.asarray(1.0)
    v255 = (video + 1.0) * 127.5
    mae = jnp.mean(jnp.abs(jnp.diff(v255, axis=0)))
    return (255.0 - mae) / 255.0


def motion_smoothness_proxy(video: jnp.ndarray) -> jnp.ndarray:
    """Second-order temporal-difference heuristic. NOT VBench's
    motion_smoothness (which scores AMT frame-interpolation residuals,
    eval/vbench/motion_smoothness.py:113-178) — hence the ``_proxy``
    suffix."""
    if video.shape[0] < 3:
        return jnp.asarray(1.0)
    accel = jnp.diff(video, n=2, axis=0)
    return jnp.clip(1.0 - jnp.mean(jnp.abs(accel)) * 5.0, 0.0, 1.0)


def dynamic_degree_proxy(video: jnp.ndarray,
                         threshold: float = 2.0) -> jnp.ndarray:
    """Pooled-correlation soft-argmax flow stand-in. NOT VBench's
    RAFT-based dynamic_degree — use ``dynamic_degree`` with converted
    RAFT weights for the faithful protocol."""
    if video.shape[0] < 2:
        return jnp.asarray(0.0)
    flow = estimate_flow(video[:-1], video[1:])
    mag = jnp.linalg.norm(flow, axis=-1)
    return jnp.mean((mag > threshold).astype(jnp.float32))


def dynamic_degree(video: jnp.ndarray, raft_params,
                   fps: Optional[float] = None, iters: int = 20,
                   pair_chunk: int = 8) -> float:
    """FAITHFUL VBench dynamic_degree (eval/vbench/dynamic_degree.py:15-80)
    over the JAX RAFT (evalkit/raft.py):

    - frames subsampled to ~8 fps (interval = round(fps/8));
    - per consecutive pair: pad to /8 (InputPadder), 20 RAFT iterations,
      score = mean of the top-5% flow magnitudes (on the padded frame);
    - thres = 6·(min(H,W)/256), count_num = round(4·(T/16));
    - returns 1.0 once count_num scores exceed thres, else 0.0 —
      including the reference's count_num == 0 ⇒ immediately-True path.
    """
    from videotuna_tpu.evalkit.raft import RAFT, pad_to_8
    v = np.asarray(video)
    v255 = (v + 1.0) * 127.5
    if fps:
        interval = max(int(round(fps / 8)), 1)
        v255 = v255[::interval]
    count = v255.shape[0]
    if count < 2:
        return 0.0
    scale = min(v255.shape[1], v255.shape[2])
    thres = 6.0 * (scale / 256.0)
    count_num = round(4 * (count / 16.0))
    padded, _ = pad_to_8(jnp.asarray(v255, jnp.float32))
    model = RAFT(iters=iters)
    apply_fn = jax.jit(
        lambda p, a, b: model.apply({"params": p}, a, b))
    scores: List[float] = []
    h, w = padded.shape[1:3]
    cut = int(h * w * 0.05)
    for s in range(0, count - 1, pair_chunk):
        a = padded[s:s + pair_chunk]
        b = padded[s + 1:s + 1 + pair_chunk]
        n = min(a.shape[0], b.shape[0])
        flows = np.asarray(apply_fn(raft_params, a[:n], b[:n]))
        rad = np.sqrt(np.sum(flows ** 2, axis=-1)).reshape(n, -1)
        top = -np.sort(-rad, axis=1)[:, :cut]
        scores.extend(np.mean(top, axis=1).tolist())
    moved = 0
    for sc in scores:
        if sc > thres:
            moved += 1
        if moved >= count_num:
            return 1.0
    return 0.0


def subject_consistency_proxy(video: jnp.ndarray,
                              features: FeatureFn = default_features
                              ) -> jnp.ndarray:
    """Pooled-pixel feature cosine. NOT VBench's subject_consistency
    (which uses DINO ViT-B/16 CLS features,
    eval/vbench/subject_consistency.py:27-80) — use
    ``subject_consistency`` with converted dino_vitb16 weights
    (evalkit/dino.py) for the faithful protocol."""
    f = features(video)
    sims = _cos(f[1:], jnp.broadcast_to(f[:1], f[1:].shape))
    adj = _cos(f[1:], f[:-1])
    return jnp.clip((jnp.mean(sims) + jnp.mean(adj)) / 2.0, 0.0, 1.0)


def background_consistency_proxy(video: jnp.ndarray,
                                 border: int = 8) -> jnp.ndarray:
    """Frame-border cosine heuristic. NOT VBench's background_consistency
    (CLIP frame features) — use ``background_consistency`` with a
    converted CLIPScorer for the faithful protocol."""
    edges = jnp.concatenate([
        video[:, :border].reshape(video.shape[0], -1),
        video[:, -border:].reshape(video.shape[0], -1),
        video[:, :, :border].reshape(video.shape[0], -1),
        video[:, :, -border:].reshape(video.shape[0], -1),
    ], axis=-1)
    sims = _cos(edges[1:], jnp.broadcast_to(edges[:1], edges[1:].shape))
    return jnp.clip(jnp.mean(sims), 0.0, 1.0)


def _vbench_consistency_formula(f: np.ndarray) -> float:
    """The shared VBench consistency score over L2-normalized per-frame
    features: mean over i>=1 of
    (max(0, cos(f_{i-1}, f_i)) + max(0, cos(f_0, f_i))) / 2
    (background_consistency.py:36-51, subject_consistency.py:48-73)."""
    if f.shape[0] < 2:
        return 1.0
    sim_pre = np.maximum((f[:-1] * f[1:]).sum(-1), 0.0)
    sim_fir = np.maximum((f[:1] * f[1:]).sum(-1), 0.0)
    return float(np.mean((sim_pre + sim_fir) / 2.0))


def background_consistency(video: jnp.ndarray, scorer) -> float:
    """FAITHFUL VBench background_consistency
    (eval/vbench/background_consistency.py:15-57): CLIP frame features
    (the 224px clip_transform lives in the scorer's preprocess), scored
    with the clamped (prev+first)/2 cosine formula."""
    f = np.asarray(scorer.embed_frames(video))
    return _vbench_consistency_formula(f)


def imaging_quality_proxy(video: jnp.ndarray) -> jnp.ndarray:
    """Local-contrast/saturation heuristic. NOT VBench's MUSIQ — reported
    under a ``_proxy`` suffix so it can't be mistaken for the leaderboard
    number (VERDICT r1 weak-6)."""
    gy = jnp.diff(video, axis=1)
    gx = jnp.diff(video, axis=2)
    contrast = (jnp.mean(jnp.abs(gy)) + jnp.mean(jnp.abs(gx))) / 2.0
    sat = jnp.mean(jnp.std(video, axis=-1))
    return jnp.clip(contrast * 3.0 + sat, 0.0, 1.0)


def aesthetic_quality_proxy(video: jnp.ndarray,
                            features: FeatureFn = default_features
                            ) -> jnp.ndarray:
    """Feature-norm heuristic; the REAL dimension is ``aesthetic_quality``
    below, which needs converted CLIP + LAION-MLP weights."""
    f = features(video)
    return jnp.clip(jnp.tanh(jnp.mean(jnp.abs(f)) * 2.0), 0.0, 1.0)


def aesthetic_quality(video: jnp.ndarray, scorer,
                      aesthetic_params=None) -> jnp.ndarray:
    """LAION aesthetic predictor over CLIP frame embeddings — the actual
    VBench aesthetic_quality protocol (score/10, clipped to [0,1]).
    ``scorer`` is an ``evalkit.semantic.CLIPScorer``;
    ``aesthetic_params`` a converted ``AestheticPredictor`` tree
    (tools/convert_weights.aesthetic_map)."""
    from videotuna_tpu.models.clip_vision import AestheticPredictor
    emb = scorer.embed_frames(video)
    pred = AestheticPredictor()
    if aesthetic_params is None:
        aesthetic_params = pred.init(jax.random.key(0), emb)["params"]
    score = pred.apply({"params": aesthetic_params}, emb)
    return jnp.clip(jnp.mean(score) / 10.0, 0.0, 1.0)


STANDARD_DIMENSIONS: Dict[str, Callable] = {
    "temporal_flickering": temporal_flickering,        # faithful protocol
    "motion_smoothness_proxy": motion_smoothness_proxy,
    "dynamic_degree_proxy": dynamic_degree_proxy,
    "subject_consistency_proxy": subject_consistency_proxy,
    "background_consistency_proxy": background_consistency_proxy,
    "imaging_quality_proxy": imaging_quality_proxy,
    "aesthetic_quality_proxy": aesthetic_quality_proxy,
}


def evaluate_video(video: np.ndarray,
                   dimensions: Optional[List[str]] = None,
                   scorer=None, prompt: Optional[str] = None,
                   aux: Optional[Dict] = None,
                   aesthetic_params=None,
                   raft_params=None,
                   amt_params=None,
                   dino_params=None,
                   viclip_scorer=None,
                   umt_scorer=None,
                   tag2text_captioner=None,
                   grit_detector=None,
                   musiq_params=None,
                   video_name: Optional[str] = None,
                   fps: Optional[float] = None) -> Dict[str, float]:
    """video: (T, H, W, 3) uint8 or float [-1, 1]. With a CLIP ``scorer``
    the semantic dimensions (+ real aesthetic_quality) are scored too;
    with converted RAFT weights the faithful ``dynamic_degree`` replaces
    its correlation proxy, with converted AMT-S weights the faithful
    ``motion_smoothness`` replaces its heuristic proxy, and with a
    ``ViCLIPScorer`` the faithful ``overall_consistency`` /
    ``temporal_style`` (video↔text, the VBench backbone protocol)
    replace the frame-CLIP approximations."""
    if video.dtype == np.uint8:
        video = video.astype(np.float32) / 127.5 - 1.0
    v = jnp.asarray(video)
    dims = dimensions or list(STANDARD_DIMENSIONS)
    out = {d: float(STANDARD_DIMENSIONS[d](v)) for d in dims
           if d in STANDARD_DIMENSIONS}
    if raft_params is not None and (dimensions is None
                                    or "dynamic_degree" in dims):
        out["dynamic_degree"] = float(
            dynamic_degree(v, raft_params, fps=fps))
        out.pop("dynamic_degree_proxy", None)
    if amt_params is not None and (dimensions is None
                                   or "motion_smoothness" in dims):
        from videotuna_tpu.evalkit.amt import motion_smoothness_score
        out["motion_smoothness"] = float(
            motion_smoothness_score(np.asarray(video), amt_params))
        out.pop("motion_smoothness_proxy", None)
    if musiq_params is not None and (dimensions is None
                                     or "imaging_quality" in dims):
        from videotuna_tpu.evalkit.musiq import MusiqScorer
        out["imaging_quality"] = MusiqScorer(musiq_params).video_score(
            np.asarray(video))
        out.pop("imaging_quality_proxy", None)
    if dino_params is not None and (dimensions is None
                                    or "subject_consistency" in dims):
        from videotuna_tpu.evalkit.dino import subject_consistency_score
        out["subject_consistency"] = subject_consistency_score(
            np.asarray(video), dino_params)
        out.pop("subject_consistency_proxy", None)
    if scorer is not None:
        if dimensions is None or "background_consistency" in dims:
            out["background_consistency"] = background_consistency(
                v, scorer)
            out.pop("background_consistency_proxy", None)
        from videotuna_tpu.evalkit.semantic import (SEMANTIC_DIMENSIONS,
                                                    evaluate_semantics)
        sem = [d for d in dims if d in SEMANTIC_DIMENSIONS] \
            if dimensions else None
        if prompt is not None:
            out.update(evaluate_semantics(scorer, v, prompt, aux,
                                          dimensions=sem))
        if dimensions is None or "aesthetic_quality" in dims:
            out["aesthetic_quality"] = float(
                aesthetic_quality(v, scorer, aesthetic_params))
    if viclip_scorer is not None:
        vid = np.asarray(video)
        if prompt is not None and (dimensions is None
                                   or "overall_consistency" in dims):
            out["overall_consistency"] = viclip_scorer.score(vid, prompt)
        style = (aux or {}).get("style") if isinstance(aux, dict) else None
        if style and (dimensions is None or "temporal_style" in dims):
            out["temporal_style"] = viclip_scorer.score(vid, style)
    if umt_scorer is not None and video_name and \
            (dimensions is None or "human_action" in dims):
        out["human_action"] = float(
            umt_scorer.score(np.asarray(video), video_name))
    scene_phrase = (aux or {}).get("scene") if isinstance(aux, dict) \
        else None
    if isinstance(scene_phrase, dict):       # VBench aux: {"scene": str}
        scene_phrase = scene_phrase.get("scene")
    if tag2text_captioner is not None and scene_phrase and \
            (dimensions is None or "scene" in dims):
        from videotuna_tpu.evalkit.tag2text import scene_score
        out["scene"] = float(scene_score(
            tag2text_captioner, np.asarray(video), scene_phrase))
    if grit_detector is not None and isinstance(aux, dict):
        from videotuna_tpu.evalkit import grit as G
        vid = np.asarray(video)
        if aux.get("object") and (dimensions is None
                                  or "object_class" in dims):
            out["object_class"] = G.grit_object_class(
                grit_detector, vid, aux["object"])
        multi = aux.get("objects") or (
            aux.get("object") if " and " in str(aux.get("object", ""))
            else None)
        if multi and (dimensions is None or "multiple_objects" in dims):
            out["multiple_objects"] = G.grit_multiple_objects(
                grit_detector, vid, multi)
        if aux.get("spatial_relationship") and \
                (dimensions is None or "spatial_relationship" in dims):
            out["spatial_relationship"] = G.grit_spatial_relationship(
                grit_detector, vid, aux["spatial_relationship"])
        if aux.get("color") and prompt and \
                (dimensions is None or "color" in dims):
            # color.py:74-79 derives the object by stripping articles
            # and the color word from the prompt
            obj = prompt.replace("a ", "").replace("an ", "") \
                .replace(aux["color"], "").strip()
            c = G.grit_color(grit_detector, vid, aux["color"], obj)
            if c is not None:
                out["color"] = c
    return out
