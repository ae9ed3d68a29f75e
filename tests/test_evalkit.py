"""Eval kit tests: correlation op, metrics behavior, runner e2e."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.evalkit.correlation import (correlation_volume,
                                               estimate_flow,
                                               flow_from_correlation)
from videotuna_tpu.evalkit.metrics import (dynamic_degree_proxy,
                                           evaluate_video,
                                           motion_smoothness_proxy,
                                           subject_consistency_proxy,
                                           temporal_flickering)
from videotuna_tpu.evalkit.runner import (evaluate_directory,
                                          save_videos_vbench, tabular_score)


class TestCorrelation:
    def test_volume_shape_and_identity_peak(self):
        f = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
        corr = correlation_volume(f, f, radius=2)
        assert corr.shape == (1, 8, 8, 25)
        # zero displacement (center of 5×5 window = index 12) is the argmax
        # almost everywhere (ties can occur when a neighbor feature has
        # larger norm and correlates — rare for iid gaussian features)
        center_is_max = corr.argmax(-1)[:, 2:-2, 2:-2] == 12
        assert float(jnp.mean(center_is_max)) > 0.85
        others = jnp.delete(corr, 12, axis=-1)
        assert float(corr[..., 12].mean()) > float(others.mean()) + 1.0

    def test_flow_recovers_shift(self):
        """A pure translation must be recovered by the soft-argmax flow."""
        rng = np.random.default_rng(0)
        base = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
        shifted = np.roll(base, shift=2, axis=2)   # dx = +2
        corr = correlation_volume(jnp.asarray(base), jnp.asarray(shifted),
                                  radius=3)
        flow = flow_from_correlation(corr, radius=3)
        inner = flow[:, 4:-4, 4:-4]
        # flow dx should be ≈ +2 away from borders
        assert abs(float(inner[..., 1].mean()) - 2.0) < 0.5
        assert abs(float(inner[..., 0].mean())) < 0.5


class TestMetrics:
    def test_static_video_flickering_perfect(self):
        v = jnp.zeros((8, 32, 32, 3))
        assert float(temporal_flickering(v)) == 1.0
        assert float(motion_smoothness_proxy(v)) == 1.0
        assert float(dynamic_degree_proxy(v)) == 0.0

    def test_noise_video_flickers(self):
        v = jax.random.uniform(jax.random.key(0), (8, 32, 32, 3),
                               minval=-1, maxval=1)
        # faithful protocol: E|U1-U2| = 2/3 on [-1,1] → MAE ≈ 85/255
        score = float(temporal_flickering(v))
        assert 0.6 < score < 0.75

    def test_flickering_matches_reference_formula(self):
        rng = np.random.default_rng(5)
        v255 = rng.uniform(0, 255, (5, 16, 16, 3)).astype(np.float32)
        want = (255.0 - np.mean(np.abs(np.diff(v255, axis=0)))) / 255.0
        got = float(temporal_flickering(jnp.asarray(v255 / 127.5 - 1.0)))
        assert abs(got - want) < 1e-5

    def test_moving_square_dynamic(self):
        frames = []
        for t in range(8):
            f = -np.ones((64, 64, 3), np.float32)
            f[20:40, 4 * t:4 * t + 20] = 1.0
            frames.append(f)
        v = jnp.asarray(np.stack(frames))
        moving = float(dynamic_degree_proxy(v))
        static = float(dynamic_degree_proxy(jnp.asarray(
            np.repeat(frames[0][None], 8, 0))))
        assert moving > static

    def test_subject_consistency_orders(self):
        stable = jnp.zeros((6, 32, 32, 3)) + 0.5
        noisy = jax.random.uniform(jax.random.key(1), (6, 32, 32, 3),
                                   minval=-1, maxval=1)
        assert float(subject_consistency_proxy(stable)) > \
            float(subject_consistency_proxy(noisy))

    def test_evaluate_video_all_dims(self):
        v = np.zeros((4, 32, 32, 3), np.uint8)
        scores = evaluate_video(v)
        assert set(scores) >= {"temporal_flickering", "dynamic_degree_proxy"}
        assert all(0.0 <= s <= 1.0 for s in scores.values())


class TestRunner:
    def test_vbench_save_and_evaluate(self, tmp_path):
        rng = np.random.default_rng(0)
        videos = [rng.integers(0, 255, (6, 32, 32, 3)).astype(np.uint8)
                  for _ in range(2)]
        paths = save_videos_vbench(videos, ["a cat", "a dog"],
                                   str(tmp_path), n_per_prompt=1)
        assert len(paths) == 2
        assert (tmp_path / "info.json").exists()
        info = json.loads((tmp_path / "info.json").read_text())
        assert info[0]["prompt_en"] == "a cat"

        final = evaluate_directory(str(tmp_path))
        assert final["num_videos"] == 2
        assert (tmp_path / "final_results.json").exists()
        table = tabular_score(final)
        assert "mean" in table


class TestViCLIPWiring:
    def test_evaluate_video_viclip_dispatch(self):
        """A ViCLIP scorer overrides overall_consistency/temporal_style
        with video-level scores (wiring test with a duck-typed scorer)."""
        from videotuna_tpu.evalkit.metrics import evaluate_video

        class FakeScorer:
            calls = []

            def score(self, video, text):
                self.calls.append(text)
                return 0.42

        rng = np.random.default_rng(0)
        video = rng.standard_normal((6, 16, 16, 3)).astype(np.float32)
        out = evaluate_video(video, prompt="a red fox",
                             aux={"style": "in van gogh style"},
                             viclip_scorer=FakeScorer())
        assert out["overall_consistency"] == 0.42
        assert out["temporal_style"] == 0.42
        assert FakeScorer.calls == ["a red fox", "in van gogh style"]

    def test_clip_bpe_roundtrip_or_skip(self):
        from videotuna_tpu.evalkit.clip_bpe import default_tokenizer
        tok = default_tokenizer()
        if tok is None:
            import pytest
            pytest.skip("no bpe vocab asset on disk")
        ids = tok(["a photo of a cat"], context=32)
        assert ids.shape == (1, 32)
        assert ids[0, 0] == tok.sot_id
        assert tok.eot_id in ids[0]
        assert tok.decode([i for i in ids[0]
                           if i not in (tok.sot_id, tok.eot_id, 0)]) == \
            "a photo of a cat"


class TestLeaderboardScore:
    """Faithful VBench leaderboard scaling (reference tabular_score.py)."""

    def test_all_at_max_gives_total_one(self):
        from videotuna_tpu.evalkit.runner import (NORMALIZE_DIC,
                                                  leaderboard_score)
        summary = {d.replace(" ", "_"): hi
                   for d, (lo, hi) in NORMALIZE_DIC.items()}
        lb = leaderboard_score(summary)
        assert abs(lb["quality score"] - 1.0) < 1e-9
        assert abs(lb["semantic score"] - 1.0) < 1e-9
        assert abs(lb["total score"] - 1.0) < 1e-9

    def test_minmax_weight_and_total_formula(self):
        from videotuna_tpu.evalkit.runner import (NORMALIZE_DIC,
                                                  leaderboard_score)
        # midpoint of every range → scaled 0.5·weight; quality mean stays
        # 0.5 (dynamic degree's 0.5 weight divides out), total = 0.5
        summary = {d.replace(" ", "_"): (lo + hi) / 2
                   for d, (lo, hi) in NORMALIZE_DIC.items()}
        lb = leaderboard_score(summary)
        assert abs(lb["subject consistency"] - 0.5) < 1e-9
        assert abs(lb["dynamic degree"] - 0.25) < 1e-9   # ×0.5 weight
        assert abs(lb["quality score"] - 0.5) < 1e-9
        assert abs(lb["total score"] - 0.5) < 1e-9

    def test_proxy_dims_flagged_and_partial_aggregates(self):
        from videotuna_tpu.evalkit.runner import leaderboard_score
        lb = leaderboard_score({"imaging_quality_proxy": 0.7,
                                "subject_consistency": 1.0})
        assert "imaging quality" in lb
        assert lb["_proxy_dimensions"] == ["imaging quality"]
        assert "quality score" not in lb        # incomplete member set
        assert "total score" not in lb

    def test_tabular_includes_leaderboard_block(self):
        from videotuna_tpu.evalkit.runner import (NORMALIZE_DIC,
                                                  tabular_score)
        summary = {d.replace(" ", "_"): hi
                   for d, (lo, hi) in NORMALIZE_DIC.items()}
        txt = tabular_score({"summary": summary})
        assert "total score" in txt and "100.00%" in txt
