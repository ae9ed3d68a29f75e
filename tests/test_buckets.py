"""Bucketing, caches, joint loading."""

import numpy as np
import pytest

from videotuna_tpu.data.buckets import (ArrayCache, AspectBucketSampler,
                                        JointLoader, nearest_bucket,
                                        precompute_text_embeddings)


class TestBuckets:
    def test_nearest_bucket_aspect(self):
        assert nearest_bucket(1024, 1024) == (1024, 1024)
        tall = nearest_bucket(1300, 750)
        assert tall[0] > tall[1]
        wide = nearest_bucket(700, 1300)
        assert wide[0] < wide[1]

    def test_sampler_single_bucket_batches(self):
        sizes = [(1024, 1024)] * 5 + [(768, 1344)] * 4
        s = AspectBucketSampler(sizes, batch_size=2, seed=0)
        batches = list(s)
        assert len(batches) == 2 + 2  # 5//2 + 4//2
        for bucket, idxs in batches:
            assert len(idxs) == 2
            for i in idxs:
                assert nearest_bucket(*sizes[i]) == bucket

    def test_sampler_epoch_reshuffle(self):
        sizes = [(512, 512)] * 8
        s = AspectBucketSampler(sizes, batch_size=2, seed=1)
        e1 = [idxs for _, idxs in s]
        e2 = [idxs for _, idxs in s]
        assert e1 != e2


class TestCache:
    def test_get_or_compute(self, tmp_path):
        cache = ArrayCache(str(tmp_path))
        calls = []

        def compute():
            calls.append(1)
            return np.ones((3,))

        k = cache.key_of("a", "b")
        v1 = cache.get_or_compute(k, compute)
        v2 = cache.get_or_compute(k, compute)
        assert calls == [1]
        np.testing.assert_array_equal(v1, v2)

    def test_text_embedding_cache(self, tmp_path):
        from videotuna_tpu.flows.opensora import OpenSoraFlow
        from tests.test_flow import TINY
        flow = OpenSoraFlow(**TINY, ddim_steps=2, model_max_length=8)
        flow.init_params(seed=0)
        mapping = precompute_text_embeddings(
            flow, ["a cat", "a dog", "a cat"], str(tmp_path))
        assert len(mapping) == 2
        cache = ArrayCache(str(tmp_path))
        emb = cache.get(mapping["a cat"])
        assert emb is not None and emb.shape == (8, 16)


class TestJointLoader:
    def test_interleaves_by_ratio(self):
        video = [{"kind": "v"}] * 4
        image = [{"kind": "i"}] * 8
        j = JointLoader([video, image], ratios=[1, 2])
        kinds = [b["kind"] for b in j]
        assert kinds[:3] == ["v", "i", "i"]
        assert len(kinds) == 12
