"""Data-layer tests mirroring the reference's only unit suite
(tests/datasets/test_dataset_from_csv.py) plus the retry/fault-injection
behavior."""

import numpy as np
import pytest

from videotuna_tpu.data.datasets import (DatasetFromCSV, EpochLoader, collate,
                                         make_toy_csv)
from videotuna_tpu.data.transforms import (CenterCropResize, Compose,
                                           ImageToVideo, LoadDummyImage,
                                           LoadDummyVideo, Normalize,
                                           TemporalRandomCrop,
                                           get_transforms_video)


@pytest.fixture()
def toy_csv(tmp_path):
    return make_toy_csv(str(tmp_path / "anno.csv"), n=128)


def make_ds(toy_csv, **kw):
    kw.setdefault("loader", LoadDummyVideo(num_frames=24, height=64,
                                           width=80))
    kw.setdefault("image_loader", LoadDummyImage(height=64, width=80))
    kw.setdefault("num_frames", 8)
    kw.setdefault("resolution", (32, 32))
    return DatasetFromCSV(toy_csv, **kw)


class TestDatasetFromCSV:
    def test_len_128(self, toy_csv):
        assert len(make_ds(toy_csv)) == 128  # reference test :32

    def test_item_shape_and_range(self, toy_csv):
        item = make_ds(toy_csv)[0]
        assert item["video"].shape == (8, 32, 32, 3)
        assert item["video"].dtype == np.float32
        assert item["video"].min() >= -1.0 and item["video"].max() <= 1.0
        assert item["caption"].startswith("toy clip")

    def test_multi_csv_concat(self, tmp_path):
        a = make_toy_csv(str(tmp_path / "a.csv"), n=10)
        b = make_toy_csv(str(tmp_path / "b.csv"), n=5)
        ds = make_ds([a, b])
        assert len(ds) == 15

    def test_train_val_split_partitions(self, toy_csv):
        train = make_ds(toy_csv, split="train", train_ratio=0.75, seed=3)
        val = make_ds(toy_csv, split="val", train_ratio=0.75, seed=3)
        assert len(train) + len(val) == 128
        assert len(train) == 96

    def test_retry_on_injected_failure(self, toy_csv):
        ds = make_ds(toy_csv,
                     loader=LoadDummyVideo(num_frames=24, height=64,
                                           width=80, probs_fail=0.5))
        # every fetch must still return a valid sample
        for i in range(20):
            item = ds[i]
            assert item["video"].shape == (8, 32, 32, 3)

    def test_first_frame_cond(self, toy_csv):
        ds = make_ds(toy_csv, first_frame_as_cond=True)
        item = ds[0]
        assert item["cond_image"].shape == (1, 32, 32, 3)
        np.testing.assert_array_equal(item["cond_image"][0],
                                      item["video"][0])


class TestTransforms:
    def test_temporal_crop_short_video_wraps(self):
        v = np.zeros((3, 8, 8, 3), np.uint8)
        out = TemporalRandomCrop(8)(v)
        assert out.shape[0] == 8

    def test_center_crop_resize(self):
        v = np.zeros((2, 100, 50, 3), np.uint8)
        out = CenterCropResize((32, 32))(v)
        assert out.shape == (2, 32, 32, 3)

    def test_normalize_range(self):
        v = np.array([[[[0, 127, 255]]]], np.uint8)
        out = Normalize()(v)
        np.testing.assert_allclose(out.ravel(), [-1.0, -0.00392157, 1.0],
                                   atol=1e-5)

    def test_image_to_video(self):
        img = np.zeros((16, 16, 3), np.uint8)
        out = ImageToVideo(4)(img)
        assert out.shape == (4, 16, 16, 3)

    def test_dummy_loader_fail_probability(self):
        loader = LoadDummyVideo(probs_fail=1.0)
        with pytest.raises(RuntimeError):
            loader("x.mp4")


class TestLoader:
    def test_epoch_loader_batches(self, toy_csv):
        ds = make_ds(toy_csv)
        loader = EpochLoader(ds, batch_size=16)
        batches = list(loader)
        assert len(batches) == 8
        assert batches[0]["video"].shape == (16, 8, 32, 32, 3)
        assert len(batches[0]["caption"]) == 16

    def test_shuffle_changes_across_epochs(self, toy_csv):
        ds = make_ds(toy_csv)
        loader = EpochLoader(ds, batch_size=128)
        e1 = next(iter(loader))["path"]
        e2 = next(iter(loader))["path"]
        assert e1 != e2  # different epoch seed → different order


def test_llm_prompt_expander_wiring():
    """LLM-backed prompt extension: deterministic greedy decode through
    the shared LLaMA decoder."""
    import jax
    from videotuna_tpu.data.prompt_extend import make_llm_expander
    from videotuna_tpu.models.text_encoders import LlamaTextEncoder
    import jax.numpy as jnp

    lm = LlamaTextEncoder(vocab_size=64, dim=32, heads=4, num_layers=1,
                          lm_head=True)
    p = lm.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))["params"]
    exp = make_llm_expander(lm, p, prompt_template_ids=[5, 6],
                            max_new_tokens=4)
    a = exp("a red panda")
    b = exp("a red panda")
    assert a == b and a.startswith("a red panda")
