"""Curation stack tests: uncertainty scoring, coreset, copy-paste,
SAHI auto-labeling, difficulty mining."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.curation import (
    ActiveLearner,
    AutoLabeler,
    CopyPasteAugmentor,
    class_from_filename,
    entropy_scores,
    kcenter_greedy,
    kmeans_select,
    loc_var_scores,
    mine_difficulty_map,
    nms_per_class,
    slice_image,
)
from unina_yolo_dla_tpu.models import ModelConfig, init_model

IMG = 32


@pytest.fixture(scope="module")
def model_setup():
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    return model, variables


def test_entropy_scores_max_at_half():
    # logits 0 -> p=0.5 -> binary entropy ln2 (max); large logits -> ~0
    certain = [(jnp.full((2, 4, 4, 4), 12.0), jnp.zeros((2, 4, 4, 4)))]
    uncertain = [(jnp.zeros((2, 4, 4, 4)), jnp.zeros((2, 4, 4, 4)))]
    s_cert = np.asarray(entropy_scores(certain))
    s_unc = np.asarray(entropy_scores(uncertain))
    np.testing.assert_allclose(s_unc, np.log(2), rtol=1e-5)
    assert (s_cert < 0.01).all()


def test_loc_var_scores_range():
    outputs = [(jnp.zeros((3, 4, 4, 4)), jnp.zeros((3, 4, 4, 4)))]
    s = np.asarray(loc_var_scores(outputs))
    np.testing.assert_allclose(s, 1.0)  # p=0.5 -> maximally uncertain


def test_kcenter_greedy_spreads():
    # two tight clusters + one outlier: k=2 must include the outlier region
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (20, 2))
    b = rng.normal(10, 0.05, (20, 2))
    emb = np.concatenate([a, b])
    sel = kcenter_greedy(emb, 2, seed=1)
    groups = {int(i >= 20) for i in sel}
    assert groups == {0, 1}, "k-center must cover both clusters"


def test_kmeans_select_count():
    rng = np.random.default_rng(0)
    emb = rng.normal(0, 1, (30, 8))
    sel = kmeans_select(emb, 5)
    assert len(sel) == 5 and len(set(sel)) == 5


def test_active_learner_scores_and_coreset(model_setup):
    model, variables = model_setup
    rng = np.random.default_rng(0)

    def batches():
        for i in range(2):
            imgs = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)
            yield imgs, [f"img_{i}_{j}.jpg" for j in range(2)]

    learner = ActiveLearner(model, variables)
    scores = learner.compute_difficulty_scores(batches(), mode="entropy")
    assert len(scores) == 4
    assert all(0 <= v <= np.log(2) + 1e-5 for v in scores.values())

    top = learner.query_uncertain_samples(batches(), top_k=2)
    assert len(top) == 2

    sel = learner.coreset_selection(batches, target_size=3, method="kcenter")
    assert len(sel) == 3
    assert learner._cached_embeddings is not None
    learner.invalidate_cache()
    assert learner._cached_embeddings is None


def test_class_from_filename():
    from pathlib import Path

    assert class_from_filename(Path("yellow_cone_01.png")) == 0
    assert class_from_filename(Path("large_orange_cone_xx.npy")) == 3
    assert class_from_filename(Path("orange_cone_2.png")) == 2
    assert class_from_filename(Path("random.png")) is None


def test_copy_paste_augmentor(tmp_path):
    import cv2

    # build a small RGBA asset
    asset = np.zeros((10, 8, 4), np.uint8)
    asset[..., 0] = 200
    asset[2:, 2:6, 3] = 255
    cv2.imwrite(str(tmp_path / "blue_cone_0.png"),
                cv2.cvtColor(asset, cv2.COLOR_RGBA2BGRA))

    aug = CopyPasteAugmentor(tmp_path, max_pastes=2, seed=3,
                             scale_range=(1.0, 1.0))
    img = np.full((64, 64, 3), 100, np.uint8)
    boxes = np.asarray([[0.0, 0.0, 20.0, 20.0]], np.float32)
    classes = np.asarray([0], np.int32)
    out_img, out_boxes, out_classes = aug(img, boxes, classes)
    assert out_boxes.shape[0] > 1, "no paste happened"
    assert (out_classes[1:] == 1).all()  # blue_cone
    # pasted boxes must not overlap the original occupancy
    for x1, y1, x2, y2 in out_boxes[1:]:
        assert x1 >= 20 or y1 >= 20
    assert not np.array_equal(out_img, img)


def test_slice_image_covers():
    img = np.zeros((100, 150, 3), np.uint8)
    tiles = slice_image(img, tile=64, overlap=0.25)
    covered = np.zeros((100, 150), bool)
    for t, x0, y0 in tiles:
        covered[y0:y0 + t.shape[0], x0:x0 + t.shape[1]] = True
    assert covered.all()


def test_nms_per_class():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7])
    classes = np.asarray([0, 0, 1])
    keep = nms_per_class(boxes, scores, classes, 0.5)
    assert list(keep) == [0, 2]  # duplicate class-0 suppressed; class 1 kept


def test_auto_labeler_with_mock_detector():
    # mock detector: one box at a fixed location in every tile
    def detector(tile, prompts):
        h, w = tile.shape[:2]
        return (np.asarray([[w * 0.4, h * 0.4, w * 0.6, h * 0.6]]),
                np.asarray([0.9]), np.asarray([1]))

    labeler = AutoLabeler(detector, tile=64, overlap=0.0,
                          conf_threshold=0.5)
    img = np.zeros((128, 128, 3), np.uint8)
    labels = labeler.label_image(img)
    assert labels.shape[0] == 4  # one per tile, none overlapping
    assert (labels[:, 0] == 1).all()
    assert ((labels[:, 1:] > 0) & (labels[:, 1:] <= 1)).all()


def test_mine_difficulty_map(model_setup, tmp_path):
    import cv2

    model, variables = model_setup
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"u{i}.jpg"),
                    rng.integers(0, 255, (48, 48, 3)).astype(np.uint8))
    out = tmp_path / "difficulty_map.json"
    scores = mine_difficulty_map(model, variables, img_dir, out,
                                 batch_size=2)
    assert len(scores) == 3
    loaded = json.loads(out.read_text())
    assert set(loaded) == {"u0", "u1", "u2"}
