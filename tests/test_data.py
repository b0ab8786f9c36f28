"""Synthetic generator + dataset/batch pipeline tests (the dry-run data
path, parity with run_local_debug.sh's synthetic-then-train flow)."""
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.data import (
    SynthConfig,
    YoloDataset,
    batch_iterator,
    generate_dataset,
    generate_image,
    load_dataset_yaml,
    load_difficulty_weights,
    mosaic4,
    normalize_images,
    validate_labels,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    cfg = SynthConfig(image_size=160, seed=7)
    yaml_path = generate_dataset(root, num_train=6, num_val=2, cfg=cfg)
    return root, yaml_path


def test_generate_image_deterministic():
    cfg = SynthConfig(image_size=128, seed=3)
    img1, l1 = generate_image(np.random.default_rng(3), cfg)
    img2, l2 = generate_image(np.random.default_rng(3), cfg)
    assert np.array_equal(img1, img2) and l1 == l2
    assert img1.shape == (128, 128, 3)
    assert validate_labels(l1)


def test_generated_boxes_nonoverlapping():
    cfg = SynthConfig(image_size=256, seed=11)
    _, labels = generate_image(np.random.default_rng(11), cfg)
    boxes = np.array([[c[1] - c[3] / 2, c[2] - c[4] / 2,
                       c[1] + c[3] / 2, c[2] + c[4] / 2] for c in labels])
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0])
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1])
            assert iw <= 1e-9 or ih <= 1e-9


def test_dataset_yaml_contract(synth_root):
    root, yaml_path = synth_root
    spec = load_dataset_yaml(yaml_path)
    assert spec["nc"] == 4
    assert spec["names"][0] == "yellow_cone"
    assert spec["train"].exists() and spec["val"].exists()


def test_dataset_loading_and_letterbox(synth_root):
    root, yaml_path = synth_root
    spec = load_dataset_yaml(yaml_path)
    ds = YoloDataset(spec["train"], img_size=96, max_boxes=32)
    assert len(ds) == 6
    img, boxes, classes = ds.load_letterboxed(0)
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    assert boxes.shape[1] == 4 and len(boxes) == len(classes)
    assert (boxes[:, 2] > boxes[:, 0]).all()
    assert (boxes >= 0).all() and (boxes <= 96).all()


def test_batch_iterator_shapes(synth_root):
    root, yaml_path = synth_root
    spec = load_dataset_yaml(yaml_path)
    ds = YoloDataset(spec["train"], img_size=96, max_boxes=16)
    batches = list(batch_iterator(ds, batch_size=4,
                                  rng=np.random.default_rng(0), steps=2))
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (4, 96, 96, 3)
    # uint8 across the host->device boundary; device-side normalisation
    # (ops.preprocess.ensure_normalized) is the batch contract
    assert b["images"].dtype == np.uint8
    assert b["boxes"].shape == (4, 16, 4)
    assert b["labels"].shape == (4, 16)
    assert b["mask"].dtype == bool
    assert b["mask"].any()
    # ensure_normalized: uint8 -> ImageNet-normalised f32, float untouched
    from unina_yolo_dla_tpu.ops.preprocess import ensure_normalized
    x = np.asarray(ensure_normalized(jnp.asarray(b["images"])))
    assert x.dtype == np.float32 and abs(x).max() < 4.0
    ref = normalize_images(b["images"])
    np.testing.assert_allclose(x, ref, atol=1e-6)
    again = np.asarray(ensure_normalized(jnp.asarray(x)))
    np.testing.assert_array_equal(again, x)


def test_weighted_sampling_prefers_difficult(synth_root):
    root, yaml_path = synth_root
    spec = load_dataset_yaml(yaml_path)
    ds = YoloDataset(spec["train"], img_size=96, max_boxes=16)
    dmap = {ds.image_paths[0].stem: 100.0}
    w = load_difficulty_weights(ds, dmap)
    assert w[0] == 100.0 and np.all(w[1:] == 1.0)
    # floor at 0.1
    w2 = load_difficulty_weights(ds, {ds.image_paths[1].stem: 0.0})
    assert w2[1] == 0.1
    rng = np.random.default_rng(0)
    counts = np.zeros(len(ds))
    for _ in range(200):
        idx = rng.choice(len(ds), p=w / w.sum())
        counts[idx] += 1
    assert counts[0] > 150  # heavily preferred


def test_mosaic4_merges_labels(synth_root):
    root, yaml_path = synth_root
    spec = load_dataset_yaml(yaml_path)
    ds = YoloDataset(spec["train"], img_size=96, max_boxes=16)
    rng = np.random.default_rng(0)
    samples = [ds.load_letterboxed(i) for i in range(4)]
    img, boxes, classes = mosaic4(rng, samples, 96)
    assert img.shape == (96, 96, 3)
    assert len(boxes) == len(classes)
    assert (boxes >= 0).all() and (boxes <= 96).all()


def test_batch_iterator_with_mosaic_and_copy_paste(synth_root, tmp_path):
    import cv2

    from unina_yolo_dla_tpu.curation import CopyPasteAugmentor

    root, yaml_path = synth_root
    spec = load_dataset_yaml(yaml_path)
    ds = YoloDataset(spec["train"], img_size=96, max_boxes=16)

    asset = np.zeros((8, 6, 4), np.uint8)
    asset[..., 2] = 220
    asset[1:, 1:5, 3] = 255
    cv2.imwrite(str(tmp_path / "orange_cone_0.png"),
                cv2.cvtColor(asset, cv2.COLOR_RGBA2BGRA))
    cp = CopyPasteAugmentor(tmp_path, max_pastes=1, seed=0,
                            scale_range=(1.0, 1.0))

    b = next(batch_iterator(ds, batch_size=4, rng=np.random.default_rng(0),
                            steps=1, augment=True, mosaic_p=1.0,
                            copy_paste=cp))
    assert b["images"].shape == (4, 96, 96, 3)
    assert b["mask"].any()
    # boxes stay inside the canvas after mosaic + paste
    valid_boxes = b["boxes"][b["mask"]]
    assert (valid_boxes >= 0).all() and (valid_boxes <= 96).all()


def test_xhard_regime_is_small_dominant():
    """XHARD must put the dominant mass of boxes below 15 px (and a real
    share below the P2-stride 8 px line) so small-object F1 can fail."""
    from unina_yolo_dla_tpu.data.synthetic import XHARD
    import dataclasses

    cfg = dataclasses.replace(XHARD, image_size=640, seed=5)
    heights = []
    rng = np.random.default_rng(5)
    for _ in range(8):
        _, labels = generate_image(rng, cfg)
        heights += [h * 640 for (_, _, _, _, h) in labels]
    heights = np.asarray(heights)
    assert len(heights) >= 60                  # dense scenes
    assert (heights < 15).mean() > 0.6         # small-object dominant
    assert (heights < 8).mean() > 0.2          # sub-stride band present


def test_corruptions_contract():
    """Every corruption: uint8->uint8, same shape, actually perturbs, and
    corrupt_batches is deterministic for a fixed seed."""
    from unina_yolo_dla_tpu.data.corruptions import CORRUPTIONS, corrupt_batches

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    for name, fn in CORRUPTIONS.items():
        for sev in (1, 2, 3):
            out = fn(img, sev, np.random.default_rng(1))
            assert out.shape == img.shape and out.dtype == np.uint8, name
            assert not np.array_equal(out, img), (name, sev)

    def batches():
        yield {"images": np.stack([img, img]),
               "mask": np.zeros((2, 4), bool)}

    a = next(corrupt_batches(batches, "gaussian_noise", 2, seed=9)())
    b = next(corrupt_batches(batches, "gaussian_noise", 2, seed=9)())
    np.testing.assert_array_equal(a["images"], b["images"])
    assert not np.array_equal(a["images"], np.stack([img, img]))


def test_qat_corruption_aug(synth_root):
    """--qat-corruption-aug path: corruption_p perturbs images (even with
    augment=False, the QAT recipe), leaves labels/boxes untouched, and is
    deterministic for a fixed rng stream; p=0 is the identity."""
    from unina_yolo_dla_tpu.data.corruptions import maybe_corrupt
    from unina_yolo_dla_tpu.data.dataset import YoloDataset, batch_iterator

    root, _ = synth_root
    ds = YoloDataset(str(root / "images" / "train"), img_size=160)

    def grab(p, seed=3):
        return next(batch_iterator(ds, 4, np.random.default_rng(seed),
                                   steps=1, shuffle=False, augment=False,
                                   corruption_p=p))

    clean, corr1, corr2 = grab(0.0), grab(1.0), grab(1.0)
    assert not np.array_equal(corr1["images"], clean["images"])
    np.testing.assert_array_equal(corr1["images"], corr2["images"])
    for k in ("boxes", "labels", "mask"):
        np.testing.assert_array_equal(corr1[k], clean[k])
    np.testing.assert_array_equal(grab(0.0)["images"], clean["images"])

    img = np.random.default_rng(0).integers(0, 256, (32, 32, 3),
                                            dtype=np.uint8)
    np.testing.assert_array_equal(
        maybe_corrupt(np.random.default_rng(1), img, 0.0), img)
