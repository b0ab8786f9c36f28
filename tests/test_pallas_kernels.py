"""Pallas kernel oracle tests (interpret mode on the CPU backend) —
jnp reference implementations are the numerical oracles, per SURVEY §7."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.ops import nms_reference, resize_bilinear
from unina_yolo_dla_tpu.ops.decode import Detections, decode_level
from unina_yolo_dla_tpu.ops.pallas import (
    decode_level_pallas,
    nms_pallas,
    normalize_pallas,
)
from unina_yolo_dla_tpu.ops.preprocess import normalize, resize_bilinear_mxu


def test_decode_kernel_matches_oracle(rng):
    h = w = 32  # 1024 cells = min tile
    cls_logits = rng.normal(0, 2, (h, w, 4)).astype(np.float32)
    reg = rng.uniform(0.1, 3.0, (h, w, 4)).astype(np.float32)

    ob, os_, oc, ov = decode_level(jnp.asarray(cls_logits), jnp.asarray(reg),
                                   8, 0.5, 0.1)
    pb, ps, pc, pv = decode_level_pallas(
        jnp.asarray(cls_logits), jnp.asarray(reg), 8, 0.5, 0.1,
        interpret=True)

    np.testing.assert_array_equal(np.asarray(ov), np.asarray(pv))
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(pc))
    np.testing.assert_allclose(np.asarray(os_), np.asarray(ps), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ob), np.asarray(pb),
                               rtol=1e-4, atol=1e-3)


def test_decode_kernel_multi_tile(rng):
    h = w = 64  # 4096 cells -> 2 grid steps of 2048
    cls_logits = rng.normal(0, 2, (h, w, 4)).astype(np.float32)
    reg = rng.uniform(0.1, 2.0, (h, w, 4)).astype(np.float32)
    ob, _, _, ov = decode_level(jnp.asarray(cls_logits), jnp.asarray(reg),
                                4, 0.5, 0.0)
    pb, _, _, pv = decode_level_pallas(
        jnp.asarray(cls_logits), jnp.asarray(reg), 4, 0.5, 0.0,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(pv))
    np.testing.assert_allclose(np.asarray(ob), np.asarray(pb),
                               rtol=1e-4, atol=1e-3)


def _random_dets(rng, k=256, n_valid=200):
    centers = rng.uniform(50, 590, (k, 2))
    wh = rng.uniform(5, 60, (k, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
    scores = np.sort(rng.uniform(0.5, 1.0, k))[::-1].copy()
    classes = rng.integers(0, 4, k)
    valid = np.arange(k) < n_valid
    return Detections(jnp.asarray(boxes, jnp.float32),
                      jnp.asarray(scores, jnp.float32),
                      jnp.asarray(classes, jnp.int32),
                      jnp.asarray(valid))


def test_nms_kernel_matches_greedy_oracle(rng):
    for seed in range(4):
        r = np.random.default_rng(seed)
        dets = _random_dets(r)
        want = np.asarray(nms_reference(dets, 0.45).valid)
        got = np.asarray(nms_pallas(dets.boxes, dets.scores, dets.classes,
                                    dets.valid, 0.45, interpret=True))
        np.testing.assert_array_equal(got, want)


def test_nms_kernel_chain_case():
    boxes = np.zeros((256, 4), np.float32)
    boxes[0] = (0, 0, 20, 20)
    boxes[1] = (10, 0, 30, 20)
    boxes[2] = (20, 0, 40, 20)
    scores = np.linspace(1.0, 0.1, 256).astype(np.float32)
    dets = Detections(jnp.asarray(boxes), jnp.asarray(scores),
                      jnp.zeros(256, jnp.int32),
                      jnp.asarray(np.arange(256) < 3))
    keep = np.asarray(nms_pallas(dets.boxes, dets.scores, dets.classes,
                                 dets.valid, 0.3, interpret=True))
    np.testing.assert_array_equal(keep[:3], [True, False, True])


def test_nms_kernel_deep_chain_exceeds_iteration_budget():
    """A suppression chain deeper than FIXPOINT_ITERS must still match
    exact greedy NMS (the XLA stationarity tail-guard, ADVICE round 1)."""
    from unina_yolo_dla_tpu.ops.pallas.nms_kernel import FIXPOINT_ITERS

    n = 3 * FIXPOINT_ITERS  # chain needs ~n iterations to converge
    k = 256
    assert n < k
    boxes = np.zeros((k, 4), np.float32)
    for i in range(n):
        # consecutive boxes: IoU 0.5 (> thr); i and i+2: IoU 0.2 (< thr)
        boxes[i] = (6.0 * i, 0, 6.0 * i + 18.0, 18.0)
    scores = np.linspace(1.0, 0.1, k).astype(np.float32)
    dets = Detections(jnp.asarray(boxes), jnp.asarray(scores),
                      jnp.zeros(k, jnp.int32),
                      jnp.asarray(np.arange(k) < n))
    want = np.asarray(nms_reference(dets, 0.3).valid)
    # greedy on this chain keeps the evens — sanity-check the construction
    np.testing.assert_array_equal(want[:6],
                                  [True, False, True, False, True, False])
    got = np.asarray(nms_pallas(dets.boxes, dets.scores, dets.classes,
                                dets.valid, 0.3, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_normalize_kernel_rgb(rng):
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    got = np.asarray(normalize_pallas(jnp.asarray(img), interpret=True))
    want = np.asarray(normalize(jnp.asarray(img).astype(jnp.float32) / 255.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_normalize_kernel_bgra(rng):
    img = rng.integers(0, 256, (32, 32, 4)).astype(np.uint8)
    got = np.asarray(normalize_pallas(jnp.asarray(img), swap_rb=True,
                                      interpret=True))
    rgb = img[..., 2::-1]
    want = np.asarray(normalize(jnp.asarray(rgb).astype(jnp.float32) / 255.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_mxu_matches_gather_resize(rng):
    img = rng.integers(0, 256, (96, 128, 3)).astype(np.float32)
    a = np.asarray(resize_bilinear(jnp.asarray(img), 64, 64))
    b = np.asarray(resize_bilinear_mxu(jnp.asarray(img), 64, 64))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-2)


def test_fused_stage1_merged_matches_conv(rng):
    """fused_downsample_merged (both the Pallas-interpret and the XLA
    forms) == ReLU(lax.conv 3x3 stride-2 + bias) on the merged view of
    the same input (the s2d_merged stage1 contract)."""
    from jax import lax

    from unina_yolo_dla_tpu.ops.pallas.stage1_kernel import (
        fused_downsample_merged,
        merged_from_standard,
    )
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,  # noqa: F401  (import parity with module docs)
    )

    h, ci, co = 32, 8, 16
    x = rng.normal(0, 1, (h, h, ci)).astype(np.float32)
    w3 = rng.normal(0, 0.1, (3, 3, ci, co)).astype(np.float32)
    bias = rng.normal(0, 0.1, (co,)).astype(np.float32)

    want = lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(w3), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    want = np.asarray(jnp.maximum(want + bias, 0.0))

    # blocked (2,2,4C,O) kernel via the deploy fold's math
    k4 = np.zeros((4, 4, ci, co), np.float32)
    k4[1:, 1:] = w3
    k4 = k4.reshape(2, 2, 2, 2, ci, co).transpose(0, 2, 1, 3, 4, 5)
    wb = jnp.asarray(k4.reshape(2, 2, 4 * ci, co))

    xm = jnp.asarray(merged_from_standard(x))
    got_xla = np.asarray(fused_downsample_merged(
        xm, wb, jnp.asarray(bias), use_pallas=False))
    np.testing.assert_allclose(got_xla, want, rtol=1e-4, atol=1e-4)

    got_pl = np.asarray(fused_downsample_merged(
        xm, wb, jnp.asarray(bias), use_pallas=True, interpret=True))
    np.testing.assert_allclose(got_pl, want, rtol=1e-4, atol=1e-4)

    # batched (leading-axis) form
    got_b = np.asarray(fused_downsample_merged(
        xm[None], wb, jnp.asarray(bias), use_pallas=False))[0]
    np.testing.assert_allclose(got_b, want, rtol=1e-4, atol=1e-4)
