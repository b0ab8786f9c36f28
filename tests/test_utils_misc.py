"""Misc utils tests: box helpers, profiling Timer."""
import time

import jax.numpy as jnp
import numpy as np

from unina_yolo_dla_tpu.utils import (
    Timer,
    box_ciou,
    box_iou,
    xywh_to_xyxy,
    xyxy_to_xywh,
)


def test_box_format_roundtrip(rng):
    xywh = jnp.asarray(rng.uniform(10, 100, (5, 4)).astype(np.float32))
    back = xyxy_to_xywh(xywh_to_xyxy(xywh))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xywh),
                               rtol=1e-5)


def test_iou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[20.0, 20.0, 30.0, 30.0]])
    assert float(box_iou(a, a)[0]) == 1.0
    assert float(box_iou(a, b)[0]) == 0.0


def test_ciou_bounds_and_perfect():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(float(box_ciou(a, a)[0]), 1.0, atol=1e-5)
    b = jnp.asarray([[100.0, 100.0, 105.0, 120.0]])
    v = float(box_ciou(a, b)[0])
    assert -2.0 <= v < 0.5  # distant box penalised below plain IoU


def test_timer_accumulates():
    t = Timer()
    with t("phase_a"):
        time.sleep(0.01)
    with t("phase_a"):
        time.sleep(0.01)
    s = t.summary()
    assert s["phase_a"]["count"] == 2
    assert s["phase_a"]["total_s"] >= 0.02
