"""TAL assigner + detection loss unit tests."""
import jax
import jax.numpy as jnp
import numpy as np

from unina_yolo_dla_tpu.models import ModelConfig
from unina_yolo_dla_tpu.train import (
    LossConfig,
    assign,
    decode_ltrb,
    detection_loss,
    make_anchors,
)


def test_make_anchors_layout():
    anchors, strides = make_anchors((8, 4, 2), (4, 8, 16))
    assert anchors.shape == (64 + 16 + 4, 2)
    # first anchor of P2: center of cell (0,0) at stride 4
    np.testing.assert_allclose(anchors[0], (2.0, 2.0))
    # second anchor walks x first (row-major over (y, x))
    np.testing.assert_allclose(anchors[1], (6.0, 2.0))
    assert float(strides[0]) == 4.0 and float(strides[-1]) == 16.0


def test_decode_ltrb_roundtrip():
    anchors, strides = make_anchors((4,), (8,))
    reg = jnp.ones((1, 16, 4))  # l=t=r=b=1 stride-unit
    boxes = decode_ltrb(reg, anchors, strides)
    # first cell center (4,4), offsets 8 px each side
    np.testing.assert_allclose(boxes[0, 0], (-4.0, -4.0, 12.0, 12.0))


def _toy_problem():
    """1 image, 2 GTs, anchors on a single 8x8 stride-8 grid (64 px img)."""
    anchors, strides = make_anchors((8,), (8,))
    A, C, G = 64, 4, 8
    gt_boxes = jnp.zeros((1, G, 4)).at[0, 0].set(
        jnp.asarray([8.0, 8.0, 32.0, 32.0])).at[0, 1].set(
        jnp.asarray([40.0, 40.0, 60.0, 60.0]))
    gt_labels = jnp.zeros((1, G), jnp.int32).at[0, 1].set(2)
    gt_mask = jnp.zeros((1, G), bool).at[0, 0].set(True).at[0, 1].set(True)

    # predictions: boxes == anchor cells expanded to 24px, scores peaked right
    reg = jnp.full((1, A, 4), 1.5)  # 12 px each side at stride 8
    pred_boxes = decode_ltrb(reg, anchors, strides)
    pred_scores = jnp.full((1, A, C), 0.1)
    return anchors, pred_scores, pred_boxes, gt_boxes, gt_labels, gt_mask


def test_assign_basic_properties():
    anchors, scores, boxes, gt_boxes, gt_labels, gt_mask = _toy_problem()
    res = assign(scores, boxes, anchors, gt_boxes, gt_labels, gt_mask, 4)
    fg = np.asarray(res.fg_mask[0])
    assert fg.any(), "some anchors must be assigned"
    # assigned anchors must have centers inside their target GT box
    t_boxes = np.asarray(res.target_boxes[0])
    ctr = np.asarray(anchors)
    for a in np.flatnonzero(fg):
        x1, y1, x2, y2 = t_boxes[a]
        assert x1 < ctr[a, 0] < x2 and y1 < ctr[a, 1] < y2
    # target scores zero on background
    ts = np.asarray(res.target_scores[0])
    assert np.all(ts[~fg] == 0)
    assert ts.max() <= 1.0 + 1e-6


def test_assign_respects_padding_mask():
    anchors, scores, boxes, gt_boxes, gt_labels, gt_mask = _toy_problem()
    res_with = assign(scores, boxes, anchors, gt_boxes, gt_labels, gt_mask, 4)
    # mask out GT 1 -> its anchors must disappear
    gt_mask2 = gt_mask.at[0, 1].set(False)
    res_without = assign(scores, boxes, anchors, gt_boxes, gt_labels,
                         gt_mask2, 4)
    n_with = int(res_with.fg_mask.sum())
    n_without = int(res_without.fg_mask.sum())
    assert n_without < n_with
    # class-2 targets all gone
    ts = np.asarray(res_without.target_scores[0])
    assert ts[:, 2].sum() == 0


def test_empty_image_gives_no_fg_and_finite_loss():
    cfg = ModelConfig(num_classes=4, input_size=64)
    g2, g3, g4 = 16, 8, 4
    outputs = [
        (jnp.zeros((1, g, g, 4)), jnp.ones((1, g, g, 4)))
        for g in (g2, g3, g4)
    ]
    G = 8
    loss, aux = detection_loss(
        outputs,
        jnp.zeros((1, G, 4)), jnp.zeros((1, G), jnp.int32),
        jnp.zeros((1, G), bool), cfg, grid_sizes=(g2, g3, g4))
    assert int(aux["num_fg"]) == 0
    assert np.isfinite(float(loss))
    assert float(aux["box_loss"]) == 0.0


def test_loss_gradient_flows():
    cfg = ModelConfig(num_classes=4, input_size=64)
    gs = (16, 8, 4)
    key = jax.random.key(0)
    params = [(jax.random.normal(key, (1, g, g, 4)) * 0.1,
               jnp.ones((1, g, g, 4))) for g in gs]
    gt_boxes = jnp.asarray([[[10.0, 10.0, 30.0, 30.0]] + [[0.0] * 4] * 7])
    gt_labels = jnp.zeros((1, 8), jnp.int32)
    gt_mask = jnp.zeros((1, 8), bool).at[0, 0].set(True)

    def f(outputs):
        loss, _ = detection_loss(outputs, gt_boxes, gt_labels, gt_mask,
                                 cfg, grid_sizes=gs)
        return loss

    grads = jax.grad(f)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for pair in grads for g in pair)
    assert np.isfinite(gnorm) and gnorm > 0


def test_perfect_prediction_low_loss():
    """Predictions exactly on a GT with confident correct class ->
    loss much lower than a random prediction."""
    cfg = ModelConfig(num_classes=4, input_size=64)
    gs = (8,)
    # single level stride 4 -> but cfg.strides[0]=4; use grid 16 for 64px
    gs = (16,)
    anchors, strides = make_anchors(gs, (4,))
    gt = jnp.asarray([[[20.0, 20.0, 40.0, 40.0]]])
    gt_boxes = jnp.concatenate([gt, jnp.zeros((1, 7, 4))], 1)
    gt_labels = jnp.zeros((1, 8), jnp.int32)
    gt_mask = jnp.zeros((1, 8), bool).at[0, 0].set(True)

    # build reg so each in-box anchor predicts the GT box exactly
    ctr = np.asarray(anchors)
    l = (ctr[:, 0] - 20.0) / 4.0
    t = (ctr[:, 1] - 20.0) / 4.0
    r = (40.0 - ctr[:, 0]) / 4.0
    b = (40.0 - ctr[:, 1]) / 4.0
    reg_good = jnp.asarray(np.stack([l, t, r, b], -1))[None].reshape(1, 16, 16, 4)

    inside = ((ctr[:, 0] > 20) & (ctr[:, 0] < 40)
              & (ctr[:, 1] > 20) & (ctr[:, 1] < 40))
    cls_good = np.full((16 * 16, 4), -8.0, np.float32)
    cls_good[inside, 0] = 8.0
    cls_good = jnp.asarray(cls_good).reshape(1, 16, 16, 4)

    loss_good, _ = detection_loss([(cls_good, reg_good)], gt_boxes, gt_labels,
                                  gt_mask, cfg, grid_sizes=gs)
    loss_bad, _ = detection_loss(
        [(jnp.zeros((1, 16, 16, 4)), jnp.full((1, 16, 16, 4), 3.0))],
        gt_boxes, gt_labels, gt_mask, cfg, grid_sizes=gs)
    assert float(loss_good) < 0.3 * float(loss_bad)
