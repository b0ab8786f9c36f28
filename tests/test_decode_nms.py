"""Decode + NMS oracle tests.

The scalar numpy implementations here independently re-state the reference
decode/NMS math (postprocess.hpp:94-145, 44-67) and are compared against the
vectorised jnp implementations.
"""
import jax.numpy as jnp
import numpy as np

from unina_yolo_dla_tpu.ops import Detections, decode_level, decode_outputs, nms, nms_fast


def scalar_decode(cls_logits, reg, stride, conf_th, q):
    """Straight port of the reference CPU decode loop, numpy scalars."""
    h, w, nc = cls_logits.shape
    dets = []
    for y in range(h):
        for x in range(w):
            best_c, max_conf = -1, 0.0
            for c in range(nc):
                conf = 1.0 / (1.0 + np.exp(-cls_logits[y, x, c]))
                if conf > max_conf:
                    max_conf, best_c = conf, c
            if max_conf > conf_th:
                cx, cy = (x + 0.5) * stride, (y + 0.5) * stride
                l, t, r, b = reg[y, x] * stride
                x1, y1, x2, y2 = cx - l, cy - t, cx + r, cy + b
                if q > 0:
                    dw, dh = (x2 - x1) * q, (y2 - y1) * q
                    x1, y1, x2, y2 = x1 - dw, y1 - dh, x2 + dw, y2 + dh
                dets.append((x1, y1, x2, y2, max_conf, best_c))
    return dets


def test_decode_level_matches_scalar_reference(rng):
    h = w = 8
    stride, nc, conf_th, q = 8, 4, 0.5, 0.1
    cls_logits = rng.normal(0, 2, (h, w, nc)).astype(np.float32)
    reg = rng.uniform(0.1, 3.0, (h, w, 4)).astype(np.float32)

    boxes, scores, classes, valid = decode_level(
        jnp.asarray(cls_logits), jnp.asarray(reg), stride, conf_th, q)
    boxes, scores, classes, valid = map(np.asarray, (boxes, scores, classes, valid))

    expected = scalar_decode(cls_logits, reg, stride, conf_th, q)
    got = [(tuple(boxes[i]), scores[i], classes[i])
           for i in range(h * w) if valid[i]]
    assert len(got) == len(expected)
    for (gb, gs, gc), (x1, y1, x2, y2, conf, c) in zip(got, expected):
        np.testing.assert_allclose(gb, (x1, y1, x2, y2), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(gs, conf, rtol=1e-5)
        assert gc == c


def test_decode_outputs_compaction_sorted(rng):
    outs = []
    for g, s in zip((16, 8, 4), (4, 8, 16)):
        cls_l = rng.normal(0, 2, (1, g, g, 4)).astype(np.float32)
        reg = rng.uniform(0.1, 2.0, (1, g, g, 4)).astype(np.float32)
        outs.append((jnp.asarray(cls_l), jnp.asarray(reg)))
    dets = decode_outputs(outs, (4, 8, 16), conf_threshold=0.5,
                          q_factor=0.0, max_detections=64)
    assert dets.boxes.shape == (64, 4)
    scores = np.asarray(dets.scores)
    valid = np.asarray(dets.valid)
    n = valid.sum()
    assert np.all(valid[:n]) and not np.any(valid[n:])  # compacted to front
    assert np.all(np.diff(scores[:n]) <= 1e-6)          # sorted descending
    assert np.all(scores[valid] > 0.5)


def scalar_nms(dets, iou_th):
    """Greedy class-aware NMS, straight port of postprocess.hpp:44-67."""
    order = sorted(range(len(dets)), key=lambda i: -dets[i][4])
    suppressed = [False] * len(dets)
    keep = []
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[oi + 1:]:
            if suppressed[j] or dets[i][5] != dets[j][5]:
                continue
            ax1, ay1, ax2, ay2 = dets[i][:4]
            bx1, by1, bx2, by2 = dets[j][:4]
            iw = max(0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0, min(ay2, by2) - max(ay1, by1))
            inter = iw * ih
            union = ((ax2 - ax1) * (ay2 - ay1)
                     + (bx2 - bx1) * (by2 - by1) - inter)
            if union > 0 and inter / union > iou_th:
                suppressed[j] = True
    return set(keep)


def _random_detections(rng, k=64, n_valid=48):
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


def test_nms_matches_scalar_reference(rng):
    dets = _random_detections(rng)
    out = nms(dets, 0.45)
    valid = np.asarray(out.valid)

    scalar_in = [(*np.asarray(dets.boxes)[i], float(dets.scores[i]),
                  int(dets.classes[i])) for i in range(48)]
    expected_keep = scalar_nms(scalar_in, 0.45)
    got_keep = {i for i in range(64) if valid[i]}
    assert got_keep == expected_keep


def test_nms_fast_subset_of_greedy(rng):
    # matrix NMS may only over-suppress relative to greedy, never under
    for seed in range(5):
        r = np.random.default_rng(seed)
        dets = _random_detections(r)
        greedy = np.asarray(nms(dets, 0.45).valid)
        fast = np.asarray(nms_fast(dets, 0.45).valid)
        assert not np.any(fast & ~greedy)


def test_nms_keeps_distinct_classes(rng):
    boxes = jnp.asarray([[100, 100, 150, 150], [100, 100, 150, 150]],
                        jnp.float32)
    dets = Detections(boxes, jnp.asarray([0.9, 0.8]),
                      jnp.asarray([0, 1], jnp.int32),
                      jnp.asarray([True, True]))
    out = nms(dets, 0.45)
    assert np.asarray(out.valid).all()  # identical boxes, different classes


def test_nms_fixpoint_equals_sequential_scan(rng):
    """The MXU fixpoint NMS must be bit-identical to the literal greedy
    scan, including chain cases (A kills B, so B cannot kill C)."""
    from unina_yolo_dla_tpu.ops import nms_reference

    for seed in range(8):
        r = np.random.default_rng(seed)
        dets = _random_detections(r, k=96, n_valid=80)
        fix = np.asarray(nms(dets, 0.45).valid)
        seq = np.asarray(nms_reference(dets, 0.45).valid)
        np.testing.assert_array_equal(fix, seq)


def test_nms_chain_case():
    """Explicit suppression chain: A(0.9) overlaps B(0.8), B overlaps
    C(0.7), A does NOT overlap C -> greedy keeps A and C."""
    boxes = jnp.asarray([
        [0.0, 0.0, 20.0, 20.0],     # A
        [10.0, 0.0, 30.0, 20.0],    # B: IoU(A,B)=1/3 > .3 -> suppressed by A
        [20.0, 0.0, 40.0, 20.0],    # C: IoU(B,C)=1/3, IoU(A,C)=0
    ], jnp.float32)
    dets = Detections(boxes, jnp.asarray([0.9, 0.8, 0.7]),
                      jnp.zeros(3, jnp.int32), jnp.ones(3, bool))
    keep = np.asarray(nms(dets, 0.3).valid)
    np.testing.assert_array_equal(keep, [True, False, True])


def test_serving_approx_topk_matches_exact():
    """The serving pipeline decodes with the TPU PartialReduce top-k
    (exact_topk=False). In the serving regime — valid candidates only
    above conf_threshold, #valid << K — the approx pass must return
    exactly the same detection SET as the sort-based top-k."""
    import numpy as np

    from unina_yolo_dla_tpu.ops.decode import decode_outputs

    rng = np.random.default_rng(5)
    levels = []
    for g, s in (((16, 16), 4), ((8, 8), 8), ((4, 4), 16)):
        cls = rng.normal(-4.0, 1.0, (1, *g, 4)).astype(np.float32)
        # a handful of confident cells
        for _ in range(6):
            cls[0, rng.integers(g[0]), rng.integers(g[1]),
                rng.integers(4)] = 4.0
        reg = rng.uniform(0.5, 3.0, (1, *g, 4)).astype(np.float32)
        levels.append((jnp.asarray(cls), jnp.asarray(reg)))

    exact = decode_outputs(levels, (4, 8, 16), conf_threshold=0.5,
                           q_factor=0.0, max_detections=64,
                           exact_topk=True)
    approx = decode_outputs(levels, (4, 8, 16), conf_threshold=0.5,
                            q_factor=0.0, max_detections=64,
                            exact_topk=False)
    ve = np.asarray(exact.valid)
    va = np.asarray(approx.valid)
    assert ve.sum() == va.sum() > 0
    # same (score, box) multiset among valid rows
    def rows(d, v):
        r = np.concatenate([np.asarray(d.boxes)[v],
                            np.asarray(d.scores)[v, None],
                            np.asarray(d.classes)[v, None].astype(np.float32)],
                           axis=1)
        return sorted(map(tuple, np.round(r, 4)))
    assert rows(exact, ve) == rows(approx, va)
