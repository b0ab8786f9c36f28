"""Fused C3k2 (ops/pallas/c3k2_kernel.py): one-VMEM-pass CSP block.

Contracts verified here:
  - the fused module's param tree is IDENTICAL to the standard C3k2's,
    so folded deploy checkpoints load into either graph unchanged;
  - fused output matches the standard per-conv path to bf16 rounding
    (the fused form accumulates f32 across taps — strictly tighter);
  - the Pallas kernel (interpret mode on CPU) is bit-identical to the
    XLA form it shares its math with;
  - leading batch dims and user-level vmap both work (the cached
    vmapped-predict graph binds the primitive under vmap);
  - the full detector in deploy mode produces the same boxes with
    fused_c3k2 on and off.

Reference analogue: TensorRT's builder-time cross-layer fusion of the
CSP block (/root/reference/unina_yolo_dla/export_trt.py:431-455 over
model.py:76-110) — on TPU the cross-conv fusion must be authored.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.models.blocks import C3k2
from unina_yolo_dla_tpu.ops.pallas.c3k2_kernel import fused_c3k2


def _rand_params(vs, key):
    leaves, treedef = jax.tree_util.tree_flatten(vs)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, a.shape, a.dtype) * 0.1
                  for k, a in zip(keys, leaves)])


def _weights_from_tree(p, n):
    cv = lambda d: (d["conv"]["kernel"], d["conv"]["bias"])  # noqa: E731
    bns = [(cv(p[f"bottleneck_{i}"]["cv1"]), cv(p[f"bottleneck_{i}"]["cv2"]))
           for i in range(n)]
    return cv(p["cv1"]), cv(p["cv2"]), cv(p["cv3"]), bns


@pytest.mark.parametrize("n,shortcut", [(1, True), (2, True), (1, False)])
def test_fused_matches_standard(n, shortcut):
    x = jax.random.normal(jax.random.key(1), (2, 20, 24, 16), jnp.bfloat16)
    std = C3k2(32, n=n, shortcut=shortcut, deploy=True)
    fus = C3k2(32, n=n, shortcut=shortcut, deploy=True, fused=True)
    vs = _rand_params(std.init(jax.random.key(0), x), jax.random.key(3))
    ys = np.asarray(std.apply(vs, x), np.float32)
    yf = np.asarray(fus.apply(vs, x), np.float32)
    # differences are bf16 accumulation rounding only
    np.testing.assert_allclose(yf, ys, atol=0.02, rtol=0.05)


def test_param_tree_identical():
    x = jnp.zeros((1, 8, 8, 16), jnp.bfloat16)
    std = C3k2(32, n=2, deploy=True)
    fus = C3k2(32, n=2, deploy=True, fused=True)
    vs, vf = (m.init(jax.random.key(0), x) for m in (std, fus))
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vf))
    assert (jax.tree.map(lambda a: (a.shape, a.dtype), vs)
            == jax.tree.map(lambda a: (a.shape, a.dtype), vf))


@pytest.mark.parametrize("h,n", [(20, 2), (80, 1), (80, 2)])
def test_pallas_interpret_bit_identical_to_xla_form(h, n):
    """h=20 exercises the gridless kernel; h=80 the row-gridded one
    (blk=20, 4 steps) with both halo widths (halo=n)."""
    x = jax.random.normal(jax.random.key(1), (h, 24, 16), jnp.bfloat16)
    fus = C3k2(32, n=n, deploy=True, fused=True)
    vs = _rand_params(fus.init(jax.random.key(0), x[None]),
                      jax.random.key(3))
    cv1, cv2, cv3, bns = _weights_from_tree(vs["params"], n)
    yx = fused_c3k2(x, cv1, cv2, cv3, bns, use_pallas=False)
    yp = fused_c3k2(x, cv1, cv2, cv3, bns, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(yx, np.float32),
                                  np.asarray(yp, np.float32))


def test_leading_dims_and_vmap():
    fus = C3k2(24, n=1, deploy=True, fused=True)
    xb = jax.random.normal(jax.random.key(2), (3, 12, 16, 12), jnp.bfloat16)
    vs = _rand_params(fus.init(jax.random.key(0), xb), jax.random.key(3))
    y_lead = fus.apply(vs, xb)
    y_vmap = jax.vmap(lambda a: fus.apply(vs, a[None])[0])(xb)
    assert y_lead.shape == (3, 12, 16, 12 * 2)
    np.testing.assert_array_equal(np.asarray(y_lead, np.float32),
                                  np.asarray(y_vmap, np.float32))


@pytest.mark.parametrize("up_x", [False, True])
def test_pair_form_matches_standard_concat(up_x):
    """x2/up_x (the neck fusion pattern): fused folds the upsample and
    concat into the first dots; must match the standard concat path."""
    xa = jax.random.normal(jax.random.key(1),
                           (2, 10, 12, 8) if up_x else (2, 20, 24, 8),
                           jnp.bfloat16)
    xb = jax.random.normal(jax.random.key(2), (2, 20, 24, 16),
                           jnp.bfloat16)
    std = C3k2(24, n=1, deploy=True)
    fus = C3k2(24, n=1, deploy=True, fused=True)
    vs = _rand_params(
        std.init(jax.random.key(0), xa, x2=xb, up_x=up_x),
        jax.random.key(3))
    assert (jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(
        fus.init(jax.random.key(0), xa, x2=xb, up_x=up_x)))
    ys = np.asarray(std.apply(vs, xa, x2=xb, up_x=up_x), np.float32)
    yf = np.asarray(fus.apply(vs, xa, x2=xb, up_x=up_x), np.float32)
    np.testing.assert_allclose(yf, ys, atol=0.02, rtol=0.05)


@pytest.mark.parametrize("h,n", [(20, 1), (80, 1), (80, 2)])
def test_pair_pallas_interpret_bit_identical(h, n):
    """h=80 exercises _kernel_cat_grid (blk=20) with both up_a halo
    parities (n=1 -> halo 2 via rounding, n=2 -> halo 2 natively)."""
    from unina_yolo_dla_tpu.ops.pallas.c3k2_kernel import fused_c3k2_cat

    xa = jax.random.normal(jax.random.key(1), (h // 2, 12, 8),
                           jnp.bfloat16)
    xb = jax.random.normal(jax.random.key(2), (h, 24, 16), jnp.bfloat16)
    fus = C3k2(24, n=n, deploy=True, fused=True)
    vs = _rand_params(
        fus.init(jax.random.key(0), xa[None], x2=xb[None], up_x=True),
        jax.random.key(3))
    cv1, cv2, cv3, bns = _weights_from_tree(vs["params"], n)
    yx = fused_c3k2_cat(xa, xb, cv1, cv2, cv3, bns, upsample_a=True,
                        use_pallas=False)
    yp = fused_c3k2_cat(xa, xb, cv1, cv2, cv3, bns, upsample_a=True,
                        use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(yx, np.float32),
                                  np.asarray(yp, np.float32))


def test_pair_pallas_batched_unrolls_not_vmaps():
    """Batched use_pallas=True through the gridded cat kernel: the r3
    advisor found this path still went through jax.vmap, whose pallas
    batching rule prepends the batch axis to the grid and re-binds
    pl.program_id(0) — silently corrupting every row-block index. The
    fixed path statically unrolls; outputs must match the XLA form
    bit-for-bit per sample."""
    from unina_yolo_dla_tpu.ops.pallas.c3k2_kernel import fused_c3k2_cat

    xa = jax.random.normal(jax.random.key(1), (2, 40, 12, 8),
                           jnp.bfloat16)
    xb = jax.random.normal(jax.random.key(2), (2, 80, 24, 16),
                           jnp.bfloat16)
    fus = C3k2(24, n=1, deploy=True, fused=True)
    vs = _rand_params(
        fus.init(jax.random.key(0), xa, x2=xb, up_x=True),
        jax.random.key(3))
    cv1, cv2, cv3, bns = _weights_from_tree(vs["params"], 1)
    yx = fused_c3k2_cat(xa, xb, cv1, cv2, cv3, bns, upsample_a=True,
                        use_pallas=False)
    yp = fused_c3k2_cat(xa, xb, cv1, cv2, cv3, bns, upsample_a=True,
                        use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(yx, np.float32),
                                  np.asarray(yp, np.float32))


def test_fused_head_matches_standard():
    """ops/pallas/head_kernel.py: identical param tree, bf16-rounding
    agreement, bit-exact Pallas interpret mode."""
    from unina_yolo_dla_tpu.models import ModelConfig
    from unina_yolo_dla_tpu.models.head import DetectionHead
    from unina_yolo_dla_tpu.ops.pallas.head_kernel import fused_head

    cfg = ModelConfig(num_classes=4, base_channels=8, input_size=64,
                      deploy=True)
    fcfg = dataclasses.replace(cfg, fused_head=True)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 24),
                          jnp.bfloat16)
    std, fus = DetectionHead(cfg), DetectionHead(fcfg)
    vs = std.init(jax.random.key(0), x)
    vf = fus.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(vf))
    assert (jax.tree.map(lambda a: (a.shape, a.dtype), vs)
            == jax.tree.map(lambda a: (a.shape, a.dtype), vf))
    vs = _rand_params(vs, jax.random.key(3))
    for a, b in zip(std.apply(vs, x), fus.apply(vs, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.03, rtol=0.05)
    p = vs["params"]
    cc = [(p[n]["conv"]["kernel"], p[n]["conv"]["bias"])
          for n in ("cls_conv1", "cls_conv2")]
    rc = [(p[n]["conv"]["kernel"], p[n]["conv"]["bias"])
          for n in ("reg_conv1", "reg_conv2")]
    cp = (p["cls_pred"]["kernel"], p["cls_pred"]["bias"])
    rp = (p["reg_pred"]["kernel"], p["reg_pred"]["bias"])
    yx = fused_head(x[0], cc, cp, rc, rp, use_pallas=False)
    yp = fused_head(x[0], cc, cp, rc, rp, use_pallas=True, interpret=True)
    for a, b in zip(yx, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_head_gridded_bit_identical():
    """H=80 drives the row-gridded head kernel (blk=20). The r3 advisor
    proved the pre-fix kernel's output rows 0 and H-1 diverge from the
    gridless/XLA form for every H >= 80 (conv1's nonzero halo rows leak
    into conv2's edge taps) — this asserts bit-identity on exactly that
    path, edge rows included."""
    from unina_yolo_dla_tpu.models import ModelConfig
    from unina_yolo_dla_tpu.models.head import DetectionHead
    from unina_yolo_dla_tpu.ops.pallas.head_kernel import fused_head

    cfg = ModelConfig(num_classes=4, base_channels=8, input_size=64,
                      deploy=True)
    x = jax.random.normal(jax.random.key(1), (1, 80, 16, 24),
                          jnp.bfloat16)
    std = DetectionHead(cfg)
    vs = _rand_params(std.init(jax.random.key(0), x), jax.random.key(3))
    p = vs["params"]
    cc = [(p[n]["conv"]["kernel"], p[n]["conv"]["bias"])
          for n in ("cls_conv1", "cls_conv2")]
    rc = [(p[n]["conv"]["kernel"], p[n]["conv"]["bias"])
          for n in ("reg_conv1", "reg_conv2")]
    cp = (p["cls_pred"]["kernel"], p["cls_pred"]["bias"])
    rp = (p["reg_pred"]["kernel"], p["reg_pred"]["bias"])
    yx = fused_head(x[0], cc, cp, rc, rp, use_pallas=False)
    yp = fused_head(x[0], cc, cp, rc, rp, use_pallas=True, interpret=True)
    for a, b in zip(yx, yp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_detector_deploy_fused_matches_unfused():
    """Whole-model check through the real deploy graph (folded weights)."""
    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.quant.deploy import fold_batchnorm

    cfg = ModelConfig(num_classes=4, base_channels=8, input_size=128)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(
        {k: variables[k] for k in ("params", "batch_stats")})
    dep = dataclasses.replace(cfg, deploy=True)
    fus = dataclasses.replace(cfg, deploy=True, fused_c3k2=True,
                              fused_head=True)
    x = jax.random.uniform(jax.random.key(5), (1, 128, 128, 3),
                           jnp.bfloat16)
    y0 = UninaYoloDla(dep).apply(folded, x, train=False)
    y1 = UninaYoloDla(fus).apply(folded, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(y0),
                    jax.tree_util.tree_leaves(y1)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.05, rtol=0.08)
