"""BatchNorm-folding deploy transform tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.quant.deploy import fold_batchnorm

IMG = 64


@pytest.fixture(scope="module")
def trained_like_setup():
    """Model with non-trivial batch stats (a few train steps' worth)."""
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    # push data through in train mode so means/vars move off init
    x = jax.random.normal(jax.random.key(1), (4, IMG, IMG, 3)) * 2 + 0.5
    for _ in range(3):
        _, upd = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        variables = {**variables, "batch_stats": upd["batch_stats"]}
    return cfg, model, variables


def test_fold_matches_eval_forward(trained_like_setup):
    cfg, model, variables = trained_like_setup
    deploy_cfg = dataclasses.replace(cfg, deploy=True)
    deploy_model = UninaYoloDla(deploy_cfg)
    deploy_vars = fold_batchnorm(variables)

    x = jax.random.normal(jax.random.key(2), (1, IMG, IMG, 3))
    ref = model.apply({k: variables[k] for k in ("params", "batch_stats")},
                      x, train=False)
    dep = deploy_model.apply(deploy_vars, x, train=False)
    for (rc, rr), (dc, dr) in zip(ref, dep):
        np.testing.assert_allclose(np.asarray(rc), np.asarray(dc),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rr), np.asarray(dr),
                                   rtol=1e-4, atol=1e-4)


def test_fold_tree_structure(trained_like_setup):
    cfg, model, variables = trained_like_setup
    deploy_vars = fold_batchnorm(variables)
    assert "batch_stats" not in deploy_vars
    stem = deploy_vars["params"]["backbone"]["stem"]
    assert set(stem) == {"conv"}
    assert set(stem["conv"]) == {"kernel", "bias"}
    # structure matches the deploy model's own init
    deploy_model = UninaYoloDla(dataclasses.replace(cfg, deploy=True))
    ref_init = deploy_model.init(
        jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)), train=False)
    ref_paths = {tuple(str(getattr(k, "key", k)) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     ref_init["params"])[0]}
    got_paths = {tuple(str(getattr(k, "key", k)) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     deploy_vars["params"])[0]}
    assert ref_paths == got_paths


def test_fold_preserves_param_shapes_for_head_preds(trained_like_setup):
    cfg, model, variables = trained_like_setup
    deploy_vars = fold_batchnorm(variables)
    # prediction convs (no BN) pass through untouched
    a = np.asarray(
        variables["params"]["head_p3"]["cls_pred"]["kernel"])
    b = np.asarray(
        deploy_vars["params"]["head_p3"]["cls_pred"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_stem_space_to_depth_exact_equivalence():
    """The s2d stem must be numerically IDENTICAL to the standard stem
    (same multiplies/adds, different layout): full-model outputs match on
    random input at f32 precision."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.ops.preprocess import space_to_depth
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_stem_space_to_depth,
    )

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=64,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(variables)

    dep = dataclasses.replace(cfg, deploy=True)
    s2d = dataclasses.replace(cfg, deploy=True, stem_s2d=True)
    s2d_vars = fold_stem_space_to_depth(folded)
    assert s2d_vars["params"]["backbone"]["stem"]["conv"]["kernel"].shape \
        == (2, 2, 12, 16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
    out_std = UninaYoloDla(dep).apply(folded, x, train=False)
    out_s2d = UninaYoloDla(s2d).apply(s2d_vars, x, train=False)
    for (a1, a2), (b1, b2) in zip(out_std, out_s2d):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(b1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(b2),
                                   rtol=1e-4, atol=1e-4)

    # the jnp op matches the layout contract the kernel transform assumes
    t = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3)
    b = space_to_depth(t, 2)
    assert b.shape == (2, 2, 2, 12)
    # block (0,0): offsets (di,dj) row-major, channels fastest
    np.testing.assert_array_equal(
        np.asarray(b[0, 0, 0]),
        np.concatenate([np.asarray(t[0, 0, 0]), np.asarray(t[0, 0, 1]),
                        np.asarray(t[0, 1, 0]), np.asarray(t[0, 1, 1])]))


def test_s2d_host_blocked_input_equivalence():
    """s2d_host: the model consumes an ALREADY-blocked (S/2,S/2,12) input
    (host-side shuffle, ops.preprocess.space_to_depth_np) and must match
    the standard deploy stem exactly — the matmul stem (ShiftDot2x2) is
    the same math as the conv (RESULTS.md round 3)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.ops.preprocess import (
        space_to_depth,
        space_to_depth_np,
    )
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_stem_space_to_depth,
    )

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=64,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(variables)
    dep = dataclasses.replace(cfg, deploy=True)
    s2dh = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                               s2d_host=True)
    s2d_vars = fold_stem_space_to_depth(folded)

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    xb_np = space_to_depth_np(x)
    # numpy host shuffle == the jnp op (same channel order contract)
    np.testing.assert_array_equal(
        xb_np, np.asarray(space_to_depth(jnp.asarray(x), 2)))

    out_std = UninaYoloDla(dep).apply(folded, jnp.asarray(x), train=False)
    out_h = UninaYoloDla(s2dh).apply(s2d_vars, jnp.asarray(xb_np),
                                     train=False)
    for (a1, a2), (b1, b2) in zip(out_std, out_h):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(b1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(b2),
                                   rtol=1e-4, atol=1e-4)


def test_stage1_s2d_blocked_downsample_equivalence():
    """stage1_s2d: the blocked stage1 downsample (on-device reshape-
    transpose s2d + shift-dot, quant.deploy.fold_downsample_space_to_
    depth) must match the standard deploy graph."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_downsample_space_to_depth,
    )

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=64,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(variables)
    dep = dataclasses.replace(cfg, deploy=True)
    blk = dataclasses.replace(cfg, deploy=True, stage1_s2d=True)
    blk_vars = fold_downsample_space_to_depth(folded)
    assert blk_vars["params"]["backbone"]["stage1_conv"]["conv"][
        "kernel"].shape == (2, 2, 64, 32)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
    out_std = UninaYoloDla(dep).apply(folded, x, train=False)
    out_blk = UninaYoloDla(blk).apply(blk_vars, x, train=False)
    for (a1, a2), (b1, b2) in zip(out_std, out_blk):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(b1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(b2),
                                   rtol=1e-4, atol=1e-4)


def test_s2d_merged_engine_equivalence():
    """s2d_merged: the column-merged engine (merged stem matmul + fused
    stage1, quant.deploy.merge_stem_columns) consumes the SAME host bytes
    as s2d_host viewed (S/2,S/4,24) and must match the standard deploy
    graph — same multiplies/adds, only the layout changes."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unina_yolo_dla_tpu.models import ModelConfig, init_model
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla
    from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_downsample_space_to_depth,
        fold_stem_space_to_depth,
        merge_stem_columns,
    )

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=64,
                      compute_dtype=jnp.float32)
    _, variables = init_model(jax.random.key(0), cfg)
    folded = fold_batchnorm(variables)
    dep = dataclasses.replace(cfg, deploy=True)
    merged_cfg = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                                     s2d_host=True, stage1_s2d=True,
                                     s2d_merged=True)
    m_vars = merge_stem_columns(fold_downsample_space_to_depth(
        fold_stem_space_to_depth(folded)))
    # merged stem kernel: (2,2,2*12,2*c1), bias tiled 2x
    stem_k = m_vars["params"]["backbone"]["stem"]["conv"]["kernel"]
    assert stem_k.shape == (2, 2, 24, 32)
    assert m_vars["params"]["backbone"]["stem"]["conv"]["bias"].shape == (32,)

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    xb = space_to_depth_np(x)                        # (1, 32, 32, 12)
    xm = xb.reshape(1, 32, 16, 24)                   # same bytes, merged

    out_std = UninaYoloDla(dep).apply(folded, jnp.asarray(x), train=False)
    out_m = UninaYoloDla(merged_cfg).apply(m_vars, jnp.asarray(xm),
                                           train=False)
    for (a1, a2), (b1, b2) in zip(out_std, out_m):
        np.testing.assert_allclose(np.asarray(a1), np.asarray(b1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(b2),
                                   rtol=1e-4, atol=1e-4)
