"""Fused stem+stage1 kernel (ops/pallas/stem_kernel.py) correctness.

The batched-regime engine: one VMEM pass from the normalized merged
frame to the stage1 output. Oracles: the composed graph (ShiftDot2x2
stem + fused_downsample_merged) and the kernel's own XLA form.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.ops.pallas.stem_kernel import (
    fused_stem_stage1,
    _pallas_form,
    _pallas_form_resident,
    pack_stem_weights,
)
from unina_yolo_dla_tpu.ops.pallas.stage1_kernel import (
    fused_downsample_merged,
    pack_stage1_weights,
)


def _mk(rng, H, W2, CM, O2, C2):
    xm = jnp.asarray(rng.normal(0, 1, (H, W2, CM)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    ks = jnp.asarray(rng.normal(0, .3, (2, 2, CM, O2)).astype(np.float32))
    bs = jnp.asarray(rng.normal(0, .3, (O2,)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(0, .2, (2, 2, 2 * O2, C2)
                                ).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, .2, (C2,)).astype(np.float32))
    return xm, ks, bs, k1, b1


def _composed(xm, ks, bs, k1, b1):
    """The unfused graph: ShiftDot2x2-math stem -> stage1 op."""
    H, W2, CM = xm.shape
    O2 = ks.shape[-1]
    xp = jnp.pad(xm, ((1, 0), (1, 0), (0, 0)))
    parts = [xp[kh:kh + H, kw:kw + W2, :]
             for kh in range(2) for kw in range(2)]
    z = jax.lax.dot_general(
        jnp.concatenate(parts, -1),
        ks.astype(jnp.bfloat16).reshape(4 * CM, O2),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    stem = jnp.maximum(z + bs, 0.0).astype(jnp.bfloat16)
    return fused_downsample_merged(stem, k1, b1, use_pallas=False)


@pytest.mark.parametrize("shape", [(320, 160, 24, 64, 64),
                                   (32, 16, 24, 64, 64),
                                   (16, 8, 8, 16, 32)])
def test_xla_form_matches_composed_graph(rng, shape):
    """The kernel math == the unfused graph to one bf16 ulp (the stem's
    f32 accumulation is reassociated: 2 kw-packed dots vs one 4C dot)."""
    H, W2, CM, O2, C2 = shape
    xm, ks, bs, k1, b1 = _mk(rng, H, W2, CM, O2, C2)
    ref = _composed(xm, ks, bs, k1, b1).astype(jnp.float32)
    out = fused_stem_stage1(xm, ks, bs, k1, b1,
                            use_pallas=False).astype(jnp.float32)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(out - ref).max()) <= 0.01 * max(scale, 1.0)


@pytest.mark.parametrize("shape", [(320, 160, 24, 64, 64),
                                   (32, 16, 24, 64, 64)])
def test_pallas_interpret_bit_exact_vs_xla_form(rng, shape):
    """Both platform lowerings of the primitive are ONE math — the edge
    rows included (the r3 fused-head bug class: out-of-image stem rows
    must be re-masked to stage1's zero padding)."""
    H, W2, CM, O2, C2 = shape
    xm, ks, bs, k1, b1 = _mk(rng, H, W2, CM, O2, C2)
    ox = fused_stem_stage1(xm, ks, bs, k1, b1, use_pallas=False)
    op = fused_stem_stage1(xm, ks, bs, k1, b1, use_pallas=True,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(ox, np.float32),
                                  np.asarray(op, np.float32))


def test_resident_variant_bit_exact(rng):
    xm, ks, bs, k1, b1 = _mk(rng, 32, 16, 24, 64, 64)
    wkw = pack_stem_weights(ks.astype(jnp.bfloat16))
    wp = pack_stage1_weights(k1.astype(jnp.bfloat16))
    a = _pallas_form(xm, wkw, bs.reshape(1, -1), wp, b1.reshape(1, -1),
                     interpret=True)
    b = _pallas_form_resident(xm, wkw, bs.reshape(1, -1), wp,
                              b1.reshape(1, -1), interpret=True)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


def test_batched_unroll_and_vmap(rng):
    xm, ks, bs, k1, b1 = _mk(rng, 32, 16, 24, 64, 64)
    xb = jnp.stack([xm, xm * 0.5, xm + 0.25])
    ob = fused_stem_stage1(xb, ks, bs, k1, b1, use_pallas=True,
                           interpret=True)
    per = jnp.stack([fused_stem_stage1(xb[i], ks, bs, k1, b1,
                                       use_pallas=True, interpret=True)
                     for i in range(3)])
    np.testing.assert_array_equal(np.asarray(ob, np.float32),
                                  np.asarray(per, np.float32))
    # user-level vmap of the primitive (the cached vmapped-predict graph)
    ov = jax.vmap(lambda x: fused_stem_stage1(x, ks, bs, k1, b1))(xb)
    np.testing.assert_allclose(np.asarray(ov, np.float32),
                               np.asarray(ob, np.float32), atol=1e-2)


def test_fused_stem_graph_is_tree_identical_and_equivalent(rng):
    """ModelConfig(fused_stem=True): same param tree as the standard
    merged graph (checkpoints load either way), same detector outputs."""
    from unina_yolo_dla_tpu.models import ModelConfig
    from unina_yolo_dla_tpu.models.detector import UninaYoloDla, init_model
    from unina_yolo_dla_tpu.ops.preprocess import space_to_depth_np
    from unina_yolo_dla_tpu.quant.deploy import (
        fold_batchnorm,
        fold_downsample_space_to_depth,
        fold_stem_space_to_depth,
        merge_stem_columns,
    )

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=160)
    model, v = init_model(jax.random.PRNGKey(0), cfg, batch_size=1)
    bf = fold_batchnorm({k: v[k] for k in ("params", "batch_stats")})
    mv = merge_stem_columns(fold_downsample_space_to_depth(
        fold_stem_space_to_depth(bf)))
    s2dm = dataclasses.replace(cfg, deploy=True, stem_s2d=True,
                               s2d_host=True, stage1_s2d=True,
                               s2d_merged=True)
    fstem = dataclasses.replace(s2dm, fused_stem=True)
    fr = rng.integers(0, 256, (160, 160, 3), dtype=np.uint8)
    fs = space_to_depth_np(fr)
    xm = jnp.asarray((fs.reshape(80, 40, 24).astype(np.float32) / 255.0
                      - 0.45) / 0.22)[None]
    o0 = UninaYoloDla(s2dm).apply(mv, xm, train=False)
    o1 = UninaYoloDla(fstem).apply(mv, xm, train=False)
    for (c0, r0), (c1, r1) in zip(o0, o1):
        scale = float(jnp.abs(c0).max()) + 1e-6
        assert float(jnp.abs(c1.astype(jnp.float32)
                             - c0.astype(jnp.float32)).max()) <= 0.02 * scale
        assert float(jnp.abs(r1.astype(jnp.float32)
                             - r0.astype(jnp.float32)).max()) <= 0.02 * (
            float(jnp.abs(r0).max()) + 1e-6)
    t0 = jax.tree_util.tree_structure(
        UninaYoloDla(s2dm).init(jax.random.PRNGKey(0), xm, train=False))
    t1 = jax.tree_util.tree_structure(
        UninaYoloDla(fstem).init(jax.random.PRNGKey(0), xm, train=False))
    assert t0 == t1
