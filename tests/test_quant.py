"""Quantization stack tests: fake-quant math, entropy calibration,
FP32->QAT handoff, QAT fine-tune step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.models.detector import UninaYoloDla
from unina_yolo_dla_tpu.quant import (
    QuantSpec,
    entropy_amax,
    fake_quant_tensor,
    load_calibration_cache,
    make_qat_model,
    percentile_amax,
    prepare_qat_variables,
    save_calibration_cache,
    ste_round,
)
from unina_yolo_dla_tpu.quant.fake_quant import HIST_BINS
from unina_yolo_dla_tpu.train import TrainConfig, create_train_state, make_optimizer, make_train_step

IMG = 32


def test_ste_round_gradient_is_identity():
    g = jax.grad(lambda x: ste_round(x * 3.0).sum())(jnp.asarray([0.2, 1.7]))
    np.testing.assert_allclose(g, [3.0, 3.0])


def test_fake_quant_levels():
    amax = jnp.float32(1.0)
    x = jnp.linspace(-1.5, 1.5, 13)
    q = fake_quant_tensor(x, amax, 127.0)
    # clipping at +-amax
    np.testing.assert_allclose(q[0], -1.0, atol=1e-6)
    np.testing.assert_allclose(q[-1], 1.0, atol=1e-6)
    # values land on the int8 grid
    grid = np.round(np.asarray(q) * 127.0) / 127.0
    np.testing.assert_allclose(np.asarray(q), grid, atol=1e-6)
    # quantisation error bounded by half a step
    inside = np.abs(np.asarray(x)) <= 1.0
    np.testing.assert_array_less(
        np.abs(np.asarray(q - x))[inside], 0.5 / 127.0 + 1e-7)


def test_fake_quant_zero_amax_passthrough():
    x = jnp.asarray([0.3, -2.0])
    q = fake_quant_tensor(x, jnp.float32(0.0), 127.0)
    np.testing.assert_allclose(q, x)


def test_entropy_amax_clips_outliers():
    # gaussian bulk + tiny far outlier mass: entropy amax should clip well
    # below the outlier range, percentile/max should not
    rng = np.random.default_rng(0)
    vals = np.abs(rng.normal(0, 1.0, 100_000))
    vals = np.concatenate([vals, [40.0]])
    upper = vals.max()
    hist, _ = np.histogram(vals, bins=HIST_BINS, range=(0, upper))
    amax_e = entropy_amax(hist.astype(np.float64), upper)
    amax_p = percentile_amax(hist.astype(np.float64), upper, 99.99)
    assert amax_e < 8.0, f"entropy amax {amax_e} did not clip outlier"
    assert amax_e > 1.5, "entropy amax clipped too aggressively"
    assert amax_p < upper


@pytest.fixture(scope="module")
def fp32_setup():
    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    batches = [
        {"images": rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)}
        for _ in range(3)
    ]
    return cfg, model, variables, batches


def test_calibration_and_handoff(fp32_setup):
    cfg, model, variables, batches = fp32_setup
    qat_model, qat_vars = prepare_qat_variables(
        model, variables, lambda: iter(batches), method="entropy",
        max_batches=3, min_images=0)
    # params untouched (identity transfer)
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(qat_vars["params"])):
        assert a is b or jnp.array_equal(a, b)
    # quant collection has positive amax values
    amaxes = np.array([float(x) for x in jax.tree.leaves(qat_vars["quant"])])
    assert len(amaxes) > 10
    assert (amaxes > 0).all()

    # QAT forward runs and differs slightly from FP32 forward
    x = jnp.asarray(batches[0]["images"])
    fp_out = model.apply(
        {k: variables[k] for k in ("params", "batch_stats")}, x, train=False)
    q_out = qat_model.apply(qat_vars, x, train=False)
    fp_cls = np.asarray(fp_out[2][0])
    q_cls = np.asarray(q_out[2][0])
    assert not np.allclose(fp_cls, q_cls), "quantisation had no effect"
    # ... but not wildly (int8 should be close)
    assert np.abs(fp_cls - q_cls).mean() < 0.5


def test_excluded_layers_not_quantized(fp32_setup):
    cfg, model, variables, batches = fp32_setup
    qat_model, qat_vars = prepare_qat_variables(
        model, variables, lambda: iter(batches), method="max",
        max_batches=2, min_images=0)
    paths = ["/".join(str(getattr(k, "key", k)) for k in p)
             for p, _ in jax.tree_util.tree_flatten_with_path(
                 qat_vars["quant"])[0]]
    assert paths, "no quantizers found"
    for p in paths:
        assert "stem" not in p
        assert "head_p2" not in p
        assert "stage1_conv" not in p
    # P3/P4 heads ARE quantized
    assert any("head_p3" in p for p in paths)


def test_calibration_cache_roundtrip(fp32_setup, tmp_path):
    cfg, model, variables, batches = fp32_setup
    _, qat_vars = prepare_qat_variables(
        model, variables, lambda: iter(batches), method="max",
        max_batches=2, min_images=0)
    cache = tmp_path / "calibration.cache"
    save_calibration_cache(qat_vars["quant"], cache)
    loaded = load_calibration_cache(cache)
    a = jax.tree.leaves(qat_vars["quant"])
    b = jax.tree.leaves(loaded)
    np.testing.assert_allclose(sorted(map(float, a)), sorted(map(float, b)),
                               rtol=1e-6)


def test_qat_train_step_runs_and_learns(fp32_setup):
    cfg, model, variables, batches = fp32_setup
    qat_model, qat_vars = prepare_qat_variables(
        model, variables, lambda: iter(batches), method="max",
        max_batches=2, min_images=0)

    # QAT recipe shape: low LR, no warmup, EMA off (train.py:848-873);
    # LR raised here so the un-trained toy model visibly learns in 20 steps
    tc = TrainConfig(lr0=5e-3, warmup_steps=1, total_steps=40, use_ema=False)
    tx = make_optimizer(tc)
    state = create_train_state(qat_vars, tx, tc)
    step = jax.jit(make_train_step(
        qat_model, qat_model.config, tx, tc,
        extra_variables={"quant": qat_vars["quant"]}))

    G = 8
    batch = {
        "images": jnp.asarray(batches[0]["images"]),
        "boxes": jnp.tile(jnp.asarray([[8.0, 8.0, 24.0, 24.0]]), (2, G, 1)),
        "labels": jnp.zeros((2, G), jnp.int32),
        "mask": jnp.zeros((2, G), bool).at[:, 0].set(True),
    }
    losses = []
    for _ in range(20):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), (
        f"QAT fine-tune did not reduce loss: {losses}")


def test_entropy_amax_skips_zero_spike():
    """Post-ReLU zero-mass must not drag the KL clip down (regression:
    a trained detector collapsed to mAP 0 before the zero-bin skip)."""
    rng = np.random.default_rng(0)
    bulk = np.abs(rng.normal(0, 1.0, 390_000))
    vals = np.concatenate([np.zeros(600_000), bulk,
                           rng.uniform(5, 12, 10_000)])
    upper = vals.max()
    hist, _ = np.histogram(vals, bins=HIST_BINS, range=(0, upper))
    amax = entropy_amax(hist.astype(np.float64), upper)
    assert amax > 2.5, f"zero spike dragged KL clip to {amax}"


def test_per_channel_weight_quant_is_default():
    from unina_yolo_dla_tpu.quant.fake_quant import quant_weight

    spec = QuantSpec(mode="quantize", exclude=())
    w = np.zeros((1, 1, 1, 2), np.float32)
    w[..., 0] = 0.01   # tiny channel
    w[..., 1] = 10.0   # huge channel
    q = np.asarray(quant_weight(jnp.asarray(w), spec, "any/path"))
    # per-channel: the tiny channel survives quantisation exactly-ish
    np.testing.assert_allclose(q[..., 0], 0.01, rtol=1e-2)
    # per-tensor would have crushed it to 0 (step = 10/127 ≈ 0.079)
    spec_pt = QuantSpec(mode="quantize", exclude=(),
                        per_channel_weights=False)
    q_pt = np.asarray(quant_weight(jnp.asarray(w), spec_pt, "any/path"))
    assert q_pt[..., 0] == 0.0
