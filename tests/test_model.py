"""Golden shape + parameter-count tests for the detector.

Param counts were measured by instantiating the reference torch model
(/root/reference/unina_yolo_dla/model.py) — exact structural parity.

CPU note: tests run with float32 compute (bf16 is emulated on the CPU
backend and ~3x slower); param counts and shapes are dtype-independent.
"""
import jax
import jax.numpy as jnp
import pytest

from unina_yolo_dla_tpu.models import ModelConfig, init_model, param_count

# (base_channels, lite_p2) -> reference torch param count
GOLDEN_PARAMS = {
    (32, False): 5_004_344,
    (16, False): 1_255_464,
    (32, True): 5_022_520,
    (16, True): 1_259_944,
}


def _cfg(**kw):
    kw.setdefault("compute_dtype", jnp.float32)
    return ModelConfig(**kw)


@pytest.mark.parametrize("bc,lite", list(GOLDEN_PARAMS))
def test_param_count_matches_reference(bc, lite):
    cfg = _cfg(num_classes=4, base_channels=bc, lite_p2=lite,
               input_size=32)  # param count is resolution-independent
    _, variables = init_model(jax.random.key(0), cfg)
    assert param_count(variables) == GOLDEN_PARAMS[(bc, lite)]


@pytest.fixture(scope="module")
def small_model():
    cfg = _cfg(base_channels=16, input_size=64)
    model, variables = init_model(jax.random.key(0), cfg)
    return cfg, model, variables


def test_output_shapes_pyramid(small_model):
    cfg, model, variables = small_model
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    outs = model.apply(variables, x, train=False)
    assert len(outs) == 3
    for (cls, reg), s in zip(outs, (4, 8, 16)):
        g = 64 // s
        assert cls.shape == (1, g, g, 4)
        assert reg.shape == (1, g, g, 4)
        assert cls.dtype == jnp.float32


def test_640_shapes_via_shape_inference():
    # full-res shapes validated by abstract evaluation (no CPU compute)
    cfg = _cfg(base_channels=32, input_size=640)
    model, _ = init_model(jax.random.key(0), _cfg(base_channels=32,
                                                  input_size=32))
    x = jax.ShapeDtypeStruct((1, 640, 640, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0),
                           jnp.zeros((1, 640, 640, 3)), train=False))
    outs = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, train=False), variables, x)
    for (cls, reg), g in zip(outs, (160, 80, 40)):
        assert cls.shape == (1, g, g, 4)
        assert reg.shape == (1, g, g, 4)


def test_train_mode_updates_batch_stats(small_model):
    cfg, model, variables = small_model
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    _, updated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updated["batch_stats"])
    assert any(not jnp.allclose(a, b) for a, b in zip(old, new))


def test_forward_is_jittable_and_deterministic(small_model):
    cfg, model, variables = small_model
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    o1 = fwd(variables, x)
    o2 = fwd(variables, x)
    for (c1, r1), (c2, r2) in zip(o1, o2):
        assert jnp.array_equal(c1, c2) and jnp.array_equal(r1, r2)


def test_lite_p2_changes_structure():
    cfg_full = _cfg(base_channels=16, input_size=32)
    cfg_lite = _cfg(base_channels=16, input_size=32, lite_p2=True)
    _, v_full = init_model(jax.random.key(0), cfg_full)
    _, v_lite = init_model(jax.random.key(0), cfg_lite)
    full_keys = set(v_full["params"]["backbone"]["stage1_block"].keys())
    lite_keys = set(v_lite["params"]["backbone"]["stage1_block"].keys())
    assert "cv1" in full_keys          # C3k2 subtree
    assert lite_keys == {"conv", "bn"}  # plain ConvBlock


def test_grid_cell_count():
    cfg = ModelConfig(input_size=640)
    assert cfg.num_cells == 33_600  # 160^2 + 80^2 + 40^2, SURVEY §6
