"""End-to-end training smoke tests: the CPU-backend dry run (replaces
run_local_debug.sh) and the 8-device data-parallel step (replaces the
reference's untested DDP path with an actual simulated-mesh test)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unina_yolo_dla_tpu.data import SynthConfig, YoloDataset, batch_iterator, generate_dataset, load_dataset_yaml
from unina_yolo_dla_tpu.models import ModelConfig, init_model
from unina_yolo_dla_tpu.parallel import create_mesh, make_parallel_train_step, shard_batch
from unina_yolo_dla_tpu.train import (
    TrainConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
)

IMG = 64


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_synth")
    yaml_path = generate_dataset(
        root, num_train=8, num_val=2,
        cfg=SynthConfig(image_size=IMG, seed=5, min_height=6, max_height=24,
                        min_cones=2, max_cones=5))
    spec = load_dataset_yaml(yaml_path)
    ds = YoloDataset(spec["train"], img_size=IMG, max_boxes=16)

    cfg = ModelConfig(num_classes=4, base_channels=16, input_size=IMG,
                      compute_dtype=jnp.float32)
    model, variables = init_model(jax.random.key(0), cfg, batch_size=2)
    return ds, cfg, model, variables


def test_train_step_reduces_loss(tiny_setup):
    ds, cfg, model, variables = tiny_setup
    tc = TrainConfig(lr0=0.02, warmup_steps=1, total_steps=30, use_ema=True,
                     optimizer="sgd")
    tx = make_optimizer(tc)
    state = create_train_state(variables, tx, tc)
    step = jax.jit(make_train_step(model, cfg, tx, tc))

    rng = np.random.default_rng(0)
    batch = next(batch_iterator(ds, batch_size=4, rng=rng, steps=1))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    first = None
    for i in range(25):
        state, aux = step(state, batch)
        if first is None:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert np.isfinite(last)
    assert last < first * 0.8, f"loss did not decrease: {first} -> {last}"
    assert int(state.step) == 25


def test_ema_params_track_params(tiny_setup):
    """EMA uses a warmup ramp: early steps track the live params almost
    exactly; late steps blend with the configured decay."""
    ds, cfg, model, variables = tiny_setup
    tc = TrainConfig(lr0=0.01, warmup_steps=1, total_steps=10,
                     ema_decay=0.5, use_ema=True)
    tx = make_optimizer(tc)
    state = create_train_state(variables, tx, tc)
    step = jax.jit(make_train_step(model, cfg, tx, tc))
    rng = np.random.default_rng(1)
    batch = next(batch_iterator(ds, batch_size=2, rng=rng, steps=1))
    batch.pop("sample_valid", None)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # step 0 (warmup): effective decay ~0 -> EMA ~== live params
    early, _ = step(state, batch)
    p = jax.tree.leaves(early.params)[0]
    e = jax.tree.leaves(early.ema_params)[0]
    assert not jnp.allclose(jax.tree.leaves(state.params)[0], p)
    np.testing.assert_allclose(np.asarray(e), np.asarray(p), atol=1e-4)

    # late step (past warmup): EMA strictly between old EMA and new params
    late_state = state._replace(step=jnp.int32(50_000))
    late, _ = step(late_state, batch)
    p = jax.tree.leaves(late.params)[0]
    e = jax.tree.leaves(late.ema_params)[0]
    assert not jnp.allclose(e, p)


def test_data_parallel_step_8_devices(tiny_setup):
    ds, cfg, model, variables = tiny_setup
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = create_mesh(8)
    tc = TrainConfig(lr0=0.01, warmup_steps=1, total_steps=10, use_ema=False)
    tx = make_optimizer(tc)
    state = create_train_state(variables, tx, tc)
    step = make_train_step(model, cfg, tx, tc)
    pstep = make_parallel_train_step(step, mesh)

    rng = np.random.default_rng(2)
    batch = next(batch_iterator(ds, batch_size=8, rng=rng, steps=1))
    batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    state2, aux = pstep(state, batch)
    assert np.isfinite(float(aux["loss"]))
    assert int(state2.step) == 1


def test_dp_matches_single_device(tiny_setup):
    """Gradient all-reduce over the mesh must give the same update as a
    single-device step on the same global batch (up to float tolerance)."""
    ds, cfg, model, variables = tiny_setup
    tc = TrainConfig(lr0=0.01, warmup_steps=1, total_steps=10, use_ema=False)
    tx = make_optimizer(tc)
    step = make_train_step(model, cfg, tx, tc)

    rng = np.random.default_rng(3)
    batch = next(batch_iterator(ds, batch_size=8, rng=rng, steps=1))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    s_single = create_train_state(variables, tx, tc)
    s_single, aux1 = jax.jit(step)(s_single, batch)

    mesh = create_mesh(8)
    s_dp = create_train_state(variables, tx, tc)
    pstep = make_parallel_train_step(step, mesh)
    s_dp, aux2 = pstep(s_dp, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_single.params),
                    jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_resume_is_bit_identical(tiny_setup, tmp_path):
    """Kill at epoch k, resume with --resume semantics -> bit-identical to
    an uninterrupted run (full TrainState + data-RNG position restored;
    Ultralytics last.pt parity, reference train.py:648,898)."""
    from unina_yolo_dla_tpu.train.loop import fit

    ds, cfg, model, variables = tiny_setup
    steps_per_epoch = max(len(ds) // 4, 1)
    # pin total_steps so the LR schedule is identical across all runs
    tc = TrainConfig(lr0=0.02, warmup_steps=1,
                     total_steps=steps_per_epoch * 4, use_ema=True,
                     batch_size=4)

    # uninterrupted 4-epoch run
    full = fit(model, variables, ds, None, tc, epochs=4,
               output_dir=tmp_path / "full", augment=False, seed=11,
               log_fn=lambda *_: None)

    # interrupted run: 2 epochs, then resume to 4 in the same output dir
    part = fit(model, variables, ds, None, tc, epochs=2,
               output_dir=tmp_path / "resumed", augment=False, seed=11,
               log_fn=lambda *_: None)
    resumed = fit(model, variables, ds, None, tc, epochs=4,
                  output_dir=tmp_path / "resumed", augment=False, seed=11,
                  resume=True, log_fn=lambda *_: None)

    assert int(resumed.state.step) == int(full.state.step)
    for a, b in zip(jax.tree.leaves(full.state.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(full.state.opt_state),
                    jax.tree.leaves(resumed.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(full.state.ema_params),
                    jax.tree.leaves(resumed.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # per-epoch losses of the resumed tail match the uninterrupted run
    assert [h["loss"] for h in resumed.history] == \
        [h["loss"] for h in full.history[2:]]
    # the partial run really did stop at 2
    assert len(part.history) == 2


def test_mixup_batches_are_wellformed(tiny_setup):
    """mixup_p=1 blends two samples: labels unioned, image stays uint8-
    ranged, static shapes preserved."""
    ds, cfg, model, variables = tiny_setup
    rng = np.random.default_rng(0)
    plain = next(batch_iterator(ds, batch_size=4,
                                rng=np.random.default_rng(0), steps=1,
                                augment=False))
    mixed = next(batch_iterator(ds, batch_size=4, rng=rng, steps=1,
                                augment=True, mixup_p=1.0))
    assert mixed["images"].shape == plain["images"].shape
    assert mixed["boxes"].shape == plain["boxes"].shape
    # unioned labels: at least as many valid boxes on average
    assert mixed["mask"].sum() >= plain["mask"].sum()
    assert np.isfinite(mixed["images"]).all()


def test_training_is_deterministic(tiny_setup):
    """Same seed + same data -> bit-identical first-step loss and params
    (static-shape XLA programs are deterministic; the host pipeline must
    be too)."""
    ds, cfg, model, variables = tiny_setup
    tc = TrainConfig(lr0=0.01, warmup_steps=1, total_steps=10, use_ema=False)
    tx = make_optimizer(tc)
    step = jax.jit(make_train_step(model, cfg, tx, tc))

    losses, leaves = [], []
    for _ in range(2):
        state = create_train_state(variables, tx, tc)
        batch = next(batch_iterator(ds, batch_size=4,
                                    rng=np.random.default_rng(7), steps=1,
                                    augment=True))
        batch.pop("sample_valid", None)
        state, aux = step(state, {k: jnp.asarray(v)
                                  for k, v in batch.items()})
        losses.append(float(aux["loss"]))
        leaves.append(np.asarray(jax.tree.leaves(state.params)[0]))
    assert losses[0] == losses[1]
    np.testing.assert_array_equal(leaves[0], leaves[1])
