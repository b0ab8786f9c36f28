"""High-level fit loop: epochs, eval, checkpointing, data parallelism.

The Ultralytics-trainer-equivalent glue (reference trainer.py/train.py):
epoch loop over the batch iterator, per-epoch validation (mAP + small-
object metrics injected into the metric dict like UninaDLAValidator,
trainer.py:197-286), fitness-tracked best checkpoint (0.1*mAP50 +
0.9*mAP50-95, the Ultralytics fitness), difficulty-weighted sampling, and
optional multi-device data parallelism.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from pathlib import Path
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import YoloDataset, batch_iterator, load_difficulty_weights
from ..evaluate import evaluate_model
from ..models.config import ModelConfig
from ..parallel import create_mesh, make_parallel_train_step, shard_batch
from ..parallel.distributed import is_main_process, make_global_batch
from ..utils.checkpoint import CheckpointManager
from .losses import LossConfig
from .trainer import TrainConfig, TrainState, create_train_state, make_optimizer, make_train_step


def prefetch(batches: Iterator, depth: int = 2) -> Iterator:
    """Run the (CPU-bound) batch pipeline in a background thread, ``depth``
    batches ahead, so image loading/augmentation overlaps device compute —
    the async-dataloader role of the reference's torch DataLoader workers
    (data_loader.py:152-228), one thread being enough because the consumer
    is an async XLA dispatch, not a training computation."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for b in batches:
                q.put(b)
            q.put(sentinel)
        except BaseException as e:  # propagate into the consumer thread
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def fitness(metrics: dict[str, float]) -> float:
    """Ultralytics fitness: 0.1*mAP50 + 0.9*mAP50-95."""
    return 0.1 * metrics.get("map50", 0.0) + 0.9 * metrics.get("map50_95", 0.0)


@dataclasses.dataclass
class FitResult:
    state: TrainState
    best_variables: dict[str, Any]
    metrics: dict[str, float]
    history: list[dict[str, float]]


def fit(
    model,
    variables: dict[str, Any],
    train_ds: YoloDataset,
    val_ds: YoloDataset | None,
    tc: TrainConfig,
    epochs: int,
    output_dir: str | Path,
    loss_cfg: LossConfig = LossConfig(),
    difficulty_map: str | dict | None = None,
    augment: bool = True,
    mosaic_p: float = 0.0,
    mixup_p: float = 0.0,
    copy_paste=None,
    corruption_p: float = 0.0,
    n_devices: int | None = None,
    extra_variables: dict[str, Any] | None = None,
    seed: int = 0,
    resume: bool = False,
    log_fn: Callable[[str], None] = print,
) -> FitResult:
    """Train for ``epochs`` over ``train_ds``; returns the best variables.

    ``extra_variables`` carries the frozen quant collection for phase-2 QAT.

    ``resume=True`` restores the FULL training state (params, batch_stats,
    optimizer state, EMA tree, step counter, data-RNG position) from
    ``<output_dir>/weights/last_state.msgpack`` — the Ultralytics last.pt
    semantics (reference train.py:648,898): a resumed run is bit-identical
    to one that never stopped.

    Multi-host: when ``jax.distributed`` is initialised (>1 process —
    parallel/distributed.py), the mesh spans all hosts' devices,
    ``tc.batch_size`` is the GLOBAL batch, each host loads only its
    process_index-strided slice, and every artifact write is gated on
    process 0 (the reference's rank-0 DDP semantics,
    train.py:1064-1096). ``output_dir`` must be a shared filesystem for
    --resume to see process 0's state file.
    """
    cfg: ModelConfig = model.config
    output_dir = Path(output_dir)
    ckpts = CheckpointManager(output_dir / "weights")

    pcount = jax.process_count()
    main = is_main_process()

    steps_per_epoch = max(len(train_ds) // tc.batch_size, 1)
    tc = dataclasses.replace(
        tc, total_steps=max(tc.total_steps, steps_per_epoch * epochs))
    tx = make_optimizer(tc)
    state = create_train_state(variables, tx, tc)
    step_fn = make_train_step(model, cfg, tx, tc, loss_cfg,
                              extra_variables=extra_variables)

    n_dev = n_devices or (jax.device_count() if pcount > 1 else 1)
    if n_dev > 1:
        mesh = create_mesh(n_dev)
        p_step = make_parallel_train_step(step_fn, mesh)
    else:
        mesh = None
        p_step = jax.jit(step_fn, donate_argnums=(0,))
    process_slice = (jax.process_index(), pcount) if pcount > 1 else None

    weights = load_difficulty_weights(train_ds, difficulty_map) \
        if difficulty_map is not None else None
    rng = np.random.default_rng(seed)

    history: list[dict[str, float]] = []
    best_fit = -1.0
    best_variables = {k: jax.device_get(v) for k, v in variables.items()}
    start_epoch = 0

    resume_path = output_dir / "weights" / "last_state.msgpack"
    resume_meta_path = output_dir / "weights" / "last_state.json"
    if resume and resume_path.exists():
        import json as _json

        from ..utils.checkpoint import load_msgpack

        state = load_msgpack(resume_path, state)
        meta = _json.loads(resume_meta_path.read_text())
        start_epoch = int(meta["epoch"]) + 1
        best_fit = float(meta["best_fit"])
        rng.bit_generator.state = meta["rng_state"]
        eval_template = {
            "params": state.ema_params if tc.use_ema else state.params,
            "batch_stats": state.batch_stats,
            **(extra_variables or {}),
        }
        try:
            best_variables = ckpts.load_best(eval_template)
        except FileNotFoundError:
            pass
        log_fn(f"resumed from epoch {start_epoch - 1} "
               f"(step={int(state.step)}, best_fit={best_fit:.4f})")
    elif resume:
        log_fn(f"--resume requested but {resume_path} not found; "
               "starting fresh")

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = []
        for batch in prefetch(batch_iterator(
                train_ds, tc.batch_size, rng,
                steps=steps_per_epoch, weights=weights,
                augment=augment, mosaic_p=mosaic_p,
                mixup_p=mixup_p,
                copy_paste=copy_paste,
                corruption_p=corruption_p,
                process_slice=process_slice)):
            batch.pop("sample_valid", None)
            batch.pop("indices", None)
            if process_slice is not None:
                # per-host rows -> global batch-sharded jax.Arrays
                batch = make_global_batch(batch, mesh, tc.batch_size)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
            state, aux = p_step(state, batch)
            losses.append(aux)

        mean_loss = float(np.mean([float(a["loss"]) for a in losses]))
        epoch_metrics: dict[str, float] = {"loss": mean_loss, "epoch": epoch}

        eval_vars = {
            "params": state.ema_params if tc.use_ema else state.params,
            "batch_stats": state.batch_stats,
            **(extra_variables or {}),
        }
        if val_ds is not None and len(val_ds) > 0:
            if pcount > 1:
                # multi-host: SHARD validation — each process predicts only
                # its process_slice rows of every (deterministic) val batch,
                # then the padded per-image records are allgathered so every
                # host computes identical metrics from the global set. The
                # fitness/best decision stays in lockstep at ~1/P the val
                # cost (the reference validates rank-0 only, trainer.py:197;
                # we shard instead of duplicating).
                val_bs = max(pcount,
                             min(tc.batch_size, len(val_ds))
                             // pcount * pcount)

                def val_batches():
                    return prefetch(batch_iterator(
                        val_ds, val_bs, np.random.default_rng(0),
                        shuffle=False, augment=False,
                        process_slice=process_slice))

                eval_vars = {k: jax.device_get(v)
                             for k, v in eval_vars.items()}
                val_metrics = evaluate_model(model, eval_vars, val_batches,
                                             mesh=None, process_gather=True)
            else:
                def val_batches():
                    return prefetch(batch_iterator(
                        val_ds, min(tc.batch_size, len(val_ds)),
                        np.random.default_rng(0),
                        shuffle=False, augment=False))

                val_metrics = evaluate_model(model, eval_vars, val_batches,
                                             mesh=mesh)
            epoch_metrics.update(val_metrics)
            fit_val = fitness(val_metrics)
        else:
            fit_val = -mean_loss  # fall back to loss when no val set

        epoch_metrics["fitness"] = fit_val
        epoch_metrics["time_s"] = time.time() - t0
        history.append(epoch_metrics)
        if main:
            log_fn(
                f"epoch {epoch}: loss={mean_loss:.4f} fitness={fit_val:.4f} "
                f"map50={epoch_metrics.get('map50', float('nan')):.4f} "
                f"small_f1={epoch_metrics.get('small_object_f1', float('nan')):.4f} "
                f"({epoch_metrics['time_s']:.1f}s)")

        save_vars = {k: jax.device_get(v) for k, v in eval_vars.items()}
        if main:
            ckpts.save(epoch, save_vars, fitness=fit_val)
        if fit_val > best_fit:
            best_fit = fit_val
            best_variables = save_vars

        if main:
            # full-state checkpoint for --resume (last.pt semantics): the
            # whole TrainState plus the host data-RNG position so a resumed
            # run is bit-identical to an uninterrupted one
            from ..utils.checkpoint import save_msgpack
            import json as _json

            save_msgpack(state, resume_path)
            resume_meta_path.write_text(_json.dumps({
                "epoch": epoch,
                "best_fit": best_fit,
                "rng_state": rng.bit_generator.state,
            }))

            # append-only metrics log (results.csv analogue)
            with open(output_dir / "history.jsonl", "a") as f:
                f.write(_json.dumps(
                    {k: (float(v) if isinstance(v, (int, float)) else v)
                     for k, v in epoch_metrics.items()
                     if not isinstance(v, (list, dict))}) + "\n")

    return FitResult(state=state, best_variables=best_variables,
                     metrics=history[-1] if history else {},
                     history=history)
