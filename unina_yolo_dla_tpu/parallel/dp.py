"""Data-parallel training over a device mesh.

Replaces the reference's Ultralytics-managed PyTorch DDP (SURVEY.md §2 #26):
state is replicated, the batch is sharded over the ``data`` mesh axis, and
``jit`` with sharding annotations compiles the step SPMD — the gradient
all-reduce rides ICI as an XLA-inserted psum. Rank-0-only semantics
(validation, conformal calibration) are trivial here: outputs are
replicated, the single host just uses them.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh

from .mesh import batch_sharding, replicated


def make_parallel_train_step(
    train_step: Callable,
    mesh: Mesh,
    axis: str = "data",
) -> Callable:
    """jit ``train_step`` with state replicated and batch sharded on ``axis``.

    The returned function accepts (state, batch) like the serial step;
    donate the state for in-place buffer reuse.
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(eval_step: Callable, mesh: Mesh,
                            axis: str = "data") -> Callable:
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, axis)
    return jax.jit(eval_step, in_shardings=(rep, bsh),
                   out_shardings=(rep, rep))
