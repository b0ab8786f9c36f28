"""Streaming inference server with lifecycle states.

The ``perception_node.cpp`` equivalent (reference :409-539 lifecycle,
:551-688 frame path) rebuilt around the AOT artifact:

- lifecycle:  UNCONFIGURED -> configure() -> INACTIVE -> activate()
              -> ACTIVE -> deactivate()/cleanup()/shutdown()
- configure loads the serving artifact, validates its dimensions against
  the requested config (engine-vs-param check, :440-457), and warms the
  executable so activation is retrace-free.
- process_frame: per-frame guards drop bad frames instead of crashing
  (invalid buffer :561-570, wrong geometry :588-596), runs the fused
  on-chip program, and returns the compacted detection set (~1 KB D2H).
- per-frame latency histogram with p50/p99 (steady-clock logging at :684-688
  upgraded to actual percentile tracking — p99 is the north-star metric).

Transport is pluggable: in-process calls, the C++ shared-memory host loop
(runtime/native), or any pub/sub can feed ``process_frame``.
"""
from __future__ import annotations

import enum
import time
from pathlib import Path
from typing import Callable

import jax
import numpy as np

from .aot import ServingArtifact, validate_artifact_shapes


class LifecycleState(enum.Enum):
    UNCONFIGURED = "unconfigured"
    INACTIVE = "inactive"
    ACTIVE = "active"
    FINALIZED = "finalized"


class LatencyHistogram:
    """Fixed-size ring of per-frame latencies with percentile queries."""

    def __init__(self, capacity: int = 4096) -> None:
        self._buf = np.zeros(capacity, np.float64)
        self._n = 0
        self._cap = capacity

    def record(self, latency_ms: float) -> None:
        self._buf[self._n % self._cap] = latency_ms
        self._n += 1

    def summary(self) -> dict[str, float]:
        if self._n == 0:
            return {"count": 0}
        data = self._buf[: min(self._n, self._cap)]
        return {
            "count": self._n,
            "p50_ms": float(np.percentile(data, 50)),
            "p90_ms": float(np.percentile(data, 90)),
            "p99_ms": float(np.percentile(data, 99)),
            "mean_ms": float(data.mean()),
            "max_ms": float(data.max()),
        }


class PerceptionServer:
    """Lifecycle-managed frame->detections server over an AOT artifact."""

    def __init__(
        self,
        artifact_dir: str | Path,
        expected_input: int = 640,
        expected_classes: int = 4,
        log_fn: Callable[[str], None] = print,
        warn_throttle_s: float = 5.0,
    ) -> None:
        self.artifact_dir = Path(artifact_dir)
        self.expected_input = expected_input
        self.expected_classes = expected_classes
        self.state = LifecycleState.UNCONFIGURED
        self.artifact: ServingArtifact | None = None
        self.latency = LatencyHistogram()
        self.frames_processed = 0
        self.frames_dropped = 0
        self._log = log_fn
        self._warn_throttle_s = warn_throttle_s
        self._last_warn = 0.0

    # ---- lifecycle transitions (perception_node.cpp:409-539) ----

    def configure(self) -> None:
        if self.state != LifecycleState.UNCONFIGURED:
            raise RuntimeError(f"configure() in state {self.state}")
        self.artifact = ServingArtifact(self.artifact_dir)
        validate_artifact_shapes(self.artifact, self.expected_input,
                                 self.expected_classes)
        # warm: compile for the local chip so activate->first-frame is fast
        dummy = np.zeros((self.expected_input, self.expected_input, 3),
                         np.uint8)
        jax.block_until_ready(self.artifact(dummy))
        self.state = LifecycleState.INACTIVE
        self._log(f"configured: {self.artifact.config}")

    def activate(self) -> None:
        if self.state != LifecycleState.INACTIVE:
            raise RuntimeError(f"activate() in state {self.state}")
        self.state = LifecycleState.ACTIVE
        self._log("activated")

    def deactivate(self) -> None:
        if self.state == LifecycleState.ACTIVE:
            self.state = LifecycleState.INACTIVE
            self._log("deactivated")

    def cleanup(self) -> None:
        self.artifact = None
        self.state = LifecycleState.UNCONFIGURED

    def shutdown(self) -> None:
        self.artifact = None
        self.state = LifecycleState.FINALIZED
        self._log(f"shutdown; latency {self.latency.summary()}")

    # ---- frame path (perception_node.cpp:551-688) ----

    def _warn(self, msg: str) -> None:
        now = time.monotonic()
        if now - self._last_warn > self._warn_throttle_s:
            self._log(f"WARNING: {msg}")
            self._last_warn = now

    def process_frame(self, frame: np.ndarray):
        """(S, S, 3) RGB uint8 -> dict with boxes/scores/classes or None.

        Returns None (frame dropped) when inactive or the frame fails
        validation — per-frame guards never raise.
        """
        if self.state != LifecycleState.ACTIVE:
            self._warn(f"frame while {self.state.value}; dropping")
            self.frames_dropped += 1
            return None
        s = self.expected_input
        if frame is None or frame.shape != (s, s, 3) or \
                frame.dtype != np.uint8:
            self._warn(f"bad frame geometry "
                       f"{None if frame is None else frame.shape}; dropping")
            self.frames_dropped += 1
            return None

        t0 = time.perf_counter()
        boxes, scores, classes, valid = jax.device_get(self.artifact(frame))
        self.latency.record((time.perf_counter() - t0) * 1e3)
        self.frames_processed += 1

        keep = np.asarray(valid)
        return {
            "boxes": np.asarray(boxes)[keep],
            "scores": np.asarray(scores)[keep],
            "classes": np.asarray(classes)[keep],
            "count": int(keep.sum()),
        }

    def stats(self) -> dict:
        return {
            "state": self.state.value,
            "frames_processed": self.frames_processed,
            "frames_dropped": self.frames_dropped,
            **self.latency.summary(),
        }
