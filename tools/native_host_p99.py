"""Measured p99 from the native host on the live TPU (VERDICT r4 #5).

BASELINE.md's north-star is p99 < 15 ms frame-to-boxes. This drives the
no-Python path — ring_tool producer -> shm ring -> perception_host
--executor pjrt (PJRT C API, serving_baked.stablehlo) -> detections shm
— for a few thousand frames on the live chip and commits the host's own
shutdown histogram (p50/p90/p99/fps, native/include/latency.hpp;
reference parity: perception_node.cpp:684-688 latency logging).

Physics note the artifact records explicitly: this box reaches its TPU
through the axon relay, which adds ~2 RTTs (~45-65 ms, long-period
variable) to EVERY dispatch — a tunnel artifact, not pipeline cost. The
tool therefore also measures the relay floor with a null on-device
program dispatched the same way and reports
``derived_on_chip_ms = p50 - null_floor_p50`` alongside the raw
percentiles: the sub-15 ms claim is assessed against what the pipeline
adds over the transport floor, which is what an on-prem deployment
(no tunnel) would see.

Run:  python tools/native_host_p99.py [max_frames]
Writes artifacts/native_host_latency_r5.json.
Ordering (learned r2): producer FIRST with enough frames to outlast the
30-60 s PJRT configure; host ~2 s later; never SIGKILL the host
mid-configure (relay wedge).
"""
import json
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_ARGS = [a for a in sys.argv[1:] if a.isdigit()]
MAX_FRAMES = int(_ARGS[0]) if _ARGS else 3000
# Producer rate: must sit just ABOVE the host's drain rate so the host
# is always busy but the producer's frame budget outlasts the run. The
# first attempt used 250 fps: through the relay the host drains at
# ~25 fps, so the 12k-frame budget burned in 48 s and only 77 frames
# were processed before end-of-stream. 30 fps keeps the ring non-empty
# (measured drain ~25 fps) for 3000+ processed frames.
FPS = int(_ARGS[1]) if len(_ARGS) > 1 else 30
B = REPO / "unina_yolo_dla_tpu" / "runtime" / "native" / "build"
ARTIFACT = REPO / "artifacts" / "serving_artifact"
RING = "/dev/shm/unina_p99_frames"
DETS = "/dev/shm/unina_p99_dets"
OUT = REPO / "artifacts" / "native_host_latency_r5.json"

SHUTDOWN_RE = re.compile(
    r"frames=(\d+) dropped=(\d+) \(torn=(\d+) geom=(\d+)\) "
    r"p50=([\d.]+)ms p90=([\d.]+)ms p99=([\d.]+)ms fps=([\d.]+) "
    r"pipeline=(\d+)")


def measure_null_floor_subprocess(n: int = 60) -> dict:
    """``measure_null_floor`` in a child process that EXITS, releasing
    the relay claim — required for a floor measured BEFORE the host run
    (a live in-process jax client would collide with the host's PJRT
    configure; sessions on this relay are exclusive)."""
    out = subprocess.run(
        [sys.executable, __file__, "--null-floor", str(n)],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO))
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        return json.loads(line)
    except Exception:
        sys.stderr.write(out.stderr[-800:])
        return {"error": f"floor subprocess rc={out.returncode}"}


def measure_null_floor(n: int = 60) -> dict:
    """Round-trip floor of the relay transport: a trivial jitted program
    (uint8 (640,640,3) in -> scalar out) dispatched + fetched n times.
    The median is the per-dispatch cost the tunnel imposes on ANY
    executor; salted args defeat relay memoization (bench.py lesson)."""
    import jax

    # persistent compile cache (bench.py's): without it the remote
    # compile of even this trivial program costs ~10 min/run via relay
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(REPO / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def null(x, s):
        return (x[0, 0, 0].astype(jnp.int32) + s).astype(jnp.float32)

    x = jnp.zeros((640, 640, 3), jnp.uint8)
    float(null(x, jnp.int32(0)))  # compile
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(null(x, jnp.int32(i + 1)))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = sorted(ts)
    return {"p50_ms": round(ts[len(ts) // 2], 2),
            "min_ms": round(ts[0], 2),
            "p90_ms": round(ts[int(len(ts) * 0.9)], 2),
            "n": n}


def main() -> None:
    # enough producer frames to outlast configure (allow 5 min) + run
    # floor BEFORE the run (own process; claim released at its exit):
    # the relay's per-dispatch cost swings tens of ms over minutes, so a
    # floor measured only after the run can misstate the transport the
    # host actually saw (observed: derived p50 6.3 ms vs 33.6 ms for
    # the same pipeline in two sessions). Report both sides.
    print("measuring relay null floor (pre)...", flush=True)
    floor_pre = measure_null_floor_subprocess()
    total_frames = MAX_FRAMES + 5 * 60 * FPS
    producer = subprocess.Popen(
        [str(B / "ring_tool"), "produce", "--ring", RING,
         "--width", "640", "--height", "640",
         "--frames", str(total_frames), "--fps", str(FPS)])
    time.sleep(2)
    t0 = time.time()
    host = subprocess.run(
        [str(B / "perception_host"), "--artifact", str(ARTIFACT),
         "--ring", RING, "--out", DETS, "--input", "640",
         "--classes", "4", "--executor", "pjrt",
         "--max-frames", str(MAX_FRAMES)],
        capture_output=True, text=True, timeout=3600)
    wall = time.time() - t0
    producer.terminate()
    producer.wait(timeout=30)
    sys.stderr.write(host.stderr[-2000:])
    m = SHUTDOWN_RE.search(host.stderr)
    if not m:
        raise SystemExit(f"no shutdown line (rc={host.returncode})")
    frames, dropped, torn, geom = (int(m.group(i)) for i in range(1, 5))
    p50, p90, p99, fps = (float(m.group(i)) for i in range(5, 9))

    print("measuring relay null floor (post)...", flush=True)
    floor = measure_null_floor()
    floors = [f["p50_ms"] for f in (floor_pre, floor) if "p50_ms" in f]
    # the transport the host saw lies between the two bracketing floors;
    # use the HIGHER one so the derived pipeline cost is conservative
    # (never flattered by a floor measured in a faster relay moment)
    floor_hi = max(floors) if floors else float("nan")

    out = {
        "executor": "pjrt (no-Python native host)",
        "artifact": "artifacts/serving_artifact",
        "frames": frames, "dropped": dropped,
        "p50_ms": p50, "p90_ms": p90, "p99_ms": p99, "fps": fps,
        "jitter_p99_minus_p50_ms": round(p99 - p50, 3),
        "pipeline_depth": int(m.group(9)),
        # producer pacing: BELOW the host drain rate = per-frame latency
        # (ring never queues); above = saturated-throughput mode whose
        # percentiles include ring wait (see native_host_saturated_r5)
        "producer_fps": FPS,
        "wall_s": round(wall, 1),
        "relay_null_floor_pre": floor_pre,
        "relay_null_floor_post": floor,
        "derived_on_chip_p50_ms": round(p50 - floor_hi, 2),
        "derived_on_chip_p99_ms": round(p99 - floor_hi, 2),
        "note": ("raw percentiles include the axon relay transport "
                 "(~2 RTT/frame; bracketed by relay_null_floor_pre/"
                 "_post via the same tunnel — the relay swings tens of "
                 "ms over minutes, so both sides are measured and the "
                 "HIGHER floor is subtracted). derived_on_chip_* is the "
                 "conservative pipeline cost vs the 15 ms BASELINE.md "
                 "target"),
    }
    OUT.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    if "--null-floor" in sys.argv:
        # child mode (measure_null_floor_subprocess): print ONE JSON line
        print(json.dumps(measure_null_floor(
            int(_ARGS[0]) if _ARGS else 60)))
    else:
        main()
