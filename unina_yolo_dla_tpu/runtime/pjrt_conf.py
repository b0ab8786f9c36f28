"""PJRT plugin configuration for the native (no-Python) executor.

The C++ host (runtime/native/src/executor_pjrt.cpp) drives the chip
through the PJRT C API: dlopen a plugin .so, GetPjrtApi(), create a
client with named-value options, compile ``serving_baked.stablehlo``.
Which .so and which options are environment-specific, so the export step
writes them into the artifact as ``pjrt_plugin.conf`` — a flat
``key=value`` file (no JSON parser needed in C):

    library=/opt/axon/libaxon_pjrt.so
    i64.max_detections=1024
    str.topology=v5e:1x1x1          # client-create option (string)
    i64.remote_compile=1            # client-create option (int64)
    str.session_id=auto             # 'auto' -> minted per process in C++

Known plugin environments, in probe order:
- axon relay (this container): /opt/axon/libaxon_pjrt.so with the same
  options the sitecustomize registration passes.
- real TPU VM: libtpu.so from the libtpu wheel, no options required.
The host can override the conf path with UNINA_PJRT_CONF.
"""
from __future__ import annotations

import os
from pathlib import Path

AXON_SO = "/opt/axon/libaxon_pjrt.so"


def _libtpu_path() -> str | None:
    try:
        import libtpu

        p = Path(libtpu.__file__).parent / "libtpu.so"
        return str(p) if p.exists() else None
    except ImportError:
        return None


def pjrt_plugin_settings() -> tuple[str, dict[str, object]] | None:
    """(library path, client-create options) for this environment, or
    None when no known PJRT plugin is available (e.g. CPU-only CI —
    jaxlib ships no standalone CPU plugin .so)."""
    if os.path.exists(os.environ.get("AXON_SO_PATH", AXON_SO)):
        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
        rc = os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
        # mirror of the sitecustomize registration
        # (axon/register/pjrt.py:_register_backend): pool mode with a
        # per-process session id; rank sentinel = monoclient.
        return os.environ.get("AXON_SO_PATH", AXON_SO), {
            "remote_compile": 1 if rc else 0,
            "local_only": 0,
            "priority": 0,
            "topology": f"{gen}:1x1x1",
            "n_slices": 1,
            "session_id": "auto",
            "rank": 4294967295,
        }
    tpu = _libtpu_path()
    if tpu:
        return tpu, {}
    return None


def write_pjrt_conf(artifact_dir: str | Path, max_detections: int,
                    camera: tuple[int, int, str] | None = None,
                    batch: int | None = None,
                    s2d_host: bool = False,
                    s2d_merged: bool = False) -> None:
    """``camera=(h, w, format)`` exports add input-spec keys so the native
    executor uploads raw camera frames (convert+resize runs on-chip).
    ``s2d_host`` exports tell the executor to stage frames space-to-depth
    blocked (S/2, S/2, 12) — the shuffle fuses into the staging pass.
    ``s2d_merged`` exports stage the SAME bytes but upload them as
    (S/2, S/4, 24) — adjacent column pairs merged into lanes (the fused-
    stage1 engine's input contract); zero extra host work."""
    # "in." keys describe the program's input tensor (read by the C++
    # executor); "str."/"i64." keys become PJRT client-create options.
    lines = [f"i64.max_detections={max_detections}"]
    if camera is not None:
        lines += [f"in.format={camera[2]}",
                  f"in.height={camera[0]}",
                  f"in.width={camera[1]}"]
    if batch is not None:
        lines.append(f"in.batch={batch}")
    if s2d_merged:
        lines.append("in.layout=s2dm")
    elif s2d_host:
        lines.append("in.layout=s2d")
    settings = pjrt_plugin_settings()
    if settings is None:
        lines.insert(0, "library=")
    else:
        lib, options = settings
        lines.insert(0, f"library={lib}")
        for k, v in options.items():
            tag = "i64" if isinstance(v, int) else "str"
            lines.append(f"{tag}.{k}={v}")
    (Path(artifact_dir) / "pjrt_plugin.conf").write_text(
        "\n".join(lines) + "\n")
