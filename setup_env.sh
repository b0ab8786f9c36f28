#!/usr/bin/env bash
# Environment check + optional editable install — the setup_env.sh
# equivalent. The TPU stack needs no NGC indexes or vendor wheels: jax,
# flax and optax are the whole compute dependency set.
set -euo pipefail
cd "$(dirname "$0")"

echo ">>> checking python environment"
python - <<'EOF'
import importlib, sys
required = ["jax", "flax", "optax", "numpy", "yaml"]
optional = ["cv2", "sklearn", "PIL", "pytest"]
missing = [m for m in required if importlib.util.find_spec(m) is None]
if missing:
    sys.exit(f"FATAL: missing required packages: {missing}")
for m in optional:
    if importlib.util.find_spec(m) is None:
        print(f"  note: optional package '{m}' not found "
              "(data tooling / tests may be limited)")
import jax
print(f"  jax {jax.__version__}; default backend: {jax.default_backend()}")
print(f"  devices: {jax.devices()}")
EOF

if [[ "${1:-}" == "--install" ]]; then
  echo ">>> installing package (editable)"
  pip install -e .
fi

if command -v cmake >/dev/null && command -v ninja >/dev/null; then
  echo ">>> building native perception host"
  cmake -S unina_yolo_dla_tpu/runtime/native \
        -B unina_yolo_dla_tpu/runtime/native/build -G Ninja >/dev/null
  cmake --build unina_yolo_dla_tpu/runtime/native/build >/dev/null
  echo "  built: unina_yolo_dla_tpu/runtime/native/build/perception_host"
else
  echo "  note: cmake/ninja not found; skipping native host build"
fi

echo ">>> environment OK"
