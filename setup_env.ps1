# Environment check + optional editable install (PowerShell twin of
# setup_env.sh; reference role: setup_env.ps1). The TPU stack needs no
# NGC indexes or vendor wheels: jax, flax and optax are the whole
# compute dependency set.
param(
    [switch]$Install
)

$ErrorActionPreference = "Stop"
Set-Location (Split-Path -Parent $MyInvocation.MyCommand.Path)

Write-Host ">>> checking python environment"
@"
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
"@ | python -
if ($LASTEXITCODE -ne 0) { exit 1 }

if ($Install) {
    Write-Host ">>> installing package (editable)"
    pip install -e .
    if ($LASTEXITCODE -ne 0) { exit 1 }
}

$cmake = Get-Command cmake -ErrorAction SilentlyContinue
$ninja = Get-Command ninja -ErrorAction SilentlyContinue
if ($cmake -and $ninja) {
    Write-Host ">>> building native perception host"
    cmake -S unina_yolo_dla_tpu/runtime/native `
          -B unina_yolo_dla_tpu/runtime/native/build -G Ninja | Out-Null
    cmake --build unina_yolo_dla_tpu/runtime/native/build | Out-Null
    Write-Host "  built: unina_yolo_dla_tpu/runtime/native/build/perception_host"
}
else {
    Write-Host "  note: cmake/ninja not found; skipping native host build"
}

Write-Host ">>> environment OK"
