"""UNINA-YOLO-DLA-TPU: a TPU-native rebuild of the UNINA-YOLO-DLA perception stack.

A complete JAX/XLA/Pallas framework for Formula Student Driverless cone
detection, re-designed TPU-first:

- ``models``   — pure Flax model library (ReLU-only CSP-Darknet, P2/P3/P4).
- ``ops``      — preprocess / decode / NMS: jnp reference oracles + Pallas kernels.
- ``train``    — two-phase (FP32 -> QAT) training: TAL assigner, losses, EMA,
                 conformal-prediction calibration.
- ``quant``    — int8 fake-quant QAT + entropy (KL) calibration (replaces
                 pytorch-quantization and the TensorRT entropy calibrator).
- ``parallel`` — mesh / data-parallel training via shard_map over ICI.
- ``data``     — YOLO-txt datasets, letterbox, mosaic/copy-paste augmentation,
                 weighted (active-learning) sampling, synthetic FSD generator.
- ``curation`` — active learning (entropy/loc-var, coreset), mining, auto-label.
- ``runtime``  — AOT-compiled streaming inference (the TensorRT-engine + ROS-node
                 equivalent): lifecycle states, double-buffered host loop,
                 ~1 KB device->host per frame.
- ``metrics``  — mAP50/50-95 + small-object P/R/F1.

Reference parity: raider99k/UNINA-YOLO-DLA (see SURVEY.md).
"""

__version__ = "0.1.0"
