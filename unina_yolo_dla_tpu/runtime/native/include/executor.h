#pragma once

#include <cstdint>
#include <vector>

#include "frame_ring.hpp"

namespace unina {

// Outcome of a single-frame inference call. kGeometryError is the
// shape-mismatch sentinel — distinct from a legitimate zero-detection
// frame so the host can count it as a drop instead of publishing an
// empty result.
enum class InferStatus { kOk, kGeometryError };

// Engine abstraction the host drives (the TensorRTEngine-wrapper role,
// reference perception_node.cpp:223-351). Implementations:
//  - PyExecutor   (executor_py.cpp):   embedded CPython over the
//                                      jax.export artifact
//  - PjrtExecutor (executor_pjrt.cpp): PJRT C API over the weights-baked
//                                      StableHLO — no Python in the loop
class Executor {
 public:
  virtual ~Executor() = default;

  // Frame bytes (from the shm ring) -> compacted detections.
  // channels: 3 = RGB, 4 = BGRA, 0 = NV12 planar (w*h*3/2 bytes).
  virtual InferStatus infer(const uint8_t* frame, int width, int height,
                            int channels, std::vector<Detection>* out) = 0;
};

}  // namespace unina
