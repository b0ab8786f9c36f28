#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "frame_ring.hpp"

namespace unina {

// Outcome of a single-frame inference call. kGeometryError is the
// executor-side shape-mismatch sentinel (embed.py returns 0xFFFFFFFF) —
// distinct from a legitimate zero-detection frame so the host can count
// it as a drop instead of publishing an empty result.
enum class InferStatus { kOk, kGeometryError };

// Inference executor over the AOT serving artifact (embedded CPython).
class PyExecutor {
 public:
  PyExecutor(const std::string& artifact_dir, int input_size,
             int num_classes);
  ~PyExecutor();
  PyExecutor(const PyExecutor&) = delete;
  PyExecutor& operator=(const PyExecutor&) = delete;

  // Frame bytes (from the shm ring) -> compacted detections.
  // channels: 3 = RGB, 4 = BGRA, 0 = NV12 planar (w*h*3/2 bytes).
  InferStatus infer(const uint8_t* frame, int width, int height,
                    int channels, std::vector<Detection>* out);

 private:
  struct Impl;
  Impl* impl_;
};

}  // namespace unina
