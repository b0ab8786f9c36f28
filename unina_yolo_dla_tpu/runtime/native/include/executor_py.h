#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "executor.h"

namespace unina {

// Inference executor over the AOT serving artifact (embedded CPython).
// The portable fallback: works on any backend JAX can reach (CPU / the
// axon relay), at the cost of a per-frame Python round-trip. The
// production path is PjrtExecutor (executor_pjrt.h).
class PyExecutor : public Executor {
 public:
  PyExecutor(const std::string& artifact_dir, int input_size,
             int num_classes);
  ~PyExecutor() override;
  PyExecutor(const PyExecutor&) = delete;
  PyExecutor& operator=(const PyExecutor&) = delete;

  // Frame bytes (from the shm ring) -> compacted detections.
  // channels: 3 = RGB, 4 = BGRA, 0 = NV12 planar (w*h*3/2 bytes).
  InferStatus infer(const uint8_t* frame, int width, int height,
                    int channels, std::vector<Detection>* out) override;

 private:
  struct Impl;
  Impl* impl_;
};

}  // namespace unina
