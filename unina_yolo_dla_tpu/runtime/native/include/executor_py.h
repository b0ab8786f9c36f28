#pragma once

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "frame_ring.hpp"

namespace unina {

// Inference executor over the AOT serving artifact (embedded CPython).
class PyExecutor {
 public:
  PyExecutor(const std::string& artifact_dir, int input_size,
             int num_classes);
  ~PyExecutor();
  PyExecutor(const PyExecutor&) = delete;
  PyExecutor& operator=(const PyExecutor&) = delete;

  // Frame bytes (zero-copy from the shm ring) -> compacted detections.
  std::vector<Detection> infer(const uint8_t* frame, int width, int height,
                               int channels);

 private:
  struct Impl;
  Impl* impl_;
};

}  // namespace unina
