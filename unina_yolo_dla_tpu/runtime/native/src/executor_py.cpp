// Embedded-CPython executor: drives the AOT serving artifact from C++.
//
// The reference's native node owns a TensorRT engine (TensorRTEngine RAII
// wrapper, perception_node.cpp:223-351); here the engine analogue is the
// jax.export artifact, executed through an embedded interpreter. The hot
// path hands the interpreter a ZERO-COPY memoryview of the shared-memory
// frame slot; only the packed ~1 KB detection blob comes back.
//
// (A direct PJRT-C-API executor — loading libtpu.so and feeding the
// serialized StableHLO without Python — is the drop-in next step: this
// file isolates the executor behind Executor so only this translation
// unit changes.)
#include "executor_py.h"

#include <Python.h>

#include <stdexcept>
#include <string>

namespace unina {

struct PyExecutor::Impl {
  PyObject* execute_fn = nullptr;
};

PyExecutor::PyExecutor(const std::string& artifact_dir, int input_size,
                       int num_classes)
    : impl_(new Impl) {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
  }
  PyGILState_STATE gil = PyGILState_Ensure();

  PyObject* mod = PyImport_ImportModule("unina_yolo_dla_tpu.runtime.embed");
  if (!mod) {
    PyErr_Print();
    PyGILState_Release(gil);
    throw std::runtime_error("cannot import unina_yolo_dla_tpu.runtime.embed");
  }
  PyObject* make = PyObject_GetAttrString(mod, "make_executor");
  Py_DECREF(mod);
  PyObject* args = Py_BuildValue("(sii)", artifact_dir.c_str(), input_size,
                                 num_classes);
  impl_->execute_fn = PyObject_CallObject(make, args);
  Py_DECREF(args);
  Py_DECREF(make);
  if (!impl_->execute_fn) {
    PyErr_Print();
    PyGILState_Release(gil);
    throw std::runtime_error("make_executor() failed (bad artifact?)");
  }
  PyGILState_Release(gil);
}

PyExecutor::~PyExecutor() {
  if (impl_->execute_fn) {
    PyGILState_STATE gil = PyGILState_Ensure();
    Py_DECREF(impl_->execute_fn);
    PyGILState_Release(gil);
  }
  delete impl_;
}

InferStatus PyExecutor::infer(const uint8_t* frame, int width, int height,
                              int channels, std::vector<Detection>* out) {
  PyGILState_STATE gil = PyGILState_Ensure();

  // channels == 0 is the NV12-planar sentinel (frame_ring.hpp): the
  // payload is w*h luma + w*h/2 interleaved chroma, not w*h*channels.
  Py_ssize_t nbytes =
      channels == 0
          ? static_cast<Py_ssize_t>(width) * height * 3 / 2
          : static_cast<Py_ssize_t>(width) * height * channels;
  // zero-copy view of the shm slot
  PyObject* view = PyMemoryView_FromMemory(
      reinterpret_cast<char*>(const_cast<uint8_t*>(frame)), nbytes,
      PyBUF_READ);
  PyObject* result = PyObject_CallFunction(impl_->execute_fn, "Oiii", view,
                                           width, height, channels);
  Py_DECREF(view);

  out->clear();
  if (!result) {
    PyErr_Print();
    PyGILState_Release(gil);
    throw std::runtime_error("executor call failed");
  }
  InferStatus status = InferStatus::kOk;
  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(result, &buf, &len) == 0 &&
      len >= static_cast<Py_ssize_t>(sizeof(uint32_t))) {
    uint32_t count;
    std::memcpy(&count, buf, sizeof(count));
    if (count == 0xFFFFFFFFu) {
      status = InferStatus::kGeometryError;
    } else {
      size_t need = sizeof(uint32_t) + size_t(count) * sizeof(Detection);
      if (static_cast<size_t>(len) >= need) {
        out->resize(count);
        std::memcpy(out->data(), buf + sizeof(uint32_t),
                    count * sizeof(Detection));
      }
    }
  }
  Py_DECREF(result);
  PyGILState_Release(gil);
  return status;
}

}  // namespace unina
