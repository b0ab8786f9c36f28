// PJRT-C-API executor: the no-Python hot path.
//
// Configure time (the engine-deserialisation analogue,
// perception_node.cpp:430-437):
//   1. parse <artifact>/pjrt_plugin.conf  (library path, client options)
//   2. dlopen the plugin, GetPjrtApi(), PJRT_Plugin_Initialize
//   3. PJRT_Client_Create with the conf's named-value options
//   4. PJRT_Client_Compile(serving_baked.stablehlo, compile_options.pb)
//      — the weights are constants inside the module, so the executable
//      takes exactly ONE argument: the (S,S,3) uint8 RGB frame.
//
// Per frame (the enqueueV3 analogue, :598-688): host->device of the
// frame, execute, four device->host reads (boxes/scores/classes/valid,
// ~26 KB at K=1024), pack valid rows as unina::Detection. BGRA and NV12
// frames are converted to RGB on the host first (the same conversions
// embed.py applies). For raw camera streams, `export --camera HxW
// --format bgra|nv12` ships the on-chip convert+letterbox path instead
// (shipped in r3; runtime/pipeline.py:151-197) — this host conversion
// remains for pre-converted RGB deployments.
#include "executor_pjrt.h"

#include <dlfcn.h>
#include <unistd.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <fstream>
#include <map>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

#include "pjrt_c_api.h"  // vendored OpenXLA header (third_party/)

namespace unina {
namespace {

std::string slurp(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

struct PluginConf {
  std::string library;
  int64_t max_detections = 1024;
  // input tensor spec ("in." keys): camera-path artifacts take raw
  // BGRA/NV12/RGB at camera resolution, convert+resize runs on-chip
  std::string input_format = "rgb";
  int in_height = 0, in_width = 0;  // 0 -> model input_size square
  bool s2d = false;  // in.layout=s2d: stage frames space-to-depth blocked
  // in.layout=s2dm: same staged bytes, uploaded as (S/2, S/4, 24) —
  // adjacent column pairs merged into lanes (fused-stage1 engine)
  bool s2d_merged = false;
  std::vector<std::pair<std::string, std::string>> str_opts;
  std::vector<std::pair<std::string, int64_t>> i64_opts;
};

PluginConf parse_conf(const std::string& path) {
  PluginConf c;
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot read " + path);
  std::string line;
  while (std::getline(f, line)) {
    auto hash = line.find('#');
    if (hash != std::string::npos) line.resize(hash);
    auto eq = line.find('=');
    if (eq == std::string::npos) continue;
    std::string key = line.substr(0, eq), val = line.substr(eq + 1);
    if (key == "library") {
      c.library = val;
    } else if (key == "i64.max_detections") {
      c.max_detections = std::atoll(val.c_str());
    } else if (key == "in.format") {
      c.input_format = val;
    } else if (key == "in.height") {
      c.in_height = std::atoi(val.c_str());
    } else if (key == "in.width") {
      c.in_width = std::atoi(val.c_str());
    } else if (key == "in.layout") {
      c.s2d = (val == "s2d" || val == "s2dm");
      c.s2d_merged = (val == "s2dm");
    } else if (key.rfind("in.", 0) == 0) {
      // other input-spec keys (e.g. in.batch) are not client options
    } else if (key.rfind("str.", 0) == 0) {
      c.str_opts.emplace_back(key.substr(4), val);
    } else if (key.rfind("i64.", 0) == 0) {
      c.i64_opts.emplace_back(key.substr(4), std::atoll(val.c_str()));
    }
  }
  return c;
}

// BT.601 limited-range NV12 -> RGB (parity with ops/preprocess.py's
// nv12_to_rgb and cuda_preprocess.cu:212-253).
void nv12_to_rgb(const uint8_t* src, int w, int h, uint8_t* dst) {
  const uint8_t* yp = src;
  const uint8_t* uv = src + static_cast<size_t>(w) * h;
  for (int r = 0; r < h; ++r) {
    for (int col = 0; col < w; ++col) {
      float y = 1.164f * (static_cast<float>(yp[r * w + col]) - 16.0f);
      const uint8_t* c = uv + (r / 2) * w + (col / 2) * 2;
      float u = static_cast<float>(c[0]) - 128.0f;
      float v = static_cast<float>(c[1]) - 128.0f;
      auto clamp = [](float x) {
        return static_cast<uint8_t>(x < 0 ? 0 : (x > 255 ? 255 : x + 0.5f));
      };
      uint8_t* o = dst + (static_cast<size_t>(r) * w + col) * 3;
      o[0] = clamp(y + 1.596f * v);
      o[1] = clamp(y - 0.392f * u - 0.813f * v);
      o[2] = clamp(y + 2.017f * u);
    }
  }
}

}  // namespace

struct PjrtExecutor::Impl {
  void* dl = nullptr;
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  PJRT_LoadedExecutable* exe = nullptr;
  int input_size = 0;
  int64_t max_detections = 1024;
  // program input spec (conf "in." keys): camera artifacts consume raw
  // frames, so expected geometry/format comes from the artifact
  std::string input_format = "rgb";
  int exp_w = 0, exp_h = 0;   // expected ring-frame geometry
  bool camera = false;        // raw upload (no host conversion)
  bool relay_plugin = false;  // network-relay transport (axon tunnel)
  bool s2d = false;           // stage frames space-to-depth blocked
  bool s2d_merged = false;    // upload the staged bytes as (S/2,S/4,24)
  std::vector<uint8_t> rgb_tmp;  // BGRA/NV12 -> RGB scratch before s2d
  // double-buffered host staging (one per pipeline slot): the frame is
  // converted/copied here at submit so the bytes stay valid until the
  // async h2d completes — the caller's buffer is reusable immediately
  std::vector<uint8_t> staging[2];
  int next_slot = 0;
  // preallocated packed-output read buffer (K x 7 f32), reused per frame
  // (the reference allocates its buffers once at configure,
  // perception_node.cpp:471-484)
  std::vector<float> packed;

  // one in-flight pipeline stage: input buffer + its h2d-done event are
  // released at collect (after d2h, when the transfer has long finished)
  struct Inflight {
    PJRT_Buffer* input = nullptr;
    PJRT_Event* h2d_done = nullptr;
    PJRT_Buffer* output = nullptr;
  };
  std::deque<Inflight> inflight;

  void check(PJRT_Error* e, const char* what) {
    if (!e) return;
    PJRT_Error_Message_Args m{PJRT_Error_Message_Args_STRUCT_SIZE, nullptr,
                              e};
    api->PJRT_Error_Message(&m);
    std::string msg(m.message, m.message_size);
    PJRT_Error_Destroy_Args d{PJRT_Error_Destroy_Args_STRUCT_SIZE, nullptr,
                              e};
    api->PJRT_Error_Destroy(&d);
    throw std::runtime_error(std::string("PJRT ") + what + ": " + msg);
  }

  void await(PJRT_Event* ev, const char* what) {
    PJRT_Event_Await_Args a{PJRT_Event_Await_Args_STRUCT_SIZE, nullptr, ev};
    PJRT_Error* err = api->PJRT_Event_Await(&a);
    PJRT_Event_Destroy_Args d{PJRT_Event_Destroy_Args_STRUCT_SIZE, nullptr,
                              ev};
    api->PJRT_Event_Destroy(&d);
    check(err, what);
  }

  void destroy_buffer(PJRT_Buffer* b) {
    if (!b) return;
    PJRT_Buffer_Destroy_Args d{PJRT_Buffer_Destroy_Args_STRUCT_SIZE, nullptr,
                               b};
    api->PJRT_Buffer_Destroy(&d);
  }

  // device buffer -> host bytes (ToHostBuffer: size query, copy, await)
  void to_host(PJRT_Buffer* src, void* dst, size_t dst_size,
               const char* what) {
    PJRT_Buffer_ToHostBuffer_Args th{
        PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE, nullptr};
    th.src = src;
    th.dst = dst;
    th.dst_size = dst_size;
    check(api->PJRT_Buffer_ToHostBuffer(&th), what);
    await(th.event, what);
  }
};

PjrtExecutor::PjrtExecutor(const std::string& artifact_dir, int input_size,
                           int num_classes)
    : impl_(new Impl) {
  (void)num_classes;  // class count is baked into the program
  impl_->input_size = input_size;

  const char* conf_env = std::getenv("UNINA_PJRT_CONF");
  PluginConf conf = parse_conf(conf_env ? conf_env
                                        : artifact_dir + "/pjrt_plugin.conf");
  if (conf.library.empty()) {
    throw std::runtime_error(
        "pjrt_plugin.conf has no plugin library for this environment "
        "(re-export the artifact where a PJRT plugin is available, or "
        "point UNINA_PJRT_CONF at a conf with library=...)");
  }
  impl_->max_detections = conf.max_detections;
  impl_->input_format = conf.input_format;
  impl_->relay_plugin = conf.library.find("axon") != std::string::npos;
  impl_->s2d = conf.s2d;
  impl_->s2d_merged = conf.s2d_merged;
  impl_->camera = conf.in_height > 0 && conf.in_width > 0;
  impl_->exp_h = impl_->camera ? conf.in_height : input_size;
  impl_->exp_w = impl_->camera ? conf.in_width : input_size;

  // the axon relay plugin resolves its terminal through this env var
  // (mirror of the sitecustomize boot line)
  if (std::getenv("PALLAS_AXON_POOL_IPS") &&
      !std::getenv("AXON_POOL_SVC_OVERRIDE")) {
    ::setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", 0);
  }

  impl_->dl = ::dlopen(conf.library.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!impl_->dl) {
    throw std::runtime_error(std::string("dlopen failed: ") + ::dlerror());
  }
  auto get_api =
      reinterpret_cast<const PJRT_Api* (*)()>(::dlsym(impl_->dl,
                                                      "GetPjrtApi"));
  if (!get_api) {
    throw std::runtime_error(std::string("no GetPjrtApi in ") + conf.library);
  }
  impl_->api = get_api();
  const PJRT_Api* api = impl_->api;

  PJRT_Plugin_Initialize_Args init{PJRT_Plugin_Initialize_Args_STRUCT_SIZE,
                                   nullptr};
  impl_->check(api->PJRT_Plugin_Initialize(&init), "plugin init");

  // client-create options from the conf; session_id=auto -> per-process id
  char session[64];
  std::snprintf(session, sizeof session, "unina-host-%d",
                static_cast<int>(::getpid()));
  std::vector<PJRT_NamedValue> opts;
  for (auto& [k, v] : conf.str_opts) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof nv);
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = k.c_str();
    nv.name_size = k.size();
    nv.type = PJRT_NamedValue_kString;
    const char* val = (k == "session_id" && v == "auto") ? session
                                                         : v.c_str();
    nv.string_value = val;
    nv.value_size = std::strlen(val);
    opts.push_back(nv);
  }
  for (auto& [k, v] : conf.i64_opts) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof nv);
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = k.c_str();
    nv.name_size = k.size();
    nv.type = PJRT_NamedValue_kInt64;
    nv.int64_value = v;
    nv.value_size = 1;
    opts.push_back(nv);
  }

  PJRT_Client_Create_Args cc{PJRT_Client_Create_Args_STRUCT_SIZE, nullptr};
  cc.create_options = opts.data();
  cc.num_options = opts.size();
  impl_->check(api->PJRT_Client_Create(&cc), "client create");
  impl_->client = cc.client;

  PJRT_Client_AddressableDevices_Args ad{
      PJRT_Client_AddressableDevices_Args_STRUCT_SIZE, nullptr,
      impl_->client};
  impl_->check(api->PJRT_Client_AddressableDevices(&ad), "devices");
  if (ad.num_addressable_devices == 0) {
    throw std::runtime_error("PJRT client has no addressable devices");
  }
  impl_->device = ad.addressable_devices[0];

  // compile the weights-baked program (warm "engine build")
  std::string mlir = slurp(artifact_dir + "/serving_baked.stablehlo");
  std::string copts = slurp(artifact_dir + "/compile_options.pb");
  PJRT_Program prog{PJRT_Program_STRUCT_SIZE, nullptr};
  prog.code = mlir.data();
  prog.code_size = mlir.size();
  static const char kFmt[] = "mlir";
  prog.format = kFmt;
  prog.format_size = sizeof(kFmt) - 1;
  PJRT_Client_Compile_Args comp{PJRT_Client_Compile_Args_STRUCT_SIZE,
                                nullptr};
  comp.client = impl_->client;
  comp.program = &prog;
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  impl_->check(api->PJRT_Client_Compile(&comp), "compile");
  impl_->exe = comp.executable;

  for (auto& s : impl_->staging) {
    s.resize(static_cast<size_t>(impl_->exp_w) * impl_->exp_h * 4);
  }
  impl_->packed.resize(static_cast<size_t>(impl_->max_detections) * 7);

  // warm execute so the first real frame is compile- and cache-warm
  // (embed.py's warm-compile parity; with remote-compile plugins the
  // device program materialises on first execute, not at Compile)
  int warm_ch = 3;
  size_t warm_bytes = static_cast<size_t>(impl_->exp_w) * impl_->exp_h * 3;
  if (impl_->camera) {
    if (impl_->input_format == "bgra") {
      warm_ch = 4;
      warm_bytes = static_cast<size_t>(impl_->exp_w) * impl_->exp_h * 4;
    } else if (impl_->input_format == "nv12") {
      warm_ch = 0;
      warm_bytes =
          static_cast<size_t>(impl_->exp_w) * impl_->exp_h * 3 / 2;
    }
  }
  std::vector<uint8_t> dummy(warm_bytes, 0);
  std::vector<Detection> sink;
  infer(dummy.data(), impl_->exp_w, impl_->exp_h, warm_ch, &sink);

  std::fprintf(stderr,
               "[executor_pjrt] configured: plugin=%s program=%zuB "
               "max_detections=%lld (warm)\n",
               conf.library.c_str(), mlir.size(),
               static_cast<long long>(impl_->max_detections));
}

PjrtExecutor::~PjrtExecutor() {
  if (!impl_) return;
  const PJRT_Api* api = impl_->api;
  if (api) {
    // drain any in-flight pipeline stages before tearing the client down
    for (auto& f : impl_->inflight) {
      if (f.h2d_done) {
        PJRT_Event_Destroy_Args d{PJRT_Event_Destroy_Args_STRUCT_SIZE,
                                  nullptr, f.h2d_done};
        api->PJRT_Event_Destroy(&d);
      }
      impl_->destroy_buffer(f.input);
      impl_->destroy_buffer(f.output);
    }
    impl_->inflight.clear();
    if (impl_->exe) {
      PJRT_LoadedExecutable_Destroy_Args d{
          PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE, nullptr,
          impl_->exe};
      api->PJRT_LoadedExecutable_Destroy(&d);
    }
    if (impl_->client) {
      PJRT_Client_Destroy_Args d{PJRT_Client_Destroy_Args_STRUCT_SIZE,
                                 nullptr, impl_->client};
      api->PJRT_Client_Destroy(&d);
    }
  }
  // the plugin .so stays loaded: PJRT plugins are not designed for
  // re-initialisation after dlclose
}

InferStatus PjrtExecutor::submit(const uint8_t* frame, int width, int height,
                                 int channels) {
  if (width != impl_->exp_w || height != impl_->exp_h)
    return InferStatus::kGeometryError;

  // stage the frame into this pipeline slot's buffer (convert or copy):
  // the caller's ring buffer is reusable the moment submit returns, and
  // the staged bytes outlive the async h2d (released at collect)
  uint8_t* dst = impl_->staging[impl_->next_slot].data();
  impl_->next_slot ^= 1;
  int64_t dims[3] = {height, width, 3};
  size_t num_dims = 3;
  size_t nbytes = static_cast<size_t>(height) * width * 3;

  if (impl_->camera) {
    // camera-path program: upload the RAW frame; colour conversion and
    // resize run on-chip (cuda_preprocess.cu parity — the frame never
    // gets touched by the host CPU)
    const std::string& f = impl_->input_format;
    if (f == "bgra") {
      if (channels != 4) return InferStatus::kGeometryError;
      dims[2] = 4;
      nbytes = static_cast<size_t>(height) * width * 4;
    } else if (f == "nv12") {
      if (channels != 0) return InferStatus::kGeometryError;
      dims[0] = static_cast<int64_t>(height) * 3 / 2;
      dims[1] = width;
      num_dims = 2;
      nbytes = static_cast<size_t>(height) * width * 3 / 2;
    } else {
      if (channels != 3) return InferStatus::kGeometryError;
    }
    std::memcpy(dst, frame, nbytes);
  } else {
    // square-RGB program: host-side format normalisation (embed.py
    // parity) for BGRA / NV12 ring frames
    const int s = impl_->input_size;
    const uint8_t* rgb = frame;
    uint8_t* conv_dst = dst;
    if (impl_->s2d && channels != 3) {
      // convert into scratch first; the s2d block pass reads from it
      impl_->rgb_tmp.resize(static_cast<size_t>(s) * s * 3);
      conv_dst = impl_->rgb_tmp.data();
    }
    if (channels == 4) {  // BGRA -> RGB
      const size_t n = static_cast<size_t>(s) * s;
      for (size_t i = 0; i < n; ++i) {
        conv_dst[i * 3 + 0] = frame[i * 4 + 2];
        conv_dst[i * 3 + 1] = frame[i * 4 + 1];
        conv_dst[i * 3 + 2] = frame[i * 4 + 0];
      }
      rgb = conv_dst;
    } else if (channels == 0) {  // NV12 planar
      nv12_to_rgb(frame, s, s, conv_dst);
      rgb = conv_dst;
    } else if (channels == 3) {
      rgb = frame;
    } else {
      return InferStatus::kGeometryError;
    }
    if (impl_->s2d) {
      // space-to-depth block (2x2): the program consumes (s/2, s/2, 12)
      // with (di, dj, c) channel order — the shuffle that costs more
      // than it saves on-device is one cache-friendly pass here
      const int hh = s / 2, hw = s / 2;
      for (int p = 0; p < hh; ++p) {
        const uint8_t* r0 = rgb + static_cast<size_t>(2 * p) * s * 3;
        const uint8_t* r1 = r0 + static_cast<size_t>(s) * 3;
        uint8_t* row = dst + static_cast<size_t>(p) * hw * 12;
        for (int q = 0; q < hw; ++q) {
          std::memcpy(row + q * 12 + 0, r0 + q * 6, 6);   // (0,0),(0,1)
          std::memcpy(row + q * 12 + 6, r1 + q * 6, 6);   // (1,0),(1,1)
        }
      }
      if (impl_->s2d_merged) {
        // merged engine: SAME bytes, column pairs merged into lanes —
        // a pure dims change, the staging pass above is unchanged
        dims[0] = hh;
        dims[1] = hw / 2;
        dims[2] = 24;
      } else {
        dims[0] = hh;
        dims[1] = hw;
        dims[2] = 12;
      }
    } else if (rgb != dst) {
      // channels==3 without s2d: plain copy into the staging slot
      std::memcpy(dst, rgb, nbytes);
    }
  }

  const PJRT_Api* api = impl_->api;
  PJRT_Client_BufferFromHostBuffer_Args bh{
      PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE, nullptr};
  bh.client = impl_->client;
  bh.data = dst;
  bh.type = PJRT_Buffer_Type_U8;
  bh.dims = dims;
  bh.num_dims = num_dims;
  bh.byte_strides = nullptr;
  bh.num_byte_strides = 0;
  bh.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  bh.device = impl_->device;
  bh.memory = nullptr;
  bh.device_layout = nullptr;
  impl_->check(api->PJRT_Client_BufferFromHostBuffer(&bh), "h2d");

  PJRT_ExecuteOptions eo;
  std::memset(&eo, 0, sizeof eo);
  eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_Buffer* argbuf[1] = {bh.buffer};
  PJRT_Buffer* const* arglist[1] = {argbuf};
  PJRT_Buffer* outbuf[1] = {nullptr};
  PJRT_Buffer** outlist[1] = {outbuf};

  // async-enqueue discipline (the reference keeps exactly one stream
  // sync per frame, gpu_postprocess.cu:421-424): execute is enqueued
  // right behind the h2d and NOTHING here blocks — the single packed d2h
  // in collect() is the only wait, so frame N+1's upload and frame N's
  // execute ride the wire together.
  PJRT_LoadedExecutable_Execute_Args ex{
      PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE, nullptr};
  ex.executable = impl_->exe;
  ex.options = &eo;
  ex.argument_lists = arglist;
  ex.num_devices = 1;
  ex.num_args = 1;
  ex.output_lists = outlist;
  ex.device_complete_events = nullptr;
  ex.execute_device = nullptr;
  PJRT_Error* err = api->PJRT_LoadedExecutable_Execute(&ex);
  if (err) {
    // failed enqueue: release the input buffer + event before raising
    if (bh.done_with_host_buffer) {
      PJRT_Event_Destroy_Args d{PJRT_Event_Destroy_Args_STRUCT_SIZE,
                                nullptr, bh.done_with_host_buffer};
      api->PJRT_Event_Destroy(&d);
    }
    impl_->destroy_buffer(bh.buffer);
    impl_->check(err, "execute");
  }

  impl_->inflight.push_back(
      Impl::Inflight{bh.buffer, bh.done_with_host_buffer, outbuf[0]});
  return InferStatus::kOk;
}

InferStatus PjrtExecutor::collect(std::vector<Detection>* out) {
  out->clear();
  if (impl_->inflight.empty()) return InferStatus::kGeometryError;
  Impl::Inflight f = impl_->inflight.front();
  impl_->inflight.pop_front();

  // one packed output: (K, 7) f32 rows [x1,y1,x2,y2,score,cls,valid]
  // read into the buffer preallocated at configure
  const size_t K = static_cast<size_t>(impl_->max_detections);
  try {
    impl_->to_host(f.output, impl_->packed.data(),
                   impl_->packed.size() * 4, "d2h packed");
  } catch (...) {
    impl_->destroy_buffer(f.output);
    if (f.h2d_done) impl_->await(f.h2d_done, "h2d event");
    impl_->destroy_buffer(f.input);
    throw;
  }
  impl_->destroy_buffer(f.output);
  // d2h completing implies the h2d long finished; this await is a
  // bookkeeping release of the event + input buffer, not a stall
  if (f.h2d_done) impl_->await(f.h2d_done, "h2d event");
  impl_->destroy_buffer(f.input);

  for (size_t i = 0; i < K; ++i) {
    const float* row = &impl_->packed[i * 7];
    if (row[6] < 0.5f) continue;  // valid flag
    Detection d;
    d.x1 = row[0];
    d.y1 = row[1];
    d.x2 = row[2];
    d.y2 = row[3];
    d.score = row[4];
    d.class_id = static_cast<int32_t>(row[5]);
    out->push_back(d);
  }
  return InferStatus::kOk;
}

int PjrtExecutor::pipeline_depth() const {
  // Measured on the axon relay (RESULTS.md round 3, 2x interleaved
  // 300-frame runs): the relay serializes all PJRT RPCs on one channel,
  // so a depth-2 submit inserts frame N+1's ~1.2 MB upload between
  // frame N's execute and its result fetch — every frame becomes three
  // channel turnarounds instead of two (19.5 -> 13.3 fps, p50 49 ->
  // 133 ms). Overlap only pays when h2d and execute use independent
  // resources (local PCIe/DMA vs the systolic array), i.e. a real
  // TPU-VM plugin; there the reference's one-sync discipline applies
  // and depth 2 reclaims the upload window.
  return impl_->relay_plugin ? 1 : 2;
}

InferStatus PjrtExecutor::infer(const uint8_t* frame, int width, int height,
                                int channels, std::vector<Detection>* out) {
  // unpipelined convenience path: submit + immediate collect (drains any
  // stale in-flight work first so interleaved misuse cannot mismatch
  // frames and results)
  out->clear();
  std::vector<Detection> sink;
  while (!impl_->inflight.empty()) collect(&sink);
  InferStatus st = submit(frame, width, height, channels);
  if (st != InferStatus::kOk) return st;
  return collect(out);
}

}  // namespace unina
