// Fused letterbox (bilinear resize + gray pad + BGR->RGB) for uint8 HWC
// images — the native host-side preprocessing stage of the input
// pipeline (the reference leans on OpenCV C++ for the same work,
// ref:ultralytics/data/augment.py:1479 + cv2; here it is a single pass
// with no intermediate allocations, one call per image).
//
// CPython C API module (no pybind11 in this environment); built by
// native/build.py with g++ -O3.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// bilinear sample of src (h, w, 3) uint8 at (fy, fx)
inline void sample_bilinear(const uint8_t* src, int h, int w, float fy,
                            float fx, uint8_t* out3, bool swap_rb) {
  int x0 = static_cast<int>(fx);
  int y0 = static_cast<int>(fy);
  x0 = std::min(std::max(x0, 0), w - 1);
  y0 = std::min(std::max(y0, 0), h - 1);
  int x1 = std::min(x0 + 1, w - 1);
  int y1 = std::min(y0 + 1, h - 1);
  float ax = fx - static_cast<float>(x0);
  float ay = fy - static_cast<float>(y0);
  const uint8_t* p00 = src + (static_cast<size_t>(y0) * w + x0) * 3;
  const uint8_t* p01 = src + (static_cast<size_t>(y0) * w + x1) * 3;
  const uint8_t* p10 = src + (static_cast<size_t>(y1) * w + x0) * 3;
  const uint8_t* p11 = src + (static_cast<size_t>(y1) * w + x1) * 3;
  for (int c = 0; c < 3; ++c) {
    float v = (1 - ay) * ((1 - ax) * p00[c] + ax * p01[c]) +
              ay * ((1 - ax) * p10[c] + ax * p11[c]);
    int cc = swap_rb ? 2 - c : c;
    out3[cc] = static_cast<uint8_t>(v + 0.5f);
  }
}

// letterbox(src(h,w,3) u8, dst(size,size,3) u8 prefilled by caller?) —
// we fill everything here: pad value + resized content, centered.
void letterbox_one(const uint8_t* src, int h, int w, uint8_t* dst, int size,
                   int pad_value, bool swap_rb, float* ratio, int* pad_xy) {
  float r = std::min(static_cast<float>(size) / h, static_cast<float>(size) / w);
  int new_w = static_cast<int>(w * r + 0.5f);
  int new_h = static_cast<int>(h * r + 0.5f);
  int left = (size - new_w) / 2;
  int top = (size - new_h) / 2;
  *ratio = r;
  pad_xy[0] = left;
  pad_xy[1] = top;

  std::memset(dst, pad_value, static_cast<size_t>(size) * size * 3);
  float sx = static_cast<float>(w) / new_w;
  float sy = static_cast<float>(h) / new_h;
  for (int y = 0; y < new_h; ++y) {
    // cv2-style center-aligned sampling grid
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    uint8_t* row = dst + (static_cast<size_t>(y + top) * size + left) * 3;
    for (int x = 0; x < new_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      sample_bilinear(src, h, w, fy, fx, row + static_cast<size_t>(x) * 3,
                      swap_rb);
    }
  }
}

// letterbox(bytes, h, w, size, pad_value, swap_rb) -> (bytes, ratio, left, top)
PyObject* py_letterbox(PyObject*, PyObject* args) {
  Py_buffer buf;
  int h, w, size, pad_value, swap_rb;
  if (!PyArg_ParseTuple(args, "y*iiiip", &buf, &h, &w, &size, &pad_value,
                        &swap_rb)) {
    return nullptr;
  }
  if (buf.len < static_cast<Py_ssize_t>(h) * w * 3) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "buffer smaller than h*w*3");
    return nullptr;
  }
  PyObject* out =
      PyBytes_FromStringAndSize(nullptr, static_cast<Py_ssize_t>(size) * size * 3);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  float ratio = 1.0f;
  int pad_xy[2] = {0, 0};
  Py_BEGIN_ALLOW_THREADS
  letterbox_one(static_cast<const uint8_t*>(buf.buf), h, w,
                reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out)), size,
                pad_value, swap_rb != 0, &ratio, pad_xy);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return Py_BuildValue("(Nfii)", out, static_cast<double>(ratio), pad_xy[0],
                       pad_xy[1]);
}

// letterbox_batch(seq_of_buffers, seq_of_(h,w), out_buffer, size,
//                 pad_value, swap_rb, n_threads) -> [(ratio, left, top), ...]
//
// Batched form for the predictor/validator hot loop: every image is
// letterboxed directly into its slice of the caller's preallocated
// (N, size, size, 3) uint8 batch array (no per-image bytes objects, no
// stack copy), with the GIL released across the whole batch and the
// images distributed over a worker-thread pool (one thread per core on
// production multi-core TPU hosts).
PyObject* py_letterbox_batch(PyObject*, PyObject* args) {
  PyObject* seq;
  PyObject* hw_seq;
  Py_buffer out_buf;
  int size, pad_value, swap_rb, n_threads;
  if (!PyArg_ParseTuple(args, "OOw*iipi", &seq, &hw_seq, &out_buf, &size,
                        &pad_value, &swap_rb, &n_threads)) {
    return nullptr;
  }
  Py_ssize_t n = PySequence_Size(seq);
  if (n < 0 || PySequence_Size(hw_seq) != n) {
    PyBuffer_Release(&out_buf);
    PyErr_SetString(PyExc_ValueError, "images and shapes length mismatch");
    return nullptr;
  }
  size_t per = static_cast<size_t>(size) * size * 3;
  if (out_buf.len < static_cast<Py_ssize_t>(per * n)) {
    PyBuffer_Release(&out_buf);
    PyErr_SetString(PyExc_ValueError, "output buffer smaller than N*size*size*3");
    return nullptr;
  }

  std::vector<Py_buffer> bufs(n);
  std::vector<int> hs(n), ws(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_GetItem(seq, i);
    PyObject* hw = PySequence_GetItem(hw_seq, i);
    int ok = item && hw &&
             PyArg_ParseTuple(hw, "ii", &hs[i], &ws[i]) &&
             PyObject_GetBuffer(item, &bufs[i], PyBUF_SIMPLE) == 0 &&
             bufs[i].len >= static_cast<Py_ssize_t>(hs[i]) * ws[i] * 3;
    Py_XDECREF(item);
    Py_XDECREF(hw);
    if (!ok) {
      for (Py_ssize_t j = 0; j < i; ++j) PyBuffer_Release(&bufs[j]);
      PyBuffer_Release(&out_buf);
      if (!PyErr_Occurred())
        PyErr_SetString(PyExc_ValueError, "bad image buffer or (h, w)");
      return nullptr;
    }
  }

  std::vector<float> ratios(n);
  std::vector<int> pads(2 * n);
  uint8_t* out = static_cast<uint8_t*>(out_buf.buf);
  bool swap = swap_rb != 0;

  Py_BEGIN_ALLOW_THREADS
  int nt = std::max(1, std::min<int>(n_threads, static_cast<int>(n)));
  auto work = [&](int t) {
    for (Py_ssize_t i = t; i < n; i += nt) {
      letterbox_one(static_cast<const uint8_t*>(bufs[i].buf), hs[i], ws[i],
                    out + per * i, size, pad_value, swap, &ratios[i],
                    &pads[2 * i]);
    }
  };
  if (nt == 1) {
    work(0);
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(work, t);
    for (auto& th : pool) th.join();
  }
  Py_END_ALLOW_THREADS

  for (Py_ssize_t i = 0; i < n; ++i) PyBuffer_Release(&bufs[i]);
  PyBuffer_Release(&out_buf);

  PyObject* meta = PyList_New(n);
  if (!meta) return nullptr;
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyList_SET_ITEM(meta, i,
                    Py_BuildValue("(fii)", static_cast<double>(ratios[i]),
                                  pads[2 * i], pads[2 * i + 1]));
  }
  return meta;
}

PyMethodDef kMethods[] = {
    {"letterbox", py_letterbox, METH_VARARGS,
     "letterbox(bytes, h, w, size, pad_value, swap_rb) -> (bytes, ratio, left, top)"},
    {"letterbox_batch", py_letterbox_batch, METH_VARARGS,
     "letterbox_batch(imgs, hws, out, size, pad_value, swap_rb, n_threads)"
     " -> [(ratio, left, top), ...]"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_letterbox_native",
                       "fused letterbox preprocessing", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__letterbox_native(void) {
  return PyModule_Create(&kModule);
}
