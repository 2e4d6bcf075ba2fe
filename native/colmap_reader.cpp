// Native COLMAP binary model reader.
//
// C++ counterpart of deblur4dgs_tpu/data/colmap.py's binary parsers —
// the framework's native data-path component (the reference reads COLMAP
// models in Python; at production scale parsing thousands of images.bin
// records per scene is host-bound, so the hot parser is native, exposed
// through ctypes with a pure-Python fallback).
//
// Build: g++ -O2 -shared -fPIC -o libcolmap_reader.so colmap_reader.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  FILE* f;
  bool ok = true;
  explicit Reader(const char* path) { f = std::fopen(path, "rb"); }
  ~Reader() {
    if (f) std::fclose(f);
  }
  template <typename T>
  T read() {
    T v{};
    if (!f || std::fread(&v, sizeof(T), 1, f) != 1) ok = false;
    return v;
  }
  std::string read_cstr() {
    std::string s;
    int c;
    while (f && (c = std::fgetc(f)) != EOF && c != '\0') s.push_back((char)c);
    return s;
  }
  void skip(long n) {
    if (f && std::fseek(f, n, SEEK_CUR) != 0) ok = false;
  }
};

int camera_model_num_params(int model_id) {
  switch (model_id) {
    case 0: return 3;   // SIMPLE_PINHOLE
    case 1: return 4;   // PINHOLE
    case 2: return 4;   // SIMPLE_RADIAL
    case 3: return 5;   // RADIAL
    case 4: return 8;   // OPENCV
    case 5: return 8;   // OPENCV_FISHEYE
    case 6: return 12;  // FULL_OPENCV
    case 7: return 5;   // FOV
    case 8: return 4;   // SIMPLE_RADIAL_FISHEYE
    case 9: return 5;   // RADIAL_FISHEYE
    case 10: return 12; // THIN_PRISM_FISHEYE
    default: return -1;
  }
}

}  // namespace

extern "C" {

// Parse cameras.bin. Fills caller-allocated arrays of length max_n:
//   ids[i], model_ids[i], widths[i], heights[i], params[i*12..] (padded).
// Returns number of cameras, or -1 on error.
int64_t read_cameras_bin(const char* path, int64_t max_n, int32_t* ids,
                         int32_t* model_ids, int64_t* widths,
                         int64_t* heights, double* params) {
  Reader r(path);
  if (!r.f) return -1;
  uint64_t n = r.read<uint64_t>();
  if (!r.ok || (int64_t)n > max_n) return -1;
  for (uint64_t i = 0; i < n; i++) {
    ids[i] = r.read<int32_t>();
    model_ids[i] = r.read<int32_t>();
    widths[i] = (int64_t)r.read<uint64_t>();
    heights[i] = (int64_t)r.read<uint64_t>();
    int np = camera_model_num_params(model_ids[i]);
    if (np < 0) return -1;
    for (int p = 0; p < np; p++) params[i * 12 + p] = r.read<double>();
    for (int p = np; p < 12; p++) params[i * 12 + p] = 0.0;
    if (!r.ok) return -1;
  }
  return (int64_t)n;
}

// Parse images.bin poses (skips the 2D point observations). Fills:
//   ids[i], qvecs[i*4..] (wxyz), tvecs[i*3..], camera_ids[i],
//   names (concatenated, '\0'-separated into names_buf of size names_cap).
// Returns number of images, or -1 on error.
int64_t read_images_bin(const char* path, int64_t max_n, int32_t* ids,
                        double* qvecs, double* tvecs, int32_t* camera_ids,
                        char* names_buf, int64_t names_cap) {
  Reader r(path);
  if (!r.f) return -1;
  uint64_t n = r.read<uint64_t>();
  if (!r.ok || (int64_t)n > max_n) return -1;
  int64_t name_off = 0;
  for (uint64_t i = 0; i < n; i++) {
    ids[i] = r.read<int32_t>();
    for (int k = 0; k < 4; k++) qvecs[i * 4 + k] = r.read<double>();
    for (int k = 0; k < 3; k++) tvecs[i * 3 + k] = r.read<double>();
    camera_ids[i] = r.read<int32_t>();
    std::string name = r.read_cstr();
    if (name_off + (int64_t)name.size() + 1 > names_cap) return -1;
    std::memcpy(names_buf + name_off, name.c_str(), name.size() + 1);
    name_off += (int64_t)name.size() + 1;
    uint64_t npts = r.read<uint64_t>();
    r.skip((long)(npts * 24));  // (x, y, point3D_id) records
    if (!r.ok) return -1;
  }
  return (int64_t)n;
}

// Parse points3D.bin xyz/rgb/error (skips per-point tracks). Returns count.
int64_t read_points3d_bin(const char* path, int64_t max_n, int64_t* ids,
                          double* xyz, uint8_t* rgb, double* errors) {
  Reader r(path);
  if (!r.f) return -1;
  uint64_t n = r.read<uint64_t>();
  if (!r.ok || (int64_t)n > max_n) return -1;
  for (uint64_t i = 0; i < n; i++) {
    ids[i] = (int64_t)r.read<uint64_t>();
    for (int k = 0; k < 3; k++) xyz[i * 3 + k] = r.read<double>();
    for (int k = 0; k < 3; k++) rgb[i * 3 + k] = r.read<uint8_t>();
    errors[i] = r.read<double>();
    uint64_t tl = r.read<uint64_t>();
    r.skip((long)(tl * 8));
    if (!r.ok) return -1;
  }
  return (int64_t)n;
}

}  // extern "C"
