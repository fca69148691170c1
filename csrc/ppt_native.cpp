// Native host-side data path for pytorch_points_tpu.
//
// The reference implements its hot device ops in CUDA/C++; on TPU those
// became Pallas kernels, and the native layer's remaining job is the HOST
// data path: fast point-cloud file parsing and CPU-side preprocessing
// (FPS / voxel-grid subsampling) that feed the device input pipeline.
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: make -C csrc   (or python -m pytorch_points_tpu._native.build)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>
#include <unordered_map>

extern "C" {

// ---------------------------------------------------------------------------
// PLY fast path: binary_little_endian files whose vertex element starts
// with float x, y, z. Two-call contract:
//   n = ply_vertex_count(path)            (<0: unsupported/error)
//   ply_read_xyz(path, out /* n*3 f32 */)  (0 on success)
// ---------------------------------------------------------------------------

struct PlyInfo {
  long n_verts = -1;
  long vertex_stride = 0;  // bytes per vertex record
  long data_offset = 0;    // file offset of vertex data
  bool ok = false;
};

static long prop_size(const std::string& t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32") return 4;
  if (t == "double" || t == "float64") return 8;
  return -1;
}

static PlyInfo parse_header(const char* path) {
  PlyInfo info;
  FILE* f = fopen(path, "rb");
  if (!f) return info;
  char line[4096];
  if (!fgets(line, sizeof line, f) || strncmp(line, "ply", 3) != 0) {
    fclose(f);
    return info;
  }
  bool binary_le = false, in_vertex = false;
  int float_xyz_seen = 0;
  long stride = 0;
  bool xyz_leading = true;
  while (fgets(line, sizeof line, f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("format ", 0) == 0) {
      binary_le = s.find("binary_little_endian") != std::string::npos;
    } else if (s.rfind("element ", 0) == 0) {
      in_vertex = s.rfind("element vertex", 0) == 0;
      if (in_vertex) sscanf(s.c_str(), "element vertex %ld", &info.n_verts);
    } else if (s.rfind("property ", 0) == 0 && in_vertex) {
      char type[64], name[64];
      if (sscanf(s.c_str(), "property %63s %63s", type, name) != 2) {
        fclose(f);
        return info;
      }
      if (strcmp(type, "list") == 0) { fclose(f); return info; }
      long sz = prop_size(type);
      if (sz < 0) { fclose(f); return info; }
      if (float_xyz_seen < 3) {
        const char* want = float_xyz_seen == 0 ? "x"
                           : float_xyz_seen == 1 ? "y" : "z";
        if (strcmp(type, "float") == 0 && strcmp(name, want) == 0 &&
            stride == 4l * float_xyz_seen) {
          ++float_xyz_seen;
        } else {
          xyz_leading = false;
        }
      }
      stride += sz;
    } else if (s == "end_header") {
      info.data_offset = ftell(f);
      break;
    }
  }
  fclose(f);
  info.vertex_stride = stride;
  info.ok = binary_le && xyz_leading && float_xyz_seen == 3 &&
            info.n_verts >= 0 && info.data_offset > 0;
  return info;
}

long ply_vertex_count(const char* path) {
  PlyInfo info = parse_header(path);
  return info.ok ? info.n_verts : -1;
}

int ply_read_xyz(const char* path, float* out) {
  PlyInfo info = parse_header(path);
  if (!info.ok) return -1;
  FILE* f = fopen(path, "rb");
  if (!f) return -2;
  if (fseek(f, info.data_offset, SEEK_SET) != 0) { fclose(f); return -3; }
  if (info.vertex_stride == 12) {
    size_t got = fread(out, 12, (size_t)info.n_verts, f);
    fclose(f);
    return got == (size_t)info.n_verts ? 0 : -4;
  }
  std::vector<char> buf((size_t)info.vertex_stride * 4096);
  long done = 0;
  while (done < info.n_verts) {
    long chunk = info.n_verts - done < 4096 ? info.n_verts - done : 4096;
    if (fread(buf.data(), (size_t)info.vertex_stride, (size_t)chunk, f) !=
        (size_t)chunk) { fclose(f); return -4; }
    for (long i = 0; i < chunk; ++i)
      memcpy(out + (done + i) * 3, buf.data() + i * info.vertex_stride, 12);
    done += chunk;
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// FPS: identical semantics to the device kernel (seed index 0, f32 math,
// lowest-index tie-break). O(kN) with the classic running min-distance.
// ---------------------------------------------------------------------------

void fps(const float* xyz, long n, long k, int32_t* out) {
  std::vector<float> mind((size_t)n, 1e10f);
  long last = 0;
  out[0] = 0;
  for (long j = 1; j < k; ++j) {
    const float lx = xyz[last * 3], ly = xyz[last * 3 + 1],
                lz = xyz[last * 3 + 2];
    float best = -1.0f;
    long arg = 0;
    for (long i = 0; i < n; ++i) {
      const float dx = xyz[i * 3] - lx;
      const float dy = xyz[i * 3 + 1] - ly;
      const float dz = xyz[i * 3 + 2] - lz;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < mind[i]) mind[i] = d;
      if (mind[i] > best) { best = mind[i]; arg = i; }
    }
    last = arg;
    out[j] = (int32_t)arg;
  }
}

// ---------------------------------------------------------------------------
// Voxel-grid subsample: keep the centroid of each occupied cell.
// Two-call contract via an opaque run: first call computes count with
// out=nullptr; caller allocates; second call fills. Deterministic order:
// cells ordered by first-point appearance.
// ---------------------------------------------------------------------------

long grid_subsample(const float* xyz, long n, float cell, float* out) {
  std::unordered_map<uint64_t, long> cells;
  std::vector<double> acc;
  std::vector<long> cnt;
  cells.reserve((size_t)n * 2);
  for (long i = 0; i < n; ++i) {
    const int64_t gx = (int64_t)floorf(xyz[i * 3] / cell);
    const int64_t gy = (int64_t)floorf(xyz[i * 3 + 1] / cell);
    const int64_t gz = (int64_t)floorf(xyz[i * 3 + 2] / cell);
    // 21 bits per axis, offset to positive
    const uint64_t key = (((uint64_t)(gx + (1 << 20)) & 0x1FFFFF) << 42) |
                         (((uint64_t)(gy + (1 << 20)) & 0x1FFFFF) << 21) |
                         ((uint64_t)(gz + (1 << 20)) & 0x1FFFFF);
    auto it = cells.find(key);
    long slot;
    if (it == cells.end()) {
      slot = (long)cnt.size();
      cells.emplace(key, slot);
      acc.resize(acc.size() + 3, 0.0);
      cnt.push_back(0);
    } else {
      slot = it->second;
    }
    acc[slot * 3] += xyz[i * 3];
    acc[slot * 3 + 1] += xyz[i * 3 + 1];
    acc[slot * 3 + 2] += xyz[i * 3 + 2];
    cnt[slot] += 1;
  }
  const long m = (long)cnt.size();
  if (out) {
    for (long s = 0; s < m; ++s) {
      out[s * 3] = (float)(acc[s * 3] / cnt[s]);
      out[s * 3 + 1] = (float)(acc[s * 3 + 1] / cnt[s]);
      out[s * 3 + 2] = (float)(acc[s * 3 + 2] / cnt[s]);
    }
  }
  return m;
}

}  // extern "C"
