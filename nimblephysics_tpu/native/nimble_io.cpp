// nimble_io: native data-loader for the .b3d subject format + C3D mocap.
//
// TPU-native replacement for the reference's C++ SubjectOnDisk
// (dart/biomechanics/SubjectOnDisk.hpp:546-617 — streamable binary subject
// format with per-frame seeking) and its vendored ezc3d C3D reader. The
// runtime around the XLA compute path stays native: this library does
// zero-copy memory-mapped frame reads so mocap datasets stream into
// training loops without Python-loop overhead.
//
// B3D layout (this engine's format, version 1):
//   [0..4)   magic "NB3D"
//   [4..8)   u32 version
//   [8..16)  u64 header_json_len
//   [16..16+len) header JSON (trial table: name, num_frames, frame stride
//                in f32s, absolute data offset; dof/marker name tables)
//   then per-trial contiguous f32 frame blocks (fixed stride -> O(1) seek).
//
// Exposed as a plain C ABI for ctypes.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MappedFile {
  int fd = -1;
  size_t size = 0;
  const uint8_t* data = nullptr;
};

struct B3D {
  MappedFile map;
  std::string header_json;
  // trial table mirrors the JSON (parsed on the Python side; we keep the
  // numeric essentials here for seeking).
  std::vector<uint64_t> offsets;       // absolute byte offset per trial
  std::vector<uint64_t> num_frames;    // frames per trial
  std::vector<uint64_t> stride_floats; // f32s per frame
};

bool map_file(const char* path, MappedFile* out) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return false;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (p == MAP_FAILED) {
    ::close(fd);
    return false;
  }
  out->fd = fd;
  out->size = static_cast<size_t>(st.st_size);
  out->data = static_cast<const uint8_t*>(p);
  return true;
}

void unmap_file(MappedFile* f) {
  if (f->data) munmap(const_cast<uint8_t*>(f->data), f->size);
  if (f->fd >= 0) ::close(f->fd);
  f->data = nullptr;
  f->fd = -1;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// B3D writing. The Python layer serializes the header JSON and passes the
// numeric trial table alongside; data arrives as contiguous f32 blocks.
// ---------------------------------------------------------------------------

int b3d_write_start(const char* path, const char* header_json) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  const char magic[4] = {'N', 'B', '3', 'D'};
  uint32_t version = 1;
  uint64_t len = strlen(header_json);
  fwrite(magic, 1, 4, f);
  fwrite(&version, 4, 1, f);
  fwrite(&len, 8, 1, f);
  fwrite(header_json, 1, len, f);
  long pos = ftell(f);
  fclose(f);
  return static_cast<int>(pos);  // data start offset
}

int b3d_append_trial(const char* path, const float* data, uint64_t count) {
  FILE* f = fopen(path, "ab");
  if (!f) return -1;
  size_t written = fwrite(data, sizeof(float), count, f);
  fclose(f);
  return written == count ? 0 : -2;
}

// ---------------------------------------------------------------------------
// B3D reading (memory-mapped, O(1) frame seeks).
// ---------------------------------------------------------------------------

void* b3d_open(const char* path) {
  auto* b = new B3D();
  if (!map_file(path, &b->map) || b->map.size < 16 ||
      memcmp(b->map.data, "NB3D", 4) != 0) {
    unmap_file(&b->map);
    delete b;
    return nullptr;
  }
  uint64_t len;
  memcpy(&len, b->map.data + 8, 8);
  // Overflow-safe: a crafted huge u64 len must not wrap 16 + len.
  if (len > b->map.size - 16) {
    unmap_file(&b->map);
    delete b;
    return nullptr;
  }
  b->header_json.assign(
      reinterpret_cast<const char*>(b->map.data + 16), len);
  return b;
}

const char* b3d_header_json(void* handle) {
  return static_cast<B3D*>(handle)->header_json.c_str();
}

// The Python layer parses the JSON and hands back the trial table (the C
// side stays JSON-free).
void b3d_set_trials(void* handle, const uint64_t* offsets,
                    const uint64_t* num_frames, const uint64_t* strides,
                    int n) {
  auto* b = static_cast<B3D*>(handle);
  b->offsets.assign(offsets, offsets + n);
  b->num_frames.assign(num_frames, num_frames + n);
  b->stride_floats.assign(strides, strides + n);
}

// Copy `count` frames starting at `start` of trial `t` into out
// (count * stride f32s). Returns frames copied.
int b3d_read_frames(void* handle, int t, uint64_t start, uint64_t count,
                    float* out) {
  auto* b = static_cast<B3D*>(handle);
  if (t < 0 || t >= static_cast<int>(b->offsets.size())) return -1;
  uint64_t stride = b->stride_floats[t];
  uint64_t frames = b->num_frames[t];
  if (start >= frames) return 0;
  if (count > frames - start) count = frames - start;
  // Overflow-safe products and offsets (crafted headers must not wrap).
  if (stride != 0 &&
      (start > UINT64_MAX / stride / sizeof(float) ||
       count > UINT64_MAX / stride / sizeof(float)))
    return -2;
  uint64_t rel = start * stride * sizeof(float);
  uint64_t bytes = count * stride * sizeof(float);
  uint64_t base = b->offsets[t];
  if (base > b->map.size || rel > b->map.size - base) return -2;
  uint64_t byte_off = base + rel;
  if (bytes > b->map.size - byte_off) return -2;
  memcpy(out, b->map.data + byte_off, bytes);
  return static_cast<int>(count);
}

void b3d_close(void* handle) {
  auto* b = static_cast<B3D*>(handle);
  unmap_file(&b->map);
  delete b;
}

// ---------------------------------------------------------------------------
// C3D mocap reading (Intel/float + integer formats; the common case for
// modern files). Layout per the public C3D specification (c3d.org).
// ---------------------------------------------------------------------------

struct C3D {
  MappedFile map;
  int proc_type = 84;  // 84 = Intel, 85 = DEC, 86 = MIPS (SGI)
  int num_points = 0;
  int num_frames = 0;
  int first_frame = 1;
  float frame_rate = 0.0f;
  float point_scale = 1.0f;  // negative => float data
  int data_start = 0;        // 512-byte block index (1-based)
  int analog_per_frame = 0;
  int analog_used = 0;
  std::vector<std::string> labels;
};

static uint16_t rd_u16(const uint8_t* p) {
  uint16_t v;
  memcpy(&v, p, 2);
  return v;
}
static int16_t rd_i16(const uint8_t* p) {
  int16_t v;
  memcpy(&v, p, 2);
  return v;
}
static float rd_f32(const uint8_t* p) {
  float v;
  memcpy(&v, p, 4);
  return v;
}
// DEC (PDP-11/VAX) float: word-swapped with a 2x exponent bias.
static float rd_f32_dec(const uint8_t* p) {
  uint8_t b[4] = {p[2], p[3], p[0], p[1]};
  float v;
  memcpy(&v, b, 4);
  return v / 4.0f;
}

void* c3d_open(const char* path) {
  auto* c = new C3D();
  if (!map_file(path, &c->map) || c->map.size < 512) {
    unmap_file(&c->map);
    delete c;
    return nullptr;
  }
  const uint8_t* h = c->map.data;
  if (h[1] != 0x50) {  // C3D id byte
    unmap_file(&c->map);
    delete c;
    return nullptr;
  }
  int param_block = h[0];
  // Processor type lives at byte 4 of the parameter section.
  {
    size_t poff = static_cast<size_t>(param_block - 1) * 512;
    if (poff + 4 <= c->map.size) c->proc_type = h[poff + 3];
  }
  auto f32 = [&](const uint8_t* p) {
    return c->proc_type == 85 ? rd_f32_dec(p) : rd_f32(p);
  };
  c->num_points = rd_u16(h + 2);
  c->analog_per_frame = rd_u16(h + 4);
  c->first_frame = rd_u16(h + 6);
  int last_frame = rd_u16(h + 8);
  c->num_frames = last_frame - c->first_frame + 1;
  c->point_scale = f32(h + 12);
  c->data_start = rd_u16(h + 16);
  int analog_samples = rd_u16(h + 18);
  c->analog_used =
      analog_samples > 0 ? c->analog_per_frame / (analog_samples ? analog_samples : 1) : 0;
  c->frame_rate = f32(h + 20);

  // Parameter section: find POINT:LABELS.
  size_t poff = static_cast<size_t>(param_block - 1) * 512;
  if (poff + 4 < c->map.size) {
    size_t cursor = poff + 4;
    int point_group_id = 0;
    // First pass: group name -> id.
    size_t scan = cursor;
    while (scan + 2 < c->map.size) {
      int8_t nname = static_cast<int8_t>(h[scan]);
      int8_t gid = static_cast<int8_t>(h[scan + 1]);
      int nchars = nname < 0 ? -nname : nname;
      if (nchars == 0) break;
      size_t name_at = scan + 2;
      if (name_at + nchars >= c->map.size) break;
      std::string name(reinterpret_cast<const char*>(h + name_at), nchars);
      size_t off_at = name_at + nchars;
      if (off_at + 2 > c->map.size) break;
      uint16_t next = rd_u16(h + off_at);
      bool is_group = gid < 0;
      if (is_group && name == "POINT") point_group_id = -gid;
      if (!is_group && point_group_id != 0 && gid == point_group_id &&
          name == "LABELS") {
        // parameter: data type, dims, data (every read bounds-checked:
        // a truncated/malformed C3D must not cause OOB reads).
        size_t q = off_at + 2;
        if (q + 4 <= c->map.size) {
          int8_t dtype = static_cast<int8_t>(h[q]);
          int ndims = h[q + 1];
          if (dtype == -1 && ndims == 2) {
            int w = h[q + 2];
            int n = h[q + 3];
            size_t data_at = q + 2 + ndims;
            if (w > 0 && n > 0 &&
                data_at <= c->map.size &&
                static_cast<size_t>(w) * n <= c->map.size - data_at) {
              for (int i = 0; i < n; i++) {
                std::string lab(
                    reinterpret_cast<const char*>(h + data_at + i * w), w);
                // trim trailing spaces
                while (!lab.empty() && lab.back() == ' ') lab.pop_back();
                c->labels.push_back(lab);
              }
            }
          }
        }
      }
      if (next == 0) break;
      scan = off_at + next;
    }
  }
  return c;
}

int c3d_num_points(void* handle) { return static_cast<C3D*>(handle)->num_points; }
int c3d_num_frames(void* handle) { return static_cast<C3D*>(handle)->num_frames; }
float c3d_frame_rate(void* handle) { return static_cast<C3D*>(handle)->frame_rate; }

int c3d_labels(void* handle, char* buf, int buflen) {
  auto* c = static_cast<C3D*>(handle);
  std::string joined;
  for (auto& l : c->labels) {
    joined += l;
    joined += '\n';
  }
  int n = static_cast<int>(joined.size());
  if (n >= buflen) n = buflen - 1;
  memcpy(buf, joined.data(), n);
  buf[n] = 0;
  return static_cast<int>(c->labels.size());
}

// out: num_frames * num_points * 4 floats (x, y, z, residual; residual < 0
// = occluded). Handles float and scaled-integer storage.
int c3d_read_points(void* handle, float* out) {
  auto* c = static_cast<C3D*>(handle);
  const uint8_t* d = c->map.data;
  size_t off = static_cast<size_t>(c->data_start - 1) * 512;
  bool is_float = c->point_scale < 0;
  float scale = is_float ? 1.0f : c->point_scale;
  size_t point_bytes = is_float ? 16 : 8;
  size_t analog_bytes =
      (is_float ? 4 : 2) * static_cast<size_t>(c->analog_per_frame);
  size_t frame_bytes = c->num_points * point_bytes + analog_bytes;

  for (int f = 0; f < c->num_frames; f++) {
    size_t at = off + f * frame_bytes;
    if (at + c->num_points * point_bytes > c->map.size) return f;
    for (int p = 0; p < c->num_points; p++) {
      float* o = out + (static_cast<size_t>(f) * c->num_points + p) * 4;
      if (is_float) {
        const uint8_t* q = d + at + p * 16;
        bool dec = c->proc_type == 85;
        o[0] = dec ? rd_f32_dec(q) : rd_f32(q);
        o[1] = dec ? rd_f32_dec(q + 4) : rd_f32(q + 4);
        o[2] = dec ? rd_f32_dec(q + 8) : rd_f32(q + 8);
        float w = dec ? rd_f32_dec(q + 12) : rd_f32(q + 12);
        o[3] = w;
      } else {
        const uint8_t* q = d + at + p * 8;
        o[0] = rd_i16(q) * scale;
        o[1] = rd_i16(q + 2) * scale;
        o[2] = rd_i16(q + 4) * scale;
        o[3] = static_cast<float>(rd_i16(q + 6));
      }
    }
  }
  return c->num_frames;
}

void c3d_close(void* handle) {
  auto* c = static_cast<C3D*>(handle);
  unmap_file(&c->map);
  delete c;
}

}  // extern "C"
