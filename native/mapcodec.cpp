// Native map wire codec — the C++ runtime path for submap serialization.
//
// Role parity: the reference serializes maps with boost binary archives in
// native code (`Atlas::SerializeMap`, orb_slam3/src/Atlas.cc:325-346); this
// framework's wire format (see dvm_slam_tpu/multiagent/codec.py for the
// layout) gets the same native treatment: framing + zlib in C++, exposed
// through a C ABI consumed via ctypes (no pybind11 in the image).
//
// Byte-identical with the Python reference implementation; tests/test_native.py
// cross-checks both directions.
//
// Build: make -C native   (produces libdvmmapcodec.so)

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint32_t kMagic = 0x44564D31;  // "DVM1"

struct Writer {
  std::vector<uint8_t> buf;
  void raw(const void* p, size_t n) {
    const uint8_t* b = static_cast<const uint8_t*>(p);
    buf.insert(buf.end(), b, b + n);
  }
  template <typename T>
  void put(T v) {
    raw(&v, sizeof(T));  // little-endian hosts only (x86/arm64)
  }
};

}  // namespace

extern "C" {

// Pack n arrays into the DVM1 frame and zlib-compress.
//   names:       concatenated NUL-terminated array names
//   dtype_codes: [n] uint8 (codec.py _DTYPES codes)
//   ndims:       [n] uint8
//   dims:        concatenated uint32 dims, sum(ndims) entries
//   payloads:    [n] pointers to C-contiguous data
//   payload_sizes: [n] byte sizes
// Returns a malloc'd buffer in *out (caller frees via dvm_free), size in
// *out_len. Returns 0 on success.
int dvm_pack(int n, const char* names, const uint8_t* dtype_codes,
             const uint8_t* ndims, const uint32_t* dims,
             const uint8_t* const* payloads, const uint64_t* payload_sizes,
             uint8_t** out, uint64_t* out_len) {
  Writer w;
  w.put<uint32_t>(kMagic);
  w.put<uint32_t>(static_cast<uint32_t>(n));
  const char* name = names;
  size_t dim_off = 0;
  for (int i = 0; i < n; ++i) {
    uint8_t nlen = static_cast<uint8_t>(strlen(name));
    w.put<uint8_t>(nlen);
    w.raw(name, nlen);
    name += nlen + 1;
    w.put<uint8_t>(dtype_codes[i]);
    w.put<uint8_t>(ndims[i]);
    for (int d = 0; d < ndims[i]; ++d) w.put<uint32_t>(dims[dim_off + d]);
    dim_off += ndims[i];
    w.raw(payloads[i], payload_sizes[i]);
  }

  uLongf bound = compressBound(w.buf.size());
  uint8_t* blob = static_cast<uint8_t*>(malloc(8 + bound));
  if (!blob) return -1;
  uint64_t rawlen = w.buf.size();
  memcpy(blob, &rawlen, 8);
  if (compress2(blob + 8, &bound, w.buf.data(), w.buf.size(), 6) != Z_OK) {
    free(blob);
    return -2;
  }
  *out = blob;
  *out_len = 8 + bound;
  return 0;
}

// Decompress a DVM1 blob into the raw frame. Caller frees via dvm_free.
int dvm_unpack_raw(const uint8_t* blob, uint64_t blob_len, uint8_t** out,
                   uint64_t* out_len) {
  if (blob_len < 12) return -1;
  uint64_t rawlen;
  memcpy(&rawlen, blob, 8);
  // rawlen is attacker-controlled: require room for the magic word and cap
  // against a max zlib expansion of 1024x (real map packets are ~2-4x) so a
  // hostile 8-byte prefix cannot demand an unbounded allocation.
  if (rawlen < 8 || rawlen > (blob_len - 8) * 1024ULL || rawlen > (1ULL << 32))
    return -1;
  uint8_t* raw = static_cast<uint8_t*>(malloc(rawlen));
  if (!raw) return -2;
  uLongf dst = rawlen;
  if (uncompress(raw, &dst, blob + 8, blob_len - 8) != Z_OK || dst != rawlen) {
    free(raw);
    return -3;
  }
  uint32_t magic;
  memcpy(&magic, raw, 4);
  if (magic != kMagic) {
    free(raw);
    return -4;
  }
  *out = raw;
  *out_len = rawlen;
  return 0;
}

void dvm_free(uint8_t* p) { free(p); }

}  // extern "C"
