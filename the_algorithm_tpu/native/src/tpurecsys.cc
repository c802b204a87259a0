// Native host-side data plane for the_algorithm_tpu.
//
// C++ replacements for the reference's native input path (SURVEY.md §2.2):
//   - MurmurHash3 x64 128 + twml feature-id hashing
//     (≡ twml/libtwml/src/lib/murmur_hash3.cpp, functions.cpp)
//   - integer multiplicative hashing discretizer
//     (≡ twml/libtwml/src/lib/hashing_discretizer_impl.cpp:51-70)
//   - TRec block-format record codec: encode/decode batches of sparse
//     (feature-id, value) records (≡ libtwml DataRecord/HashedDataRecord +
//     BlockFormatReader, twml/libtwml/src/lib/BlockFormatReader.cpp)
//   - batch densifier: records → fixed-width dense/hashed tensors driven by
//     a feature-id vocab (≡ navi/dr_transform segdense converter.rs)
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in the image).
//
// TRec wire format (little endian):
//   Block  := magic 'TREC' | u32 n_records | Record*
//   Record := u32 byte_len | u16 n_cont | u16 n_label
//             n_cont  × (i64 feature_id | f32 value)
//             n_label × (i64 feature_id | f32 value)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- murmur3

static inline uint64_t rotl64(uint64_t x, int8_t r) {
  return (x << r) | (x >> (64 - r));
}

static inline uint64_t fmix64(uint64_t k) {
  k ^= k >> 33;
  k *= 0xff51afd7ed558ccdULL;
  k ^= k >> 33;
  k *= 0xc4ceb9fe1a85ec53ULL;
  k ^= k >> 33;
  return k;
}

// MurmurHash3 x64 128-bit (public-domain algorithm, Austin Appleby).
void tpurecsys_murmur3_x64_128(const uint8_t* data, uint64_t len,
                               uint32_t seed, uint64_t* out) {
  const uint64_t nblocks = len / 16;
  uint64_t h1 = seed, h2 = seed;
  const uint64_t c1 = 0x87c37b91114253d5ULL;
  const uint64_t c2 = 0x4cf5ad432745937fULL;

  const uint64_t* blocks = reinterpret_cast<const uint64_t*>(data);
  for (uint64_t i = 0; i < nblocks; i++) {
    uint64_t k1, k2;
    std::memcpy(&k1, &blocks[i * 2 + 0], 8);
    std::memcpy(&k2, &blocks[i * 2 + 1], 8);
    k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
    h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729;
    k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
    h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5;
  }

  const uint8_t* tail = data + nblocks * 16;
  uint64_t k1 = 0, k2 = 0;
  switch (len & 15) {
    case 15: k2 ^= ((uint64_t)tail[14]) << 48; [[fallthrough]];
    case 14: k2 ^= ((uint64_t)tail[13]) << 40; [[fallthrough]];
    case 13: k2 ^= ((uint64_t)tail[12]) << 32; [[fallthrough]];
    case 12: k2 ^= ((uint64_t)tail[11]) << 24; [[fallthrough]];
    case 11: k2 ^= ((uint64_t)tail[10]) << 16; [[fallthrough]];
    case 10: k2 ^= ((uint64_t)tail[9]) << 8; [[fallthrough]];
    case 9:
      k2 ^= ((uint64_t)tail[8]) << 0;
      k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
      [[fallthrough]];
    case 8: k1 ^= ((uint64_t)tail[7]) << 56; [[fallthrough]];
    case 7: k1 ^= ((uint64_t)tail[6]) << 48; [[fallthrough]];
    case 6: k1 ^= ((uint64_t)tail[5]) << 40; [[fallthrough]];
    case 5: k1 ^= ((uint64_t)tail[4]) << 32; [[fallthrough]];
    case 4: k1 ^= ((uint64_t)tail[3]) << 24; [[fallthrough]];
    case 3: k1 ^= ((uint64_t)tail[2]) << 16; [[fallthrough]];
    case 2: k1 ^= ((uint64_t)tail[1]) << 8; [[fallthrough]];
    case 1:
      k1 ^= ((uint64_t)tail[0]) << 0;
      k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
      break;
    default: break;
  }

  h1 ^= len; h2 ^= len;
  h1 += h2; h2 += h1;
  h1 = fmix64(h1); h2 = fmix64(h2);
  h1 += h2; h2 += h1;
  out[0] = h1;
  out[1] = h2;
}

// Feature-name → int64 id, parity with twml_get_feature_id
// (functions.cpp:103-137): utf16-le encode, '#'-split two-stage hashing.
// `name` is UTF-8; for parity we only support ASCII/BMP (the reference
// converts utf8→utf16; feature names are ASCII in practice).
int64_t tpurecsys_feature_id(const char* name, uint64_t len) {
  // ascii → utf16-le
  std::vector<uint8_t> u16;
  u16.reserve(len * 2);
  uint64_t k = 0;
  for (uint64_t i = 0; i < len; i++) {
    if (name[i] == '#' && k == 0 && i > 0) k = i;
  }
  uint64_t h[2];
  if (k != 0) {
    for (uint64_t i = 0; i < k; i++) {
      u16.push_back((uint8_t)name[i]);
      u16.push_back(0);
    }
    tpurecsys_murmur3_x64_128(u16.data(), u16.size(), 0, h);
    std::vector<uint8_t> buf(8);
    std::memcpy(buf.data(), &h[0], 8);
    for (uint64_t i = k + 1; i < len; i++) {
      buf.push_back((uint8_t)name[i]);
      buf.push_back(0);
    }
    tpurecsys_murmur3_x64_128(buf.data(), buf.size(), 0, h);
  } else {
    for (uint64_t i = 0; i < len; i++) {
      u16.push_back((uint8_t)name[i]);
      u16.push_back(0);
    }
    tpurecsys_murmur3_x64_128(u16.data(), u16.size(), 0, h);
  }
  int64_t id;
  std::memcpy(&id, &h[0], 8);
  return id;
}

// ------------------------------------------- multiplicative hashing (twml)

// ≡ integer_multiplicative_hashing (hashing_discretizer_impl.cpp:51-70).
void tpurecsys_multiplicative_hash(const int64_t* feature_ids,
                                   const int64_t* bucket_indices,
                                   int32_t* out, uint64_t n,
                                   uint64_t output_bits) {
  const uint64_t c = 2654435761ULL;
  const uint64_t N = 32;
  const uint64_t mask = (1ULL << output_bits) - 1;
  for (uint64_t i = 0; i < n; i++) {
    uint64_t f = (uint64_t)feature_ids[i];
    f *= c;
    f += (uint64_t)bucket_indices[i];
    f *= c;
    f >>= N - output_bits;
    out[i] = (int32_t)(mask & f);
  }
}

// --------------------------------------------------------- TRec codec

static const uint32_t kMagic = 0x43455254;  // 'TREC' LE

// Encode a batch of records given flat CSR-style arrays. Returns bytes
// written, or the required size if `out` is null (call twice).
uint64_t tpurecsys_encode_block(
    const int64_t* cont_fids, const float* cont_vals,
    const uint32_t* cont_offsets,  // [n_records+1]
    const int64_t* label_fids, const float* label_vals,
    const uint32_t* label_offsets,  // [n_records+1]
    uint32_t n_records, uint8_t* out, uint64_t out_cap) {
  uint64_t need = 8;  // magic + n_records
  for (uint32_t r = 0; r < n_records; r++) {
    uint32_t nc = cont_offsets[r + 1] - cont_offsets[r];
    uint32_t nl = label_offsets[r + 1] - label_offsets[r];
    need += 8 + (uint64_t)(nc + nl) * 12;
  }
  if (out == nullptr) return need;
  if (out_cap < need) return 0;

  uint8_t* p = out;
  std::memcpy(p, &kMagic, 4); p += 4;
  std::memcpy(p, &n_records, 4); p += 4;
  for (uint32_t r = 0; r < n_records; r++) {
    uint32_t nc = cont_offsets[r + 1] - cont_offsets[r];
    uint32_t nl = label_offsets[r + 1] - label_offsets[r];
    uint32_t byte_len = 8 + (nc + nl) * 12;
    uint16_t nc16 = (uint16_t)nc, nl16 = (uint16_t)nl;
    std::memcpy(p, &byte_len, 4); p += 4;
    std::memcpy(p, &nc16, 2); p += 2;
    std::memcpy(p, &nl16, 2); p += 2;
    for (uint32_t i = cont_offsets[r]; i < cont_offsets[r + 1]; i++) {
      std::memcpy(p, &cont_fids[i], 8); p += 8;
      std::memcpy(p, &cont_vals[i], 4); p += 4;
    }
    for (uint32_t i = label_offsets[r]; i < label_offsets[r + 1]; i++) {
      std::memcpy(p, &label_fids[i], 8); p += 8;
      std::memcpy(p, &label_vals[i], 4); p += 4;
    }
  }
  return need;
}

// Returns n_records, or 0 on parse failure.
uint32_t tpurecsys_block_num_records(const uint8_t* buf, uint64_t len) {
  if (len < 8) return 0;
  uint32_t magic, n;
  std::memcpy(&magic, buf, 4);
  std::memcpy(&n, buf + 4, 4);
  if (magic != kMagic) return 0;
  return n;
}

// Decode into CSR arrays. Caller sizes arrays using the totals returned by
// tpurecsys_block_totals. Returns 1 on success.
int tpurecsys_block_totals(const uint8_t* buf, uint64_t len,
                           uint64_t* total_cont, uint64_t* total_label) {
  uint32_t n = tpurecsys_block_num_records(buf, len);
  const uint8_t* p = buf + 8;
  const uint8_t* end = buf + len;
  uint64_t tc = 0, tl = 0;
  for (uint32_t r = 0; r < n; r++) {
    if (p + 8 > end) return 0;
    uint32_t byte_len; uint16_t nc, nl;
    std::memcpy(&byte_len, p, 4);
    std::memcpy(&nc, p + 4, 2);
    std::memcpy(&nl, p + 6, 2);
    if (p + byte_len > end) return 0;
    tc += nc; tl += nl;
    p += byte_len;
  }
  *total_cont = tc;
  *total_label = tl;
  return 1;
}

int tpurecsys_decode_block(
    const uint8_t* buf, uint64_t len,
    int64_t* cont_fids, float* cont_vals, uint32_t* cont_offsets,
    int64_t* label_fids, float* label_vals, uint32_t* label_offsets) {
  uint32_t n = tpurecsys_block_num_records(buf, len);
  const uint8_t* p = buf + 8;
  uint64_t ci = 0, li = 0;
  cont_offsets[0] = 0;
  label_offsets[0] = 0;
  for (uint32_t r = 0; r < n; r++) {
    uint32_t byte_len; uint16_t nc, nl;
    std::memcpy(&byte_len, p, 4);
    std::memcpy(&nc, p + 4, 2);
    std::memcpy(&nl, p + 6, 2);
    const uint8_t* q = p + 8;
    for (uint16_t i = 0; i < nc; i++) {
      std::memcpy(&cont_fids[ci], q, 8); q += 8;
      std::memcpy(&cont_vals[ci], q, 4); q += 4;
      ci++;
    }
    for (uint16_t i = 0; i < nl; i++) {
      std::memcpy(&label_fids[li], q, 8); q += 8;
      std::memcpy(&label_vals[li], q, 4); q += 4;
      li++;
    }
    cont_offsets[r + 1] = (uint32_t)ci;
    label_offsets[r + 1] = (uint32_t)li;
    p += byte_len;
  }
  return 1;
}

// ------------------------------------------------------------- densify

// Records → dense [n_records, n_vocab] matrix by feature-id vocab
// (≡ dr_transform's segdense slot mapping). Vocab must be sorted ascending.
// Missing features leave 0 and clear the mask bit.
int tpurecsys_densify(
    const uint8_t* buf, uint64_t len,
    const int64_t* vocab, uint32_t n_vocab,
    float* out_values /* [n_records, n_vocab] zeroed by caller */,
    uint8_t* out_mask /* [n_records, n_vocab] zeroed by caller */) {
  uint32_t n = tpurecsys_block_num_records(buf, len);
  const uint8_t* p = buf + 8;
  for (uint32_t r = 0; r < n; r++) {
    uint32_t byte_len; uint16_t nc, nl;
    std::memcpy(&byte_len, p, 4);
    std::memcpy(&nc, p + 4, 2);
    std::memcpy(&nl, p + 6, 2);
    const uint8_t* q = p + 8;
    for (uint16_t i = 0; i < nc; i++) {
      int64_t fid; float val;
      std::memcpy(&fid, q, 8); q += 8;
      std::memcpy(&val, q, 4); q += 4;
      const int64_t* lo = std::lower_bound(vocab, vocab + n_vocab, fid);
      if (lo != vocab + n_vocab && *lo == fid) {
        uint32_t col = (uint32_t)(lo - vocab);
        out_values[(uint64_t)r * n_vocab + col] = val;
        out_mask[(uint64_t)r * n_vocab + col] = 1;
      }
    }
    p += byte_len;
  }
  return 1;
}

// Label-section densify: same slot mapping over each record's label list
// (≡ DecodeDataRecord's label outputs, twml/libtwml/src/ops/data_record.cpp).
int tpurecsys_densify_labels(
    const uint8_t* buf, uint64_t len,
    const int64_t* vocab, uint32_t n_vocab,
    float* out_values /* [n_records, n_vocab] zeroed by caller */,
    uint8_t* out_mask /* [n_records, n_vocab] zeroed by caller */) {
  uint32_t n = tpurecsys_block_num_records(buf, len);
  const uint8_t* p = buf + 8;
  for (uint32_t r = 0; r < n; r++) {
    uint32_t byte_len; uint16_t nc, nl;
    std::memcpy(&byte_len, p, 4);
    std::memcpy(&nc, p + 4, 2);
    std::memcpy(&nl, p + 6, 2);
    const uint8_t* q = p + 8 + (uint64_t)nc * 12;  // skip cont section
    for (uint16_t i = 0; i < nl; i++) {
      int64_t fid; float val;
      std::memcpy(&fid, q, 8); q += 8;
      std::memcpy(&val, q, 4); q += 4;
      const int64_t* lo = std::lower_bound(vocab, vocab + n_vocab, fid);
      if (lo != vocab + n_vocab && *lo == fid) {
        uint32_t col = (uint32_t)(lo - vocab);
        out_values[(uint64_t)r * n_vocab + col] = val;
        out_mask[(uint64_t)r * n_vocab + col] = 1;
      }
    }
    p += byte_len;
  }
  return 1;
}

// ------------------------------------- hashing discretizer (batch, C++)

// ≡ HashingDiscretizer::compute (hashing_discretizer_impl.cpp:121-160):
// per (feature, value): bin = lower_bound(bin_vals[row], value), then
// multiplicative hash into 2**bits. Rows resolved via sorted vocab.
// Unknown features hash with bucket 0 (the reference keeps raw id; we take
// bucket 0 so outputs stay in-range — callers pre-filter vocab anyway).
int tpurecsys_hash_discretize(
    const uint8_t* buf, uint64_t len,
    const int64_t* vocab, uint32_t n_vocab,
    const float* bin_vals, uint32_t n_bins_minus_1,
    uint32_t output_bits, uint32_t max_width,
    int32_t* out_indices /* [n_records, max_width], caller-zeroed */,
    float* out_values /* [n_records, max_width] */,
    uint8_t* out_mask /* [n_records, max_width] */) {
  uint32_t n = tpurecsys_block_num_records(buf, len);
  const uint8_t* p = buf + 8;
  const uint64_t c = 2654435761ULL;
  for (uint32_t r = 0; r < n; r++) {
    uint32_t byte_len; uint16_t nc, nl;
    std::memcpy(&byte_len, p, 4);
    std::memcpy(&nc, p + 4, 2);
    std::memcpy(&nl, p + 6, 2);
    const uint8_t* q = p + 8;
    uint32_t w = 0;
    for (uint16_t i = 0; i < nc && w < max_width; i++) {
      int64_t fid; float val;
      std::memcpy(&fid, q, 8); q += 8;
      std::memcpy(&val, q, 4); q += 4;
      const int64_t* lo = std::lower_bound(vocab, vocab + n_vocab, fid);
      if (lo == vocab + n_vocab || *lo != fid) continue;
      uint32_t row = (uint32_t)(lo - vocab);
      const float* bins = bin_vals + (uint64_t)row * n_bins_minus_1;
      uint32_t bucket =
          (uint32_t)(std::lower_bound(bins, bins + n_bins_minus_1, val) -
                     bins);
      uint64_t h = (uint64_t)fid;
      h *= c;
      h += bucket;
      h *= c;
      h >>= 32 - output_bits;
      out_indices[(uint64_t)r * max_width + w] =
          (int32_t)(h & ((1ULL << output_bits) - 1));
      out_values[(uint64_t)r * max_width + w] = 1.0f;
      out_mask[(uint64_t)r * max_width + w] = 1;
      w++;
    }
    p += byte_len;
  }
  return 1;
}

}  // extern "C"
