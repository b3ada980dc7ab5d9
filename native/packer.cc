// Native host-side data path: token-cache batch packing.
//
// The reference's per-batch work happened in 10 Python DataLoader workers
// (/root/reference/sparse_vae/text_data_module.py:175-228: fetch rows,
// reinterpret uint16, pad-pack into one tensor). Here the equivalent is a
// single C++ pass over a memory-mapped uint16 token cache: for each batch
// row, widen uint16 -> int32 directly into the preallocated [rows, L]
// buffer and record the row's token count. No Python object per document,
// no intermediate copies.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

extern "C" {

// Pack documents into a zero-initialized [rows, bucket_len] int32 batch.
//   tokens:      base pointer of the uint16 token arena
//   offsets:     [n_total_docs + 1] start offsets into `tokens`
//   doc_indices: [n_docs] documents to place in rows 0..n_docs-1
//   rows:        total rows in the output (>= n_docs; tail rows stay PAD)
//   bucket_len:  row length; documents longer than this are truncated
//   out:         [rows * bucket_len] int32, caller-allocated
//   num_tokens:  [rows] int32, caller-allocated
// Returns 0 on success, -1 on bad arguments.
int svt_pack_batch(const uint16_t* tokens, const uint64_t* offsets,
                   const int64_t* doc_indices, int n_docs, int rows,
                   int bucket_len, int32_t* out, int32_t* num_tokens) {
  if (!tokens || !offsets || !doc_indices || !out || !num_tokens ||
      n_docs < 0 || n_docs > rows || bucket_len <= 0) {
    return -1;
  }
  std::memset(out, 0, sizeof(int32_t) * static_cast<size_t>(rows) *
                          static_cast<size_t>(bucket_len));
  std::memset(num_tokens, 0, sizeof(int32_t) * static_cast<size_t>(rows));

  for (int r = 0; r < n_docs; ++r) {
    const int64_t doc = doc_indices[r];
    const uint64_t start = offsets[doc];
    const uint64_t end = offsets[doc + 1];
    int64_t len = static_cast<int64_t>(end - start);
    if (len > bucket_len) len = bucket_len;
    const uint16_t* src = tokens + start;
    int32_t* dst = out + static_cast<size_t>(r) * bucket_len;
    for (int64_t i = 0; i < len; ++i) {
      dst[i] = static_cast<int32_t>(src[i]);
    }
    num_tokens[r] = static_cast<int32_t>(len);
  }
  return 0;
}

// Bucket lengths: round each value up to the next multiple (vectorized host
// loop for epoch planning; text_data_module.py:166-170 semantics).
void svt_bucket_lengths(const int64_t* lengths, int64_t n, int64_t multiple,
                        int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = ((lengths[i] + multiple - 1) / multiple) * multiple;
  }
}

}  // extern "C"
