// Native interleaved-document packer for the unidisc_tpu data path.
//
// C++ twin of unidisc_tpu/data/interleaved.pack_documents (itself a
// TPU-shape-static redesign of the reference's PackingCollate,
// dataloader.py:564-677): greedy first-fit packing of whole documents into
// fixed-length rows — an image block is never split, EOS is inserted
// between documents, pad rows carry sample_id -1, and per-token
// rope_index / img_block_index are emitted (text rope: offset within the
// sample counting ALL tokens, matching the reference's
// add_txt_data_to_blocks alignment; image rope: raster position within
// the block, plus an optional per-segment base for multi-resolution
// tables; img_block_index: 0-based count of prior image blocks in the
// same sample).
//
// The Python packer is the semantic oracle (tests/test_native_packer.py
// checks bit-identical outputs); this one exists for host-side throughput
// at pod-scale global batches, where packing ragged web documents for
// hundreds of rows per step is Python-loop-bound.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pack segments into rows.
//
// Inputs (all int32):
//   seg_ids      concatenated token ids of every segment
//   seg_len[s]   tokens in segment s
//   seg_kind[s]  0 = text, 1 = image
//   seg_doc[s]   document index of segment s (non-decreasing)
//   seg_ropebase[s] base rope index for image segments (0 without
//                multi-resolution tables)
//   n_segs, n_docs, length, pad_id, eos_id (-1 = no EOS)
//
// Outputs: caller-allocated (max_rows, length) int32 arrays; max_rows must
// be >= the worst case (n_docs). Returns the number of rows actually used,
// or -1 on error.
int32_t pack_documents_i32(
    const int32_t* seg_ids, const int32_t* seg_len, const int32_t* seg_kind,
    const int32_t* seg_doc, const int32_t* seg_ropebase,
    int32_t n_segs, int32_t n_docs, int32_t length,
    int32_t pad_id, int32_t eos_id,
    int32_t* input_ids, int32_t* modality, int32_t* sample_ids,
    int32_t* rope_index, int32_t* img_block_index, int32_t max_rows) {
  if (n_segs < 0 || n_docs < 0 || length <= 0 || max_rows < 0) return -1;

  // segment start offsets into seg_ids
  std::vector<int64_t> seg_off(n_segs + 1, 0);
  for (int32_t s = 0; s < n_segs; ++s) {
    if (seg_len[s] < 0) return -1;
    seg_off[s + 1] = seg_off[s] + seg_len[s];
  }

  // document -> [first_seg, last_seg) ranges
  std::vector<int32_t> doc_begin(n_docs, 0), doc_end(n_docs, 0);
  {
    int32_t s = 0;
    for (int32_t d = 0; d < n_docs; ++d) {
      doc_begin[d] = s;
      while (s < n_segs && seg_doc[s] == d) ++s;
      doc_end[d] = s;
    }
    if (s != n_segs) return -1;  // seg_doc not contiguous/non-decreasing
  }

  const bool use_eos = eos_id >= 0;
  struct Placed {            // one placed segment (or synthetic EOS)
    int32_t sample_id;
    int32_t seg;             // -1 => synthetic EOS
  };
  std::vector<std::vector<Placed>> rows;
  std::vector<int32_t> row_space;
  rows.reserve(n_docs);

  int32_t sample_counter = 0;
  for (int32_t d = 0; d < n_docs; ++d) {
    int32_t begin = doc_begin[d], end = doc_end[d];
    // truncate trailing segments until the doc fits an empty row
    int64_t total = use_eos ? 1 : 0;
    for (int32_t s = begin; s < end; ++s) total += seg_len[s];
    while (end > begin && total > length) {
      --end;
      total -= seg_len[end];
    }
    if (end == begin) continue;  // nothing fits; doc dropped (no id)
    const int32_t size = static_cast<int32_t>(total);

    // first-fit
    int32_t target = -1;
    for (size_t ri = 0; ri < rows.size(); ++ri) {
      if (row_space[ri] >= size) { target = static_cast<int32_t>(ri); break; }
    }
    if (target < 0) {
      if (static_cast<int32_t>(rows.size()) >= max_rows) return -1;
      rows.emplace_back();
      row_space.push_back(length);
      target = static_cast<int32_t>(rows.size()) - 1;
    }
    for (int32_t s = begin; s < end; ++s)
      rows[target].push_back({sample_counter, s});
    if (use_eos) rows[target].push_back({sample_counter, -1});
    row_space[target] -= size;
    ++sample_counter;
  }

  const int32_t b = static_cast<int32_t>(rows.size());
  // fill outputs (pad defaults)
  for (int64_t i = 0; i < static_cast<int64_t>(b) * length; ++i) {
    input_ids[i] = pad_id;
    modality[i] = 0;
    sample_ids[i] = -1;
    rope_index[i] = 0;
    img_block_index[i] = 0;
  }

  for (int32_t ri = 0; ri < b; ++ri) {
    int64_t pos = 0;
    // running within-sample offset (ALL tokens) and image-block count
    // per sample id within this row (few samples per row: linear probe)
    std::vector<std::pair<int32_t, int32_t>> samp_off;
    std::vector<std::pair<int32_t, int32_t>> img_cnt;
    auto advance = [](std::vector<std::pair<int32_t, int32_t>>& v,
                      int32_t sid, int32_t n) -> int32_t {
      for (auto& kv : v)
        if (kv.first == sid) { int32_t s0 = kv.second; kv.second += n; return s0; }
      v.push_back({sid, n});
      return 0;
    };
    int32_t* row_ids = input_ids + static_cast<int64_t>(ri) * length;
    int32_t* row_mod = modality + static_cast<int64_t>(ri) * length;
    int32_t* row_sid = sample_ids + static_cast<int64_t>(ri) * length;
    int32_t* row_rope = rope_index + static_cast<int64_t>(ri) * length;
    int32_t* row_ibi = img_block_index + static_cast<int64_t>(ri) * length;
    for (const Placed& p : rows[ri]) {
      if (p.seg < 0) {  // synthetic EOS: one text token
        row_ids[pos] = eos_id;
        row_sid[pos] = p.sample_id;
        row_rope[pos] = advance(samp_off, p.sample_id, 1);
        ++pos;
        continue;
      }
      const int32_t n = seg_len[p.seg];
      std::memcpy(row_ids + pos, seg_ids + seg_off[p.seg],
                  sizeof(int32_t) * n);
      for (int32_t j = 0; j < n; ++j) row_sid[pos + j] = p.sample_id;
      const int32_t s0 = advance(samp_off, p.sample_id, n);
      if (seg_kind[p.seg] == 1) {
        const int32_t cnt = advance(img_cnt, p.sample_id, 1);
        for (int32_t j = 0; j < n; ++j) {
          row_mod[pos + j] = 1;
          row_rope[pos + j] = seg_ropebase[p.seg] + j;
          row_ibi[pos + j] = cnt;
        }
      } else {
        for (int32_t j = 0; j < n; ++j) row_rope[pos + j] = s0 + j;
      }
      pos += n;
    }
  }
  return b;
}

}  // extern "C"
