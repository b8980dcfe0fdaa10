// WELL (windowed gathered-ELL) packer — native engine.
//
// Converts a canonical CSR matrix into the WELL chunk layout consumed by the
// Pallas SpMV kernel (see sparse_linear_tpu/formats/well.py for the format
// invariants).  The vectorized numpy packer is ~20 s for 21M nonzeros on
// this class of host; this single greedy pass is O(nnz * avg_chunk_scan)
// and runs in well under a second.
//
// Greedy first-fit per entry (row r, col c), processed in CSR order:
//   vreg v = r >> 10, sublane i = (r >> 7) & 7, slot lane j = r & 127
//   window w = c >> 10, source sublane rr = (c >> 7) & 7, lane l = c & 127
// An entry goes into the first chunk of (v, w) such that
//   (1) no other entry of row r is already in the chunk, and
//   (2) the chunk's sublane-i lane-l cell is unset or already equals rr
//       (two reads of the same source cell may share it).
// A new chunk is appended when none fits.  This reproduces exactly the
// constraint set of the Python packer (formats/well.py) — the depths the
// fixpoint converges to are the same chunks this greedy scan assigns.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Chunk {
  int64_t base;                  // x2-row units (multiple of 8)
  int64_t last_row;              // constraint (1): one entry per row
  std::vector<uint8_t> lmap;     // 8*128 cells, rr+1 (0 = unset)
  std::vector<int32_t> idx;      // 8*128 packed (r'<<7 | l)
  std::vector<double> vals;      // 8*128
  std::vector<double> vals_im;   // 8*128 (only when complex)

  Chunk(int64_t b, bool complex_)
      : base(b), last_row(-1), lmap(8 * 128, 0), idx(8 * 128, 0),
        vals(8 * 128, 0.0) {
    if (complex_) vals_im.assign(8 * 128, 0.0);
  }
};

struct WellPack {
  int64_t n_vregs = 0;
  int64_t c_max = 0;
  bool complex_ = false;
  // chunks per vreg, in creation (= local chunk index) order
  std::vector<std::vector<Chunk>> per_vreg;
};

}  // namespace

extern "C" {

// Returns a handle, or nullptr when cap > 0 and some vreg needs more chunks.
void* slt_wellpack(int64_t nr, int64_t nc, int64_t nnz,
                   const int64_t* indptr, const int32_t* indices,
                   const double* vals, const double* vals_im,
                   int32_t cap) {
  (void)nc;
  auto* wp = new WellPack();
  wp->complex_ = vals_im != nullptr;
  int64_t n_vregs = (nr + 1023) / 1024;
  if (n_vregs < 1) n_vregs = 1;
  wp->n_vregs = n_vregs;
  wp->per_vreg.resize(n_vregs);

  // per-vreg window -> chunk-id list; rebuilt when the vreg changes
  std::unordered_map<int64_t, std::vector<int32_t>> win_chunks;
  int64_t cur_v = -1;

  for (int64_t row = 0; row < nr; ++row) {
    int64_t v = row >> 10;
    if (v != cur_v) {
      win_chunks.clear();
      cur_v = v;
    }
    int i = (int)((row >> 7) & 7);
    int j = (int)(row & 127);
    auto& chunks = wp->per_vreg[v];
    for (int64_t e = indptr[row]; e < indptr[row + 1]; ++e) {
      int64_t c = indices[e];
      int64_t w = c >> 10;
      int rr = (int)((c >> 7) & 7);
      int l = (int)(c & 127);
      auto& list = win_chunks[w];
      int32_t pick = -1;
      for (int32_t ch : list) {
        Chunk& k = chunks[ch];
        if (k.last_row == row) continue;                 // (1)
        uint8_t cell = k.lmap[i * 128 + l];
        if (cell != 0 && cell != (uint8_t)(rr + 1)) continue;  // (2)
        pick = ch;
        break;
      }
      if (pick < 0) {
        if (cap > 0 && (int64_t)chunks.size() >= cap) {
          delete wp;
          return nullptr;
        }
        pick = (int32_t)chunks.size();
        chunks.emplace_back(w * 8, wp->complex_);
        list.push_back(pick);
      }
      Chunk& k = chunks[pick];
      k.last_row = row;
      k.lmap[i * 128 + l] = (uint8_t)(rr + 1);
      k.idx[i * 128 + j] |= l;
      k.idx[i * 128 + l] |= (rr << 7);
      k.vals[i * 128 + j] = vals[e];
      if (wp->complex_) k.vals_im[i * 128 + j] = vals_im[e];
    }
  }
  for (auto& chunks : wp->per_vreg)
    if ((int64_t)chunks.size() > wp->c_max) wp->c_max = (int64_t)chunks.size();
  if (wp->c_max < 1) wp->c_max = 1;
  return wp;
}

void slt_wellpack_sizes(void* h, int64_t* out) {
  auto* wp = (WellPack*)h;
  out[0] = wp->n_vregs;
  out[1] = wp->c_max;
}

// bases: (n_vregs * c_max) i32; idx: (n_vregs * c_max * 1024) i32;
// vals / vals_im: same count, f64.  vals_im may be nullptr for real packs.
void slt_wellpack_fill(void* h, int32_t* bases, int32_t* idx,
                       double* vals, double* vals_im) {
  auto* wp = (WellPack*)h;
  const int64_t cm = wp->c_max;
  std::memset(bases, 0, sizeof(int32_t) * wp->n_vregs * cm);
  std::memset(idx, 0, sizeof(int32_t) * wp->n_vregs * cm * 1024);
  std::memset(vals, 0, sizeof(double) * wp->n_vregs * cm * 1024);
  if (vals_im) std::memset(vals_im, 0, sizeof(double) * wp->n_vregs * cm * 1024);
  for (int64_t v = 0; v < wp->n_vregs; ++v) {
    auto& chunks = wp->per_vreg[v];
    for (int64_t c = 0; c < (int64_t)chunks.size(); ++c) {
      Chunk& k = chunks[c];
      bases[v * cm + c] = (int32_t)k.base;
      std::memcpy(idx + (v * cm + c) * 1024, k.idx.data(),
                  sizeof(int32_t) * 1024);
      std::memcpy(vals + (v * cm + c) * 1024, k.vals.data(),
                  sizeof(double) * 1024);
      if (vals_im && wp->complex_)
        std::memcpy(vals_im + (v * cm + c) * 1024, k.vals_im.data(),
                    sizeof(double) * 1024);
    }
  }
}

void slt_wellpack_free(void* h) { delete (WellPack*)h; }

}  // extern "C"
