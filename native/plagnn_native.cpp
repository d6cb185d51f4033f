// Native preprocessing kernels for plagnn-tpu.
//
// The reference's preprocessing hot loops run in Python
// (/root/reference/code/data_preprocess.py:175-214 — O(E·N) dense-row ECC
// triangle counting; :228-257 — O(N²) dense topology thresholding).  These
// C++ kernels provide the heavy inner loops behind the numpy/scipy front
// ends in plagnn_tpu.data (loaded via ctypes; results are bit-identical to
// the scipy paths, which remain as fallbacks).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC plagnn_native.cpp -o libplagnn_native.so

#include <cstdint>
#include <algorithm>

extern "C" {

// Common-neighbor counts for query edges over a sorted CSR adjacency.
// indptr: (n+1) int64, indices: (nnz) int32 sorted per row.
// rows/cols: (n_queries) int32.  out: (n_queries) double.
void common_neighbors(const int64_t* indptr, const int32_t* indices,
                      const int32_t* rows, const int32_t* cols,
                      int64_t n_queries, double* out) {
#pragma omp parallel for schedule(dynamic, 2048)
  for (int64_t q = 0; q < n_queries; ++q) {
    const int32_t r = rows[q], c = cols[q];
    int64_t i = indptr[r], ie = indptr[r + 1];
    int64_t j = indptr[c], je = indptr[c + 1];
    int64_t cnt = 0;
    while (i < ie && j < je) {
      const int32_t a = indices[i], b = indices[j];
      cnt += (a == b);
      i += (a <= b);
      j += (b <= a);
    }
    out[q] = static_cast<double>(cnt);
  }
}

// Pearson-difference threshold scan for one row block.
// z_inter/z_nor: (n, k) row-normalized expression matrices (zero-mean,
// unit-norm rows; zero rows for invalid proteins), row-major.
// For rows [row0, row1), finds columns j where
//   diff(i, j) = z_inter[i]·z_inter[j] − z_nor[i]·z_nor[j]
// is < lo (emit kind 0) or > hi (emit kind 1), excluding the diagonal.
// Returns the number of hits written (caps at max_out).
int64_t diff_threshold_scan(const double* z_inter, const double* z_nor,
                            int64_t n, int64_t k,
                            int64_t row0, int64_t row1,
                            double lo, double hi,
                            int32_t* out_i, int32_t* out_j, int8_t* out_kind,
                            int64_t max_out) {
  int64_t n_out = 0;
  for (int64_t i = row0; i < row1; ++i) {
    const double* zi_a = z_inter + i * k;
    const double* zi_b = z_nor + i * k;
    for (int64_t j = 0; j < n; ++j) {
      if (j == i) continue;
      const double* zj_a = z_inter + j * k;
      const double* zj_b = z_nor + j * k;
      double da = 0.0, db = 0.0;
      for (int64_t t = 0; t < k; ++t) {
        da += zi_a[t] * zj_a[t];
        db += zi_b[t] * zj_b[t];
      }
      const double diff = da - db;
      if (diff < lo || diff > hi) {
        if (n_out >= max_out) return n_out;
        out_i[n_out] = static_cast<int32_t>(i);
        out_j[n_out] = static_cast<int32_t>(j);
        out_kind[n_out] = diff > hi ? 1 : 0;
        ++n_out;
      }
    }
  }
  return n_out;
}

}  // extern "C"
