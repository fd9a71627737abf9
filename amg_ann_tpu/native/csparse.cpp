// csparse — native host-side sparse kernels for amg_ann_tpu.
//
// The reference delegates its entire AMG setup (coarsening, interpolation,
// Galerkin RAP) to hypre inside `PreconditionBoomerAMG::initialize`
// (reference: code/data-generation/common/amg_solver.h:48).  Here the setup
// is our own; the irregular, data-dependent-shape pieces run on host and
// these C++ kernels keep that phase fast.  Exposed through ctypes
// (see native/build.py) — no pybind11 in this image.
//
// Conventions: CSR with int64 indptr, int32 indices, double data.
// Output buffers are allocated here with malloc and released by
// csparse_free_* — callers copy into numpy and free immediately.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// SpGEMM: C = A(m×k) · B(k×n).  Gustavson row-merge with a dense scatter
// accumulator.  Returns 0 on success.
// ---------------------------------------------------------------------------
int csparse_spgemm(
    int64_t m, int64_t k, int64_t n,
    const int64_t* a_indptr, const int32_t* a_indices, const double* a_data,
    const int64_t* b_indptr, const int32_t* b_indices, const double* b_data,
    int64_t** c_indptr_out, int32_t** c_indices_out, double** c_data_out,
    int64_t* c_nnz_out) {
  (void)k;
  int64_t* c_indptr = (int64_t*)malloc(sizeof(int64_t) * (m + 1));
  if (!c_indptr) return 1;
  c_indptr[0] = 0;

  // Symbolic pass: count nnz per row using a "visited" stamp array.
  std::vector<int64_t> stamp(n, -1);
  for (int64_t i = 0; i < m; ++i) {
    int64_t count = 0;
    for (int64_t jj = a_indptr[i]; jj < a_indptr[i + 1]; ++jj) {
      const int32_t j = a_indices[jj];
      for (int64_t kk = b_indptr[j]; kk < b_indptr[j + 1]; ++kk) {
        const int32_t col = b_indices[kk];
        if (stamp[col] != i) {
          stamp[col] = i;
          ++count;
        }
      }
    }
    c_indptr[i + 1] = c_indptr[i] + count;
  }
  const int64_t nnz = c_indptr[m];
  int32_t* c_indices = (int32_t*)malloc(sizeof(int32_t) * std::max<int64_t>(nnz, 1));
  double* c_data = (double*)malloc(sizeof(double) * std::max<int64_t>(nnz, 1));
  if (!c_indices || !c_data) {
    free(c_indptr); free(c_indices); free(c_data);
    return 1;
  }

  // Numeric pass: dense accumulator + sorted column output per row.
  std::vector<double> acc(n, 0.0);
  std::vector<int32_t> rowcols;
  std::fill(stamp.begin(), stamp.end(), -1);
  for (int64_t i = 0; i < m; ++i) {
    rowcols.clear();
    for (int64_t jj = a_indptr[i]; jj < a_indptr[i + 1]; ++jj) {
      const int32_t j = a_indices[jj];
      const double av = a_data[jj];
      for (int64_t kk = b_indptr[j]; kk < b_indptr[j + 1]; ++kk) {
        const int32_t col = b_indices[kk];
        if (stamp[col] != i) {
          stamp[col] = i;
          acc[col] = av * b_data[kk];
          rowcols.push_back(col);
        } else {
          acc[col] += av * b_data[kk];
        }
      }
    }
    std::sort(rowcols.begin(), rowcols.end());
    int64_t ptr = c_indptr[i];
    for (const int32_t col : rowcols) {
      c_indices[ptr] = col;
      c_data[ptr] = acc[col];
      ++ptr;
    }
  }

  *c_indptr_out = c_indptr;
  *c_indices_out = c_indices;
  *c_data_out = c_data;
  *c_nnz_out = nnz;
  return 0;
}

void csparse_free_i64(int64_t* p) { free(p); }
void csparse_free_i32(int32_t* p) { free(p); }
void csparse_free_f64(double* p) { free(p); }

// ---------------------------------------------------------------------------
// CSR transpose: B = A^T for A (m×n).  Caller provides all output buffers
// (sizes are known: nnz identical).
// ---------------------------------------------------------------------------
int csparse_transpose(
    int64_t m, int64_t n,
    const int64_t* a_indptr, const int32_t* a_indices, const double* a_data,
    int64_t* b_indptr, int32_t* b_indices, double* b_data) {
  const int64_t nnz = a_indptr[m];
  std::memset(b_indptr, 0, sizeof(int64_t) * (n + 1));
  for (int64_t e = 0; e < nnz; ++e) b_indptr[a_indices[e] + 1]++;
  for (int64_t j = 0; j < n; ++j) b_indptr[j + 1] += b_indptr[j];
  std::vector<int64_t> next(b_indptr, b_indptr + n);
  for (int64_t i = 0; i < m; ++i) {
    for (int64_t jj = a_indptr[i]; jj < a_indptr[i + 1]; ++jj) {
      const int64_t pos = next[a_indices[jj]]++;
      b_indices[pos] = (int32_t)i;
      b_data[pos] = a_data[jj];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// PMIS C/F splitting on the symmetrized strength graph S ∪ S^T.
// Inputs: the strength graph S in CSR *pattern* form (indices only) plus its
// transpose pattern, and per-point weights w_i = |column i of S| + rand[0,1).
// Output: cf[i] = 1 for C-points, 0 for F-points.
// Deterministic given the weights. Returns number of C points.
// ---------------------------------------------------------------------------
int64_t csparse_pmis(
    int64_t n,
    const int64_t* s_indptr, const int32_t* s_indices,
    const int64_t* st_indptr, const int32_t* st_indices,
    const double* weights, int8_t* cf) {
  // state: 0 undecided, 1 C, -1 F
  std::vector<int8_t> state(n, 0);
  // Points with no strong connections at all become F immediately (they
  // are handled by the smoother alone — hypre does the same for isolated
  // points under PMIS).
  for (int64_t i = 0; i < n; ++i) {
    if (s_indptr[i + 1] == s_indptr[i] && st_indptr[i + 1] == st_indptr[i])
      state[i] = -1;
  }
  bool changed = true;
  while (changed) {
    changed = false;
    // Select: undecided i becomes C if w_i is a strict local max over all
    // undecided neighbors in S ∪ S^T (ties broken by index).
    std::vector<int64_t> newC;
    for (int64_t i = 0; i < n; ++i) {
      if (state[i] != 0) continue;
      bool ismax = true;
      const double wi = weights[i];
      for (int64_t jj = s_indptr[i]; jj < s_indptr[i + 1] && ismax; ++jj) {
        const int32_t j = s_indices[jj];
        if (state[j] == 0 && (weights[j] > wi || (weights[j] == wi && j < i)))
          ismax = false;
      }
      for (int64_t jj = st_indptr[i]; jj < st_indptr[i + 1] && ismax; ++jj) {
        const int32_t j = st_indices[jj];
        if (state[j] == 0 && (weights[j] > wi || (weights[j] == wi && j < i)))
          ismax = false;
      }
      if (ismax) newC.push_back(i);
    }
    if (newC.empty()) {
      // No strict local maxima remain among undecided (can only happen on
      // an empty undecided set); just promote any leftovers to C.
      for (int64_t i = 0; i < n; ++i)
        if (state[i] == 0) { state[i] = 1; changed = false; }
      break;
    }
    changed = true;
    for (const int64_t i : newC) state[i] = 1;
    // Undecided points that strongly depend on a new C point become F.
    for (const int64_t i : newC) {
      for (int64_t jj = st_indptr[i]; jj < st_indptr[i + 1]; ++jj) {
        const int32_t j = st_indices[jj];
        if (state[j] == 0) state[j] = -1;
      }
    }
  }
  int64_t nc = 0;
  for (int64_t i = 0; i < n; ++i) {
    cf[i] = state[i] == 1 ? 1 : 0;
    nc += cf[i];
  }
  return nc;
}

}  // extern "C"
