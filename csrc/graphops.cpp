// graphops: native host-side graph kernels for the TPU GNN framework.
//
// The reference framework's data layer does its exact-k-hop neighborhood
// precompute with scipy spgemm in Python (reference
// h2gcn/datasets/_dataset.py:139-158, flagged "TODO: increase performance"
// at experiments/h2gcn/utils/dataset.py:70). These kernels provide the
// native fast path used by h2gcn_tpu.native:
//
//   * bool_spgemm      — Gustavson sparse×sparse boolean product over CSR
//                        index arrays (values implicitly 1), OpenMP
//                        row-parallel, two-phase (count, fill).
//   * bool_subtract    — A \ B on sorted CSR index arrays (exact-hop
//                        difference 1[(A+I)^k>0] − 1[(A+I)^{k-1}>0]).
//   * build_ell        — CSR → padded ELL neighbor table (GraphSAGE
//                        sampling tables).
//   * csr_to_bsr_count / csr_to_bsr_fill — CSR → block-sparse (BSR)
//                        payload for the Pallas SpMM kernel.
//
// Plain C ABI for ctypes; all index arrays are int64 (scipy default) or
// int32 as noted.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Phase 1: count nnz per row of C = A(boolean) * B(boolean).
// indptr arrays are int64[n+1]; indices int32[nnz].
// The _nt variants cap the OpenMP team size (nt <= 0 = runtime default):
// the thread-transport distributed spgemm (parallel/spgemm.py) runs P
// concurrent Python workers, each of which must own ncpu/P OMP lanes
// instead of oversubscribing P full teams.
void bool_spgemm_count_nt(int64_t n_rows, int64_t n_cols,
                          const int64_t* a_indptr, const int32_t* a_indices,
                          const int64_t* b_indptr, const int32_t* b_indices,
                          int64_t* c_row_counts, int64_t nt) {
#ifdef _OPENMP
    if (nt <= 0) nt = omp_get_max_threads();
#else
    (void)nt;
#endif
#pragma omp parallel num_threads(nt)
    {
        std::vector<int64_t> stamp(n_cols, -1);
#pragma omp for schedule(dynamic, 64)
        for (int64_t i = 0; i < n_rows; ++i) {
            int64_t count = 0;
            for (int64_t jj = a_indptr[i]; jj < a_indptr[i + 1]; ++jj) {
                const int32_t j = a_indices[jj];
                for (int64_t kk = b_indptr[j]; kk < b_indptr[j + 1]; ++kk) {
                    const int32_t k = b_indices[kk];
                    if (stamp[k] != i) {
                        stamp[k] = i;
                        ++count;
                    }
                }
            }
            c_row_counts[i] = count;
        }
    }
}

void bool_spgemm_count(int64_t n_rows, int64_t n_cols,
                       const int64_t* a_indptr, const int32_t* a_indices,
                       const int64_t* b_indptr, const int32_t* b_indices,
                       int64_t* c_row_counts) {
    bool_spgemm_count_nt(n_rows, n_cols, a_indptr, a_indices, b_indptr,
                         b_indices, c_row_counts, 0);
}

// Phase 2: fill C's column indices (sorted per row).
void bool_spgemm_fill_nt(int64_t n_rows, int64_t n_cols,
                         const int64_t* a_indptr, const int32_t* a_indices,
                         const int64_t* b_indptr, const int32_t* b_indices,
                         const int64_t* c_indptr, int32_t* c_indices,
                         int64_t nt) {
#ifdef _OPENMP
    if (nt <= 0) nt = omp_get_max_threads();
#else
    (void)nt;
#endif
#pragma omp parallel num_threads(nt)
    {
        std::vector<int64_t> stamp(n_cols, -1);
#pragma omp for schedule(dynamic, 64)
        for (int64_t i = 0; i < n_rows; ++i) {
            int64_t out = c_indptr[i];
            const int64_t start = out;
            for (int64_t jj = a_indptr[i]; jj < a_indptr[i + 1]; ++jj) {
                const int32_t j = a_indices[jj];
                for (int64_t kk = b_indptr[j]; kk < b_indptr[j + 1]; ++kk) {
                    const int32_t k = b_indices[kk];
                    if (stamp[k] != i) {
                        stamp[k] = i;
                        c_indices[out++] = k;
                    }
                }
            }
            std::sort(c_indices + start, c_indices + out);
        }
    }
}

void bool_spgemm_fill(int64_t n_rows, int64_t n_cols,
                      const int64_t* a_indptr, const int32_t* a_indices,
                      const int64_t* b_indptr, const int32_t* b_indices,
                      const int64_t* c_indptr, int32_t* c_indices) {
    bool_spgemm_fill_nt(n_rows, n_cols, a_indptr, a_indices, b_indptr,
                        b_indices, c_indptr, c_indices, 0);
}

// C = A \ B on sorted CSR index sets; phase 1 counts.
void bool_subtract_count(int64_t n_rows,
                         const int64_t* a_indptr, const int32_t* a_indices,
                         const int64_t* b_indptr, const int32_t* b_indices,
                         int64_t* c_row_counts) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_rows; ++i) {
        int64_t aj = a_indptr[i], bj = b_indptr[i];
        const int64_t ae = a_indptr[i + 1], be = b_indptr[i + 1];
        int64_t count = 0;
        while (aj < ae) {
            while (bj < be && b_indices[bj] < a_indices[aj]) ++bj;
            if (bj >= be || b_indices[bj] != a_indices[aj]) ++count;
            ++aj;
        }
        c_row_counts[i] = count;
    }
}

void bool_subtract_fill(int64_t n_rows,
                        const int64_t* a_indptr, const int32_t* a_indices,
                        const int64_t* b_indptr, const int32_t* b_indices,
                        const int64_t* c_indptr, int32_t* c_indices) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_rows; ++i) {
        int64_t aj = a_indptr[i], bj = b_indptr[i];
        const int64_t ae = a_indptr[i + 1], be = b_indptr[i + 1];
        int64_t out = c_indptr[i];
        while (aj < ae) {
            while (bj < be && b_indices[bj] < a_indices[aj]) ++bj;
            if (bj >= be || b_indices[bj] != a_indices[aj])
                c_indices[out++] = a_indices[aj];
            ++aj;
        }
    }
}

// CSR → padded ELL table [n, dmax] with validity flags.
void build_ell(int64_t n_rows, const int64_t* indptr, const int32_t* indices,
               int64_t dmax, int32_t* table, uint8_t* valid) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t deg = indptr[i + 1] - indptr[i];
        for (int64_t d = 0; d < dmax; ++d) {
            if (d < deg) {
                table[i * dmax + d] = indices[indptr[i] + d];
                valid[i * dmax + d] = 1;
            } else {
                table[i * dmax + d] = 0;
                valid[i * dmax + d] = 0;
            }
        }
    }
}

// CSR → BSR phase 1: mark nonzero blocks. block_mask is [n_rb * n_cb] bytes.
void csr_to_bsr_count(int64_t n_rows, int64_t block,
                      const int64_t* indptr, const int32_t* indices,
                      int64_t n_cb, uint8_t* block_mask) {
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t rb = i / block;
        for (int64_t jj = indptr[i]; jj < indptr[i + 1]; ++jj) {
            block_mask[rb * n_cb + indices[jj] / block] = 1;
        }
    }
}

// CSR → BSR phase 2: scatter values into dense block payloads.
// block_index maps [n_rb*n_cb] → payload slot (or -1).
void csr_to_bsr_fill(int64_t n_rows, int64_t block,
                     const int64_t* indptr, const int32_t* indices,
                     const float* data, int64_t n_cb,
                     const int64_t* block_index, float* blocks) {
    const int64_t bsz = block * block;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t rb = i / block;
        const int64_t ri = i % block;
        for (int64_t jj = indptr[i]; jj < indptr[i + 1]; ++jj) {
            const int64_t cb = indices[jj] / block;
            const int64_t ci = indices[jj] % block;
            const int64_t slot = block_index[rb * n_cb + cb];
            blocks[slot * bsz + ri * block + ci] = data[jj];
        }
    }
}

// Reverse Cuthill-McKee ordering on a symmetric CSR pattern. Writes a
// permutation `perm` (int32[n]) such that A[perm][:, perm] has reduced
// bandwidth — used to cluster edges into dense tiles so the BSR/COO-tile
// SpMM backends touch fewer blocks at large scale. BFS per connected
// component from a minimum-degree seed, neighbors visited in degree order,
// whole order reversed at the end (the classic RCM recipe; greenfield —
// the reference has no analogue, its scipy path densifies instead).
void rcm_order(int64_t n, const int64_t* indptr, const int32_t* indices,
               int32_t* perm) {
    std::vector<int32_t> degree(n);
    for (int64_t i = 0; i < n; ++i)
        degree[i] = static_cast<int32_t>(indptr[i + 1] - indptr[i]);

    // global degree-ascending node order: component seeds are scanned from
    // here so each component starts at (one of) its min-degree nodes.
    std::vector<int32_t> by_degree(n);
    for (int64_t i = 0; i < n; ++i) by_degree[i] = static_cast<int32_t>(i);
    std::sort(by_degree.begin(), by_degree.end(),
              [&](int32_t a, int32_t b) {
                  return degree[a] != degree[b] ? degree[a] < degree[b]
                                                : a < b;
              });

    std::vector<uint8_t> visited(n, 0);
    std::vector<int32_t> order;
    order.reserve(n);
    std::vector<int32_t> nbrs;
    int64_t seed_scan = 0;
    while (static_cast<int64_t>(order.size()) < n) {
        while (visited[by_degree[seed_scan]]) ++seed_scan;
        const int32_t seed = by_degree[seed_scan];
        visited[seed] = 1;
        order.push_back(seed);
        // BFS over order[] itself as the queue
        for (size_t head = order.size() - 1; head < order.size(); ++head) {
            const int32_t u = order[head];
            nbrs.clear();
            for (int64_t jj = indptr[u]; jj < indptr[u + 1]; ++jj) {
                const int32_t v = indices[jj];
                if (!visited[v]) {
                    visited[v] = 1;
                    nbrs.push_back(v);
                }
            }
            std::sort(nbrs.begin(), nbrs.end(),
                      [&](int32_t a, int32_t b) {
                          return degree[a] != degree[b]
                                     ? degree[a] < degree[b]
                                     : a < b;
                      });
            order.insert(order.end(), nbrs.begin(), nbrs.end());
        }
    }
    for (int64_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
}

int graphops_version() { return 3; }

}  // extern "C"
