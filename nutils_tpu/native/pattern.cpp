// Native sparse-pattern builder: sort-and-deduplicate COO entry streams into
// CSR with a slot map for device-side value scatter.  This replaces the
// numpy lexsort/cumsum pipeline of matrix.SparsePattern (the role the
// reference delegates to its compiled sparse backend, matrix/_base.py) with
// a single-pass C++ radix/std::sort over packed 64-bit keys, multithreaded
// over chunks.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpattern.so pattern.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>
#include <thread>

extern "C" {

// Phase 1: sort entry ids by (row, col) key; returns via out arrays.
//   rows/cols: int64[n]; order_out: int64[n] (permutation sorting entries)
void pattern_argsort(const int64_t* rows, const int64_t* cols, int64_t n,
                     int64_t ncols, int64_t* order_out)
{
    std::vector<std::pair<uint64_t, int64_t>> keyed(n);
    const uint64_t nc = (uint64_t)ncols;
    for (int64_t i = 0; i < n; ++i)
        keyed[i] = { (uint64_t)rows[i] * nc + (uint64_t)cols[i], i };

    unsigned hw = std::thread::hardware_concurrency();
    int nthreads = hw > 1 ? (int)std::min<unsigned>(hw, 16) : 1;
    if (n < (1 << 16) || nthreads <= 1) {
        std::sort(keyed.begin(), keyed.end());
    } else {
        // parallel chunk sort + k-way merge via repeated inplace_merge
        int64_t chunk = (n + nthreads - 1) / nthreads;
        std::vector<std::thread> ts;
        for (int t = 0; t < nthreads; ++t) {
            int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
            if (lo >= hi) break;
            ts.emplace_back([&keyed, lo, hi] {
                std::sort(keyed.begin() + lo, keyed.begin() + hi);
            });
        }
        for (auto& t : ts) t.join();
        for (int64_t width = chunk; width < n; width *= 2)
            for (int64_t lo = 0; lo + width < n; lo += 2 * width)
                std::inplace_merge(keyed.begin() + lo, keyed.begin() + lo + width,
                                   keyed.begin() + std::min<int64_t>(n, lo + 2 * width));
    }
    for (int64_t i = 0; i < n; ++i)
        order_out[i] = keyed[i].second;
}

// Phase 2: given sorted order, emit slot ids per original entry plus unique
// (row, col) pairs.  Returns nnz.  slot_out: int64[n]; urows/ucols: int64[n]
// (only the first nnz entries are meaningful).
int64_t pattern_dedup(const int64_t* rows, const int64_t* cols, int64_t n,
                      const int64_t* order, int64_t* slot_out,
                      int64_t* urows, int64_t* ucols)
{
    int64_t nnz = 0;
    int64_t prev_r = -1, prev_c = -1;
    for (int64_t i = 0; i < n; ++i) {
        int64_t j = order[i];
        int64_t r = rows[j], c = cols[j];
        if (r != prev_r || c != prev_c) {
            urows[nnz] = r;
            ucols[nnz] = c;
            ++nnz;
            prev_r = r;
            prev_c = c;
        }
        slot_out[j] = nnz - 1;
    }
    return nnz;
}

// CSR row pointer from sorted unique rows: indptr: int64[nrows+1]
void pattern_indptr(const int64_t* urows, int64_t nnz, int64_t nrows,
                    int64_t* indptr)
{
    std::memset(indptr, 0, sizeof(int64_t) * (nrows + 1));
    for (int64_t i = 0; i < nnz; ++i)
        indptr[urows[i] + 1] += 1;
    for (int64_t r = 0; r < nrows; ++r)
        indptr[r + 1] += indptr[r];
}

} // extern "C"
