// Native sparse-pattern builder: sort-and-deduplicate COO entry streams into
// CSR with a slot map for device-side value scatter.  This replaces the
// numpy lexsort/cumsum pipeline of matrix.SparsePattern (the role the
// reference delegates to its compiled sparse backend, matrix/_base.py).
//
// The sort is a parallel LSD radix sort over packed (row * ncols + col)
// keys: per-thread digit histograms, exclusive global offsets, stable
// parallel scatter — ~10x the merge-based std::sort pipeline at the
// 10M-entry streams a ~1M-dof assembly produces.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpattern.so pattern.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>
#include <thread>

namespace {

constexpr int RADIX_BITS = 11;
constexpr int RADIX = 1 << RADIX_BITS;

struct Entry { uint64_t key; int64_t id; };

void radix_sort(std::vector<Entry>& a, uint64_t maxkey)
{
    const int64_t n = (int64_t)a.size();
    int keybits = 1;
    while (maxkey >> keybits) ++keybits;
    const int npass = (keybits + RADIX_BITS - 1) / RADIX_BITS;

    unsigned hw = std::thread::hardware_concurrency();
    int T = hw > 1 ? (int)std::min<unsigned>(hw, 32) : 1;
    if (n < (1 << 15)) T = 1;
    const int64_t chunk = (n + T - 1) / T;

    std::vector<Entry> b(n);
    std::vector<int64_t> hist((size_t)T * RADIX);

    Entry* src = a.data();
    Entry* dst = b.data();
    for (int pass = 0; pass < npass; ++pass) {
        const int shift = pass * RADIX_BITS;
        std::fill(hist.begin(), hist.end(), 0);
        {
            std::vector<std::thread> ts;
            for (int t = 0; t < T; ++t) {
                int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
                if (lo >= hi) break;
                ts.emplace_back([&, t, lo, hi] {
                    int64_t* h = hist.data() + (size_t)t * RADIX;
                    for (int64_t i = lo; i < hi; ++i)
                        ++h[(src[i].key >> shift) & (RADIX - 1)];
                });
            }
            for (auto& th : ts) th.join();
        }
        // exclusive offsets in digit-major, thread-minor order (stability)
        int64_t sum = 0;
        for (int d = 0; d < RADIX; ++d)
            for (int t = 0; t < T; ++t) {
                int64_t& h = hist[(size_t)t * RADIX + d];
                int64_t c = h;
                h = sum;
                sum += c;
            }
        {
            std::vector<std::thread> ts;
            for (int t = 0; t < T; ++t) {
                int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
                if (lo >= hi) break;
                ts.emplace_back([&, t, lo, hi] {
                    int64_t* h = hist.data() + (size_t)t * RADIX;
                    for (int64_t i = lo; i < hi; ++i)
                        dst[h[(src[i].key >> shift) & (RADIX - 1)]++] = src[i];
                });
            }
            for (auto& th : ts) th.join();
        }
        std::swap(src, dst);
    }
    if (src != a.data())
        std::memcpy(a.data(), src, sizeof(Entry) * (size_t)n);
}

template <typename T>
void argsort_impl(const T* rows, const T* cols, int64_t n, int64_t ncols,
                  int64_t* order_out)
{
    std::vector<Entry> keyed((size_t)n);
    const uint64_t nc = (uint64_t)ncols;
    uint64_t maxkey = 1;
    for (int64_t i = 0; i < n; ++i) {
        uint64_t k = (uint64_t)rows[i] * nc + (uint64_t)cols[i];
        keyed[(size_t)i] = { k, i };
        if (k > maxkey) maxkey = k;
    }
    radix_sort(keyed, maxkey);
    for (int64_t i = 0; i < n; ++i)
        order_out[i] = keyed[(size_t)i].id;
}

template <typename T>
int64_t dedup_impl(const T* rows, const T* cols, int64_t n,
                   const int64_t* order, int64_t* slot_out,
                   int64_t* urows, int64_t* ucols)
{
    int64_t nnz = 0;
    int64_t prev_r = -1, prev_c = -1;
    for (int64_t i = 0; i < n; ++i) {
        int64_t j = order[i];
        int64_t r = (int64_t)rows[j], c = (int64_t)cols[j];
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

} // namespace

extern "C" {

void pattern_argsort(const int64_t* rows, const int64_t* cols, int64_t n,
                     int64_t ncols, int64_t* order_out)
{
    argsort_impl(rows, cols, n, ncols, order_out);
}

void pattern_argsort32(const int32_t* rows, const int32_t* cols, int64_t n,
                       int64_t ncols, int64_t* order_out)
{
    argsort_impl(rows, cols, n, ncols, order_out);
}

int64_t pattern_dedup(const int64_t* rows, const int64_t* cols, int64_t n,
                      const int64_t* order, int64_t* slot_out,
                      int64_t* urows, int64_t* ucols)
{
    return dedup_impl(rows, cols, n, order, slot_out, urows, ucols);
}

int64_t pattern_dedup32(const int32_t* rows, const int32_t* cols, int64_t n,
                        const int64_t* order, int64_t* slot_out,
                        int64_t* urows, int64_t* ucols)
{
    return dedup_impl(rows, cols, n, order, slot_out, urows, ucols);
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
