// Native multivariate polynomial kernels in tensor power layout [K]*d
// (row-major, axis i = power of variable i).  The host-side counterpart of
// the reference's Rust nutils-poly crate (§2.1): polynomial products and
// affine composition used by spline/Bernstein basis construction and
// hierarchical/trimmed coefficient push-forward.  The on-device evaluation
// path is the batched monomial contraction in evaluable.Monomials.
//
// All kernels are d-generic via mixed-radix index arithmetic.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int64_t ipow(int64_t b, int64_t e)
{
    int64_t r = 1;
    while (e--) r *= b;
    return r;
}

// dense tensor "convolution": out[i+j] += a[i]*b[j], cube sizes Ka,Kb -> Ko
void conv(const double* a, int64_t Ka, const double* b, int64_t Kb,
          double* out, int64_t Ko, int d)
{
    std::vector<int64_t> ia(d, 0), ib(d, 0);
    int64_t na = ipow(Ka, d), nb = ipow(Kb, d);
    for (int64_t p = 0; p < na; ++p) {
        double av = a[p];
        if (av != 0.0) {
            std::fill(ib.begin(), ib.end(), 0);
            for (int64_t q = 0; q < nb; ++q) {
                double bv = b[q];
                if (bv != 0.0) {
                    int64_t o = 0;
                    for (int k = 0; k < d; ++k)
                        o = o * Ko + (ia[k] + ib[k]);
                    out[o] += av * bv;
                }
                for (int k = d - 1; k >= 0; --k) {
                    if (++ib[k] < Kb) break;
                    ib[k] = 0;
                }
            }
        }
        for (int k = d - 1; k >= 0; --k) {
            if (++ia[k] < Ka) break;
            ia[k] = 0;
        }
    }
}

} // namespace

extern "C" {

// out[(i+j)...] += a * b, both (K,)*d, result (2K-1,)*d
void poly_mul(const double* a, const double* b, int64_t K, int d, double* out)
{
    conv(a, K, b, K, out, 2 * K - 1, d);
}

// change_degree: embed (Ka,)*d coefficients into a (Kb,)*d box (Kb >= Ka)
void poly_change_degree(const double* a, int64_t Ka, int64_t Kb, int d, double* out)
{
    std::vector<int64_t> ia(d, 0);
    int64_t na = ipow(Ka, d);
    std::memset(out, 0, sizeof(double) * ipow(Kb, d));
    for (int64_t p = 0; p < na; ++p) {
        int64_t o = 0;
        for (int k = 0; k < d; ++k)
            o = o * Kb + ia[k];
        out[o] = a[p];
        for (int k = d - 1; k >= 0; --k) {
            if (++ia[k] < Ka) break;
            ia[k] = 0;
        }
    }
}

// composition with an affine map: coefficients of p(lin @ y + off) for a
// batch of L polynomials sharing the same (K,)*d box.  Dropped coefficients
// outside the box must vanish; returns max |dropped| for the caller to check.
double poly_compose_affine(const double* coeffs, int64_t L, int64_t K, int d,
                           const double* lin, const double* off, double* out)
{
    const int64_t n = ipow(K, d);
    const int64_t Kw = 2 * K - 1;           // workspace box for products
    const int64_t nw = ipow(Kw, d);

    // powers[i][m] = (lin[i] . y + off[i])^m in the (K,)*d box
    std::vector<std::vector<double>> powers((size_t)d * K);
    for (int i = 0; i < d; ++i) {
        std::vector<double> q((size_t)n, 0.0);
        q[0] = off[i];
        for (int j = 0; j < d; ++j)
            if (lin[(size_t)i * d + j] != 0.0) {
                int64_t o = 0;
                for (int k = 0; k < d; ++k)
                    o = o * K + (k == j ? 1 : 0);
                q[(size_t)o] = lin[(size_t)i * d + j];
            }
        powers[(size_t)i * K + 0].assign((size_t)n, 0.0);
        powers[(size_t)i * K + 0][0] = 1.0;
        if (K > 1)
            powers[(size_t)i * K + 1] = q;
        std::vector<double> work((size_t)nw);
        for (int64_t m = 2; m < K; ++m) {
            std::fill(work.begin(), work.end(), 0.0);
            conv(powers[(size_t)i * K + m - 1].data(), K, q.data(), K, work.data(), Kw, d);
            // truncate back to (K,)*d (higher terms must be checked by caller
            // on the final result; intermediate powers of an affine map stay
            // within total degree, so per-axis overflow only occurs when the
            // final result would overflow too)
            std::vector<double> trunc((size_t)n, 0.0);
            std::vector<int64_t> idx(d, 0);
            for (int64_t p = 0; p < n; ++p) {
                int64_t o = 0;
                for (int k = 0; k < d; ++k)
                    o = o * Kw + idx[k];
                trunc[(size_t)p] = work[(size_t)o];
                for (int k = d - 1; k >= 0; --k) {
                    if (++idx[k] < K) break;
                    idx[k] = 0;
                }
            }
            powers[(size_t)i * K + m] = std::move(trunc);
        }
    }

    double maxdrop = 0.0;
    std::vector<double> term((size_t)n), work((size_t)nw);
    std::vector<int64_t> ks(d, 0);
    std::memset(out, 0, sizeof(double) * (size_t)(L * n));
    for (int64_t p = 0; p < n; ++p) {
        bool any = false;
        for (int64_t l = 0; l < L && !any; ++l)
            any = coeffs[l * n + p] != 0.0;
        if (any) {
            term = powers[(size_t)0 * K + ks[0]];
            for (int i = 1; i < d; ++i) {
                std::fill(work.begin(), work.end(), 0.0);
                conv(term.data(), K, powers[(size_t)i * K + ks[i]].data(), K, work.data(), Kw, d);
                std::vector<int64_t> idx(d, 0);
                for (int64_t q = 0; q < n; ++q) {
                    int64_t o = 0;
                    for (int k = 0; k < d; ++k)
                        o = o * Kw + idx[k];
                    term[(size_t)q] = work[(size_t)o];
                    for (int k = d - 1; k >= 0; --k) {
                        if (++idx[k] < K) break;
                        idx[k] = 0;
                    }
                }
                // track dropped mass outside the (K,)*d box
                std::vector<int64_t> widx(d, 0);
                for (int64_t q = 0; q < nw; ++q) {
                    bool inside = true;
                    for (int k = 0; k < d; ++k)
                        if (widx[k] >= K) inside = false;
                    if (!inside && work[(size_t)q] != 0.0) {
                        double v = work[(size_t)q] < 0 ? -work[(size_t)q] : work[(size_t)q];
                        if (v > maxdrop) maxdrop = v;
                    }
                    for (int k = d - 1; k >= 0; --k) {
                        if (++widx[k] < Kw) break;
                        widx[k] = 0;
                    }
                }
            }
            for (int64_t l = 0; l < L; ++l) {
                double cl = coeffs[l * n + p];
                if (cl != 0.0)
                    for (int64_t q = 0; q < n; ++q)
                        out[l * n + q] += cl * term[(size_t)q];
            }
        }
        for (int k = d - 1; k >= 0; --k) {
            if (++ks[k] < K) break;
            ks[k] = 0;
        }
    }
    return maxdrop;
}

} // extern "C"
