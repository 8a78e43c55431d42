// Native host-side structural kernels (C ABI, loaded via ctypes).
//
// The TPU owns the compute path (XLA/Pallas); these are the pointer-chasing
// *setup* algorithms the reference implements in Rust and that Python loops
// handle poorly: ILU(0) factorization (math-solvers/src/preconditioners/
// ilu.rs:16) and PMIS coarsening for AMG (amg.rs PMIS variant).
//
// Build: g++ -O3 -march=native -shared -fPIC kernels.cpp -o libmathaudio.so

#include <cstdint>
#include <cstring>
#include <complex>
#include <vector>

extern "C" {

// In-place ILU(0) on a CSR matrix with complex128 values (IKJ variant,
// no fill). Returns 0 on success, 1 on zero pivot.
int ilu0_factor_complex(
    const int64_t* indptr,
    const int32_t* indices,
    std::complex<double>* data,
    int64_t n)
{
    // column -> slot lookup per row, rebuilt as a scatter array
    std::vector<int64_t> pos(n, -1);
    for (int64_t i = 1; i < n; ++i) {
        // register row i's columns
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) pos[indices[p]] = p;

        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            int64_t k = indices[p];
            if (k >= i) continue;
            // find diagonal of row k
            std::complex<double> dk(0.0, 0.0);
            int64_t dk_slot = -1;
            for (int64_t q = indptr[k]; q < indptr[k + 1]; ++q) {
                if (indices[q] == k) { dk_slot = q; break; }
            }
            if (dk_slot < 0) continue;
            dk = data[dk_slot];
            if (std::abs(dk) == 0.0) return 1;
            data[p] /= dk;
            std::complex<double> lik = data[p];
            for (int64_t q = indptr[k]; q < indptr[k + 1]; ++q) {
                int64_t j = indices[q];
                if (j <= k) continue;
                int64_t pij = pos[j];
                if (pij >= 0) data[pij] -= lik * data[q];
            }
        }
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) pos[indices[p]] = -1;
    }
    return 0;
}

// PMIS independent-set coarsening on a symmetrized strength graph.
// state_out: 1 = coarse, -1 = fine. weights: degree + random tiebreak.
void pmis_coarsen(
    const int64_t* indptr,
    const int32_t* indices,
    const double* weights,
    int8_t* state_out,
    int64_t n)
{
    std::memset(state_out, 0, n * sizeof(int8_t));
    int64_t undecided = n;
    std::vector<int64_t> new_coarse;
    new_coarse.reserve(256);
    while (undecided > 0) {
        new_coarse.clear();
        for (int64_t i = 0; i < n; ++i) {
            if (state_out[i] != 0) continue;
            bool wmax = true;
            for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
                int64_t j = indices[p];
                if (state_out[j] == 0 && weights[j] > weights[i]) { wmax = false; break; }
            }
            if (wmax) new_coarse.push_back(i);
        }
        if (new_coarse.empty()) {
            // promote the max-weight undecided node to guarantee progress
            int64_t best = -1;
            double wbest = -1.0;
            for (int64_t i = 0; i < n; ++i)
                if (state_out[i] == 0 && weights[i] > wbest) { wbest = weights[i]; best = i; }
            if (best < 0) break;
            new_coarse.push_back(best);
        }
        for (int64_t i : new_coarse) {
            state_out[i] = 1;
            for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
                int64_t j = indices[p];
                if (state_out[j] == 0) state_out[j] = -1;
            }
        }
        undecided = 0;
        for (int64_t i = 0; i < n; ++i) if (state_out[i] == 0) ++undecided;
    }
}

// Greedy multicoloring of a (symmetrized) sparsity graph: adjacent rows
// get different colors. Used by the colored-ILU preconditioner.
void greedy_coloring(
    const int64_t* indptr,
    const int32_t* indices,
    int32_t* colors_out,
    int64_t n)
{
    for (int64_t i = 0; i < n; ++i) colors_out[i] = -1;
    std::vector<int64_t> used_stamp;
    std::vector<int64_t> stamp(256, -1);
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
            int32_t cj = colors_out[indices[p]];
            if (cj >= 0) {
                if ((size_t)cj >= stamp.size()) stamp.resize(cj + 64, -1);
                stamp[cj] = i;
            }
        }
        int32_t c = 0;
        while ((size_t)c < stamp.size() && stamp[c] == i) ++c;
        colors_out[i] = c;
    }
}

}  // extern "C"
