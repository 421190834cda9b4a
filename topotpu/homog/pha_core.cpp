// Pairwise-homogenization numeric core.
//
// Parity target: the role of NCEI's PHA v52i Fortran executable in the
// reference pipeline (SURVEY.md §2.7, §3.5): detect changepoints in
// pairwise monthly difference series and estimate step adjustments. The
// reference serializes its station DB to PHA's input tree and shells out;
// here the detector is an in-process C library (host-side — this stage is
// serial and data-small, not a TPU workload) driven from
// topotpu/homog/pha.py via ctypes.
//
// Implemented: batched SNHT (standard normal homogeneity test) changepoint
// detection with binary segmentation over NaN-tolerant monthly difference
// series, and segment-mean step estimation. The attribution voting and
// adjustment application live in Python (cheap, and easier to audit).
//
// Build: g++ -O3 -march=native -shared -fPIC pha_core.cpp -o libpha.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// SNHT critical value ~95% as a function of series length n (Khaliq &
// Ouarda 2007 interpolation; asymptote near 9.9 for large n).
double snht_crit(int n) {
    if (n < 10) return 1e30;  // too short to test
    static const int    ns[]   = {10,  20,  30,  40,  50,  70,  100, 150, 250, 500, 1000, 5000};
    static const double crit[] = {5.7, 6.95, 7.65, 8.1, 8.45, 8.8, 9.15, 9.55, 9.7, 10.0, 10.2, 10.5};
    if (n >= ns[11]) return crit[11];
    int i = 0;
    while (n > ns[i + 1]) ++i;
    double f = double(n - ns[i]) / double(ns[i + 1] - ns[i]);
    return crit[i] + f * (crit[i + 1] - crit[i]);
}

// One SNHT scan over x[lo:hi) using only finite entries.
// Returns best split index (absolute, in [lo+minseg, hi-minseg)) or -1.
int snht_scan(const float* x, int lo, int hi, int minseg, double* stat_out) {
    std::vector<double> vals;
    std::vector<int> idx;
    vals.reserve(hi - lo);
    for (int t = lo; t < hi; ++t) {
        if (std::isfinite(x[t])) { vals.push_back(x[t]); idx.push_back(t); }
    }
    int n = (int)vals.size();
    if (n < 2 * minseg) { *stat_out = 0.0; return -1; }

    double mean = 0.0;
    for (double v : vals) mean += v;
    mean /= n;
    double var = 0.0;
    for (double v : vals) var += (v - mean) * (v - mean);
    var /= n;
    if (var < 1e-12) { *stat_out = 0.0; return -1; }
    double sd = std::sqrt(var);

    // prefix sums of standardized values
    double best = 0.0;
    int best_k = -1;
    double cum = 0.0;
    for (int k = 1; k < n; ++k) {
        cum += (vals[k - 1] - mean) / sd;
        if (k < minseg || n - k < minseg) continue;
        double z1 = cum / k;
        double z2 = -cum / (n - k);
        double T = k * z1 * z1 + (n - k) * z2 * z2;
        if (T > best) { best = T; best_k = k; }
    }
    *stat_out = best;
    if (best_k < 0 || best < snht_crit(n)) return -1;
    // split AFTER observation best_k-1: first month of the new segment
    return idx[best_k];
}

void segment_recurse(const float* x, int lo, int hi, int minseg, int max_breaks,
                     int* breaks, double* stats, int* n_found) {
    if (*n_found >= max_breaks) return;
    double stat;
    int split = snht_scan(x, lo, hi, minseg, &stat);
    if (split < 0) return;
    breaks[*n_found] = split;
    stats[*n_found] = stat;
    (*n_found)++;
    segment_recurse(x, lo, split, minseg, max_breaks, breaks, stats, n_found);
    segment_recurse(x, split, hi, minseg, max_breaks, breaks, stats, n_found);
}

}  // namespace

extern "C" {

// Detect changepoints in a batch of difference series.
//   series:  (n_series, T) row-major float32, NaN = missing
//   breaks:  (n_series, max_breaks) int32 out, -1 padded
//   stats:   (n_series, max_breaks) float64 out
// Returns 0.
int pha_detect_breaks(const float* series, int n_series, int T, int minseg,
                      int max_breaks, int32_t* breaks, double* stats) {
    for (int s = 0; s < n_series; ++s) {
        const float* x = series + (size_t)s * T;
        int32_t* b = breaks + (size_t)s * max_breaks;
        double* st = stats + (size_t)s * max_breaks;
        for (int i = 0; i < max_breaks; ++i) { b[i] = -1; st[i] = 0.0; }
        int n_found = 0;
        std::vector<int> tmp(max_breaks, -1);
        std::vector<double> tst(max_breaks, 0.0);
        segment_recurse(x, 0, T, minseg, max_breaks, tmp.data(), tst.data(), &n_found);
        for (int i = 0; i < n_found; ++i) { b[i] = tmp[i]; st[i] = tst[i]; }
    }
    return 0;
}

// Step size at a break: mean(x[after window]) - mean(x[before window]),
// windows bounded by [lo, hi) and clipped to win_max finite months each side.
// Returns NaN if either side has < win_min finite months.
double pha_step_size(const float* x, int T, int brk, int lo, int hi,
                     int win_min, int win_max) {
    if (brk <= lo || brk >= hi) return NAN;
    double s_before = 0.0; int n_before = 0;
    for (int t = brk - 1; t >= lo && n_before < win_max; --t) {
        if (std::isfinite(x[t])) { s_before += x[t]; ++n_before; }
    }
    double s_after = 0.0; int n_after = 0;
    for (int t = brk; t < hi && n_after < win_max; ++t) {
        if (std::isfinite(x[t])) { s_after += x[t]; ++n_after; }
    }
    if (n_before < win_min || n_after < win_min) return NAN;
    return s_after / n_after - s_before / n_before;
}

}  // extern "C"
