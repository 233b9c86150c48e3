/* Naive fftwf r2c/c2r replacement for the golden harness (DepanEstimate
 * phase correlation, MVDepan.cpp:887-893 + :1000-1153).  Separable DFT
 * with double accumulation, float32 storage, and fftw's conventions:
 * r2c output is the non-redundant half [n0, n1/2+1] row-major,
 * unnormalised; c2r is the unnormalised inverse (scale n0*n1 round
 * trip).  O(N^2) per axis — the harness runs small windows only. */
#include <cmath>
#include <cstdlib>
#include <vector>

#include "fftw3.h"

struct fftwf_plan_s {
    int n0, n1;
    int inverse;
};

extern "C" {

void *fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void *p) { free(p); }

fftwf_plan fftwf_plan_dft_r2c_2d(int n0, int n1, float *, fftwf_complex *,
                                 unsigned) {
    fftwf_plan p = new fftwf_plan_s{n0, n1, 0};
    return p;
}

fftwf_plan fftwf_plan_dft_c2r_2d(int n0, int n1, fftwf_complex *, float *,
                                 unsigned) {
    fftwf_plan p = new fftwf_plan_s{n0, n1, 1};
    return p;
}

void fftwf_destroy_plan(fftwf_plan p) { delete p; }

void fftwf_execute_dft_r2c(const fftwf_plan p, float *in,
                           fftwf_complex *out) {
    const int n0 = p->n0, n1 = p->n1, nc = n1 / 2 + 1;
    // fftw in-place transforms use REAL rows padded to 2*nc floats
    const int rpitch = (in == (float *)out) ? 2 * nc : n1;
    // rows: real -> half-complex [n0][nc]
    std::vector<double> rr((size_t)n0 * nc), ri((size_t)n0 * nc);
    for (int y = 0; y < n0; y++)
        for (int k = 0; k < nc; k++) {
            double sr = 0.0, si = 0.0;
            for (int x = 0; x < n1; x++) {
                double a = 2.0 * M_PI * k * x / n1;
                sr += in[(size_t)y * rpitch + x] * std::cos(a);
                si -= in[(size_t)y * rpitch + x] * std::sin(a);
            }
            rr[(size_t)y * nc + k] = sr;
            ri[(size_t)y * nc + k] = si;
        }
    // columns: complex DFT over n0
    for (int k0 = 0; k0 < n0; k0++)
        for (int k = 0; k < nc; k++) {
            double sr = 0.0, si = 0.0;
            for (int y = 0; y < n0; y++) {
                double a = 2.0 * M_PI * k0 * y / n0;
                double c = std::cos(a), s = -std::sin(a);
                double vr = rr[(size_t)y * nc + k];
                double vi = ri[(size_t)y * nc + k];
                sr += vr * c - vi * s;
                si += vr * s + vi * c;
            }
            out[(size_t)k0 * nc + k][0] = (float)sr;
            out[(size_t)k0 * nc + k][1] = (float)si;
        }
}

void fftwf_execute_dft_c2r(const fftwf_plan p, fftwf_complex *in,
                           float *out) {
    const int n0 = p->n0, n1 = p->n1, nc = n1 / 2 + 1;
    const int rpitch = (out == (float *)in) ? 2 * nc : n1;
    // columns first: inverse complex DFT over n0 (unnormalised)
    std::vector<double> cr((size_t)n0 * nc), ci((size_t)n0 * nc);
    for (int y = 0; y < n0; y++)
        for (int k = 0; k < nc; k++) {
            double sr = 0.0, si = 0.0;
            for (int k0 = 0; k0 < n0; k0++) {
                double a = 2.0 * M_PI * k0 * y / n0;
                double c = std::cos(a), s = std::sin(a);
                double vr = in[(size_t)k0 * nc + k][0];
                double vi = in[(size_t)k0 * nc + k][1];
                sr += vr * c - vi * s;
                si += vr * s + vi * c;
            }
            cr[(size_t)y * nc + k] = sr;
            ci[(size_t)y * nc + k] = si;
        }
    // rows: half-complex -> real, using Hermitian symmetry
    for (int y = 0; y < n0; y++)
        for (int x = 0; x < n1; x++) {
            double acc = cr[(size_t)y * nc + 0];
            for (int k = 1; k < nc; k++) {
                double a = 2.0 * M_PI * k * x / n1;
                double term = cr[(size_t)y * nc + k] * std::cos(a)
                    - ci[(size_t)y * nc + k] * std::sin(a);
                // interior bins appear twice (k and n1-k); the Nyquist
                // bin (even n1) only once
                if (k == n1 - k)
                    acc += term;
                else
                    acc += 2.0 * term;
            }
            out[(size_t)y * rpitch + x] = (float)acc;
        }
}

} // extern "C"
