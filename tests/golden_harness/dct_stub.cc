/* Scalar DCTFFTW replacement for the golden harness (the real
 * DCTFFTW.cpp needs libfftw3f, not present here; this file implements
 * the same contract — see /root/reference/src/DCTFFTW.cpp:30-54 and
 * :146-178 for the behavior being reproduced):
 *
 *  - dctInit computes dctshift = ceil(log2(blkArea)), dctshift0 =
 *    dctshift + 2, and allocates the float work buffers.
 *  - dctBytes2D runs an UNNORMALISED 2-D DCT-II (FFTW REDFT10
 *    convention: X[k] = 2 * sum_n x[n] * cos(pi*(n+0.5)*k/N) per axis)
 *    and requantises exactly like Float2Pixels_C: every coefficient is
 *    scaled by sqrt(2)/2 in FLOAT32, nearbyintf-rounded, arithmetic-
 *    shifted by dctshift and rebased to pixelHalf; the DC coefficient
 *    is then overwritten with the 0.5-scaled dctshift0 variant.
 *
 * The transform itself accumulates in double and stores float32 (the
 * repo's ops/dct.py mirrors this), so the byte parity being tested is
 * the reference's quantisation/cost logic, not FFTW's internal float
 * rounding — a real fftwf pipeline could differ by one quantisation
 * step in rare last-ulp races. */
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <mutex>
#include <vector>

#include "DCTFFTW.h"

/* normally defined in DCTFFTW.cpp (not compiled here); MVDepan.cpp
 * guards its fftw plan calls with it */
std::mutex g_fftw_plans_mutex;

static const float sqrt_2_div_2 = 0.70710678118654752440084436210485f;

/* unnormalised separable DCT-II, double accumulation, float32 result */
static void redft10_2d(int ny, int nx, const float *in, float *out) {
    std::vector<double> rows((size_t)ny * nx), cols((size_t)ny * nx);
    for (int j = 0; j < ny; j++)
        for (int k = 0; k < nx; k++) {
            double acc = 0.0;
            for (int n = 0; n < nx; n++)
                acc += (double)in[j * nx + n]
                    * std::cos(M_PI * (n + 0.5) * k / nx);
            rows[(size_t)j * nx + k] = 2.0 * acc;
        }
    for (int k = 0; k < ny; k++)
        for (int i = 0; i < nx; i++) {
            double acc = 0.0;
            for (int n = 0; n < ny; n++)
                acc += rows[(size_t)n * nx + i]
                    * std::cos(M_PI * (n + 0.5) * k / ny);
            cols[(size_t)k * nx + i] = 2.0 * acc;
        }
    for (int t = 0; t < ny * nx; t++)
        out[t] = (float)cols[t];
}

template <typename PixelType>
static void float2pixels(const DCTFFTW *dct, uint8_t *dstp8,
                         int dst_pitch, const float *realdata) {
    PixelType *dstp = (PixelType *)dstp8;
    dst_pitch /= sizeof(PixelType);
    PixelType *dstp_orig = dstp;
    const float *realdata_orig = realdata;
    int pixelMax = (1 << dct->bitsPerSample) - 1;
    int pixelHalf = 1 << (dct->bitsPerSample - 1);
    for (int j = 0; j < dct->sizey; j++) {
        for (int i = 0; i < dct->sizex; i++) {
            float f = realdata[i] * sqrt_2_div_2;
            int integ = (int)(nearbyintf(f));
            dstp[i] = std::min(pixelMax,
                               std::max(0, (integ >> dct->dctshift)
                                               + pixelHalf));
        }
        dstp += dst_pitch;
        realdata += dct->sizex;
    }
    float f = realdata_orig[0] * 0.5f;
    int integ = (int)(nearbyintf(f));
    dstp_orig[0] = std::min(
        pixelMax, std::max(0, (integ >> dct->dctshift0) + pixelHalf));
}

extern "C" {

void dctInit(DCTFFTW *dct, int sizex, int sizey, int bitsPerSample,
             int /*opt*/) {
    dct->sizex = sizex;
    dct->sizey = sizey;
    dct->bitsPerSample = bitsPerSample;
    int size2d = sizex * sizey;
    dct->dctshift = 0;
    int cursize = 1;
    while (cursize < size2d) {
        dct->dctshift++;
        cursize <<= 1;
    }
    dct->dctshift0 = dct->dctshift + 2;
    dct->fSrc = (float *)malloc(sizeof(float) * size2d);
    dct->fSrcDCT = (float *)malloc(sizeof(float) * size2d);
    dct->dctplan = nullptr;
    dct->Float2Pixels = nullptr;
}

void dctDeinit(DCTFFTW *dct) {
    free(dct->fSrc);
    free(dct->fSrcDCT);
}

void dctBytes2D(DCTFFTW *dct, const uint8_t *srcp, int src_pitch,
                uint8_t *dctp, int dct_pitch) {
    for (int j = 0; j < dct->sizey; j++) {
        for (int i = 0; i < dct->sizex; i++) {
            if (dct->bitsPerSample == 8)
                dct->fSrc[j * dct->sizex + i] =
                    ((const uint8_t *)(srcp + (size_t)j * src_pitch))[i];
            else
                dct->fSrc[j * dct->sizex + i] = ((const uint16_t *)(
                    srcp + (size_t)j * src_pitch))[i];
        }
    }
    redft10_2d(dct->sizey, dct->sizex, dct->fSrc, dct->fSrcDCT);
    if (dct->bitsPerSample == 8)
        float2pixels<uint8_t>(dct, dctp, dct_pitch, dct->fSrcDCT);
    else
        float2pixels<uint16_t>(dct, dctp, dct_pitch, dct->fSrcDCT);
}

} // extern "C"
