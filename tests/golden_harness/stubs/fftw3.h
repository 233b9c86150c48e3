/* fftw3f stub (golden-test harness).  DCTFFTW.h needs the typedefs;
 * MVDepan.cpp's DepanEstimate additionally calls the r2c/c2r planning
 * API — fftw_mini.cc provides naive double-accumulated DFT
 * implementations with fftw's unnormalised conventions. */
#ifndef FFTW3_H_STUB
#define FFTW3_H_STUB

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef float fftwf_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;

void *fftwf_malloc(size_t n);
void fftwf_free(void *p);

fftwf_plan fftwf_plan_dft_r2c_2d(int n0, int n1, float *in,
                                 fftwf_complex *out, unsigned flags);
fftwf_plan fftwf_plan_dft_c2r_2d(int n0, int n1, fftwf_complex *in,
                                 float *out, unsigned flags);
void fftwf_execute_dft_r2c(const fftwf_plan p, float *in,
                           fftwf_complex *out);
void fftwf_execute_dft_c2r(const fftwf_plan p, fftwf_complex *in,
                           float *out);
void fftwf_destroy_plan(fftwf_plan p);

#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE (0U)

#ifdef __cplusplus
}
#endif

#endif
