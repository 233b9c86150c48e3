/* fftw3 type stub (golden-test harness): DCTFFTW.h only needs the
 * typedefs for its struct fields; the harness runs dctmode=0 so no fftw
 * function is ever called (DCTFFTW.cpp is not compiled — see
 * dct_stub.cc). */
#ifndef FFTW3_H_STUB
#define FFTW3_H_STUB

typedef float fftwf_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;

#endif
