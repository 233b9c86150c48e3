/* DCTFFTW link stubs: the harness runs dctmode=0 only, so the fftw-based
 * DCT is referenced by PlaneOfBlocks.cpp but never called. */
#include <cstdio>
#include <cstdlib>

#include "DCTFFTW.h"

extern "C" {

void dctInit(DCTFFTW *, int, int, int, int) {
    fprintf(stderr, "golden harness: dctInit called (dctmode!=0 "
                    "unsupported)\n");
    abort();
}

void dctDeinit(DCTFFTW *) { abort(); }

void dctBytes2D(DCTFFTW *, const uint8_t *, int, uint8_t *, int) {
    fprintf(stderr, "golden harness: dctBytes2D called (dctmode!=0 "
                    "unsupported)\n");
    abort();
}

} // extern "C"
