/* Minimal VSHelper4 stub (golden-test harness): the alignment/min/max
 * helpers the reference kernels use, with the same semantics as the real
 * VapourSynth header (aligned allocation, 32-byte frame alignment). */
#ifndef VSHELPER4_H_STUB
#define VSHELPER4_H_STUB

#include <stddef.h>
#include <stdlib.h>
#include <string.h>

#include "VapourSynth4.h"

static inline int vsh_isConstantVideoFormat(const VSVideoInfo *vi) {
    return vi->height > 0 && vi->width > 0
        && vi->format.colorFamily != cfUndefined;
}

#ifdef __cplusplus
namespace vsh {
static inline bool isConstantVideoFormat(const VSVideoInfo *vi) {
    return vsh_isConstantVideoFormat(vi);
}
} // namespace vsh
#endif

#define VSMIN(a, b) ((a) > (b) ? (b) : (a))
#define VSMAX(a, b) ((a) > (b) ? (a) : (b))
#define VSH_ALIGNED_MALLOC(pptr, size, alignment) \
    do { *(pptr) = aligned_alloc((alignment), \
        (((size) + (alignment) - 1) / (alignment)) * (alignment)); } while (0)
#define VSH_ALIGNED_FREE(ptr) free(ptr)
#define VS_ALIGNED_MALLOC VSH_ALIGNED_MALLOC
#define VS_ALIGNED_FREE VSH_ALIGNED_FREE

/* row-by-row copy (same semantics as the VapourSynth helper) */
static inline void vsh_bitblt(void *dstp, ptrdiff_t dst_stride,
                              const void *srcp, ptrdiff_t src_stride,
                              size_t row_size, size_t height) {
    if ((size_t)dst_stride == row_size && (size_t)src_stride == row_size) {
        memcpy(dstp, srcp, row_size * height);
        return;
    }
    char *d = (char *)dstp;
    const char *s = (const char *)srcp;
    for (size_t i = 0; i < height; i++) {
        memcpy(d, s, row_size);
        d += dst_stride;
        s += src_stride;
    }
}
#define vs_bitblt vsh_bitblt

#endif
