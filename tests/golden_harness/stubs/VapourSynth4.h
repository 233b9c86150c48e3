/* Minimal VapourSynth4 stub for building the reference's scalar kernels
 * standalone (golden-test harness).  Only the types referenced by
 * MVAnalysisData.h's prototypes are needed; none of the functions that
 * take them are compiled or called. */
#ifndef VAPOURSYNTH4_H_STUB
#define VAPOURSYNTH4_H_STUB

#include <stddef.h>
#include <stdint.h>

typedef struct VSNode VSNode;
typedef struct VSCore VSCore;
typedef struct VSFrame VSFrame;
typedef struct VSMap VSMap;
typedef struct VSAPI VSAPI;
typedef struct VSFrameContext VSFrameContext;
typedef struct VSPlugin VSPlugin;
typedef struct VSPLUGINAPI VSPLUGINAPI;

#endif
