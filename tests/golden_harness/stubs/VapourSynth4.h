/* VapourSynth4 API stub for the golden-test harness: just enough of
 * the public VS4 surface (types, enums, the VSAPI function table) for
 * the reference's filter sources to compile IN PLACE and run against
 * the harness's miniature synchronous core (vs_mini.cc).  Function
 * NAMES and SIGNATURES follow the public VapourSynth4 API where the
 * reference calls them; struct layouts and enum values are this
 * harness's own (both sides compile against this header, so only
 * internal consistency matters). */
#ifndef VAPOURSYNTH4_H_STUB
#define VAPOURSYNTH4_H_STUB

#include <stddef.h>
#include <stdint.h>

#define VS_CC
#define VS_EXTERN_C extern "C"
#ifndef __cplusplus
#undef VS_EXTERN_C
#define VS_EXTERN_C
#endif

typedef struct VSNode VSNode;
typedef struct VSCore VSCore;
typedef struct VSFrame VSFrame;
typedef struct VSMap VSMap;
typedef struct VSFrameContext VSFrameContext;
typedef struct VSPlugin VSPlugin;

typedef enum VSColorFamily {
    cfUndefined = 0,
    cfGray = 1,
    cfRGB = 2,
    cfYUV = 3,
} VSColorFamily;

typedef enum VSSampleType {
    stInteger = 0,
    stFloat = 1,
} VSSampleType;

/* preset ids: value layout is this harness's own (colorFamily<<16 |
 * subSamplingW<<8 | subSamplingH<<4 | bits index); only pfYUV444P8 is
 * consumed by the compiled sources (MVMask.c:329) */
typedef enum VSPresetVideoFormat {
    pfNone = 0,
    pfGray8 = (1 << 16),
    pfYUV420P8 = (3 << 16) | (1 << 8) | (1 << 4),
    pfYUV444P8 = (3 << 16),
} VSPresetVideoFormat;

typedef enum VSActivationReason {
    arInitial = 0,
    arAllFramesReady = 1,
    arError = -1,
} VSActivationReason;

typedef enum VSFilterMode {
    fmParallel = 100,
    fmParallelRequests = 200,
    fmUnordered = 300,
    fmFrameState = 400,
} VSFilterMode;

typedef enum VSMapAppendMode {
    maReplace = 0,
    maAppend = 1,
} VSMapAppendMode;

typedef enum VSDataTypeHint {
    dtUnknown = -1,
    dtBinary = 0,
    dtUtf8 = 1,
} VSDataTypeHint;

typedef enum VSRequestPattern {
    rpGeneral = 0,
    rpNoFrameReuse = 1,
    rpStrictSpatial = 2,
} VSRequestPattern;

typedef struct VSVideoFormat {
    int colorFamily;
    int sampleType;
    int bitsPerSample;
    int bytesPerSample;
    int subSamplingW;
    int subSamplingH;
    int numPlanes;
} VSVideoFormat;

typedef struct VSVideoInfo {
    VSVideoFormat format;
    int64_t fpsNum;
    int64_t fpsDen;
    int width;
    int height;
    int numFrames;
} VSVideoInfo;

typedef struct VSFilterDependency {
    VSNode *source;
    int requestPattern;
} VSFilterDependency;

typedef const VSFrame *(VS_CC *VSFilterGetFrame)(
    int n, int activationReason, void *instanceData, void **frameData,
    VSFrameContext *frameCtx, VSCore *core, const struct VSAPI *vsapi);
typedef void (VS_CC *VSFilterFree)(void *instanceData, VSCore *core,
                                   const struct VSAPI *vsapi);
typedef void (VS_CC *VSPublicFunction)(const VSMap *in, VSMap *out,
                                       void *userData, VSCore *core,
                                       const struct VSAPI *vsapi);

typedef struct VSAPI {
    /* nodes */
    const VSVideoInfo *(VS_CC *getVideoInfo)(VSNode *node);
    void (VS_CC *freeNode)(VSNode *node);
    VSNode *(VS_CC *addNodeRef)(VSNode *node);
    void (VS_CC *createVideoFilter)(
        VSMap *out, const char *name, const VSVideoInfo *vi,
        VSFilterGetFrame getFrame, VSFilterFree freeFilter,
        int filterMode, const VSFilterDependency *dependencies,
        int numDeps, void *instanceData, VSCore *core);
    /* frames */
    const VSFrame *(VS_CC *getFrameFilter)(int n, VSNode *node,
                                           VSFrameContext *frameCtx);
    void (VS_CC *requestFrameFilter)(int n, VSNode *node,
                                     VSFrameContext *frameCtx);
    const VSFrame *(VS_CC *getFrame)(int n, VSNode *node,
                                     char *errorMsg, int bufSize);
    void (VS_CC *freeFrame)(const VSFrame *f);
    VSFrame *(VS_CC *copyFrame)(const VSFrame *f, VSCore *core);
    VSFrame *(VS_CC *newVideoFrame)(const VSVideoFormat *format,
                                    int width, int height,
                                    const VSFrame *propSrc, VSCore *core);
    ptrdiff_t (VS_CC *getStride)(const VSFrame *f, int plane);
    const uint8_t *(VS_CC *getReadPtr)(const VSFrame *f, int plane);
    uint8_t *(VS_CC *getWritePtr)(VSFrame *f, int plane);
    int (VS_CC *getFrameWidth)(const VSFrame *f, int plane);
    int (VS_CC *getFrameHeight)(const VSFrame *f, int plane);
    const VSMap *(VS_CC *getFramePropertiesRO)(const VSFrame *f);
    VSMap *(VS_CC *getFramePropertiesRW)(VSFrame *f);
    /* maps */
    VSMap *(VS_CC *createMap)(void);
    void (VS_CC *freeMap)(VSMap *map);
    void (VS_CC *clearMap)(VSMap *map);
    int64_t (VS_CC *mapGetInt)(const VSMap *map, const char *key,
                               int index, int *error);
    int (VS_CC *mapGetIntSaturated)(const VSMap *map, const char *key,
                                    int index, int *error);
    double (VS_CC *mapGetFloat)(const VSMap *map, const char *key,
                                int index, int *error);
    const char *(VS_CC *mapGetData)(const VSMap *map, const char *key,
                                    int index, int *error);
    int (VS_CC *mapGetDataSize)(const VSMap *map, const char *key,
                                int index, int *error);
    VSNode *(VS_CC *mapGetNode)(const VSMap *map, const char *key,
                                int index, int *error);
    const char *(VS_CC *mapGetError)(const VSMap *map);
    void (VS_CC *mapSetError)(VSMap *map, const char *errorMessage);
    int (VS_CC *mapSetInt)(VSMap *map, const char *key, int64_t i,
                           int append);
    int (VS_CC *mapSetFloat)(VSMap *map, const char *key, double d,
                             int append);
    int (VS_CC *mapSetData)(VSMap *map, const char *key,
                            const char *data, int size, int type,
                            int append);
    int (VS_CC *mapSetNode)(VSMap *map, const char *key, VSNode *node,
                            int append);
    int (VS_CC *mapDeleteKey)(VSMap *map, const char *key);
    /* plugins */
    VSPlugin *(VS_CC *getPluginByID)(const char *identifier,
                                     VSCore *core);
    VSMap *(VS_CC *invoke)(VSPlugin *plugin, const char *name,
                           const VSMap *args);
    /* filter errors */
    void (VS_CC *setFilterError)(const char *errorMessage,
                                 VSFrameContext *frameCtx);
    /* formats */
    int (VS_CC *getVideoFormatByID)(VSVideoFormat *format, uint32_t id,
                                    VSCore *core);
    const VSVideoFormat *(VS_CC *getVideoFrameFormat)(const VSFrame *f);
} VSAPI;

typedef struct VSPLUGINAPI {
    int (VS_CC *configPlugin)(const char *identifier,
                              const char *pluginNamespace,
                              const char *name, int pluginVersion,
                              int apiVersion, int flags,
                              VSPlugin *plugin);
    int (VS_CC *registerFunction)(const char *name, const char *args,
                                  const char *returnType,
                                  VSPublicFunction argsFunc,
                                  void *functionData, VSPlugin *plugin);
} VSPLUGINAPI;

#define VS_MAKE_VERSION(major, minor) (((major) << 16) | (minor))
#define VAPOURSYNTH_API_VERSION VS_MAKE_VERSION(4, 0)
#define VS_API_VERSION VAPOURSYNTH_API_VERSION

#endif
