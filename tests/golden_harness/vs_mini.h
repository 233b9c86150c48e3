/* Miniature synchronous VapourSynth core for the golden harness: lets
 * the reference's FILTER sources (MVDepan.cpp, MVFlowFPS.c, ...) be
 * compiled in place and driven exactly as VapourSynth would drive
 * them — create via the registered public function, frames via a
 * recursive synchronous getFrameFilter.  Single-threaded, arena-owned
 * memory (free* calls are no-ops; the process is a short-lived test). */
#ifndef VS_MINI_H
#define VS_MINI_H

#include <cstdint>
#include <string>
#include <vector>

#include "VapourSynth4.h"

const VSAPI *vsmini_api();
VSCore *vsmini_core();

/* a source node serving pre-built frames */
VSNode *vsmini_buffer_node(const VSVideoInfo &vi,
                           std::vector<VSFrame *> frames,
                           const char *name);

/* frame construction/access for the driver */
VSFrame *vsmini_new_frame(const VSVideoFormat &fmt, int width, int height);
uint8_t *vsmini_write_ptr(VSFrame *f, int plane);
ptrdiff_t vsmini_stride(const VSFrame *f, int plane);
VSMap *vsmini_frame_props(VSFrame *f);

/* register a reference plugin-register function (mvdepanRegister etc.)
 * under the given plugin id */
typedef void (*vsmini_register_fn)(VSPlugin *, const VSPLUGINAPI *);
void vsmini_register_plugin(const char *identifier, vsmini_register_fn fn);

/* invoke a registered public function; aborts with the map error
 * message on failure, returns the result map */
VSMap *vsmini_invoke(const char *plugin_id, const char *name, VSMap *args);

#endif
