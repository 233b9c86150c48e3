/* Miniature synchronous VapourSynth core (see vs_mini.h).  The VSAPI
 * function table matches the subset of the public VS4 API the
 * reference's filters call (stubs/VapourSynth4.h); evaluation is
 * depth-first synchronous: getFrameFilter(n, node) runs the node's
 * getframe with arInitial (requests are satisfied on demand, so they
 * are ignored) and then arAllFramesReady.  All objects live in leaked
 * arenas — free*()/freeNode() are reference-count no-ops because the
 * harness binary is one short-lived test process. */
#include "vs_mini.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>

struct Entry {
    std::vector<int64_t> ints;
    std::vector<double> floats;
    std::vector<std::string> datas;
    std::vector<int> data_hints;
    std::vector<VSNode *> nodes;
};

struct VSMap {
    std::map<std::string, Entry> entries;
    std::string error;
};

struct VSFrame {
    VSVideoFormat fmt;
    int width = 0, height = 0;
    std::vector<std::vector<uint8_t>> planes;
    std::vector<ptrdiff_t> strides;
    std::vector<int> pw, ph;
    VSMap props;
};

struct VSNode {
    std::string name;
    VSVideoInfo vi{};
    VSFilterGetFrame getframe = nullptr;
    void *instance_data = nullptr;
    std::vector<VSFrame *> buffer;       // source nodes
    std::map<int, const VSFrame *> cache;
};

struct VSPlugin {
    std::string identifier;
    std::map<std::string, std::pair<VSPublicFunction, void *>> funcs;
};

struct VSCore {
    std::map<std::string, VSPlugin *> plugins;
};

static VSCore g_core;

VSCore *vsmini_core() { return &g_core; }

[[noreturn]] static void die(const char *what) {
    fprintf(stderr, "vs_mini: %s\n", what);
    exit(3);
}

/* ---- frames ---------------------------------------------------------- */

static int plane_dims(const VSFrame *f, int plane, int *w, int *h) {
    *w = f->pw[plane];
    *h = f->ph[plane];
    return 0;
}

VSFrame *vsmini_new_frame(const VSVideoFormat &fmt, int width, int height) {
    VSFrame *f = new VSFrame();
    f->fmt = fmt;
    f->width = width;
    f->height = height;
    for (int p = 0; p < fmt.numPlanes; p++) {
        int pw = p ? width >> fmt.subSamplingW : width;
        int ph = p ? height >> fmt.subSamplingH : height;
        ptrdiff_t stride = ((size_t)pw * fmt.bytesPerSample + 63) & ~63;
        f->planes.emplace_back((size_t)stride * ph, 0);
        f->strides.push_back(stride);
        f->pw.push_back(pw);
        f->ph.push_back(ph);
    }
    return f;
}

uint8_t *vsmini_write_ptr(VSFrame *f, int plane) {
    return f->planes[plane].data();
}

ptrdiff_t vsmini_stride(const VSFrame *f, int plane) {
    return f->strides[plane];
}

VSMap *vsmini_frame_props(VSFrame *f) { return &f->props; }

/* ---- VSAPI ------------------------------------------------------------ */

static const VSVideoInfo *api_getVideoInfo(VSNode *node) {
    return &node->vi;
}

static void api_freeNode(VSNode *) {}

static VSNode *api_addNodeRef(VSNode *node) { return node; }

static void api_createVideoFilter(VSMap *out, const char *name,
                                  const VSVideoInfo *vi,
                                  VSFilterGetFrame getFrame,
                                  VSFilterFree, int,
                                  const VSFilterDependency *, int,
                                  void *instanceData, VSCore *) {
    VSNode *node = new VSNode();
    node->name = name;
    node->vi = *vi;
    node->getframe = getFrame;
    node->instance_data = instanceData;
    out->entries["clip"].nodes.push_back(node);
}

static const VSFrame *run_node(int n, VSNode *node) {
    if (!node->buffer.empty()) {
        if (n < 0 || n >= (int)node->buffer.size())
            die("buffer node frame out of range");
        return node->buffer[n];
    }
    auto it = node->cache.find(n);
    if (it != node->cache.end())
        return it->second;
    if (!node->getframe)
        die("node without frames");
    void *frame_data = nullptr;
    /* arInitial: requests are recorded by real cores; here frames are
     * produced on demand, so a NULL return just means "ready later".
     * A non-NULL return is a passthrough frame. */
    const VSFrame *f = node->getframe(n, arInitial, node->instance_data,
                                      &frame_data, nullptr, &g_core,
                                      vsmini_api());
    if (!f)
        f = node->getframe(n, arAllFramesReady, node->instance_data,
                           &frame_data, nullptr, &g_core, vsmini_api());
    if (!f)
        die((node->name + ": getframe returned no frame").c_str());
    node->cache[n] = f;
    return f;
}

static const VSFrame *api_getFrameFilter(int n, VSNode *node,
                                         VSFrameContext *) {
    return run_node(n, node);
}

static void api_requestFrameFilter(int, VSNode *, VSFrameContext *) {}

static const VSFrame *api_getFrame(int n, VSNode *node, char *, int) {
    return run_node(n, node);
}

static void api_freeFrame(const VSFrame *) {}

static VSFrame *api_copyFrame(const VSFrame *f, VSCore *) {
    return new VSFrame(*f);
}

static VSFrame *api_newVideoFrame(const VSVideoFormat *format, int width,
                                  int height, const VSFrame *propSrc,
                                  VSCore *) {
    VSFrame *f = vsmini_new_frame(*format, width, height);
    if (propSrc)
        f->props = propSrc->props;
    return f;
}

static ptrdiff_t api_getStride(const VSFrame *f, int plane) {
    return f->strides[plane];
}

static const uint8_t *api_getReadPtr(const VSFrame *f, int plane) {
    return f->planes[plane].data();
}

static uint8_t *api_getWritePtr(VSFrame *f, int plane) {
    return f->planes[plane].data();
}

static int api_getFrameWidth(const VSFrame *f, int plane) {
    int w, h;
    plane_dims(f, plane, &w, &h);
    return w;
}

static int api_getFrameHeight(const VSFrame *f, int plane) {
    int w, h;
    plane_dims(f, plane, &w, &h);
    return h;
}

static const VSMap *api_getFramePropertiesRO(const VSFrame *f) {
    return &f->props;
}

static VSMap *api_getFramePropertiesRW(VSFrame *f) {
    return &f->props;
}

/* ---- maps ------------------------------------------------------------- */

static VSMap *api_createMap(void) { return new VSMap(); }
static void api_freeMap(VSMap *) {}
static void api_clearMap(VSMap *map) {
    map->entries.clear();
    map->error.clear();
}

static const Entry *get_entry(const VSMap *map, const char *key,
                              int *error) {
    auto it = map->entries.find(key);
    if (it == map->entries.end()) {
        if (error)
            *error = 1;
        return nullptr;
    }
    if (error)
        *error = 0;
    return &it->second;
}

static int64_t api_mapGetInt(const VSMap *map, const char *key, int index,
                             int *error) {
    int err = 0;
    const Entry *e = get_entry(map, key, &err);
    if (err || index >= (int)e->ints.size()) {
        if (error)
            *error = 1;
        return 0;
    }
    if (error)
        *error = 0;
    return e->ints[index];
}

static int api_mapGetIntSaturated(const VSMap *map, const char *key,
                                  int index, int *error) {
    return (int)api_mapGetInt(map, key, index, error);
}

static double api_mapGetFloat(const VSMap *map, const char *key,
                              int index, int *error) {
    int err = 0;
    const Entry *e = get_entry(map, key, &err);
    if (err || index >= (int)(e->floats.size() + e->ints.size())) {
        if (error)
            *error = 1;
        return 0.0;
    }
    if (error)
        *error = 0;
    if (index < (int)e->floats.size())
        return e->floats[index];
    return (double)e->ints[index - e->floats.size()];
}

static const char *api_mapGetData(const VSMap *map, const char *key,
                                  int index, int *error) {
    int err = 0;
    const Entry *e = get_entry(map, key, &err);
    if (err || index >= (int)e->datas.size()) {
        if (error)
            *error = 1;
        return nullptr;
    }
    if (error)
        *error = 0;
    return e->datas[index].data();
}

static int api_mapGetDataSize(const VSMap *map, const char *key,
                              int index, int *error) {
    int err = 0;
    const Entry *e = get_entry(map, key, &err);
    if (err || index >= (int)e->datas.size()) {
        if (error)
            *error = 1;
        return 0;
    }
    if (error)
        *error = 0;
    return (int)e->datas[index].size();
}

static VSNode *api_mapGetNode(const VSMap *map, const char *key,
                              int index, int *error) {
    int err = 0;
    const Entry *e = get_entry(map, key, &err);
    if (err || index >= (int)e->nodes.size()) {
        if (error)
            *error = 1;
        return nullptr;
    }
    if (error)
        *error = 0;
    return e->nodes[index];
}

static const char *api_mapGetError(const VSMap *map) {
    return map->error.empty() ? nullptr : map->error.c_str();
}

static void api_mapSetError(VSMap *map, const char *errorMessage) {
    map->error = errorMessage ? errorMessage : "";
}

static int api_mapSetInt(VSMap *map, const char *key, int64_t i,
                         int append) {
    Entry &e = map->entries[key];
    if (append == maReplace)
        e = Entry();
    e.ints.push_back(i);
    return 0;
}

static int api_mapSetFloat(VSMap *map, const char *key, double d,
                           int append) {
    Entry &e = map->entries[key];
    if (append == maReplace)
        e = Entry();
    e.floats.push_back(d);
    return 0;
}

static int api_mapSetData(VSMap *map, const char *key, const char *data,
                          int size, int type, int append) {
    Entry &e = map->entries[key];
    if (append == maReplace)
        e = Entry();
    e.datas.emplace_back(data, size < 0 ? strlen(data) : (size_t)size);
    e.data_hints.push_back(type);
    return 0;
}

static int api_mapSetNode(VSMap *map, const char *key, VSNode *node,
                          int append) {
    Entry &e = map->entries[key];
    if (append == maReplace)
        e = Entry();
    e.nodes.push_back(node);
    return 0;
}

static int api_mapDeleteKey(VSMap *map, const char *key) {
    return (int)map->entries.erase(key);
}

/* ---- plugins ----------------------------------------------------------- */

static VSPlugin *api_getPluginByID(const char *identifier, VSCore *core) {
    auto it = core->plugins.find(identifier);
    if (it != core->plugins.end())
        return it->second;
    /* unknown plugins (e.g. com.vapoursynth.text used by DepanAnalyse's
     * info path) get a pass-through shim created on first use */
    VSPlugin *p = new VSPlugin();
    p->identifier = identifier;
    core->plugins[identifier] = p;
    return p;
}

static VSMap *api_invoke(VSPlugin *plugin, const char *name,
                         const VSMap *args) {
    VSMap *out = new VSMap();
    auto it = plugin->funcs.find(name);
    if (it == plugin->funcs.end()) {
        /* pass-through shim: return the input clip unchanged (used for
         * text.FrameProps in DepanAnalyse's info mode) */
        int err = 0;
        VSNode *clip = api_mapGetNode(args, "clip", 0, &err);
        if (err) {
            out->error = std::string(name) + ": not registered";
            return out;
        }
        out->entries["clip"].nodes.push_back(clip);
        return out;
    }
    it->second.first(args, out, it->second.second, &g_core, vsmini_api());
    return out;
}

static int api_getVideoFormatByID(VSVideoFormat *format, uint32_t id,
                                  VSCore *) {
    format->colorFamily = (int)(id >> 16);
    format->sampleType = stInteger;
    format->bitsPerSample = 8;
    format->bytesPerSample = 1;
    format->subSamplingW = (int)((id >> 8) & 0xf);
    format->subSamplingH = (int)((id >> 4) & 0xf);
    format->numPlanes = format->colorFamily == cfGray ? 1 : 3;
    return 1;
}

static const VSVideoFormat *api_getVideoFrameFormat(const VSFrame *f) {
    return &f->fmt;
}

static void api_setFilterError(const char *errorMessage, VSFrameContext *) {
    fprintf(stderr, "vs_mini filter error: %s\n",
            errorMessage ? errorMessage : "(null)");
    exit(3);
}

/* ---- plugin API (registration) ---------------------------------------- */

static VSPlugin *g_current_plugin = nullptr;

static int plugapi_configPlugin(const char *, const char *, const char *,
                                int, int, int, VSPlugin *) {
    return 1;
}

static int plugapi_registerFunction(const char *name, const char *,
                                    const char *, VSPublicFunction func,
                                    void *functionData, VSPlugin *plugin) {
    (plugin ? plugin : g_current_plugin)
        ->funcs[name] = {func, functionData};
    return 1;
}

static const VSPLUGINAPI g_plugapi = {
    plugapi_configPlugin,
    plugapi_registerFunction,
};

void vsmini_register_plugin(const char *identifier, vsmini_register_fn fn) {
    VSPlugin *p = api_getPluginByID(identifier, &g_core);
    g_current_plugin = p;
    fn(p, &g_plugapi);
    g_current_plugin = nullptr;
}

VSMap *vsmini_invoke(const char *plugin_id, const char *name, VSMap *args) {
    VSPlugin *p = api_getPluginByID(plugin_id, &g_core);
    VSMap *ret = api_invoke(p, name, args);
    if (!ret->error.empty()) {
        fprintf(stderr, "vs_mini: %s.%s failed: %s\n", plugin_id, name,
                ret->error.c_str());
        exit(3);
    }
    return ret;
}

/* ---- buffer (source) nodes -------------------------------------------- */

VSNode *vsmini_buffer_node(const VSVideoInfo &vi,
                           std::vector<VSFrame *> frames,
                           const char *name) {
    VSNode *node = new VSNode();
    node->name = name;
    node->vi = vi;
    node->vi.numFrames = (int)frames.size();
    node->buffer = std::move(frames);
    return node;
}

/* ---- the API table ------------------------------------------------------ */

static const VSAPI g_api = {
    api_getVideoInfo,
    api_freeNode,
    api_addNodeRef,
    api_createVideoFilter,
    api_getFrameFilter,
    api_requestFrameFilter,
    api_getFrame,
    api_freeFrame,
    api_copyFrame,
    api_newVideoFrame,
    api_getStride,
    api_getReadPtr,
    api_getWritePtr,
    api_getFrameWidth,
    api_getFrameHeight,
    api_getFramePropertiesRO,
    api_getFramePropertiesRW,
    api_createMap,
    api_freeMap,
    api_clearMap,
    api_mapGetInt,
    api_mapGetIntSaturated,
    api_mapGetFloat,
    api_mapGetData,
    api_mapGetDataSize,
    api_mapGetNode,
    api_mapGetError,
    api_mapSetError,
    api_mapSetInt,
    api_mapSetFloat,
    api_mapSetData,
    api_mapSetNode,
    api_mapDeleteKey,
    api_getPluginByID,
    api_invoke,
    api_setFilterError,
    api_getVideoFormatByID,
    api_getVideoFrameFormat,
};

const VSAPI *vsmini_api() { return &g_api; }
