/* golden_vs: drive the reference's FILTER sources (compiled in place)
 * through the miniature VapourSynth core — the filters run their own
 * Create + GetFrame exactly as under VapourSynth, so these goldens
 * cover the full filter logic (parameter defaults, helper filters,
 * frame-prop plumbing), not just the kernels.
 *
 * Modes (gray 8-bit; common prefix mirrors harness.cc's analyse args):
 *   golden_vs <mode> <w> <h> <pel> <levels> <hpad> <vpad> <sharp>
 *     <rfilter> <xratiouv> <yratiouv> <blkx> <blky> <ovx> <ovy>
 *     <searchtype> <searchparam> <pelsearch> <lambda> <lsad> <pnew>
 *     <plevel> <global> <pzero> <pglobal> <badsad> <badrange> <meander>
 *     <trymany> <coarse> <T> <f0.raw> ... <fT-1.raw> <mode args...>
 *
 *   flowfps  <num_mult> <n> <maskmode> <ml> <blend> <out.raw>
 *   blockfps <num_mult> <n> <mode> <ml> <blend> <out.raw>
 *   flowblur <blur> <prec> <n> <out.raw>
 */
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include "MVFrame.h"
#include "GroupOfPlanes.h"
#include "MVAnalysisData.h"
}
#include "vs_mini.h"

extern "C" {
void mvflowfpsRegister(VSPlugin *, const VSPLUGINAPI *);
void mvblockfpsRegister(VSPlugin *, const VSPLUGINAPI *);
void mvflowblurRegister(VSPlugin *, const VSPLUGINAPI *);
void mvfinestRegister(VSPlugin *, const VSPLUGINAPI *);
void mvflowRegister(VSPlugin *, const VSPLUGINAPI *);
void mvmaskRegister(VSPlugin *, const VSPLUGINAPI *);
}
VS_EXTERN_C void mvdepanRegister(VSPlugin *, const VSPLUGINAPI *);

static std::vector<uint8_t> read_file(const char *path, size_t expect) {
    FILE *f = fopen(path, "rb");
    if (!f) {
        fprintf(stderr, "cannot open %s\n", path);
        exit(2);
    }
    std::vector<uint8_t> buf(expect);
    if (fread(buf.data(), 1, expect, f) != expect) {
        fprintf(stderr, "short read from %s\n", path);
        exit(2);
    }
    fclose(f);
    return buf;
}

static void write_file(const char *path, const void *data, size_t size) {
    FILE *f = fopen(path, "wb");
    if (!f) {
        fprintf(stderr, "cannot write %s\n", path);
        exit(2);
    }
    fwrite(data, 1, size, f);
    fclose(f);
}

struct Geom {
    int w, h, pel, levels, hpad, vpad, sharp, rfilter, rx, ry;
    int super_w, super_h;
};

/* MVSuper's getframe, standalone (same as harness.cc build_super) */
static std::vector<uint8_t> build_super(const uint8_t *src, const Geom &g) {
    std::vector<uint8_t> buf((size_t)g.super_w * g.super_h, 0);
    MVGroupOfFrames gof;
    mvgofInit(&gof, g.levels, g.w, g.h, g.pel, g.hpad, g.vpad, YPLANE, 0,
              g.rx, g.ry, 8);
    uint8_t *pDst[3] = { buf.data(), nullptr, nullptr };
    int pitch[3] = { g.super_w, 0, 0 };
    mvgofUpdate(&gof, pDst, pitch);
    mvfFillPlane(gof.frames[0], src, g.w, 0);
    mvgofReduce(&gof, YPLANE, g.rfilter);
    mvgofPad(&gof, YPLANE);
    mvgofRefine(&gof, YPLANE, g.sharp);
    mvgofDeinit(&gof);
    return buf;
}

struct SearchParams {
    int blkx, blky, ovx, ovy, searchtype, searchparam, pelsearch;
    int lambda, lsad, pnew, plevel, global, pzero, pglobal;
    long long badsad;
    int badrange, meander, trymany, coarse;
    int nblkx, nblky;
};

static std::vector<uint8_t> run_search(const Geom &g,
                                       const SearchParams &sp,
                                       const std::vector<uint8_t> &sup_src,
                                       const std::vector<uint8_t> &sup_ref) {
    GroupOfPlanes gop;
    gopInit(&gop, sp.blkx, sp.blky, g.levels, g.pel, 0, 0, sp.ovx, sp.ovy,
            sp.nblkx, sp.nblky, g.rx, g.ry, 0, 8);
    MVGroupOfFrames srcGOF, refGOF;
    mvgofInit(&srcGOF, g.levels, g.w, g.h, g.pel, g.hpad, g.vpad, YPLANE,
              0, g.rx, g.ry, 8);
    mvgofInit(&refGOF, g.levels, g.w, g.h, g.pel, g.hpad, g.vpad, YPLANE,
              0, g.rx, g.ry, 8);
    uint8_t *pS[3] = { const_cast<uint8_t *>(sup_src.data()), nullptr,
                       nullptr };
    uint8_t *pR[3] = { const_cast<uint8_t *>(sup_ref.data()), nullptr,
                       nullptr };
    int pitch[3] = { g.super_w, 0, 0 };
    mvgofUpdate(&srcGOF, pS, pitch);
    mvgofUpdate(&refGOF, pR, pitch);
    std::vector<uint8_t> out(gopGetArraySize(&gop), 0);
    gopSearchMVs(&gop, &srcGOF, &refGOF, (SearchType)sp.searchtype,
                 sp.searchparam, sp.pelsearch, sp.lambda, sp.lsad,
                 sp.pnew, sp.plevel, sp.global, out.data(), 0, nullptr,
                 0, sp.pzero, sp.pglobal, sp.badsad, sp.badrange,
                 sp.meander, sp.trymany, (SearchType)sp.coarse);
    gopDeinit(&gop);
    mvgofDeinit(&srcGOF);
    mvgofDeinit(&refGOF);
    return out;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: see header\n");
        return 2;
    }
    const char *mode = argv[1];
    int a = 2;
    Geom g;
    g.w = atoi(argv[a++]);
    g.h = atoi(argv[a++]);
    g.pel = atoi(argv[a++]);
    g.levels = atoi(argv[a++]);
    g.hpad = atoi(argv[a++]);
    g.vpad = atoi(argv[a++]);
    g.sharp = atoi(argv[a++]);
    g.rfilter = atoi(argv[a++]);
    g.rx = atoi(argv[a++]);
    g.ry = atoi(argv[a++]);
    g.super_w = g.w + 2 * g.hpad;
    g.super_h = (int)(PlaneSuperOffset(0, g.h, g.levels, g.pel, g.vpad,
                                       (unsigned)g.super_w, g.ry)
                      / (unsigned)g.super_w);

    SearchParams sp;
    sp.blkx = atoi(argv[a++]);
    sp.blky = atoi(argv[a++]);
    sp.ovx = atoi(argv[a++]);
    sp.ovy = atoi(argv[a++]);
    sp.searchtype = atoi(argv[a++]);
    sp.searchparam = atoi(argv[a++]);
    sp.pelsearch = atoi(argv[a++]);
    sp.lambda = atoi(argv[a++]);
    sp.lsad = atoi(argv[a++]);
    sp.pnew = atoi(argv[a++]);
    sp.plevel = atoi(argv[a++]);
    sp.global = atoi(argv[a++]);
    sp.pzero = atoi(argv[a++]);
    sp.pglobal = atoi(argv[a++]);
    sp.badsad = atoll(argv[a++]);
    sp.badrange = atoi(argv[a++]);
    sp.meander = atoi(argv[a++]);
    sp.trymany = atoi(argv[a++]);
    sp.coarse = atoi(argv[a++]);
    sp.nblkx = (g.w - sp.ovx) / (sp.blkx - sp.ovx);
    sp.nblky = (g.h - sp.ovy) / (sp.blky - sp.ovy);

    int T = atoi(argv[a++]);
    std::vector<std::vector<uint8_t>> frames;
    for (int i = 0; i < T; i++)
        frames.push_back(read_file(argv[a++], (size_t)g.w * g.h));

    vsmini_register_plugin("com.nodame.mvtools", mvflowfpsRegister);
    vsmini_register_plugin("com.nodame.mvtools", mvblockfpsRegister);
    vsmini_register_plugin("com.nodame.mvtools", mvflowblurRegister);
    vsmini_register_plugin("com.nodame.mvtools", mvfinestRegister);
    vsmini_register_plugin("com.nodame.mvtools", mvdepanRegister);
    vsmini_register_plugin("com.nodame.mvtools", mvflowRegister);
    vsmini_register_plugin("com.nodame.mvtools", mvmaskRegister);
    const VSAPI *vsapi = vsmini_api();

    VSVideoFormat gray8 = { cfGray, stInteger, 8, 1, 0, 0, 1 };
    VSVideoInfo vi{};
    vi.format = gray8;
    vi.fpsNum = 25;
    vi.fpsDen = 1;
    vi.width = g.w;
    vi.height = g.h;
    vi.numFrames = T;

    /* source clip */
    std::vector<VSFrame *> src_frames;
    for (int i = 0; i < T; i++) {
        VSFrame *f = vsmini_new_frame(gray8, g.w, g.h);
        for (int y = 0; y < g.h; y++)
            memcpy(vsmini_write_ptr(f, 0) + y * vsmini_stride(f, 0),
                   frames[i].data() + (size_t)y * g.w, g.w);
        src_frames.push_back(f);
    }
    VSNode *clip = vsmini_buffer_node(vi, src_frames, "source");

    /* super clip (Super_* props as mv.Super attaches them) */
    std::vector<std::vector<uint8_t>> supers;
    for (int i = 0; i < T; i++)
        supers.push_back(build_super(frames[i].data(), g));
    VSVideoInfo svi = vi;
    svi.width = g.super_w;
    svi.height = g.super_h;
    std::vector<VSFrame *> sup_frames;
    for (int i = 0; i < T; i++) {
        VSFrame *f = vsmini_new_frame(gray8, g.super_w, g.super_h);
        for (int y = 0; y < g.super_h; y++)
            memcpy(vsmini_write_ptr(f, 0) + y * vsmini_stride(f, 0),
                   supers[i].data() + (size_t)y * g.super_w, g.super_w);
        VSMap *props = vsmini_frame_props(f);
        vsapi->mapSetInt(props, "Super_height", g.h, maReplace);
        vsapi->mapSetInt(props, "Super_hpad", g.hpad, maReplace);
        vsapi->mapSetInt(props, "Super_vpad", g.vpad, maReplace);
        vsapi->mapSetInt(props, "Super_pel", g.pel, maReplace);
        vsapi->mapSetInt(props, "Super_modeyuv", 1 /* YPLANE */,
                         maReplace);
        vsapi->mapSetInt(props, "Super_levels", g.levels, maReplace);
        sup_frames.push_back(f);
    }
    VSNode *super = vsmini_buffer_node(svi, sup_frames, "super");

    /* mv clips: mvbw frame n carries search(src n, ref n+1); mvfw frame
     * n carries search(src n, ref n-1) — MVAnalyse.c:81-109 semantics
     * with isb and delta 1.  Edge frames reference themselves (zero
     * field, like a trimmed clip would never request them). */
    auto make_mv_node = [&](int backward) {
        MVAnalysisData ad;
        memset(&ad, 0, sizeof(ad));
        ad.nVersion = MVANALYSIS_DATA_VERSION;
        ad.nBlkSizeX = sp.blkx;
        ad.nBlkSizeY = sp.blky;
        ad.nPel = g.pel;
        ad.nLvCount = g.levels;
        ad.nDeltaFrame = 1;
        ad.isBackward = backward;
        ad.nMotionFlags = backward ? MOTION_IS_BACKWARD : 0;
        ad.nWidth = g.w;
        ad.nHeight = g.h;
        ad.nOverlapX = sp.ovx;
        ad.nOverlapY = sp.ovy;
        ad.nBlkX = sp.nblkx;
        ad.nBlkY = sp.nblky;
        ad.bitsPerSample = 8;
        ad.yRatioUV = g.ry;
        ad.xRatioUV = g.rx;
        ad.nHPadding = g.hpad;
        ad.nVPadding = g.vpad;

        std::vector<VSFrame *> mv_frames;
        for (int i = 0; i < T; i++) {
            int ref = backward ? i + 1 : i - 1;
            if (ref < 0 || ref >= T)
                ref = i;
            auto blob = run_search(g, sp, supers[i], supers[ref]);
            VSFrame *f = vsmini_new_frame(gray8, 4, 4);
            VSMap *props = vsmini_frame_props(f);
            vsapi->mapSetData(props, prop_MVTools_MVAnalysisData,
                              (const char *)&ad, sizeof(ad), dtBinary,
                              maReplace);
            vsapi->mapSetData(props, prop_MVTools_vectors,
                              (const char *)blob.data(),
                              (int)blob.size(), dtBinary, maReplace);
            mv_frames.push_back(f);
        }
        return vsmini_buffer_node(vi, mv_frames,
                                  backward ? "mvbw" : "mvfw");
    };
    VSNode *mvbw = make_mv_node(1);
    VSNode *mvfw = make_mv_node(0);

    auto dump_frame = [&](const VSFrame *f, const char *path) {
        std::vector<uint8_t> out((size_t)g.w * g.h);
        for (int y = 0; y < g.h; y++)
            memcpy(out.data() + (size_t)y * g.w,
                   vsapi->getReadPtr(f, 0)
                       + y * vsapi->getStride(f, 0), g.w);
        write_file(path, out.data(), out.size());
    };

    if (!strcmp(mode, "flowfps") || !strcmp(mode, "blockfps")) {
        int num_mult = atoi(argv[a++]);
        int n = atoi(argv[a++]);
        int maskmode = atoi(argv[a++]);
        double ml = atof(argv[a++]);
        int blend = atoi(argv[a++]);
        const char *out_path = argv[a++];

        VSMap *args = vsapi->createMap();
        vsapi->mapSetNode(args, "clip", clip, maReplace);
        vsapi->mapSetNode(args, "super", super, maReplace);
        vsapi->mapSetNode(args, "mvbw", mvbw, maReplace);
        vsapi->mapSetNode(args, "mvfw", mvfw, maReplace);
        vsapi->mapSetInt(args, "num", vi.fpsNum * num_mult, maReplace);
        vsapi->mapSetInt(args, "den", vi.fpsDen, maReplace);
        vsapi->mapSetInt(args, !strcmp(mode, "flowfps") ? "mask"
                                                        : "mode",
                         maskmode, maReplace);
        vsapi->mapSetFloat(args, "ml", ml, maReplace);
        vsapi->mapSetInt(args, "blend", blend, maReplace);
        vsapi->mapSetInt(args, "opt", 0, maReplace);
        VSMap *ret = vsmini_invoke(
            "com.nodame.mvtools",
            !strcmp(mode, "flowfps") ? "FlowFPS" : "BlockFPS", args);
        VSNode *out_node = vsapi->mapGetNode(ret, "clip", 0, NULL);
        const VSFrame *f = vsapi->getFrame(n, out_node, NULL, 0);
        dump_frame(f, out_path);
        printf("%s n=%d num_mult=%d mask/mode=%d\n", mode, n, num_mult,
               maskmode);
        return 0;
    }

    if (!strcmp(mode, "depananalyse")) {
        /* <zoom> <rot> <pixaspect> <error> <wrong> <zerow> — prints
         * "n dx dy zoom rot" for every frame */
        int zoom = atoi(argv[a++]);
        int rot = atoi(argv[a++]);
        double pixaspect = atof(argv[a++]);
        double error = atof(argv[a++]);
        double wrong = atof(argv[a++]);
        double zerow = atof(argv[a++]);

        VSMap *args = vsapi->createMap();
        vsapi->mapSetNode(args, "clip", clip, maReplace);
        vsapi->mapSetNode(args, "vectors", mvbw, maReplace);
        vsapi->mapSetInt(args, "zoom", zoom, maReplace);
        vsapi->mapSetInt(args, "rot", rot, maReplace);
        vsapi->mapSetFloat(args, "pixaspect", pixaspect, maReplace);
        vsapi->mapSetFloat(args, "error", error, maReplace);
        vsapi->mapSetFloat(args, "wrong", wrong, maReplace);
        vsapi->mapSetFloat(args, "zerow", zerow, maReplace);
        VSMap *ret = vsmini_invoke("com.nodame.mvtools", "DepanAnalyse",
                                   args);
        VSNode *out_node = vsapi->mapGetNode(ret, "clip", 0, NULL);
        for (int n = 0; n < T; n++) {
            const VSFrame *f = vsapi->getFrame(n, out_node, NULL, 0);
            const VSMap *props = vsapi->getFramePropertiesRO(f);
            printf("depananalyse %d %.9g %.9g %.9g %.9g\n", n,
                   vsapi->mapGetFloat(props, "Depan_dx", 0, NULL),
                   vsapi->mapGetFloat(props, "Depan_dy", 0, NULL),
                   vsapi->mapGetFloat(props, "Depan_zoom", 0, NULL),
                   vsapi->mapGetFloat(props, "Depan_rot", 0, NULL));
        }
        return 0;
    }

    if (!strcmp(mode, "depanestimate")) {
        /* <trust> <winx> <winy> <dxmax> <dymax> <stab> — prints
         * "n dx dy zoom" for every frame */
        double trust = atof(argv[a++]);
        int winx = atoi(argv[a++]);
        int winy = atoi(argv[a++]);
        int dxmax = atoi(argv[a++]);
        int dymax = atoi(argv[a++]);
        double stab = atof(argv[a++]);

        VSMap *args = vsapi->createMap();
        vsapi->mapSetNode(args, "clip", clip, maReplace);
        vsapi->mapSetFloat(args, "trust", trust, maReplace);
        if (winx > 0)
            vsapi->mapSetInt(args, "winx", winx, maReplace);
        if (winy > 0)
            vsapi->mapSetInt(args, "winy", winy, maReplace);
        if (dxmax >= 0)
            vsapi->mapSetInt(args, "dxmax", dxmax, maReplace);
        if (dymax >= 0)
            vsapi->mapSetInt(args, "dymax", dymax, maReplace);
        vsapi->mapSetFloat(args, "stab", stab, maReplace);
        VSMap *ret = vsmini_invoke("com.nodame.mvtools",
                                   "DepanEstimate", args);
        VSNode *out_node = vsapi->mapGetNode(ret, "clip", 0, NULL);
        for (int n = 0; n < T; n++) {
            const VSFrame *f = vsapi->getFrame(n, out_node, NULL, 0);
            const VSMap *props = vsapi->getFramePropertiesRO(f);
            printf("depanestimate %d %.9g %.9g %.9g\n", n,
                   vsapi->mapGetFloat(props, "Depan_dx", 0, NULL),
                   vsapi->mapGetFloat(props, "Depan_dy", 0, NULL),
                   vsapi->mapGetFloat(props, "Depan_zoom", 0, NULL));
        }
        return 0;
    }

    bool dcomp = !strcmp(mode, "depancompensate");
    bool dstab = !strcmp(mode, "depanstabilise");
    if (dcomp || dstab) {
        /* depancompensate <offset> <subpixel> <pixaspect> <mirror>
         *   <blur> <n> <dx dy zoom rot>*T <out.raw>
         * depanstabilise <method> <cutoff> <damping> <initzoom>
         *   <addzoom> <prev> <next> <mirror> <blur> <dxmax> <dymax>
         *   <zoommax> <rotmax> <subpixel> <pixaspect> <n>
         *   <dx dy zoom rot>*T <out.raw> */
        VSMap *args = vsapi->createMap();
        vsapi->mapSetNode(args, "clip", clip, maReplace);
        int n;
        if (dcomp) {
            vsapi->mapSetFloat(args, "offset", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetInt(args, "subpixel", atoi(argv[a++]),
                             maReplace);
            vsapi->mapSetFloat(args, "pixaspect", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetInt(args, "mirror", atoi(argv[a++]),
                             maReplace);
            vsapi->mapSetInt(args, "blur", atoi(argv[a++]), maReplace);
            n = atoi(argv[a++]);
        } else {
            vsapi->mapSetInt(args, "method", atoi(argv[a++]),
                             maReplace);
            vsapi->mapSetFloat(args, "cutoff", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetFloat(args, "damping", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetFloat(args, "initzoom", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetInt(args, "addzoom", atoi(argv[a++]),
                             maReplace);
            vsapi->mapSetInt(args, "prev", atoi(argv[a++]), maReplace);
            vsapi->mapSetInt(args, "next", atoi(argv[a++]), maReplace);
            vsapi->mapSetInt(args, "mirror", atoi(argv[a++]),
                             maReplace);
            vsapi->mapSetInt(args, "blur", atoi(argv[a++]), maReplace);
            vsapi->mapSetFloat(args, "dxmax", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetFloat(args, "dymax", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetFloat(args, "zoommax", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetFloat(args, "rotmax", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetInt(args, "subpixel", atoi(argv[a++]),
                             maReplace);
            vsapi->mapSetFloat(args, "pixaspect", atof(argv[a++]),
                               maReplace);
            n = atoi(argv[a++]);
        }
        /* data clip: the Depan_* motion props per frame */
        std::vector<VSFrame *> data_frames;
        for (int i = 0; i < T; i++) {
            VSFrame *f = vsmini_new_frame(gray8, 4, 4);
            VSMap *props = vsmini_frame_props(f);
            vsapi->mapSetFloat(props, "Depan_dx", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetFloat(props, "Depan_dy", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetFloat(props, "Depan_zoom", atof(argv[a++]),
                               maReplace);
            vsapi->mapSetFloat(props, "Depan_rot", atof(argv[a++]),
                               maReplace);
            data_frames.push_back(f);
        }
        vsapi->mapSetNode(args, "data",
                          vsmini_buffer_node(vi, data_frames, "data"),
                          maReplace);
        const char *out_path = argv[a++];
        VSMap *ret = vsmini_invoke(
            "com.nodame.mvtools",
            dcomp ? "DepanCompensate" : "DepanStabilise", args);
        VSNode *out_node = vsapi->mapGetNode(ret, "clip", 0, NULL);
        const VSFrame *f = vsapi->getFrame(n, out_node, NULL, 0);
        dump_frame(f, out_path);
        printf("%s n=%d\n", mode, n);
        return 0;
    }

    if (!strcmp(mode, "flow")) {
        /* flow <time> <flowmode> <backward> <n> <out.raw> */
        double tim = atof(argv[a++]);
        int fmode = atoi(argv[a++]);
        int backward = atoi(argv[a++]);
        int n = atoi(argv[a++]);
        const char *out_path = argv[a++];

        VSMap *args = vsapi->createMap();
        vsapi->mapSetNode(args, "clip", clip, maReplace);
        vsapi->mapSetNode(args, "super", super, maReplace);
        vsapi->mapSetNode(args, "vectors", backward ? mvbw : mvfw,
                          maReplace);
        vsapi->mapSetFloat(args, "time", tim, maReplace);
        vsapi->mapSetInt(args, "mode", fmode, maReplace);
        vsapi->mapSetInt(args, "opt", 0, maReplace);
        VSMap *ret = vsmini_invoke("com.nodame.mvtools", "Flow", args);
        VSNode *out_node = vsapi->mapGetNode(ret, "clip", 0, NULL);
        const VSFrame *f = vsapi->getFrame(n, out_node, NULL, 0);
        dump_frame(f, out_path);
        printf("flow n=%d time=%g mode=%d backward=%d\n", n, tim, fmode,
               backward);
        return 0;
    }

    if (!strcmp(mode, "mask")) {
        /* mask <ml> <gamma> <kind> <time> <ysc> <n> <out.raw>
         * gray input -> YUV444P8 output; out.raw = Y then U then V,
         * each w*h bytes */
        double ml = atof(argv[a++]);
        double gamma = atof(argv[a++]);
        int kind = atoi(argv[a++]);
        double tim = atof(argv[a++]);
        int ysc = atoi(argv[a++]);
        int n = atoi(argv[a++]);
        const char *out_path = argv[a++];

        VSMap *args = vsapi->createMap();
        vsapi->mapSetNode(args, "clip", clip, maReplace);
        vsapi->mapSetNode(args, "vectors", mvbw, maReplace);
        vsapi->mapSetFloat(args, "ml", ml, maReplace);
        vsapi->mapSetFloat(args, "gamma", gamma, maReplace);
        vsapi->mapSetInt(args, "kind", kind, maReplace);
        vsapi->mapSetFloat(args, "time", tim, maReplace);
        vsapi->mapSetInt(args, "ysc", ysc, maReplace);
        vsapi->mapSetInt(args, "opt", 0, maReplace);
        VSMap *ret = vsmini_invoke("com.nodame.mvtools", "Mask", args);
        VSNode *out_node = vsapi->mapGetNode(ret, "clip", 0, NULL);
        const VSFrame *f = vsapi->getFrame(n, out_node, NULL, 0);
        std::vector<uint8_t> out((size_t)g.w * g.h * 3);
        for (int p = 0; p < 3; p++)
            for (int y = 0; y < g.h; y++)
                memcpy(out.data() + ((size_t)p * g.h + y) * g.w,
                       vsapi->getReadPtr(f, p)
                           + y * vsapi->getStride(f, p), g.w);
        write_file(out_path, out.data(), out.size());
        printf("mask n=%d kind=%d ml=%g\n", n, kind, ml);
        return 0;
    }

    if (!strcmp(mode, "flowblur")) {
        double blur = atof(argv[a++]);
        int prec = atoi(argv[a++]);
        int n = atoi(argv[a++]);
        const char *out_path = argv[a++];

        VSMap *args = vsapi->createMap();
        vsapi->mapSetNode(args, "clip", clip, maReplace);
        vsapi->mapSetNode(args, "super", super, maReplace);
        vsapi->mapSetNode(args, "mvbw", mvbw, maReplace);
        vsapi->mapSetNode(args, "mvfw", mvfw, maReplace);
        vsapi->mapSetFloat(args, "blur", blur, maReplace);
        vsapi->mapSetInt(args, "prec", prec, maReplace);
        vsapi->mapSetInt(args, "opt", 0, maReplace);
        VSMap *ret = vsmini_invoke("com.nodame.mvtools", "FlowBlur",
                                   args);
        VSNode *out_node = vsapi->mapGetNode(ret, "clip", 0, NULL);
        const VSFrame *f = vsapi->getFrame(n, out_node, NULL, 0);
        dump_frame(f, out_path);
        printf("flowblur n=%d blur=%g prec=%d\n", n, blur, prec);
        return 0;
    }

    fprintf(stderr, "bad mode %s\n", mode);
    return 2;
}
