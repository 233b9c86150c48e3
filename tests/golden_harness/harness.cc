/* Golden-test harness: drive the reference's scalar C kernels
 * (MVFrame.cpp pyramid build + GroupOfPlanes/PlaneOfBlocks search,
 * compiled from /root/reference/src WITHOUT MVTOOLS_X86, i.e. the pure
 * scalar dispatch tier) standalone, and dump the resulting MV vectors
 * array — the byte blob MVAnalyse stores as a frame prop
 * (MVAnalyse.c:153, GroupOfPlanes.c:77-108).
 *
 * The reference sources are compiled IN PLACE from the read-only
 * reference checkout; this directory only carries the VSHelper/fftw
 * stubs and this driver.  Usage:
 *
 *   golden_harness super <w> <h> <pel> <levels> <hpad> <vpad> <sharp>
 *       <rfilter> <xratiouv> <yratiouv> <in.raw> <out_super.raw>
 *   golden_harness analyse <w> <h> <pel> <levels> <hpad> <vpad> <sharp>
 *       <rfilter> <xratiouv> <yratiouv> <blksizex> <blksizey>
 *       <overlapx> <overlapy>
 *       <searchtype> <searchparam> <pelsearch> <lambda> <lsad> <pnew>
 *       <plevel> <global> <pzero> <pglobal> <badsad> <badrange>
 *       <meander> <trymany> <coarsesearch> <src.raw> <ref.raw>
 *       <out_vectors.bin>
 *
 * Raw frames are 8-bit grayscale, w*h bytes, row-major. */

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include "MVFrame.h"
#include "GroupOfPlanes.h"
}

static std::vector<uint8_t> read_file(const char *path, size_t expect) {
    FILE *f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    std::vector<uint8_t> buf(expect);
    if (fread(buf.data(), 1, expect, f) != expect) {
        fprintf(stderr, "short read from %s\n", path); exit(2);
    }
    fclose(f);
    return buf;
}

static void write_file(const char *path, const void *data, size_t size) {
    FILE *f = fopen(path, "wb");
    if (!f) { fprintf(stderr, "cannot open %s for write\n", path); exit(2); }
    fwrite(data, 1, size, f);
    fclose(f);
}

struct SuperGeom {
    int w, h, pel, levels, hpad, vpad, rx, ry;
    int super_w, super_h, pitch;
};

/* Build the super frame exactly like MVSuper's getframe
 * (MVSuper.c:60-105): FillPlane level 0, Reduce, Pad, Refine. */
static std::vector<uint8_t> build_super(const uint8_t *src,
                                        const SuperGeom &g, int sharp,
                                        int rfilter) {
    std::vector<uint8_t> buf((size_t)g.pitch * g.super_h, 0);
    MVGroupOfFrames gof;
    mvgofInit(&gof, g.levels, g.w, g.h, g.pel, g.hpad, g.vpad, YPLANE,
              /*opt=*/0, g.rx, g.ry, /*bitsPerSample=*/8);
    uint8_t *pDst[3] = { buf.data(), nullptr, nullptr };
    int pitch[3] = { g.pitch, 0, 0 };
    mvgofUpdate(&gof, pDst, pitch);
    mvfFillPlane(gof.frames[0], src, g.w, 0);
    mvgofReduce(&gof, YPLANE, rfilter);
    mvgofPad(&gof, YPLANE);
    mvgofRefine(&gof, YPLANE, sharp);
    mvgofDeinit(&gof);
    return buf;
}

static SuperGeom make_geom(int w, int h, int pel, int levels, int hpad,
                           int vpad, int rx, int ry) {
    SuperGeom g{w, h, pel, levels, hpad, vpad, rx, ry, 0, 0, 0};
    g.super_w = w + 2 * hpad;
    g.pitch = g.super_w;
    g.super_h = (int)(PlaneSuperOffset(0, h, levels, pel, vpad, g.super_w,
                                       ry) / (unsigned)g.super_w);
    return g;
}

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: see header\n"); return 2; }
    const char *mode = argv[1];
    int a = 2;
    int w = atoi(argv[a++]), h = atoi(argv[a++]);
    int pel = atoi(argv[a++]), levels = atoi(argv[a++]);
    int hpad = atoi(argv[a++]), vpad = atoi(argv[a++]);
    int sharp = atoi(argv[a++]), rfilter = atoi(argv[a++]);
    int rx = atoi(argv[a++]), ry = atoi(argv[a++]);
    SuperGeom g = make_geom(w, h, pel, levels, hpad, vpad, rx, ry);

    if (!strcmp(mode, "super")) {
        auto src = read_file(argv[a++], (size_t)w * h);
        auto sup = build_super(src.data(), g, sharp, rfilter);
        write_file(argv[a++], sup.data(), sup.size());
        printf("super %dx%d pitch %d\n", g.super_w, g.super_h, g.pitch);
        return 0;
    }

    if (strcmp(mode, "analyse")) { fprintf(stderr, "bad mode\n"); return 2; }

    int blkx = atoi(argv[a++]), blky = atoi(argv[a++]);
    int ovx = atoi(argv[a++]), ovy = atoi(argv[a++]);
    int searchtype = atoi(argv[a++]), searchparam = atoi(argv[a++]);
    int pelsearch = atoi(argv[a++]);
    int lambda = atoi(argv[a++]), lsad = atoi(argv[a++]);
    int pnew = atoi(argv[a++]), plevel = atoi(argv[a++]);
    int global = atoi(argv[a++]);
    int pzero = atoi(argv[a++]), pglobal = atoi(argv[a++]);
    long long badsad = atoll(argv[a++]);
    int badrange = atoi(argv[a++]);
    int meander = atoi(argv[a++]), trymany = atoi(argv[a++]);
    int coarse = atoi(argv[a++]);
    const char *src_path = argv[a++], *ref_path = argv[a++];
    const char *out_path = argv[a++];

    auto src = read_file(src_path, (size_t)w * h);
    auto ref = read_file(ref_path, (size_t)w * h);
    auto sup_src = build_super(src.data(), g, sharp, rfilter);
    auto sup_ref = build_super(ref.data(), g, sharp, rfilter);

    // block counts at the finest level (MVAnalyse.c create)
    int nblkx = (w - ovx) / (blkx - ovx);
    int nblky = (h - ovy) / (blky - ovy);

    GroupOfPlanes gop;
    gopInit(&gop, blkx, blky, levels, pel, /*nMotionFlags=*/0,
            /*nCPUFlags=*/0, ovx, ovy, nblkx, nblky, g.rx, g.ry,
            /*divideExtra=*/0, /*bitsPerSample=*/8);

    MVGroupOfFrames srcGOF, refGOF;
    mvgofInit(&srcGOF, levels, w, h, pel, hpad, vpad, YPLANE, 0, g.rx,
              g.ry, 8);
    mvgofInit(&refGOF, levels, w, h, pel, hpad, vpad, YPLANE, 0, g.rx,
              g.ry, 8);
    uint8_t *pSrc[3] = { sup_src.data(), nullptr, nullptr };
    uint8_t *pRef[3] = { sup_ref.data(), nullptr, nullptr };
    int pitch[3] = { g.pitch, 0, 0 };
    mvgofUpdate(&srcGOF, pSrc, pitch);
    mvgofUpdate(&refGOF, pRef, pitch);

    MVArraySizeType size = gopGetArraySize(&gop);
    std::vector<uint8_t> out(size, 0);
    gopSearchMVs(&gop, &srcGOF, &refGOF, (SearchType)searchtype,
                 searchparam, pelsearch, lambda, lsad, pnew, plevel,
                 global, out.data(), /*fieldShift=*/0, /*DCT=*/nullptr,
                 /*dctmode=*/0, pzero, pglobal, badsad, badrange, meander,
                 trymany, (SearchType)coarse);

    write_file(out_path, out.data(), out.size());
    printf("analyse blob %u bytes, %dx%d blocks, %d levels\n",
           (unsigned)size, nblkx, nblky, levels);

    gopDeinit(&gop);
    mvgofDeinit(&srcGOF);
    mvgofDeinit(&refGOF);
    return 0;
}
