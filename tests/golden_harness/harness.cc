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
#include <ctime>
#include <vector>

extern "C" {
#include "MVFrame.h"
#include "GroupOfPlanes.h"
#include "MVAnalysisData.h"
#include "Overlap.h"
#include "MaskFun.h"
#include "SimpleResize.h"
}
#include "VSHelper4.h"
#include "MVDegrains.h"

/* MaskFun/SimpleResize reference g_cpuinfo (set by the plugin's
 * EntryPoint); the harness always runs opt=0 scalar */
extern "C" uint32_t g_cpuinfo;
uint32_t g_cpuinfo = 0;

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
 * (MVSuper.c:60-105): FillPlane level 0, Reduce, Pad, Refine.
 * Pitches are in BYTES (8- or 16-bit samples). */
static std::vector<uint8_t> build_super(const uint8_t *src,
                                        const SuperGeom &g, int sharp,
                                        int rfilter, int bits = 8) {
    int bytes = bits > 8 ? 2 : 1;
    std::vector<uint8_t> buf((size_t)g.pitch * bytes * g.super_h, 0);
    MVGroupOfFrames gof;
    mvgofInit(&gof, g.levels, g.w, g.h, g.pel, g.hpad, g.vpad, YPLANE,
              /*opt=*/0, g.rx, g.ry, bits);
    uint8_t *pDst[3] = { buf.data(), nullptr, nullptr };
    int pitch[3] = { g.pitch * bytes, 0, 0 };
    mvgofUpdate(&gof, pDst, pitch);
    mvfFillPlane(gof.frames[0], src, g.w * bytes, 0);
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

/* three-plane super build (MVSuper.c:60-105 with nModeYUV=YUVPLANES) */
static void build_super_yuv(const SuperGeom &g, int sharp, int rfilter,
                            const uint8_t *y, const uint8_t *u,
                            const uint8_t *v, std::vector<uint8_t> &by,
                            std::vector<uint8_t> &bu,
                            std::vector<uint8_t> &bv) {
    int wc = g.w / g.rx;
    int pitch_c = g.pitch / g.rx;
    int suph_c = g.super_h / g.ry;
    by.assign((size_t)g.pitch * g.super_h, 0);
    bu.assign((size_t)pitch_c * suph_c, 0);
    bv.assign((size_t)pitch_c * suph_c, 0);
    MVGroupOfFrames gof;
    mvgofInit(&gof, g.levels, g.w, g.h, g.pel, g.hpad, g.vpad,
              YUVPLANES, 0, g.rx, g.ry, 8);
    uint8_t *pDst[3] = { by.data(), bu.data(), bv.data() };
    int pitch3[3] = { g.pitch, pitch_c, pitch_c };
    mvgofUpdate(&gof, pDst, pitch3);
    mvfFillPlane(gof.frames[0], y, g.w, 0);
    mvfFillPlane(gof.frames[0], u, wc, 1);
    mvfFillPlane(gof.frames[0], v, wc, 2);
    mvgofReduce(&gof, YUVPLANES, rfilter);
    mvgofPad(&gof, YUVPLANES);
    mvgofRefine(&gof, YUVPLANES, sharp);
    mvgofDeinit(&gof);
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

    bool degrain_mode = !strcmp(mode, "degrain1");
    bool comp_mode = !strcmp(mode, "compensate");
    bool recalc_mode = !strcmp(mode, "recalculate");
    bool flowinter_mode = !strcmp(mode, "flowinter");
    bool yuv_mode = !strcmp(mode, "yuvanalyse");
    bool yuvdeg_mode = !strcmp(mode, "yuvdegrain1");
    bool yuvcomp_mode = !strcmp(mode, "yuvcompensate");
    bool usable_mode = !strcmp(mode, "usable");
    /* flow-family / depan goldens live in golden_vs (vs_driver.cc) */
    if (strcmp(mode, "analyse") && !degrain_mode && !comp_mode
        && !recalc_mode && !flowinter_mode && !yuv_mode
        && !yuvdeg_mode && !yuvcomp_mode && !usable_mode) {
        fprintf(stderr, "bad mode\n");
        return 2;
    }

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
    // block counts at the finest level (MVAnalyse.c create)
    int nblkx = (w - ovx) / (blkx - ovx);
    int nblky = (h - ovy) / (blky - ovy);

    int field_shift = 0;   // analyse mode: optional trailing arg
    int dctmode = 0;       // analyse mode: optional trailing arg
    int divide = 0;        // analyse mode: optional trailing arg
    int bits = 8;          // analyse mode: optional trailing arg

    auto run_search = [&](std::vector<uint8_t> &sup_src,
                          std::vector<uint8_t> &sup_ref) {
        int bytes = bits > 8 ? 2 : 1;
        GroupOfPlanes gop;
        gopInit(&gop, blkx, blky, levels, pel, /*nMotionFlags=*/0,
                /*nCPUFlags=*/0, ovx, ovy, nblkx, nblky, g.rx, g.ry,
                divide, bits);
        MVGroupOfFrames srcGOF, refGOF;
        mvgofInit(&srcGOF, levels, w, h, pel, hpad, vpad, YPLANE, 0,
                  g.rx, g.ry, bits);
        mvgofInit(&refGOF, levels, w, h, pel, hpad, vpad, YPLANE, 0,
                  g.rx, g.ry, bits);
        uint8_t *pSrc[3] = { sup_src.data(), nullptr, nullptr };
        uint8_t *pRef[3] = { sup_ref.data(), nullptr, nullptr };
        int pitch[3] = { g.pitch * bytes, 0, 0 };
        mvgofUpdate(&srcGOF, pSrc, pitch);
        mvgofUpdate(&refGOF, pRef, pitch);
        MVArraySizeType size = gopGetArraySize(&gop);
        std::vector<uint8_t> out(size, 0);
        DCTFFTW dct;             // scalar REDFT10 stub (dct_stub.cc)
        if (dctmode)
            dctInit(&dct, blkx, blky, bits, 0);
        gopSearchMVs(&gop, &srcGOF, &refGOF, (SearchType)searchtype,
                     searchparam, pelsearch, lambda, lsad, pnew, plevel,
                     global, out.data(), field_shift,
                     dctmode ? &dct : nullptr, dctmode, pzero, pglobal,
                     badsad, badrange, meander, trymany,
                     (SearchType)coarse);
        if (divide)
            gopExtraDivide(&gop, out.data());
        if (dctmode)
            dctDeinit(&dct);
        gopDeinit(&gop);
        mvgofDeinit(&srcGOF);
        mvgofDeinit(&refGOF);
        return out;
    };

    if (usable_mode) {
        /* usable: Super -> MAnalyse -> fgopIsUsable for several
         * (thscd1, thscd2) pairs with the gray scaleThSCD
         * normalisation (MVAnalysisData.c:7-31, Fakery.c:52-58,
         * :144-146).  Extra args: <src> <ref> then pairs. */
        const char *src_path = argv[a++], *ref_path = argv[a++];
        auto src = read_file(src_path, (size_t)w * h);
        auto ref = read_file(ref_path, (size_t)w * h);
        auto sup_src = build_super(src.data(), g, sharp, rfilter);
        auto sup_ref = build_super(ref.data(), g, sharp, rfilter);
        auto vec = run_search(sup_src, sup_ref);
        MVAnalysisData ad;
        memset(&ad, 0, sizeof(ad));
        ad.nBlkSizeX = blkx;
        ad.nBlkSizeY = blky;
        ad.nPel = pel;
        ad.nLvCount = levels;
        ad.nOverlapX = ovx;
        ad.nOverlapY = ovy;
        ad.nBlkX = nblkx;
        ad.nBlkY = nblky;
        ad.nWidth = w;
        ad.nHeight = h;
        ad.xRatioUV = g.rx;
        ad.yRatioUV = g.ry;
        ad.bitsPerSample = 8;
        FakeGroupOfPlanes fgop;
        fgopInit(&fgop, &ad);
        fgopUpdate(&fgop, vec.data());
        while (a + 1 < argc) {
            long long t1 = atoll(argv[a++]);
            int t2 = atoi(argv[a++]);
            int64_t nSCD1 = t1 * (blkx * blky) / 64;
            int nSCD2 = t2 * nblkx * nblky / 256;
            printf("usable %lld %d -> %d\n", t1, t2,
                   fgopIsUsable(&fgop, nSCD1, nSCD2));
        }
        fgopDeinit(&fgop);
        return 0;
    }

    if (recalc_mode) {
        /* recalculate: Super -> MAnalyse -> MRecalculate
         * (mvrecalculateGetFrame MVRecalculate.c:98-260: fgop from the
         * analyse blob, a fresh 1-level GroupOfPlanes at the recalc
         * block geometry, gopRecalculateMVs).  Extra args:
         *   <rblkx> <rblky> <rovx> <rovy> <rsearch> <rsearchparam>
         *   <rlambda> <rpnew> <rthsad> <rsmooth> <src.raw> <ref.raw>
         *   <out_vectors.bin> */
        int rblkx = atoi(argv[a++]), rblky = atoi(argv[a++]);
        int rovx = atoi(argv[a++]), rovy = atoi(argv[a++]);
        int rsearch = atoi(argv[a++]), rsearchparam = atoi(argv[a++]);
        int rlambda = atoi(argv[a++]), rpnew = atoi(argv[a++]);
        long long rthsad = atoll(argv[a++]);
        int rsmooth = atoi(argv[a++]);
        const char *src_path = argv[a++], *ref_path = argv[a++];
        const char *out_path = argv[a++];

        auto src = read_file(src_path, (size_t)w * h);
        auto ref = read_file(ref_path, (size_t)w * h);
        auto sup_src = build_super(src.data(), g, sharp, rfilter);
        auto sup_ref = build_super(ref.data(), g, sharp, rfilter);
        auto vec = run_search(sup_src, sup_ref);

        MVAnalysisData ad;   // the ANALYSE stage's data, for the fgop
        memset(&ad, 0, sizeof(ad));
        ad.nBlkSizeX = blkx;
        ad.nBlkSizeY = blky;
        ad.nPel = pel;
        ad.nLvCount = levels;
        ad.nOverlapX = ovx;
        ad.nOverlapY = ovy;
        ad.nBlkX = nblkx;
        ad.nBlkY = nblky;
        ad.nWidth = w;
        ad.nHeight = h;
        ad.xRatioUV = g.rx;
        ad.yRatioUV = g.ry;
        ad.bitsPerSample = 8;
        FakeGroupOfPlanes fgop;
        fgopInit(&fgop, &ad);
        fgopUpdate(&fgop, vec.data());

        int rnblkx = (w - rovx) / (rblkx - rovx);
        int rnblky = (h - rovy) / (rblky - rovy);
        GroupOfPlanes gop;
        gopInit(&gop, rblkx, rblky, /*levels=*/1, pel, /*motionFlags=*/0,
                /*cpuFlags=*/0, rovx, rovy, rnblkx, rnblky, g.rx, g.ry,
                /*divideExtra=*/0, /*bitsPerSample=*/8);
        MVGroupOfFrames srcGOF, refGOF;
        mvgofInit(&srcGOF, levels, w, h, pel, hpad, vpad, YPLANE, 0,
                  g.rx, g.ry, 8);
        mvgofInit(&refGOF, levels, w, h, pel, hpad, vpad, YPLANE, 0,
                  g.rx, g.ry, 8);
        uint8_t *pS[3] = { sup_src.data(), nullptr, nullptr };
        uint8_t *pR[3] = { sup_ref.data(), nullptr, nullptr };
        int pitch3[3] = { g.pitch, 0, 0 };
        mvgofUpdate(&srcGOF, pS, pitch3);
        mvgofUpdate(&refGOF, pR, pitch3);

        /* thSAD scaling (MVRecalculate.c:489-496): 8-bit gray, recalc
         * block size */
        int64_t thSAD = rthsad * (rblkx * rblky) / 64;
        std::vector<uint8_t> out(gopGetArraySize(&gop), 0);
        gopRecalculateMVs(&gop, &fgop, &srcGOF, &refGOF,
                          (SearchType)rsearch, rsearchparam, rlambda,
                          rpnew, out.data(), /*fieldShift=*/0, thSAD,
                          /*DCT=*/nullptr, /*dctmode=*/0, rsmooth,
                          meander);
        write_file(out_path, out.data(), out.size());
        printf("recalculate blob %u bytes, %dx%d blocks, thSAD %lld\n",
               (unsigned)out.size(), rnblkx, rnblky, (long long)thSAD);
        gopDeinit(&gop);
        fgopDeinit(&fgop);
        mvgofDeinit(&srcGOF);
        mvgofDeinit(&refGOF);
        return 0;
    }

    if (yuv_mode) {
        /* chroma motion search golden: YUV supers + gopSearchMVs with
         * MOTION_USE_CHROMA_MOTION (MVAnalyse.c:486-489, chroma SADs
         * via pobGetRefBlockU/V negative-bias rounding).  Extra args:
         *   <srcY> <srcU> <srcV> <refY> <refU> <refV> <out.bin> */
        int wc = w / g.rx, hc = h / g.ry;
        int pitch_c = g.pitch / g.rx;

        auto build_yuv = [&](const uint8_t *y, const uint8_t *u,
                             const uint8_t *v,
                             std::vector<uint8_t> &by,
                             std::vector<uint8_t> &bu,
                             std::vector<uint8_t> &bv) {
            build_super_yuv(g, sharp, rfilter, y, u, v, by, bu, bv);
        };

        auto sy = read_file(argv[a++], (size_t)w * h);
        auto su = read_file(argv[a++], (size_t)wc * hc);
        auto sv = read_file(argv[a++], (size_t)wc * hc);
        auto ry_ = read_file(argv[a++], (size_t)w * h);
        auto ru = read_file(argv[a++], (size_t)wc * hc);
        auto rv = read_file(argv[a++], (size_t)wc * hc);
        const char *out_path = argv[a++];

        std::vector<uint8_t> sby, sbu, sbv, rby, rbu, rbv;
        build_yuv(sy.data(), su.data(), sv.data(), sby, sbu, sbv);
        build_yuv(ry_.data(), ru.data(), rv.data(), rby, rbu, rbv);

        GroupOfPlanes gop;
        gopInit(&gop, blkx, blky, levels, pel,
                /*nMotionFlags=*/0x00000008 /* MOTION_USE_CHROMA_MOTION */,
                /*nCPUFlags=*/0, ovx, ovy, nblkx, nblky, g.rx, g.ry,
                /*divideExtra=*/0, /*bitsPerSample=*/8);
        MVGroupOfFrames srcGOF, refGOF;
        mvgofInit(&srcGOF, levels, w, h, pel, hpad, vpad, YUVPLANES, 0,
                  g.rx, g.ry, 8);
        mvgofInit(&refGOF, levels, w, h, pel, hpad, vpad, YUVPLANES, 0,
                  g.rx, g.ry, 8);
        uint8_t *pS[3] = { sby.data(), sbu.data(), sbv.data() };
        uint8_t *pR[3] = { rby.data(), rbu.data(), rbv.data() };
        int pitch3[3] = { g.pitch, pitch_c, pitch_c };
        mvgofUpdate(&srcGOF, pS, pitch3);
        mvgofUpdate(&refGOF, pR, pitch3);
        std::vector<uint8_t> out(gopGetArraySize(&gop), 0);
        gopSearchMVs(&gop, &srcGOF, &refGOF, (SearchType)searchtype,
                     searchparam, pelsearch, lambda, lsad, pnew, plevel,
                     global, out.data(), /*fieldShift=*/0,
                     /*DCT=*/nullptr, /*dctmode=*/0, pzero, pglobal,
                     badsad, badrange, meander, trymany,
                     (SearchType)coarse);
        write_file(out_path, out.data(), out.size());
        printf("yuvanalyse blob %u bytes\n", (unsigned)out.size());
        gopDeinit(&gop);
        mvgofDeinit(&srcGOF);
        mvgofDeinit(&refGOF);
        return 0;
    }

    if (flowinter_mode) {
        /* flowinter: Super -> MAnalyse bwd/fwd -> small vector fields +
         * occlusion masks -> SimpleResize -> Finest (Merge4PlanesToBig)
         * -> FlowInter kernel, no extra fields (mvflowinterGetFrame
         * MVFlowInter.c:145-378, geometry :655-676).  Extra args:
         *   <time256> <ml> <src.raw> <ref.raw> <out_frame.raw> */
        int time256 = atoi(argv[a++]);
        double ml = atof(argv[a++]);
        int use_simple = atoi(argv[a++]);
        const char *src_path = argv[a++], *ref_path = argv[a++];
        const char *out_path = argv[a++];

        auto src = read_file(src_path, (size_t)w * h);
        auto ref = read_file(ref_path, (size_t)w * h);
        auto sup_src = build_super(src.data(), g, sharp, rfilter);
        auto sup_ref = build_super(ref.data(), g, sharp, rfilter);
        /* mvbw at frame n: src super n, ref super n+1; mvfw at n+1:
         * src super n+1, ref super n (MVAnalyse.c:81-109) */
        auto vec_b = run_search(sup_src, sup_ref);
        auto vec_f = run_search(sup_ref, sup_src);

        MVAnalysisData ad;
        memset(&ad, 0, sizeof(ad));
        ad.nBlkSizeX = blkx;
        ad.nBlkSizeY = blky;
        ad.nPel = pel;
        ad.nLvCount = levels;
        ad.nOverlapX = ovx;
        ad.nOverlapY = ovy;
        ad.nBlkX = nblkx;
        ad.nBlkY = nblky;
        ad.nWidth = w;
        ad.nHeight = h;
        ad.xRatioUV = g.rx;
        ad.yRatioUV = g.ry;
        ad.bitsPerSample = 8;
        FakeGroupOfPlanes fgopB, fgopF;
        fgopInit(&fgopB, &ad);
        fgopInit(&fgopF, &ad);
        fgopUpdate(&fgopB, vec_b.data());
        fgopUpdate(&fgopF, vec_f.data());

        int nBlkXP = nblkx, nBlkYP = nblky;
        while (nBlkXP * (blkx - ovx) + ovx < w)
            nBlkXP++;
        while (nBlkYP * (blky - ovy) + ovy < h)
            nBlkYP++;
        int nWidthP = nBlkXP * (blkx - ovx) + ovx;
        int nHeightP = nBlkYP * (blky - ovy) + ovy;
        int VPitchY = (nWidthP + 15) & ~15;
        size_t nsm = (size_t)nBlkXP * nBlkYP;

        std::vector<int16_t> VXSmallB(nsm), VYSmallB(nsm);
        std::vector<int16_t> VXSmallF(nsm), VYSmallF(nsm);
        MakeVectorSmallMasks(&fgopB, nblkx, nblky, VXSmallB.data(),
                             nBlkXP, VYSmallB.data(), nBlkXP);
        MakeVectorSmallMasks(&fgopF, nblkx, nblky, VXSmallF.data(),
                             nBlkXP, VYSmallF.data(), nBlkXP);
        CheckAndPadSmallY(VXSmallB.data(), VYSmallB.data(), nBlkXP,
                          nBlkYP, nblkx, nblky);
        CheckAndPadSmallY(VXSmallF.data(), VYSmallF.data(), nBlkXP,
                          nBlkYP, nblkx, nblky);
        std::vector<uint8_t> MaskSmallB(nsm), MaskSmallF(nsm);
        MakeVectorOcclusionMaskTime(&fgopB, 1, nblkx, nblky, ml, 1.0,
                                    pel, MaskSmallB.data(), nBlkXP,
                                    256 - time256, blkx - ovx,
                                    blky - ovy);
        MakeVectorOcclusionMaskTime(&fgopF, 0, nblkx, nblky, ml, 1.0,
                                    pel, MaskSmallF.data(), nBlkXP,
                                    time256, blkx - ovx, blky - ovy);
        CheckAndPadMaskSmall(MaskSmallB.data(), nBlkXP, nBlkYP, nblkx,
                             nblky);
        CheckAndPadMaskSmall(MaskSmallF.data(), nBlkXP, nBlkYP, nblkx,
                             nblky);

        SimpleResize upsizer;
        simpleInit(&upsizer, nWidthP, nHeightP, nBlkXP, nBlkYP, w, h,
                   pel, /*opt=*/0);
        size_t nfull = (size_t)nHeightP * VPitchY;
        std::vector<int16_t> VXFullB(nfull), VYFullB(nfull);
        std::vector<int16_t> VXFullF(nfull), VYFullF(nfull);
        upsizer.simpleResize_int16_t(&upsizer, VXFullB.data(), VPitchY,
                                     VXSmallB.data(), nBlkXP, 1);
        upsizer.simpleResize_int16_t(&upsizer, VYFullB.data(), VPitchY,
                                     VYSmallB.data(), nBlkXP, 0);
        upsizer.simpleResize_int16_t(&upsizer, VXFullF.data(), VPitchY,
                                     VXSmallF.data(), nBlkXP, 1);
        upsizer.simpleResize_int16_t(&upsizer, VYFullF.data(), VPitchY,
                                     VYSmallF.data(), nBlkXP, 0);
        std::vector<uint8_t> MaskFullB(nfull), MaskFullF(nfull);
        upsizer.simpleResize_uint8_t(&upsizer, MaskFullB.data(),
                                     VPitchY, MaskSmallB.data(),
                                     nBlkXP, 0);
        upsizer.simpleResize_uint8_t(&upsizer, MaskFullF.data(),
                                     VPitchY, MaskSmallF.data(),
                                     nBlkXP, 0);

        /* finest frames (MVFinest.c:76-123) */
        auto make_fine = [&](std::vector<uint8_t> &sup) {
            MVGroupOfFrames gof;
            mvgofInit(&gof, levels, w, h, pel, hpad, vpad, YPLANE, 0,
                      g.rx, g.ry, 8);
            uint8_t *pS[3] = { sup.data(), nullptr, nullptr };
            int pitch3[3] = { g.pitch, 0, 0 };
            mvgofUpdate(&gof, pS, pitch3);
            MVPlane *pl = gof.frames[0]->planes[0];
            int fpw = pl->nPaddedWidth, fph = pl->nPaddedHeight;
            int finePitch = fpw * pel;
            std::vector<uint8_t> fine((size_t)fph * pel * finePitch);
            if (pel == 1) {
                for (int y = 0; y < fph; y++)
                    memcpy(fine.data() + (size_t)y * finePitch,
                           mvpGetAbsolutePointer(pl, 0, 0)
                               + (size_t)y * pl->nPitch, fpw);
            } else if (pel == 2) {
                Merge4PlanesToBig(fine.data(), finePitch,
                                  mvpGetAbsolutePointer(pl, 0, 0),
                                  mvpGetAbsolutePointer(pl, 1, 0),
                                  mvpGetAbsolutePointer(pl, 0, 1),
                                  mvpGetAbsolutePointer(pl, 1, 1),
                                  fpw, fph, pl->nPitch, 8);
            } else {
                Merge16PlanesToBig(fine.data(), finePitch,
                                   mvpGetAbsolutePointer(pl, 0, 0),
                                   mvpGetAbsolutePointer(pl, 1, 0),
                                   mvpGetAbsolutePointer(pl, 2, 0),
                                   mvpGetAbsolutePointer(pl, 3, 0),
                                   mvpGetAbsolutePointer(pl, 0, 1),
                                   mvpGetAbsolutePointer(pl, 1, 1),
                                   mvpGetAbsolutePointer(pl, 2, 1),
                                   mvpGetAbsolutePointer(pl, 3, 1),
                                   mvpGetAbsolutePointer(pl, 0, 2),
                                   mvpGetAbsolutePointer(pl, 1, 2),
                                   mvpGetAbsolutePointer(pl, 2, 2),
                                   mvpGetAbsolutePointer(pl, 3, 2),
                                   mvpGetAbsolutePointer(pl, 0, 3),
                                   mvpGetAbsolutePointer(pl, 1, 3),
                                   mvpGetAbsolutePointer(pl, 2, 3),
                                   mvpGetAbsolutePointer(pl, 3, 3),
                                   fpw, fph, pl->nPitch, 8);
            }
            mvgofDeinit(&gof);
            return fine;
        };
        auto fine_src = make_fine(sup_src);
        auto fine_ref = make_fine(sup_ref);
        int finePitch = (w + 2 * hpad) * pel;
        int nOffsetY = finePitch * vpad * pel + hpad * pel;

        FlowInterSimpleFunction fsimple;
        FlowInterFunction finter;
        FlowInterExtraFunction fextra;
        selectFlowInterFunctions(&fsimple, &finter, &fextra, 8, 0);
        std::vector<uint8_t> dst((size_t)w * h);
        (use_simple ? fsimple : finter)(
               dst.data(), w, fine_ref.data() + nOffsetY,
               fine_src.data() + nOffsetY, finePitch,
               VXFullB.data(), VXFullF.data(), VYFullB.data(),
               VYFullF.data(), MaskFullB.data(), MaskFullF.data(),
               VPitchY, w, h, time256, pel);
        write_file(out_path, dst.data(), dst.size());
        printf("flowinter %dx%d time256 %d nBlkP %dx%d\n", w, h,
               time256, nBlkXP, nBlkYP);
        fgopDeinit(&fgopB);
        fgopDeinit(&fgopF);
        return 0;
    }

    if (!degrain_mode && !comp_mode && !yuvdeg_mode
        && !yuvcomp_mode) {
        const char *src_path = argv[a++], *ref_path = argv[a++];
        const char *out_path = argv[a++];
        int time_iters = (a < argc) ? atoi(argv[a++]) : 0;
        field_shift = (a < argc) ? atoi(argv[a++]) : 0;
        dctmode = (a < argc) ? atoi(argv[a++]) : 0;
        divide = (a < argc) ? atoi(argv[a++]) : 0;
        bits = (a < argc) ? atoi(argv[a++]) : 8;
        int bytes = bits > 8 ? 2 : 1;
        auto src = read_file(src_path, (size_t)w * h * bytes);
        auto ref = read_file(ref_path, (size_t)w * h * bytes);
        struct timespec t0, t1;
        clock_gettime(CLOCK_MONOTONIC, &t0);
        auto sup_src = build_super(src.data(), g, sharp, rfilter, bits);
        auto sup_ref = build_super(ref.data(), g, sharp, rfilter, bits);
        clock_gettime(CLOCK_MONOTONIC, &t1);
        double super_ms = ((t1.tv_sec - t0.tv_sec) * 1e3
                           + (t1.tv_nsec - t0.tv_nsec) / 1e6) / 2;
        auto out = run_search(sup_src, sup_ref);
        double search_ms = 0;
        if (time_iters > 0) {
            clock_gettime(CLOCK_MONOTONIC, &t0);
            for (int i = 0; i < time_iters; i++)
                out = run_search(sup_src, sup_ref);
            clock_gettime(CLOCK_MONOTONIC, &t1);
            search_ms = ((t1.tv_sec - t0.tv_sec) * 1e3
                         + (t1.tv_nsec - t0.tv_nsec) / 1e6) / time_iters;
        }
        write_file(out_path, out.data(), out.size());
        printf("analyse blob %u bytes, %dx%d blocks, %d levels, "
               "super %.2f ms, search %.2f ms\n",
               (unsigned)out.size(), nblkx, nblky, levels, super_ms,
               search_ms);
        return 0;
    }

    if (yuvcomp_mode) {
        /* yuvcompensate: YUV420 Super -> chroma MAnalyse ->
         * MCompensate over all three planes (MVCompensate.c:227-320:
         * per-plane blit/overlap from block->x*nPel + mv*time256/256,
         * chroma positions plain-shifted by the subsampling).  Extra
         * args: <thsad> <thscd1> <thscd2> <time256>
         *   <srcY> <srcU> <srcV> <refY> <refU> <refV>
         *   <outY> <outU> <outV> */
        long long thsad_raw = atoll(argv[a++]);
        long long thscd1 = atoll(argv[a++]);
        int thscd2 = atoi(argv[a++]);
        int time256 = atoi(argv[a++]);
        int wc = w / g.rx, hc = h / g.ry;
        int pitch_c = g.pitch / g.rx;
        auto rf = [&](size_t n) { return read_file(argv[a++], n); };
        auto sy = rf((size_t)w * h), su = rf((size_t)wc * hc),
             sv = rf((size_t)wc * hc);
        auto ry_ = rf((size_t)w * h), ru = rf((size_t)wc * hc),
             rv = rf((size_t)wc * hc);
        const char *oy_p = argv[a++], *ou_p = argv[a++],
                   *ov_p = argv[a++];

        std::vector<uint8_t> ssy, ssu, ssv, rsy, rsu, rsv;
        build_super_yuv(g, sharp, rfilter, sy.data(), su.data(),
                        sv.data(), ssy, ssu, ssv);
        build_super_yuv(g, sharp, rfilter, ry_.data(), ru.data(),
                        rv.data(), rsy, rsu, rsv);

        GroupOfPlanes gop;
        gopInit(&gop, blkx, blky, levels, pel, /*chroma*/ 0x8, 0, ovx,
                ovy, nblkx, nblky, g.rx, g.ry, 0, 8);
        MVGroupOfFrames sGOF, rGOF;
        mvgofInit(&sGOF, levels, w, h, pel, hpad, vpad, YUVPLANES, 0,
                  g.rx, g.ry, 8);
        mvgofInit(&rGOF, levels, w, h, pel, hpad, vpad, YUVPLANES, 0,
                  g.rx, g.ry, 8);
        uint8_t *pS[3] = { ssy.data(), ssu.data(), ssv.data() };
        uint8_t *pR[3] = { rsy.data(), rsu.data(), rsv.data() };
        int pitch3[3] = { g.pitch, pitch_c, pitch_c };
        mvgofUpdate(&sGOF, pS, pitch3);
        mvgofUpdate(&rGOF, pR, pitch3);
        std::vector<uint8_t> vec(gopGetArraySize(&gop), 0);
        gopSearchMVs(&gop, &sGOF, &rGOF, (SearchType)searchtype,
                     searchparam, pelsearch, lambda, lsad, pnew, plevel,
                     global, vec.data(), 0, nullptr, 0, pzero, pglobal,
                     badsad, badrange, meander, trymany,
                     (SearchType)coarse);
        gopDeinit(&gop);

        MVAnalysisData ad;
        memset(&ad, 0, sizeof(ad));
        ad.nBlkSizeX = blkx;
        ad.nBlkSizeY = blky;
        ad.nPel = pel;
        ad.nLvCount = levels;
        ad.nOverlapX = ovx;
        ad.nOverlapY = ovy;
        ad.nBlkX = nblkx;
        ad.nBlkY = nblky;
        ad.nWidth = w;
        ad.nHeight = h;
        ad.xRatioUV = g.rx;
        ad.yRatioUV = g.ry;
        ad.bitsPerSample = 8;
        int64_t nSCD1 = thscd1 * (blkx * blky) / 64;
        nSCD1 += nSCD1 / (g.rx * g.ry) * 2;   // chroma motion flag
        int nSCD2 = thscd2 * nblkx * nblky / 256;
        int64_t thSAD_c = thsad_raw * nSCD1 / thscd1;
        FakeGroupOfPlanes fgop;
        fgopInit(&fgop, &ad);
        fgopUpdate(&fgop, vec.data());
        int usable = fgopIsUsable(&fgop, nSCD1, nSCD2);
        if (!usable) { fprintf(stderr, "unusable\n"); return 3; }
        MVPlane **pSrcPlanes = sGOF.frames[0]->planes;
        MVPlane **pRefPlanes = rGOF.frames[0]->planes;

        int xSubUV = g.rx == 2 ? 1 : 0;
        int ySubUV = g.ry == 2 ? 1 : 0;
        std::vector<uint8_t> dsts[3] = { sy, su, sv };
        int pw3[3] = { w, wc, wc };
        int bsx3[3] = { blkx, blkx >> xSubUV, blkx >> xSubUV };
        int bsy3[3] = { blky, blky >> ySubUV, blky >> ySubUV };
        int ovx3[3] = { ovx, ovx >> xSubUV, ovx >> xSubUV };
        int ovy3[3] = { ovy, ovy >> ySubUV, ovy >> ySubUV };
        bool overlapped = ovx > 0 || ovy > 0;
        for (int plane = 0; plane < 3; plane++) {
            int W = pw3[plane];
            int bw = bsx3[plane], bh = bsy3[plane];
            int nW_B = nblkx * (bw - ovx3[plane]) + ovx3[plane];
            int nH_B = nblky * (bh - ovy3[plane]) + ovy3[plane];
            uint8_t *pDstCur = dsts[plane].data();
            if (!overlapped) {
                for (int by = 0; by < nblky; by++) {
                    int xx = 0;
                    for (int bx = 0; bx < nblkx; bx++) {
                        int i = by * nblkx + bx;
                        const FakeBlockData *block =
                            fgopGetBlock(&fgop, 0, i);
                        int blx, bly;
                        MVPlane **pPlanes;
                        if (block->vector.sad < thSAD_c) {
                            blx = block->x * pel
                                + block->vector.x * time256 / 256;
                            bly = block->y * pel
                                + block->vector.y * time256 / 256;
                            pPlanes = pRefPlanes;
                        } else {
                            blx = bx * blkx * pel;
                            bly = by * blky * pel;
                            pPlanes = pSrcPlanes;
                        }
                        if (plane) { blx >>= xSubUV; bly >>= ySubUV; }
                        const uint8_t *p =
                            mvpGetPointer(pPlanes[plane], blx, bly);
                        for (int y = 0; y < bh; y++)
                            memcpy(pDstCur + xx + y * W,
                                   p + y * pPlanes[plane]->nPitch, bw);
                        xx += bw;
                    }
                    pDstCur += bh * W;
                }
            } else {
                OverlapWindows ow;
                overInit(&ow, bw, bh, ovx3[plane], ovy3[plane]);
                OverlapsFunction OVERS =
                    selectOverlapsFunction(bw, bh, 8, 0);
                int dstTempPitch = ((w + 15) / 16) * 16 * 2;
                std::vector<uint8_t> DstTemp(
                    (size_t)dstTempPitch * pw3[0]);
                memset(DstTemp.data(), 0, (size_t)dstTempPitch * nH_B);
                uint8_t *pDstTemp = DstTemp.data();
                for (int by = 0; by < nblky; by++) {
                    int wby = ((by + nblky - 3) / (nblky - 2)) * 3;
                    int wbx = 0;
                    int xx = 0;
                    for (int bx = 0; bx < nblkx; bx++) {
                        wbx = bx == nblkx - 1 ? 2 : wbx;
                        int16_t *winOver = overGetWindow(&ow, wby + wbx);
                        int i = by * nblkx + bx;
                        const FakeBlockData *block =
                            fgopGetBlock(&fgop, 0, i);
                        int blx, bly;
                        MVPlane **pPlanes;
                        if (block->vector.sad < thSAD_c) {
                            blx = block->x * pel
                                + block->vector.x * time256 / 256;
                            bly = block->y * pel
                                + block->vector.y * time256 / 256;
                            pPlanes = pRefPlanes;
                        } else {
                            blx = bx * (blkx - ovx) * pel;
                            bly = by * (blky - ovy) * pel;
                            pPlanes = pSrcPlanes;
                        }
                        if (plane) { blx >>= xSubUV; bly >>= ySubUV; }
                        OVERS(pDstTemp + xx * 2, dstTempPitch,
                              mvpGetPointer(pPlanes[plane], blx, bly),
                              pPlanes[plane]->nPitch, winOver, bw);
                        xx += bw - ovx3[plane];
                        wbx = 1;
                    }
                    pDstTemp += dstTempPitch * (bh - ovy3[plane]);
                }
                ToPixels_uint16_t_uint8_t(dsts[plane].data(), W,
                                          DstTemp.data(), dstTempPitch,
                                          nW_B, nH_B, 8);
                overDeinit(&ow);
            }
        }
        write_file(oy_p, dsts[0].data(), dsts[0].size());
        write_file(ou_p, dsts[1].data(), dsts[1].size());
        write_file(ov_p, dsts[2].data(), dsts[2].size());
        printf("yuvcompensate thSAD %lld time256 %d\n",
               (long long)thSAD_c, time256);
        fgopDeinit(&fgop);
        mvgofDeinit(&sGOF);
        mvgofDeinit(&rGOF);
        return 0;
    }

    if (comp_mode) {
        /* compensate: Super -> MAnalyse -> MCompensate
         * (mvcompensateGetFrame MVCompensate.c:98-360, gray 8-bit,
         * fields off, time=100, scbehavior as given).  Extra args:
         *   <thsad> <thscd1> <thscd2> <scbehavior> <src.raw> <ref.raw>
         *   <out.raw> */
        long long thsad_raw = atoll(argv[a++]);
        long long thscd1 = atoll(argv[a++]);
        int thscd2 = atoi(argv[a++]);
        int scbehavior = atoi(argv[a++]);
        const char *src_path = argv[a++], *ref_path = argv[a++];
        const char *out_path = argv[a++];

        auto src = read_file(src_path, (size_t)w * h);
        auto ref = read_file(ref_path, (size_t)w * h);
        auto sup_src = build_super(src.data(), g, sharp, rfilter);
        auto sup_ref = build_super(ref.data(), g, sharp, rfilter);
        auto vec = run_search(sup_src, sup_ref);

        MVAnalysisData ad;
        memset(&ad, 0, sizeof(ad));
        ad.nBlkSizeX = blkx;
        ad.nBlkSizeY = blky;
        ad.nPel = pel;
        ad.nLvCount = levels;
        ad.nOverlapX = ovx;
        ad.nOverlapY = ovy;
        ad.nBlkX = nblkx;
        ad.nBlkY = nblky;
        ad.nWidth = w;
        ad.nHeight = h;
        ad.xRatioUV = g.rx;
        ad.yRatioUV = g.ry;
        ad.bitsPerSample = 8;
        int64_t nSCD1 = thscd1 * (blkx * blky) / 64;
        nSCD1 = (int64_t)((double)nSCD1 * 255 / 255.0 + 0.5);
        int nSCD2 = thscd2 * nblkx * nblky / 256;
        int64_t thSAD_c = thsad_raw * nSCD1 / thscd1;

        FakeGroupOfPlanes fgop;
        fgopInit(&fgop, &ad);
        fgopUpdate(&fgop, vec.data());

        MVGroupOfFrames srcGOF, refGOF;
        int pitch3[3] = { g.pitch, 0, 0 };
        mvgofInit(&srcGOF, levels, w, h, pel, hpad, vpad, YPLANE, 0,
                  g.rx, g.ry, 8);
        mvgofInit(&refGOF, levels, w, h, pel, hpad, vpad, YPLANE, 0,
                  g.rx, g.ry, 8);
        uint8_t *pS[3] = { sup_src.data(), nullptr, nullptr };
        uint8_t *pR[3] = { sup_ref.data(), nullptr, nullptr };
        mvgofUpdate(&srcGOF, pS, pitch3);
        mvgofUpdate(&refGOF, pR, pitch3);
        MVPlane **pSrcPlanes = srcGOF.frames[0]->planes;
        MVPlane **pRefPlanes = refGOF.frames[0]->planes;

        int nWidth_B = nblkx * (blkx - ovx) + ovx;
        int nHeight_B = nblky * (blky - ovy) + ovy;
        bool overlapped = ovx > 0 || ovy > 0;
        std::vector<uint8_t> dst((size_t)w * h, 0);
        const uint8_t *scSrc = scbehavior ? sup_src.data()
                                          : sup_ref.data();
        int usable = fgopIsUsable(&fgop, nSCD1, nSCD2);
        if (usable) {
            if (!overlapped) {
                uint8_t *pDstCur = dst.data();
                for (int by = 0; by < nblky; by++) {
                    int xx = 0;
                    for (int bx = 0; bx < nblkx; bx++) {
                        int i = by * nblkx + bx;
                        const FakeBlockData *block =
                            fgopGetBlock(&fgop, 0, i);
                        int blx, bly;
                        MVPlane **pPlanes;
                        if (block->vector.sad < thSAD_c) {
                            blx = block->x * pel + block->vector.x;
                            bly = block->y * pel + block->vector.y;
                            pPlanes = pRefPlanes;
                        } else {
                            blx = bx * blkx * pel;
                            bly = by * blky * pel;
                            pPlanes = pSrcPlanes;
                        }
                        const uint8_t *p =
                            mvpGetPointer(pPlanes[0], blx, bly);
                        for (int y = 0; y < blky; y++)
                            memcpy(pDstCur + xx + y * w,
                                   p + y * pPlanes[0]->nPitch, blkx);
                        xx += blkx;
                    }
                    pDstCur += blky * w;
                }
            } else {
                OverlapWindows ow;
                overInit(&ow, blkx, blky, ovx, ovy);
                OverlapsFunction OVERS =
                    selectOverlapsFunction(blkx, blky, 8, 0);
                int dstTempPitch = ((w + 15) / 16) * 16 * 2;
                std::vector<uint8_t> DstTemp((size_t)dstTempPitch * h);
                memset(DstTemp.data(), 0,
                       (size_t)dstTempPitch * nHeight_B);
                uint8_t *pDstTemp = DstTemp.data();
                for (int by = 0; by < nblky; by++) {
                    int wby = ((by + nblky - 3) / (nblky - 2)) * 3;
                    int wbx = 0;
                    int xx = 0;
                    for (int bx = 0; bx < nblkx; bx++) {
                        wbx = bx == nblkx - 1 ? 2 : wbx;
                        int16_t *winOver = overGetWindow(&ow, wby + wbx);
                        int i = by * nblkx + bx;
                        const FakeBlockData *block =
                            fgopGetBlock(&fgop, 0, i);
                        int blx, bly;
                        MVPlane **pPlanes;
                        if (block->vector.sad < thSAD_c) {
                            blx = block->x * pel + block->vector.x;
                            bly = block->y * pel + block->vector.y;
                            pPlanes = pRefPlanes;
                        } else {
                            blx = bx * (blkx - ovx) * pel;
                            bly = by * (blky - ovy) * pel;
                            pPlanes = pSrcPlanes;
                        }
                        OVERS(pDstTemp + xx * 2, dstTempPitch,
                              mvpGetPointer(pPlanes[0], blx, bly),
                              pPlanes[0]->nPitch, winOver, blkx);
                        xx += blkx - ovx;
                        wbx = 1;
                    }
                    pDstTemp += dstTempPitch * (blky - ovy);
                }
                ToPixels_uint16_t_uint8_t(dst.data(), w, DstTemp.data(),
                                          dstTempPitch, nWidth_B,
                                          nHeight_B, 8);
                overDeinit(&ow);
            }
            // non-covered regions from the (un-shifted) super plane
            if (nWidth_B < w)
                for (int y = 0; y < nHeight_B; y++)
                    memcpy(dst.data() + y * w + nWidth_B,
                           scSrc + (y + vpad) * g.pitch + nWidth_B
                               + hpad, w - nWidth_B);
            if (nHeight_B < h)
                for (int y = nHeight_B; y < h; y++)
                    memcpy(dst.data() + y * w,
                           scSrc + (y + vpad) * g.pitch + hpad, w);
        } else {
            for (int y = 0; y < h; y++)
                memcpy(dst.data() + y * w,
                       scSrc + (y + vpad) * g.pitch + hpad, w);
        }
        write_file(out_path, dst.data(), dst.size());
        printf("compensate %dx%d blk%d ov%d usable %d thSAD %lld\n",
               w, h, blkx, ovx, usable, (long long)thSAD_c);
        fgopDeinit(&fgop);
        mvgofDeinit(&srcGOF);
        mvgofDeinit(&refGOF);
        return 0;
    }

    if (yuvdeg_mode) {
        /* yuvdegrain1: YUV420 Super -> chroma MAnalyse(bwd,fwd) ->
         * MDegrain1 over all three planes (mvdegrainGetFrame
         * MVDegrains.cpp:179-330: per-plane useBlock with the chroma
         * coordinate halving, thSADC, per-plane overlap windows).
         * Extra args: <thsad> <thsadc> <thscd1> <thscd2>
         *   <srcY> <srcU> <srcV> <refbY> <refbU> <refbV>
         *   <reffY> <reffU> <reffV> <outY> <outU> <outV> */
        long long thsad_raw = atoll(argv[a++]);
        long long thsadc_raw = atoll(argv[a++]);
        long long thscd1 = atoll(argv[a++]);
        int thscd2 = atoi(argv[a++]);
        int wc = w / g.rx, hc = h / g.ry;
        int pitch_c = g.pitch / g.rx;
        auto rf = [&](size_t n) { return read_file(argv[a++], n); };
        auto sy = rf((size_t)w * h), su = rf((size_t)wc * hc),
             sv = rf((size_t)wc * hc);
        auto by_ = rf((size_t)w * h), bu_ = rf((size_t)wc * hc),
             bv_ = rf((size_t)wc * hc);
        auto fy = rf((size_t)w * h), fu = rf((size_t)wc * hc),
             fv = rf((size_t)wc * hc);
        const char *oy_p = argv[a++], *ou_p = argv[a++],
                   *ov_p = argv[a++];

        std::vector<uint8_t> ssy, ssu, ssv, sby, sbu, sbv, sfy, sfu, sfv;
        build_super_yuv(g, sharp, rfilter, sy.data(), su.data(),
                        sv.data(), ssy, ssu, ssv);
        build_super_yuv(g, sharp, rfilter, by_.data(), bu_.data(),
                        bv_.data(), sby, sbu, sbv);
        build_super_yuv(g, sharp, rfilter, fy.data(), fu.data(),
                        fv.data(), sfy, sfu, sfv);

        auto yuv_search = [&](std::vector<uint8_t> *ss,
                              std::vector<uint8_t> *sr) {
            GroupOfPlanes gop;
            gopInit(&gop, blkx, blky, levels, pel, /*chroma*/ 0x8,
                    0, ovx, ovy, nblkx, nblky, g.rx, g.ry, 0, 8);
            MVGroupOfFrames sGOF, rGOF;
            mvgofInit(&sGOF, levels, w, h, pel, hpad, vpad, YUVPLANES,
                      0, g.rx, g.ry, 8);
            mvgofInit(&rGOF, levels, w, h, pel, hpad, vpad, YUVPLANES,
                      0, g.rx, g.ry, 8);
            uint8_t *pS[3] = { ss[0].data(), ss[1].data(), ss[2].data() };
            uint8_t *pR[3] = { sr[0].data(), sr[1].data(), sr[2].data() };
            int pitch3[3] = { g.pitch, pitch_c, pitch_c };
            mvgofUpdate(&sGOF, pS, pitch3);
            mvgofUpdate(&rGOF, pR, pitch3);
            std::vector<uint8_t> out(gopGetArraySize(&gop), 0);
            gopSearchMVs(&gop, &sGOF, &rGOF, (SearchType)searchtype,
                         searchparam, pelsearch, lambda, lsad, pnew,
                         plevel, global, out.data(), 0, nullptr, 0,
                         pzero, pglobal, badsad, badrange, meander,
                         trymany, (SearchType)coarse);
            gopDeinit(&gop);
            mvgofDeinit(&sGOF);
            mvgofDeinit(&rGOF);
            return out;
        };
        std::vector<uint8_t> ssrc[3] = { ssy, ssu, ssv };
        std::vector<uint8_t> srb[3] = { sby, sbu, sbv };
        std::vector<uint8_t> srf[3] = { sfy, sfu, sfv };
        auto vb = yuv_search(ssrc, srb);
        auto vf = yuv_search(ssrc, srf);

        MVAnalysisData ad;
        memset(&ad, 0, sizeof(ad));
        ad.nBlkSizeX = blkx;
        ad.nBlkSizeY = blky;
        ad.nPel = pel;
        ad.nLvCount = levels;
        ad.nOverlapX = ovx;
        ad.nOverlapY = ovy;
        ad.nBlkX = nblkx;
        ad.nBlkY = nblky;
        ad.nWidth = w;
        ad.nHeight = h;
        ad.xRatioUV = g.rx;
        ad.yRatioUV = g.ry;
        ad.bitsPerSample = 8;
        /* scaleThSCD with the chroma motion flag (MVAnalysisData.c:7-31) */
        int64_t nSCD1 = thscd1 * (blkx * blky) / 64;
        nSCD1 += nSCD1 / (g.rx * g.ry) * 2;
        int nSCD2 = thscd2 * nblkx * nblky / 256;
        int64_t thSAD[3];
        thSAD[0] = thsad_raw * nSCD1 / thscd1;
        thSAD[1] = thSAD[2] = thsadc_raw * nSCD1 / thscd1;

        FakeGroupOfPlanes fgops[2];
        fgopInit(&fgops[0], &ad);
        fgopUpdate(&fgops[0], vb.data());
        fgopInit(&fgops[1], &ad);
        fgopUpdate(&fgops[1], vf.data());
        int isUsable[2] = { fgopIsUsable(&fgops[0], nSCD1, nSCD2),
                            fgopIsUsable(&fgops[1], nSCD1, nSCD2) };

        MVGroupOfFrames gofs[2];
        MVPlane **pPlanes[2];
        std::vector<uint8_t> *refsups[2][3] = { { &sby, &sbu, &sbv },
                                                { &sfy, &sfu, &sfv } };
        int pitch3[3] = { g.pitch, pitch_c, pitch_c };
        for (int r = 0; r < 2; r++) {
            mvgofInit(&gofs[r], levels, w, h, pel, hpad, vpad,
                      YUVPLANES, 0, g.rx, g.ry, 8);
            uint8_t *pR[3] = { refsups[r][0]->data(),
                               refsups[r][1]->data(),
                               refsups[r][2]->data() };
            mvgofUpdate(&gofs[r], pR, pitch3);
            pPlanes[r] = gofs[r].frames[0]->planes;
        }

        int nLogPel = pel == 4 ? 2 : pel == 2 ? 1 : 0;
        int xSubUV = g.rx == 2 ? 1 : 0;
        int ySubUV = g.ry == 2 ? 1 : 0;
        const uint8_t *srcp[3] = { sy.data(), su.data(), sv.data() };
        std::vector<uint8_t> dsts[3] = { sy, su, sv };
        int pw3[3] = { w, wc, wc };
        int ph3[3] = { h, hc, hc };
        int bsx3[3] = { blkx, blkx >> xSubUV, blkx >> xSubUV };
        int bsy3[3] = { blky, blky >> ySubUV, blky >> ySubUV };
        int ovx3[3] = { ovx, ovx >> xSubUV, ovx >> xSubUV };
        int ovy3[3] = { ovy, ovy >> ySubUV, ovy >> ySubUV };
        bool overlapped = ovx > 0 || ovy > 0;

        for (int plane = 0; plane < 3; plane++) {
            DenoiseFunction DEG = nullptr;
            int bw = bsx3[plane], bh = bsy3[plane];
            if (bw == 8 && bh == 8) DEG = Degrain_C<1, 8, 8, uint8_t>;
            else if (bw == 16 && bh == 16)
                DEG = Degrain_C<1, 16, 16, uint8_t>;
            else if (bw == 4 && bh == 4)
                DEG = Degrain_C<1, 4, 4, uint8_t>;
            else if (bw == 8 && bh == 4)
                DEG = Degrain_C<1, 8, 4, uint8_t>;
            if (!DEG) { fprintf(stderr, "bad blk\n"); return 2; }
            int W = pw3[plane], H = ph3[plane];
            int nW_B = nblkx * (bw - ovx3[plane]) + ovx3[plane];
            int nH_B = nblky * (bh - ovy3[plane]) + ovy3[plane];
            const uint8_t *pSrcCur = srcp[plane];
            uint8_t *pDstCur = dsts[plane].data();
            int nSrcPitch[3] = { w, wc, wc };
            if (!overlapped) {
                for (int by = 0; by < nblky; by++) {
                    int xx = 0;
                    for (int bx = 0; bx < nblkx; bx++) {
                        int i = by * nblkx + bx;
                        const uint8_t *pointers[2];
                        int strides[2];
                        int WSrc, WRefs[2];
                        const uint8_t *pSrcCur3[3] = { nullptr, nullptr,
                                                       nullptr };
                        pSrcCur3[plane] = pSrcCur;
                        for (int r = 0; r < 2; r++)
                            useBlock(pointers[r], strides[r], WRefs[r],
                                     isUsable[r], &fgops[r], i,
                                     pPlanes[r], pSrcCur3, xx,
                                     nSrcPitch, nLogPel, plane, xSubUV,
                                     ySubUV, thSAD);
                        normaliseWeights<1>(WSrc, WRefs);
                        DEG(pDstCur + xx, W, pSrcCur + xx, W, pointers,
                            strides, WSrc, WRefs);
                        xx += bw;
                        if (bx == nblkx - 1 && nW_B < W)
                            for (int y = 0; y < bh; y++)
                                memcpy(pDstCur + nW_B + y * W,
                                       pSrcCur + nW_B + y * W, W - nW_B);
                    }
                    pDstCur += bh * W;
                    pSrcCur += bh * W;
                    if (by == nblky - 1 && nH_B < H)
                        memcpy(pDstCur, pSrcCur, (size_t)W * (H - nH_B));
                }
            } else {
                OverlapWindows ow;
                overInit(&ow, bw, bh, ovx3[plane], ovy3[plane]);
                OverlapsFunction OVERS =
                    selectOverlapsFunction(bw, bh, 8, 0);
                int dstTempPitch = ((w + 15) / 16) * 16 * 2;
                std::vector<uint8_t> DstTemp((size_t)dstTempPitch * H);
                std::vector<uint8_t> tmpBlock((size_t)bw * bh);
                memset(DstTemp.data(), 0, (size_t)dstTempPitch * nH_B);
                uint8_t *pDstTemp = DstTemp.data();
                for (int by = 0; by < nblky; by++) {
                    int wby = ((by + nblky - 3) / (nblky - 2)) * 3;
                    int wbx = 0;
                    int xx = 0;
                    for (int bx = 0; bx < nblkx; bx++) {
                        wbx = bx == nblkx - 1 ? 2 : wbx;
                        int16_t *winOver = overGetWindow(&ow, wby + wbx);
                        int i = by * nblkx + bx;
                        const uint8_t *pointers[2];
                        int strides[2];
                        int WSrc, WRefs[2];
                        const uint8_t *pSrcCur3[3] = { nullptr, nullptr,
                                                       nullptr };
                        pSrcCur3[plane] = pSrcCur;
                        for (int r = 0; r < 2; r++)
                            useBlock(pointers[r], strides[r], WRefs[r],
                                     isUsable[r], &fgops[r], i,
                                     pPlanes[r], pSrcCur3, xx,
                                     nSrcPitch, nLogPel, plane, xSubUV,
                                     ySubUV, thSAD);
                        normaliseWeights<1>(WSrc, WRefs);
                        DEG(tmpBlock.data(), bw, pSrcCur + xx, W,
                            pointers, strides, WSrc, WRefs);
                        OVERS(pDstTemp + xx * 2, dstTempPitch,
                              tmpBlock.data(), bw, winOver, bw);
                        xx += bw - ovx3[plane];
                        wbx = 1;
                    }
                    pSrcCur += (bh - ovy3[plane]) * W;
                    pDstTemp += (bh - ovy3[plane]) * dstTempPitch;
                }
                ToPixels_uint16_t_uint8_t(dsts[plane].data(), W,
                                          DstTemp.data(), dstTempPitch,
                                          nW_B, nH_B, 8);
                overDeinit(&ow);
            }
        }
        write_file(oy_p, dsts[0].data(), dsts[0].size());
        write_file(ou_p, dsts[1].data(), dsts[1].size());
        write_file(ov_p, dsts[2].data(), dsts[2].size());
        printf("yuvdegrain1 usable %d/%d thSAD %lld/%lld\n", isUsable[0],
               isUsable[1], (long long)thSAD[0], (long long)thSAD[1]);
        for (int r = 0; r < 2; r++) {
            mvgofDeinit(&gofs[r]);
            fgopDeinit(&fgops[r]);
        }
        return 0;
    }

    /* degrain1: full Super -> MAnalyse(bwd,fwd) -> MDegrain1 pipeline
     * (mvdegrainGetFrame MVDegrains.cpp:85-330, radius 1, gray 8-bit,
     * scalar tier), dumping the denoised frame.  Extra args:
     *   <thsad> <limit> <thscd1> <thscd2> <src.raw> <refb.raw>
     *   <reff.raw> <out.raw> [time_iters] */
    long long thsad_raw = atoll(argv[a++]);
    int limit = atoi(argv[a++]);
    long long thscd1 = atoll(argv[a++]);
    int thscd2 = atoi(argv[a++]);
    const char *src_path = argv[a++], *refb_path = argv[a++];
    const char *reff_path = argv[a++], *out_path = argv[a++];
    int time_iters = (a < argc) ? atoi(argv[a++]) : 0;

    auto src = read_file(src_path, (size_t)w * h);
    auto refb = read_file(refb_path, (size_t)w * h);
    auto reff = read_file(reff_path, (size_t)w * h);
    auto sup_src = build_super(src.data(), g, sharp, rfilter);
    auto sup_refb = build_super(refb.data(), g, sharp, rfilter);
    auto sup_reff = build_super(reff.data(), g, sharp, rfilter);
    auto vb = run_search(sup_src, sup_refb);
    auto vf = run_search(sup_src, sup_reff);

    MVAnalysisData ad;
    memset(&ad, 0, sizeof(ad));
    ad.nBlkSizeX = blkx;
    ad.nBlkSizeY = blky;
    ad.nPel = pel;
    ad.nLvCount = levels;
    ad.nOverlapX = ovx;
    ad.nOverlapY = ovy;
    ad.nBlkX = nblkx;
    ad.nBlkY = nblky;
    ad.nWidth = w;
    ad.nHeight = h;
    ad.xRatioUV = g.rx;
    ad.yRatioUV = g.ry;
    ad.bitsPerSample = 8;

    /* scaleThSCD (MVAnalysisData.c:7-31; the .c needs a live VSAPI for
     * adataFromVectorClip so the 4 relevant lines are inlined): gray
     * 8-bit, no chroma flag */
    int64_t nSCD1 = thscd1 * (blkx * blky) / 64;
    nSCD1 = (int64_t)((double)nSCD1 * 255 / 255.0 + 0.5);
    int nSCD2 = thscd2 * nblkx * nblky / 256;
    int64_t thSAD_scaled = thsad_raw * nSCD1 / thscd1;
    const int64_t thSADs[3] = { thSAD_scaled, thSAD_scaled, thSAD_scaled };

    FakeGroupOfPlanes fgops[2];
    fgopInit(&fgops[0], &ad);
    fgopUpdate(&fgops[0], vb.data());
    fgopInit(&fgops[1], &ad);
    fgopUpdate(&fgops[1], vf.data());
    int isUsable[2] = { fgopIsUsable(&fgops[0], nSCD1, nSCD2),
                        fgopIsUsable(&fgops[1], nSCD1, nSCD2) };

    MVGroupOfFrames gofs[2];
    MVPlane **pPlanes[2];
    std::vector<uint8_t> *sup_refs[2] = { &sup_refb, &sup_reff };
    int pitch3[3] = { g.pitch, 0, 0 };
    for (int r = 0; r < 2; r++) {
        mvgofInit(&gofs[r], levels, w, h, pel, hpad, vpad, YPLANE, 0,
                  g.rx, g.ry, 8);
        uint8_t *pR[3] = { sup_refs[r]->data(), nullptr, nullptr };
        mvgofUpdate(&gofs[r], pR, pitch3);
        pPlanes[r] = gofs[r].frames[0]->planes;
    }

    DenoiseFunction DEG = nullptr;
    if (blkx == 8 && blky == 8) DEG = Degrain_C<1, 8, 8, uint8_t>;
    else if (blkx == 16 && blky == 16) DEG = Degrain_C<1, 16, 16, uint8_t>;
    else if (blkx == 32 && blky == 32) DEG = Degrain_C<1, 32, 32, uint8_t>;
    else if (blkx == 8 && blky == 4) DEG = Degrain_C<1, 8, 4, uint8_t>;
    else if (blkx == 16 && blky == 8) DEG = Degrain_C<1, 16, 8, uint8_t>;
    if (!DEG) { fprintf(stderr, "unsupported block size\n"); return 2; }

    int nWidth_B = nblkx * (blkx - ovx) + ovx;
    int nHeight_B = nblky * (blky - ovy) + ovy;
    bool overlapped = ovx > 0 || ovy > 0;
    OverlapWindows ow;
    OverlapsFunction OVERS = nullptr;
    int dstTempPitch = ((w + 15) / 16) * 16 * 2;
    std::vector<uint8_t> DstTemp;
    std::vector<uint8_t> tmpBlock;
    if (overlapped) {
        overInit(&ow, blkx, blky, ovx, ovy);
        OVERS = selectOverlapsFunction(blkx, blky, 8, /*opt=*/0);
        DstTemp.resize((size_t)dstTempPitch * h);
        tmpBlock.resize((size_t)blkx * blky);
    }

    std::vector<uint8_t> dst(src);   // uncovered regions stay src
    int reps = time_iters > 0 ? time_iters : 1;
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    for (int rep = 0; rep < reps; rep++) {
        const uint8_t *pSrcCur = src.data();
        uint8_t *pDstCur = dst.data();
        const uint8_t *pSrcFrame[3] = { src.data(), nullptr, nullptr };
        int nSrcPitch[3] = { w, 0, 0 };
        if (!overlapped) {
            for (int by = 0; by < nblky; by++) {
                int xx = 0;
                for (int bx = 0; bx < nblkx; bx++) {
                    int i = by * nblkx + bx;
                    const uint8_t *pointers[2];
                    int strides[2];
                    int WSrc, WRefs[2];
                    const uint8_t *pSrcCur3[3] = { pSrcCur, nullptr,
                                                   nullptr };
                    for (int r = 0; r < 2; r++)
                        useBlock(pointers[r], strides[r], WRefs[r],
                                 isUsable[r], &fgops[r], i, pPlanes[r],
                                 pSrcCur3, xx, nSrcPitch, g.pel == 4 ? 2
                                 : g.pel == 2 ? 1 : 0, 0, 0, 0, thSADs);
                    normaliseWeights<1>(WSrc, WRefs);
                    DEG(pDstCur + xx, w, pSrcCur + xx, w, pointers,
                        strides, WSrc, WRefs);
                    xx += blkx;
                }
                pDstCur += blky * w;
                pSrcCur += blky * w;
            }
        } else {
            memset(DstTemp.data(), 0, (size_t)dstTempPitch * nHeight_B);
            uint8_t *pDstTemp = DstTemp.data();
            for (int by = 0; by < nblky; by++) {
                int wby = ((by + nblky - 3) / (nblky - 2)) * 3;
                int wbx = 0;
                int xx = 0;
                for (int bx = 0; bx < nblkx; bx++) {
                    wbx = bx == nblkx - 1 ? 2 : wbx;
                    int16_t *winOver = overGetWindow(&ow, wby + wbx);
                    int i = by * nblkx + bx;
                    const uint8_t *pointers[2];
                    int strides[2];
                    int WSrc, WRefs[2];
                    const uint8_t *pSrcCur3[3] = { pSrcCur, nullptr,
                                                   nullptr };
                    for (int r = 0; r < 2; r++)
                        useBlock(pointers[r], strides[r], WRefs[r],
                                 isUsable[r], &fgops[r], i, pPlanes[r],
                                 pSrcCur3, xx, nSrcPitch, g.pel == 4 ? 2
                                 : g.pel == 2 ? 1 : 0, 0, 0, 0, thSADs);
                    normaliseWeights<1>(WSrc, WRefs);
                    DEG(tmpBlock.data(), blkx, pSrcCur + xx, w, pointers,
                        strides, WSrc, WRefs);
                    OVERS(pDstTemp + xx * 2, dstTempPitch,
                          tmpBlock.data(), blkx, winOver, blkx);
                    xx += blkx - ovx;
                    wbx = 1;
                }
                pSrcCur += (blky - ovy) * w;
                pDstTemp += (blky - ovy) * dstTempPitch;
            }
            ToPixels_uint16_t_uint8_t(dst.data(), w, DstTemp.data(),
                                      dstTempPitch, nWidth_B, nHeight_B,
                                      8);
        }
        if (limit < 255)
            LimitChanges_C<uint8_t>(dst.data(), w, src.data(), w, w, h,
                                    limit);
        (void)pSrcFrame;
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double ms = ((t1.tv_sec - t0.tv_sec) * 1e3
                 + (t1.tv_nsec - t0.tv_nsec) / 1e6) / reps;

    write_file(out_path, dst.data(), dst.size());
    printf("degrain1 %dx%d blk%dx%d ov%d usable %d/%d thSAD %lld "
           "%.3f ms/frame\n", w, h, blkx, blky, ovx, isUsable[0],
           isUsable[1], (long long)thSAD_scaled, ms);

    for (int r = 0; r < 2; r++) {
        mvgofDeinit(&gofs[r]);
        fgopDeinit(&fgops[r]);
    }
    if (overlapped)
        overDeinit(&ow);
    return 0;
}
