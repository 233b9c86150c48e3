"""NumPy oracles for the Depan family.

Scalar re-derivations of the reference semantics (MVDepan.cpp) used to
check the vectorized JAX implementations: transform algebra
(:63-142, :1554-1615) and the quantized bilinear warp main path
(:1856-2193).  Written independently from mvtools_tpu.ops.warp (scalar
loops here, vector gathers there).
"""

import math

import numpy as np


def motion2transform(dx, dy, rot, zoom, pixaspect, xcenter, ycenter,
                     forward, fract):
    f = np.float32
    dx = f(fract) * f(dx)
    dy = f(fract) * f(dy)
    rotradian = f(fract) * f(rot) * f(math.pi) / f(180)
    if abs(rotradian) < 1e-6:
        rotradian = f(0)
    zoom = f(math.exp(f(fract) * math.log(f(zoom))))
    if abs(zoom - 1) < 1e-6:
        zoom = f(1)
    s = f(math.sin(rotradian))
    c = f(math.cos(rotradian))
    pixaspect, xcenter, ycenter = f(pixaspect), f(xcenter), f(ycenter)
    if forward:
        dxc = xcenter + (-xcenter * c + ycenter / pixaspect * s) * zoom + dx
        dyc = ycenter + (((-ycenter) / pixaspect * c
                          + (-xcenter) * s) * zoom + dy) * pixaspect
    else:
        dxc = xcenter + ((-xcenter + dx) * c
                         - ((-ycenter) / pixaspect + dy) * s) * zoom
        dyc = ycenter + (((-ycenter) / pixaspect + dy) * c
                         + (-xcenter + dx) * s) * zoom * pixaspect
    return (f(dxc), f(c * zoom), f(-s / pixaspect * zoom),
            f(dyc), f(s * zoom * pixaspect), f(c * zoom))


def sumtransform(ta, tb):
    f = np.float32
    return (f(tb[0] + tb[1] * ta[0] + tb[2] * ta[3]),
            f(tb[1] * ta[1] + tb[2] * ta[4]),
            f(tb[1] * ta[2] + tb[2] * ta[5]),
            f(tb[3] + tb[4] * ta[0] + tb[5] * ta[3]),
            f(tb[4] * ta[1] + tb[5] * ta[4]),
            f(tb[4] * ta[2] + tb[5] * ta[5]))


def inversetransform(ta):
    f = np.float32
    if ta[2] != 0.0:
        pixaspect = f(math.sqrt(-ta[4] / ta[2]))
    else:
        pixaspect = f(1)
    dxx = f(ta[1] / (ta[1] * ta[1] + ta[2] * ta[2] * pixaspect * pixaspect))
    dxy = f(-dxx * ta[2] / ta[1])
    dyx = f(-dxy * pixaspect * pixaspect)
    dxc = f(-dxx * ta[0] - dxy * ta[3])
    dyc = f(-dyx * ta[0] - dxx * ta[3])
    return (dxc, dxx, dxy, dyc, dyx, dxx)


def warp_bilinear_interior(plane, tr):
    """Bilinear warp of the strictly interior region: returns (out, mask)
    where mask marks pixels computed by the quantized 1/32 interpolation
    (MVDepan.cpp:1907-1913, 2075-2085); others are left 0 in `out`."""
    h, w = plane.shape
    src = plane.astype(np.int64)
    out = np.zeros((h, w), np.int64)
    mask = np.zeros((h, w), bool)
    f = np.float32
    for y in range(h):
        for x in range(w):
            xsrc = f(tr[0] + tr[1] * x + tr[2] * y)
            ysrc = f(tr[3] + tr[4] * x + tr[5] * y)
            rowleft = math.floor(xsrc)
            hlow = math.floor(ysrc)
            if 0 <= rowleft < w - 1 and 0 <= hlow < h - 1:
                ix = int(math.floor((xsrc - rowleft) * 32))
                iy = int(math.floor((ysrc - hlow) * 32))
                pix = ((32 - iy) * ((32 - ix) * src[hlow, rowleft]
                                    + ix * src[hlow, rowleft + 1])
                       + iy * ((32 - ix) * src[hlow + 1, rowleft]
                               + ix * src[hlow + 1, rowleft + 1])) >> 10
                out[y, x] = pix
                mask[y, x] = True
    return out, mask
