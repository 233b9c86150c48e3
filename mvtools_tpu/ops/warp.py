"""Global-motion transform algebra and affine plane warping.

TPU-first equivalents of the Depan family's transform math and
`compensate_plane_{nearest,bilinear,bicubic}` warp kernels
(MVDepan.cpp:63-142, :1554-1615, :1627-2586).  The reference walks rows
with three hand-specialised scalar loops (translation / zoom / full
affine); here a single vectorized gather evaluates the affine source
coordinate for every output pixel at once, quantizes the fractional part
exactly like the integer coefficient tables do (1/32 bilinear,
MVDepan.cpp:1910-1913; 1/256 bicubic, :2255-2260), and resolves the
border policy (mirror bits, edge blur, constant fill or keep-base) with
masked selects — all shapes static, everything fused by XLA.

All float arithmetic is float32, matching the C `float` transforms.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
I32 = jnp.int32
I64 = jnp.int64

MIRROR_TOP = 1
MIRROR_BOTTOM = 2
MIRROR_LEFT = 4
MIRROR_RIGHT = 8

MOTION_UNKNOWN = 9999.0
MOTION_BAD = 0.0


class Transform(NamedTuple):
    """Affine global-motion transform: xsrc = dxc + dxx*x + dxy*y,
    ysrc = dyc + dyx*x + dyy*y (MVDepan.cpp:63-75).  Fields may be python
    floats or traced jnp scalars."""
    dxc: jnp.ndarray
    dxx: jnp.ndarray
    dxy: jnp.ndarray
    dyc: jnp.ndarray
    dyx: jnp.ndarray
    dyy: jnp.ndarray


def null_transform() -> Transform:
    """Identity transform (setNull, MVDepan.cpp:78-85)."""
    one = jnp.asarray(1.0, F32)
    zero = jnp.asarray(0.0, F32)
    return Transform(zero, one, zero, zero, zero, one)


def motion2transform(dx, dy, rot, zoom, pixaspect, xcenter, ycenter,
                     forward: bool, fractoffset) -> Transform:
    """Motion (dx, dy, rot-degrees, zoom) -> transform at a fractional
    offset (MVDepan.cpp:1554-1591).  `forward` is static."""
    dx = jnp.asarray(dx, F32)
    dy = jnp.asarray(dy, F32)
    rot = jnp.asarray(rot, F32)
    zoom1 = jnp.asarray(zoom, F32)
    fract = jnp.asarray(fractoffset, F32)
    pixaspect = jnp.asarray(pixaspect, F32)
    xcenter = jnp.asarray(xcenter, F32)
    ycenter = jnp.asarray(ycenter, F32)

    ddx = fract * dx
    ddy = fract * dy
    rotradian = fract * rot * (np.float32(np.pi) / 180)
    rotradian = jnp.where(jnp.abs(rotradian) < 1e-6, 0.0, rotradian)
    z = jnp.exp(fract * jnp.log(zoom1))
    z = jnp.where(jnp.abs(z - 1.0) < 1e-6, 1.0, z).astype(F32)
    s = jnp.sin(rotradian).astype(F32)
    c = jnp.cos(rotradian).astype(F32)

    if forward:
        dxc = xcenter + (-xcenter * c + ycenter / pixaspect * s) * z + ddx
        dyc = ycenter + (((-ycenter) / pixaspect * c + (-xcenter) * s) * z
                         + ddy) * pixaspect
    else:
        dxc = xcenter + ((-xcenter + ddx) * c
                         - ((-ycenter) / pixaspect + ddy) * s) * z
        dyc = ycenter + (((-ycenter) / pixaspect + ddy) * c
                         + (-xcenter + ddx) * s) * z * pixaspect
    dxx = c * z
    dxy = -s / pixaspect * z
    dyx = s * z * pixaspect
    dyy = c * z
    return Transform(*(jnp.asarray(v, F32)
                       for v in (dxc, dxx, dxy, dyc, dyx, dyy)))


def transform2motion(tr: Transform, forward: bool, xcenter, ycenter,
                     pixaspect):
    """Transform -> motion (dx, dy, rot-degrees, zoom)
    (MVDepan.cpp:88-122)."""
    pixaspect = jnp.asarray(pixaspect, F32)
    xcenter = jnp.asarray(xcenter, F32)
    ycenter = jnp.asarray(ycenter, F32)
    rotradian = -jnp.arctan(pixaspect * tr.dxy / tr.dxx)
    rot = rotradian * (180 / np.float32(np.pi))
    s = jnp.sin(rotradian).astype(F32)
    c = jnp.cos(rotradian).astype(F32)
    zoom = tr.dxx / c
    if forward:
        dx = tr.dxc - xcenter - (-xcenter * c + ycenter / pixaspect * s) * zoom
        dy = (tr.dyc / pixaspect - ycenter / pixaspect
              - ((-ycenter) / pixaspect * c + (-xcenter) * s) * zoom)
    else:
        dx = (tr.dxc / zoom * c + tr.dyc / zoom / pixaspect * s
              - xcenter / zoom * c + xcenter - ycenter / zoom / pixaspect * s)
        dy = (-tr.dxc / zoom * s + tr.dyc / zoom / pixaspect * c
              + xcenter / zoom * s - (-ycenter / pixaspect)
              - ycenter / zoom / pixaspect * c)
    return (jnp.asarray(dx, F32), jnp.asarray(dy, F32),
            jnp.asarray(rot, F32), jnp.asarray(zoom, F32))


def sumtransform(ta: Transform, tb: Transform) -> Transform:
    """Composition tb(ta) (MVDepan.cpp:1599-1615)."""
    return Transform(
        dxc=tb.dxc + tb.dxx * ta.dxc + tb.dxy * ta.dyc,
        dxx=tb.dxx * ta.dxx + tb.dxy * ta.dyx,
        dxy=tb.dxx * ta.dxy + tb.dxy * ta.dyy,
        dyc=tb.dyc + tb.dyx * ta.dxc + tb.dyy * ta.dyc,
        dyx=tb.dyx * ta.dxx + tb.dyy * ta.dyx,
        dyy=tb.dyx * ta.dxy + tb.dyy * ta.dyy)


def inversetransform(ta: Transform) -> Transform:
    """Inverse transform (MVDepan.cpp:128-142)."""
    pixaspect = jnp.where(ta.dxy != 0.0,
                          jnp.sqrt(-ta.dyx / jnp.where(ta.dxy != 0.0,
                                                       ta.dxy, 1.0)),
                          1.0).astype(F32)
    dxx = ta.dxx / (ta.dxx * ta.dxx
                    + ta.dxy * ta.dxy * pixaspect * pixaspect)
    dxy = -dxx * ta.dxy / ta.dxx
    dyx = -dxy * pixaspect * pixaspect
    dxc = -dxx * ta.dxc - dxy * ta.dyc
    dyc = -dyx * ta.dxc - dxx * ta.dyc
    return Transform(dxc=dxc, dxx=dxx, dxy=dxy, dyc=dyc, dyx=dyx, dyy=dxx)


def transform_for_plane(tr: Transform, sub_w: int, sub_h: int) -> Transform:
    """Chroma transform adjustment (MVDepan.cpp:2688-2700): 420 halves the
    offsets; 422 halves dxc/dxy and doubles dyx."""
    if sub_w == 1 and sub_h == 1:      # 420
        return tr._replace(dxc=tr.dxc / 2, dyc=tr.dyc / 2)
    if sub_w == 1 and sub_h == 0:      # 422
        return tr._replace(dxc=tr.dxc / 2, dxy=tr.dxy / 2, dyx=tr.dyx * 2)
    return tr


def _mirror_coord(v, size, do_low, do_high):
    """hlow<0 -> -hlow; hlow>=size -> 2*size-hlow-2, gated by mirror bits
    (MVDepan.cpp:1678-1681)."""
    out = v
    if do_low:
        out = jnp.where(out < 0, -out, out)
    if do_high:
        out = jnp.where(out >= size, 2 * size - out - 2, out)
    return out


def _edge_blur_lookup(plane_i32, w0_rows, rowleft, mleft, mright, blurmax,
                      width, right_trigger=None, right_len_off=1):
    """Left/right mirrored edge fill with optional directional blur
    (MVDepan.cpp:1697-1716): blur = mean of `blurlen` pixels ending at the
    mirrored position.  Vectorized with a per-row cumulative sum.

    The nearest/bicubic ladders trigger the right mirror at
    rowleft >= width with blur length rowleft-width+1; the BILINEAR
    ladder triggers one column earlier (rowleft >= width-1, length
    rowleft-width+2; MVDepan.cpp:1991-2004) — right_trigger /
    right_len_off select the convention."""
    if right_trigger is None:
        right_trigger = width
    h = plane_i32.shape[0]
    rows = jnp.clip(w0_rows, 0, h - 1)
    lines = plane_i32[rows]                     # [H, W] gathered rows
    mirror_left_x = jnp.clip(-rowleft, 0, width - 1)
    mirror_right_x = jnp.clip(2 * width - rowleft - 2, 0, width - 1)
    if blurmax <= 0:
        left_val = jnp.take_along_axis(
            lines, mirror_left_x[..., None], axis=-1)[..., 0]
        right_val = jnp.take_along_axis(
            lines, mirror_right_x[..., None], axis=-1)[..., 0]
    else:
        csum = jnp.cumsum(lines, axis=-1)      # inclusive prefix sums

        def seg_sum(a, b):                     # sum of lines[a..b] inclusive
            hi = jnp.take_along_axis(csum, jnp.clip(b, 0, width - 1)[..., None],
                                     axis=-1)[..., 0]
            lo = jnp.where(a > 0,
                           jnp.take_along_axis(
                               csum, jnp.clip(a - 1, 0, width - 1)[..., None],
                               axis=-1)[..., 0], 0)
            return hi - lo

        blen_l = jnp.clip(jnp.minimum(blurmax, -rowleft), 1, None)
        a_l = -rowleft - blen_l + 1
        left_val = seg_sum(a_l, -rowleft) // blen_l
        blen_r = jnp.clip(
            jnp.minimum(blurmax, rowleft - width + right_len_off), 1,
            None)
        a_r = 2 * width - rowleft - 2
        right_val = seg_sum(a_r, a_r + blen_r - 1) // blen_r
    use_left = (rowleft < 0) & mleft
    use_right = (rowleft >= right_trigger) & mright
    return use_left, left_val, use_right, right_val


def _rot_coords(tr: Transform, h: int, w: int):
    """The rotation branch's INCREMENTAL source coordinates: per output
    row, xsrc starts at dxc + dxy*h and accumulates dxx per column in
    float32 (xsrc += dxx, MVDepan.cpp:1800-1830/:2131-2180/:2523-2581) —
    sequential f32 rounding, reproduced with a lax.scan so the floors
    match the C bit-for-bit."""
    import jax
    hs = jnp.arange(h, dtype=F32)
    x0 = (tr.dxc + tr.dxy * hs).astype(F32)
    y0 = (tr.dyc + tr.dyy * hs).astype(F32)

    def step(carry, _):
        x, y = carry
        return ((x + tr.dxx).astype(F32), (y + tr.dyx).astype(F32)), \
            (x, y)

    _, (xs_cols, ys_cols) = jax.lax.scan(step, (x0, y0), None, length=w)
    return xs_cols.T, ys_cols.T


def _mirror_both(rowleft, hlow, w, h, mleft, mright, mtop, mbottom):
    """The rotation branch's fallback: mirror each coordinate, then a
    plain bounds check (MVDepan.cpp:1810-1823)."""
    hm = hlow
    if mtop:
        hm = jnp.where(hm < 0, -hm, hm)
    if mbottom:
        hm = jnp.where(hm >= h, 2 * h - hm - 2, hm)
    rm = rowleft
    if mleft:
        rm = jnp.where(rm < 0, -rm, rm)
    if mright:
        rm = jnp.where(rm >= w, 2 * w - rm - 2, rm)
    ok = (rm >= 0) & (rm < w) & (hm >= 0) & (hm < h)
    return rm, hm, ok


def warp_plane(plane: jnp.ndarray, tr: Transform, subpixel: int,
               mirror: int, border: int, blur: int, pixel_max: int,
               base: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Warp one plane by the affine transform.

    subpixel: 0 nearest (compensate_plane_nearest MVDepan.cpp:1627-1847),
    1 bilinear (:1856-2193), 2 bicubic (:2203-2586).  `border < 0` keeps
    `base` (or the untouched source) outside; >= 0 fills with the constant.
    `blur` smears mirrored left/right edges (blurmax).

    The reference dispatches on the transform at runtime — translation
    (dxy==dyx==0, dxx==dyy==1), zoom (dxy==dyx==0), rotation (general) —
    with DIFFERENT coordinate generation, rounding, and edge ladders per
    branch; all three are computed here and selected by traced masks so
    a jitted caller keeps the exact reference semantics.
    """
    import jax
    h, w = plane.shape
    src = plane.astype(I32)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=F32), jnp.arange(w, dtype=F32),
                          indexing="ij")
    # direct coordinates (the trans/zoom branches): dxy/dyx are exactly 0
    # there, so the f32 rounding matches the C's dxc + dxx*row per row
    xsrc_d = (tr.dxc + tr.dxx * xs + tr.dxy * ys).astype(F32)
    ysrc_d = (tr.dyc + tr.dyx * xs + tr.dyy * ys).astype(F32)
    xsrc_r, ysrc_r = _rot_coords(tr, h, w)

    is_rot = (tr.dxy != 0.0) | (tr.dyx != 0.0)
    is_trans = (~is_rot) & (tr.dxx == 1.0) & (tr.dyy == 1.0)
    xsrc = jnp.where(is_rot, xsrc_r, xsrc_d)
    ysrc = jnp.where(is_rot, ysrc_r, ysrc_d)

    mtop = bool(mirror & MIRROR_TOP)
    mbottom = bool(mirror & MIRROR_BOTTOM)
    mleft = bool(mirror & MIRROR_LEFT)
    mright = bool(mirror & MIRROR_RIGHT)

    def clampedx(v):
        return jnp.clip(v, 0, w - 1)

    def clampedy(v):
        return jnp.clip(v, 0, h - 1)

    if subpixel == 0:
        # ---- trans/zoom: floorf(+0.5), mirrored hlow, blurred mirrors
        rowleft = jnp.floor(xsrc + 0.5).astype(I32)
        hlow = jnp.floor(ysrc + 0.5).astype(I32)
        hlow_m = _mirror_coord(hlow, h, mtop, mbottom)
        y_ok = (hlow_m >= 0) & (hlow_m < h)
        nearest = src[clampedy(hlow_m), clampedx(rowleft)]
        x_in = (rowleft >= 0) & (rowleft < w)
        use_l, lv, use_r, rv = _edge_blur_lookup(
            src, hlow_m, rowleft, mleft, mright, blur, w)
        val_tz = jnp.where(x_in, nearest, 0)
        val_tz = jnp.where(use_l, lv, val_tz)
        val_tz = jnp.where(use_r, rv, val_tz)
        ok_tz = y_ok & (x_in | use_l | use_r)

        # ---- rotation: (int)(xsrc + 0.5f) truncates toward ZERO, then
        # in-range nearest, else mirror both coords, no blur (:1800-1830)
        xh = xsrc + 0.5
        yh = ysrc + 0.5
        rl_r = (jnp.sign(xh) * jnp.floor(jnp.abs(xh))).astype(I32)
        hl_r = (jnp.sign(yh) * jnp.floor(jnp.abs(yh))).astype(I32)
        in1 = (rl_r >= 0) & (rl_r < w) & (hl_r >= 0) & (hl_r < h)
        near1 = src[clampedy(hl_r), clampedx(rl_r)]
        rm, hm, ok_m = _mirror_both(rl_r, hl_r, w, h, mleft, mright,
                                    mtop, mbottom)
        near_m = src[clampedy(hm), clampedx(rm)]
        val_rot = jnp.where(in1, near1, jnp.where(ok_m, near_m, 0))
        ok_rot = in1 | ok_m

        out = jnp.where(is_rot, val_rot, val_tz)
        valid = jnp.where(is_rot, ok_rot, ok_tz)
    elif subpixel == 1:
        rowleft = jnp.floor(xsrc).astype(I32)
        hlow = jnp.floor(ysrc).astype(I32)
        # 1/32 quantized coefficients, product >> 10 (MVDepan.cpp:1907-1913)
        ix = jnp.floor((xsrc - rowleft.astype(F32)) * 32).astype(I32)
        iy = jnp.floor((ysrc - hlow.astype(F32)) * 32).astype(I32)
        hlow_m = _mirror_coord(hlow, h, mtop, mbottom)
        cy = clampedy(hlow_m)
        cy1 = clampedy(hlow_m + 1)
        cx = clampedx(rowleft)
        cx1 = clampedx(rowleft + 1)
        p00 = src[cy, cx]
        p01 = src[cy, cx1]
        p10 = src[cy1, cx]
        p11 = src[cy1, cx1]
        interp = ((32 - iy) * ((32 - ix) * p00 + ix * p01)
                  + iy * ((32 - ix) * p10 + ix * p11)) >> 10
        interp_ok = ((rowleft >= 0) & (rowleft < w - 1)
                     & (hlow_m >= 0) & (hlow_m < h - 1))
        # bottom line falls back to nearest (MVDepan.cpp:2006-2018)
        near_ok = ((hlow_m == h - 1) & (rowleft >= 0) & (rowleft < w))
        # the bilinear mirror ladder triggers the RIGHT mirror one
        # column earlier than nearest/bicubic (rowleft >= w-1, blur
        # length rowleft-w+2; MVDepan.cpp:1991-2004)
        use_l, lv, use_r, rv = _edge_blur_lookup(
            src, hlow_m, rowleft, mleft, mright, blur, w,
            right_trigger=w - 1, right_len_off=2)
        y_ok = (hlow_m >= 0) & (hlow_m < h)
        val_tz = jnp.where(interp_ok, interp,
                           jnp.where(near_ok, p00, 0))
        val_tz = jnp.where(~(interp_ok | near_ok) & use_l, lv, val_tz)
        val_tz = jnp.where(~(interp_ok | near_ok) & use_r, rv, val_tz)
        ok_tz = y_ok & (interp_ok | near_ok | use_l | use_r)

        # ---- rotation branch: raw (unmirrored) coords interpolate, the
        # fallback is a both-axis mirrored NEAREST (:2131-2180)
        rot_ok = ((rowleft >= 0) & (rowleft < w - 1)
                  & (hlow >= 0) & (hlow < h - 1))
        cyr = clampedy(hlow)
        cyr1 = clampedy(hlow + 1)
        q00 = src[cyr, cx]
        q01 = src[cyr, cx1]
        q10 = src[cyr1, cx]
        q11 = src[cyr1, cx1]
        interp_r = ((32 - iy) * ((32 - ix) * q00 + ix * q01)
                    + iy * ((32 - ix) * q10 + ix * q11)) >> 10
        rm, hm, ok_m = _mirror_both(rowleft, hlow, w, h, mleft, mright,
                                    mtop, mbottom)
        near_m = src[clampedy(hm), clampedx(rm)]
        val_rot = jnp.where(rot_ok, interp_r,
                            jnp.where(ok_m, near_m, 0))
        ok_rot = rot_ok | ok_m

        out = jnp.where(is_rot, val_rot, val_tz)
        valid = jnp.where(is_rot, ok_rot, ok_tz)
    elif subpixel == 2:
        rowleft = jnp.floor(xsrc).astype(I32)
        hlow = jnp.floor(ysrc).astype(I32)
        # (int)(frac * 256): frac in [0, 1) so C truncation == floor
        sx = jnp.clip(jnp.floor((xsrc - rowleft.astype(F32)) * 256), 0,
                      256).astype(I32)
        sy = jnp.clip(jnp.floor((ysrc - hlow.astype(F32)) * 256), 0,
                      256).astype(I32)

        def coefs(i):
            # integer table of MVDepan.cpp:2248-2253; C '/' truncates
            # toward zero — the numerators below are non-negative, the
            # negation happens AFTER the division
            c0 = -((i * (256 - i) * (256 - i)) // 8192)
            c1 = (256 * 256 * 256 - 2 * 256 * i * i + i * i * i) // 8192
            c2 = (i * (256 * 256 + 256 * i - i * i)) // 8192
            c3 = -((i * i * (256 - i)) // 8192)
            return c0, c1, c2, c3

        def tdiv2048(a):
            # C truncation toward zero of coef-product / 2048
            return jnp.sign(a) * (jnp.abs(a) // 2048)

        cxs = coefs(sx)
        cys = coefs(sy)
        hlow_m = _mirror_coord(hlow, h, mtop, mbottom)

        # translation blend: per-coefficient (cy*cx)/2048 trunc, pixel
        # sum (+1024) >> 11, clamp (MVDepan.cpp:2268-2311); zoom and
        # rotation blends: separable row taps then
        # (sum cy*ts) >> 22 in int64, no rounding bias (:2404-2415,
        # :2536-2551) — rotation reads RAW (unmirrored) hlow
        acc_t = jnp.zeros((h, w), I32)
        acc_z = jnp.zeros((h, w), I64)
        acc_r = jnp.zeros((h, w), I64)
        for j in range(4):
            cyj_m = clampedy(hlow_m + (j - 1))
            cyj_r = clampedy(hlow + (j - 1))
            ts_m = jnp.zeros((h, w), I64)
            ts_r = jnp.zeros((h, w), I64)
            for i in range(4):
                cxi = clampedx(rowleft + (i - 1))
                p_m = src[cyj_m, cxi]
                acc_t = acc_t + tdiv2048(cys[j] * cxs[i]) * p_m
                ts_m = ts_m + (cxs[i] * p_m).astype(I64)
                ts_r = ts_r + (cxs[i] * src[cyj_r, cxi]).astype(I64)
            acc_z = acc_z + cys[j].astype(I64) * ts_m
            acc_r = acc_r + cys[j].astype(I64) * ts_r
        interp_t = jnp.clip((acc_t + 1024) >> 11, 0, pixel_max)
        interp_z = jnp.clip((acc_z >> 22).astype(I32), 0, pixel_max)
        interp_r = jnp.clip((acc_r >> 22).astype(I32), 0, pixel_max)

        mid_y = (hlow_m >= 1) & (hlow_m < h - 2)
        bicubic_x = (rowleft >= 1) & (rowleft < w - 2)
        interp_ok = mid_y & bicubic_x
        # middle rows, columns 0 / w-2 / w-1: nearest copy (:2332-2334)
        near_mid = mid_y & ((rowleft == 0) | (rowleft == w - 2)
                            | (rowleft == w - 1))
        # near-edge rows (hlow 0 / h-2): float bilinear for
        # rowleft in [0, w-2], nearest at w-1 (:2341-2359)
        cy = clampedy(hlow_m)
        cx = clampedx(rowleft)
        cy1 = clampedy(hlow_m + 1)
        cx1 = clampedx(rowleft + 1)
        fx = xsrc - jnp.floor(xsrc)
        fy = ysrc - jnp.floor(ysrc)
        bl = ((1.0 - fy) * ((1.0 - fx) * src[cy, cx] + fx * src[cy, cx1])
              + fy * ((1.0 - fx) * src[cy1, cx] + fx * src[cy1, cx1]))
        bl = bl.astype(I32)            # C (int) truncation; values >= 0
        edge_y = (hlow_m == 0) | (hlow_m == h - 2)
        bl_ok = edge_y & (rowleft >= 0) & (rowleft < w - 1)
        near = src[cy, cx]
        near_edge = edge_y & (rowleft == w - 1)
        # bottom line: translation branch copies the nearest pixel
        # (:2360-2369); the zoom branch averages with the row above
        # ((p + p_up) / 2, :2470-2473)
        near_bot_ok = (hlow_m == h - 1) & (rowleft >= 0) & (rowleft < w)
        near_up = src[clampedy(hlow_m - 1), cx]
        bot_val = jnp.where(is_trans, near, (near + near_up) // 2)
        use_l, lv, use_r, rv = _edge_blur_lookup(
            src, hlow_m, rowleft, mleft, mright, blur, w)
        y_ok = (hlow_m >= 0) & (hlow_m < h)
        interp_tz = jnp.where(is_trans, interp_t, interp_z)
        val_tz = jnp.where(interp_ok, interp_tz, 0)
        val_tz = jnp.where(bl_ok, bl, val_tz)
        val_tz = jnp.where(near_mid | near_edge, near, val_tz)
        val_tz = jnp.where(near_bot_ok, bot_val, val_tz)
        val_tz = jnp.where(use_l & y_ok, lv, val_tz)
        val_tz = jnp.where(use_r & y_ok, rv, val_tz)
        ok_tz = y_ok & (interp_ok | bl_ok | near_mid | near_edge
                        | near_bot_ok | use_l | use_r)

        # rotation: raw-coord bicubic region, else mirrored nearest
        rot_ok = ((rowleft >= 1) & (rowleft < w - 2)
                  & (hlow >= 1) & (hlow < h - 2))
        rm, hm, ok_m = _mirror_both(rowleft, hlow, w, h, mleft, mright,
                                    mtop, mbottom)
        near_m = src[clampedy(hm), clampedx(rm)]
        val_rot = jnp.where(rot_ok, interp_r,
                            jnp.where(ok_m, near_m, 0))
        ok_rot = rot_ok | ok_m

        out = jnp.where(is_rot, val_rot, val_tz)
        valid = jnp.where(is_rot, ok_rot, ok_tz)
    else:
        raise ValueError(f"subpixel {subpixel}")

    if border >= 0:
        background = jnp.asarray(border, I32)
    elif base is not None:
        background = base.astype(I32)
    else:
        background = src
    fill = jnp.where(valid, out, background)
    return fill.astype(plane.dtype)
