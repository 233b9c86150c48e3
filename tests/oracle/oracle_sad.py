"""NumPy oracle for SAD/SATD/luma.

The SATD oracle is a literal transliteration of the reference's SWAR
(packed-integer) scalar code (Real_Satd_4x4_C / Real_Satd_8x4_C,
SADFunctions.cpp:598-710) including the unsigned wraparound arithmetic, so
it proves the framework's matrix formulation equals the C bit-twiddling.
"""

from __future__ import annotations

import numpy as np


def sad(src, ref):
    return int(np.sum(np.abs(src.astype(np.int64) - ref.astype(np.int64))))


def luma(src):
    return int(np.sum(src.astype(np.int64)))


def _hadamard4(s0, s1, s2, s3, mask):
    t0 = (s0 + s1) & mask
    t1 = (s0 - s1) & mask
    t2 = (s2 + s3) & mask
    t3 = (s2 - s3) & mask
    return ((t0 + t2) & mask, (t1 + t3) & mask,
            (t0 - t2) & mask, (t1 - t3) & mask)  # d0, d1, d2, d3


def _abs2(a, bits_per_sum, mask):
    one = 1
    s = (((a >> (bits_per_sum - 1)) & ((one << bits_per_sum) + 1))
         * ((one << bits_per_sum) - 1)) & mask
    return ((a + s) ^ s) & mask


def satd_4x4(src, ref, bits_per_sum=16):
    mask = (1 << (2 * bits_per_sum)) - 1
    tmp = [[0, 0] for _ in range(4)]
    total = 0
    for i in range(4):
        a0 = int(src[i, 0]) - int(ref[i, 0])
        a1 = int(src[i, 1]) - int(ref[i, 1])
        b0 = ((a0 + a1) + ((a0 - a1) << bits_per_sum)) & mask
        a2 = int(src[i, 2]) - int(ref[i, 2])
        a3 = int(src[i, 3]) - int(ref[i, 3])
        b1 = ((a2 + a3) + ((a2 - a3) << bits_per_sum)) & mask
        tmp[i][0] = (b0 + b1) & mask
        tmp[i][1] = (b0 - b1) & mask
    for i in range(2):
        a0, a1, a2, a3 = _hadamard4(tmp[0][i], tmp[1][i], tmp[2][i], tmp[3][i], mask)
        a0 = (_abs2(a0, bits_per_sum, mask) + _abs2(a1, bits_per_sum, mask)
              + _abs2(a2, bits_per_sum, mask) + _abs2(a3, bits_per_sum, mask)) & mask
        total += (a0 & ((1 << bits_per_sum) - 1)) + (a0 >> bits_per_sum)
    return total >> 1


def satd_8x4(src, ref, bits_per_sum=16):
    mask = (1 << (2 * bits_per_sum)) - 1
    tmp = [[0] * 4 for _ in range(4)]
    total = 0
    for i in range(4):
        a = []
        for k in range(4):
            lo = int(src[i, k]) - int(ref[i, k])
            hi = int(src[i, k + 4]) - int(ref[i, k + 4])
            a.append((lo + (hi << bits_per_sum)) & mask)
        tmp[i][0], tmp[i][1], tmp[i][2], tmp[i][3] = _hadamard4(*a, mask)
    for i in range(4):
        a0, a1, a2, a3 = _hadamard4(tmp[0][i], tmp[1][i], tmp[2][i], tmp[3][i], mask)
        total += (_abs2(a0, bits_per_sum, mask) + _abs2(a1, bits_per_sum, mask)
                  + _abs2(a2, bits_per_sum, mask) + _abs2(a3, bits_per_sum, mask))
        total &= mask
    return ((total & ((1 << bits_per_sum) - 1)) + (total >> bits_per_sum)) >> 1


def satd(src, ref, bits=8):
    """Satd_C (SADFunctions.cpp:713-741)."""
    bits_per_sum = 16 if bits <= 8 else 32
    h, w = src.shape
    if (h, w) == (4, 4):
        return satd_4x4(src, ref, bits_per_sum)
    total = 0
    for y in range(0, h, 4):
        for x in range(0, w, 8):
            total += satd_8x4(src[y:y + 4, x:x + 8], ref[y:y + 4, x:x + 8],
                              bits_per_sum)
    return total
