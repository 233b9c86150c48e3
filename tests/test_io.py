"""Tests for the native y4m runtime (native/y4m.cc via ctypes)."""

import os

import numpy as np
import pytest

from mvtools_tpu.io import Y4MReader, Y4MWriter, read_clip, write_clip


@pytest.mark.parametrize("bits,planes,sub", [(8, 3, (2, 2)),
                                             (10, 3, (2, 1)),
                                             (16, 1, (1, 1)),
                                             (8, 3, (1, 1))])
def test_y4m_roundtrip(tmp_path, bits, planes, sub):
    rng = np.random.default_rng(bits + planes)
    path = str(tmp_path / "clip.y4m")
    w, h = 64, 48
    dt = np.uint8 if bits <= 8 else np.uint16
    hi = 1 << bits
    frames = []
    wr = Y4MWriter(path, w, h, (24, 1), sub[0], sub[1], bits, planes)
    for _ in range(4):
        f = [rng.integers(0, hi, (h, w), dt)]
        for _ in range(planes - 1):
            f.append(rng.integers(0, hi,
                                  (h // sub[1], w // sub[0]), dt))
        frames.append(f)
        wr.write(f)
    wr.close()

    rd = Y4MReader(path)
    assert (rd.width, rd.height) == (w, h)
    assert rd.bits == bits and rd.planes == planes
    assert (rd.sub_w, rd.sub_h) == sub
    got = list(rd)
    rd.close()
    assert len(got) == 4
    for f1, f2 in zip(frames, got):
        for a, b in zip(f1, f2):
            np.testing.assert_array_equal(a, b)


def test_read_write_clip_helpers(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "c.y4m")
    y = rng.integers(0, 256, (3, 32, 48), np.uint8)
    u = rng.integers(0, 256, (3, 16, 24), np.uint8)
    v = rng.integers(0, 256, (3, 16, 24), np.uint8)
    write_clip(path, [y, u, v], fps=(30, 1))
    planes, info = read_clip(path)
    assert len(planes) == 3
    np.testing.assert_array_equal(planes[0], y)
    np.testing.assert_array_equal(planes[1], u)
    assert info.fps_num == 30


@pytest.mark.parametrize("tag,bits", [("420jpeg", 8), ("420mpeg2", 8),
                                      ("420paldv", 8), ("420p10", 10),
                                      ("420", 8)])
def test_y4m_reads_siting_suffixes(tmp_path, tag, bits):
    """ffmpeg emits C420mpeg2/C420jpeg; the 'p' in those suffixes must not
    be parsed as a bit-depth marker (ADVICE r1)."""
    path = str(tmp_path / "ff.y4m")
    w, h = 32, 16
    dt = np.uint8 if bits <= 8 else np.uint16
    rng = np.random.default_rng(7)
    y = rng.integers(0, 1 << bits, (h, w), dt)
    u = rng.integers(0, 1 << bits, (h // 2, w // 2), dt)
    v = rng.integers(0, 1 << bits, (h // 2, w // 2), dt)
    with open(path, "wb") as fh:
        fh.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{tag}\n".encode())
        fh.write(b"FRAME\n")
        for pl in (y, u, v):
            fh.write(pl.tobytes())
    rd = Y4MReader(path)
    assert rd.bits == bits and rd.planes == 3
    assert (rd.sub_w, rd.sub_h) == (2, 2)
    got = list(rd)
    rd.close()
    assert len(got) == 1
    np.testing.assert_array_equal(got[0][0], y)
    np.testing.assert_array_equal(got[0][2], v)


def test_prefetch_many_frames(tmp_path):
    """More frames than the prefetch ring forces wraparound + blocking."""
    rng = np.random.default_rng(1)
    path = str(tmp_path / "long.y4m")
    frames = [rng.integers(0, 256, (16, 32), np.uint8) for _ in range(37)]
    wr = Y4MWriter(path, 32, 16, (25, 1), 1, 1, 8, 1)
    for f in frames:
        wr.write([f])
    wr.close()
    rd = Y4MReader(path, prefetch=4)
    got = [f[0] for f in rd]
    rd.close()
    assert len(got) == 37
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)
