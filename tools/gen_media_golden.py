"""Golden generator for the media_decode / media_audio / media_video driver
queries — an INDEPENDENT decode of the deterministic real-format media
fixtures.

Only the INPUT bytes are shared (ops.multimodal.synth_media_rows /
synth_video_rows, like pprl_input.csv for the JDK goldens); the PPM/BMP/WAV/
AVI PARSERS here are written fresh against the published format specs, with
different structure from the engine's codecs (regex header parse, explicit
per-row loops, iterative chunk stack instead of recursion, no numpy), so a
parser bug on either side breaks the match.

Usage: python tools/gen_media_golden.py  # writes tests/golden/media_*.csv
"""

from __future__ import annotations

import csv
import os
import re
import struct
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pprl_scaling_framework_spark.ops.multimodal import (  # noqa: E402
    synth_media_rows,
    synth_video_rows,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
OUT_IMG = os.path.join(GOLDEN_DIR, "media_decode.csv")
OUT_AUD = os.path.join(GOLDEN_DIR, "media_audio.csv")
OUT_VID = os.path.join(GOLDEN_DIR, "media_video.csv")

N, SEED = 60, 7
VIDEO_N, VIDEO_STRIDE = 20, 2


def f32(x: float) -> float:
    """The engine stores mean/rms as FloatType; emulate the f32 round-trip."""
    return struct.unpack("<f", struct.pack("<f", x))[0]


def round4(x: float) -> float:
    # Spark F.round(double, 4): BigDecimal -> HALF_UP
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def parse_ppm(data: bytes):
    m = re.match(rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s", data)
    if not m:
        return None
    w, h, maxval = (int(g) for g in m.groups())
    assert maxval == 255
    px = data[m.end() : m.end() + w * h * 3]
    assert len(px) == w * h * 3
    return w, h, list(px)


def parse_bmp(data: bytes):
    if data[:2] != b"BM":
        return None
    offset = struct.unpack("<I", data[10:14])[0]
    w = struct.unpack("<i", data[18:22])[0]
    h = struct.unpack("<i", data[22:26])[0]
    bpp = struct.unpack("<H", data[28:30])[0]
    assert bpp == 24 and h > 0
    row_bytes = w * 3
    stride = (row_bytes + 3) // 4 * 4
    px = []
    for y in range(h - 1, -1, -1):  # stored bottom-up; emit top-down
        row = data[offset + y * stride : offset + y * stride + row_bytes]
        for x in range(w):
            b, g, r = row[3 * x : 3 * x + 3]
            px.extend((r, g, b))
    return w, h, px


def parse_wav(data: bytes):
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pos = 12
    rate = channels = bits = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            assert bits == 16
            samples = [
                struct.unpack("<h", body[k : k + 2])[0]
                for k in range(0, len(body) - len(body) % 2, 2)
            ]
        pos += 8 + size + (size % 2)
    return rate, channels, samples


def parse_avi(data: bytes):
    """Iterative RIFF walk with an explicit LIST stack (vs the engine's
    recursive walker): returns (w, h, usec_per_frame, frames as int lists)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    w = h = usec = None
    frames = []
    # stack of (end_offset, is_movi) for open LISTs; scan position moves
    # linearly through the whole file
    stack = [(12 + struct.unpack("<I", data[4:8])[0] - 4, False)]
    pos = 12
    while pos + 8 <= len(data):
        while stack and pos >= stack[-1][0]:
            stack.pop()
        in_movi = any(m for _, m in stack)
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"LIST":
            stack.append((pos + 8 + size, body[:4] == b"movi"))
            pos += 12  # descend into the list body
            continue
        if cid == b"avih":
            usec = struct.unpack("<I", body[0:4])[0]
            w = struct.unpack("<I", body[32:36])[0]
            h = struct.unpack("<I", body[36:40])[0]
        elif cid == b"strf":
            assert struct.unpack("<H", body[14:16])[0] == 24  # biBitCount
            assert struct.unpack("<I", body[16:20])[0] == 0   # biCompression
        elif in_movi and cid[2:] in (b"db", b"dc"):
            stride = (w * 3 + 3) // 4 * 4
            px = []
            for y in range(h - 1, -1, -1):  # bottom-up rows; emit top-down
                row = body[y * stride : y * stride + w * 3]
                for x in range(w):
                    b, g, r = row[3 * x : 3 * x + 3]
                    px.extend((r, g, b))
            frames.append(px)
        pos += 8 + size + (size % 2)
    return w, h, usec, frames


def main() -> None:
    rows = synth_media_rows(N, SEED)
    img_out, aud_out = [], []
    for media_id, kind, mime, data, _meta in rows:
        data = bytes(data)
        if kind == "image":
            parsed = parse_ppm(data) or parse_bmp(data)
            assert parsed, f"media_id={media_id} unparseable"
            w, h, px = parsed
            mean = sum(px) / len(px)
            img_out.append((media_id, w, h, 3, round4(f32(mean))))
        else:
            rate, channels, samples = parse_wav(data)
            n = len(samples) // channels
            rms = (sum(s * s for s in samples) / len(samples)) ** 0.5
            aud_out.append((media_id, rate, channels, n, n * 1000 // rate,
                            round4(f32(rms))))

    with open(OUT_IMG, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["media_id", "width", "height", "channels", "mean_intensity"])
        for r in img_out:
            w.writerow([*r[:4], repr(r[4])])
    print(f"{len(img_out)} image rows -> {OUT_IMG}")

    with open(OUT_AUD, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["media_id", "sample_rate", "channels", "n_samples",
                    "duration_ms", "rms"])
        for r in aud_out:
            w.writerow([*r[:5], repr(r[5])])
    print(f"{len(aud_out)} audio rows -> {OUT_AUD}")

    vid_out = []
    for media_id, _kind, _mime, data, _meta in synth_video_rows(VIDEO_N, SEED):
        vw, vh, usec, frames = parse_avi(bytes(data))
        n = len(frames)
        dur_ms = n * usec // 1000
        for fi in range(0, n, VIDEO_STRIDE):
            px = frames[fi]
            mean = sum(px) / len(px)
            vid_out.append((media_id, fi, n, vw, vh, dur_ms, round4(f32(mean))))

    with open(OUT_VID, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["media_id", "frame_idx", "n_frames", "width", "height",
                    "duration_ms", "mean_intensity"])
        for r in vid_out:
            w.writerow([*r[:6], repr(r[6])])
    print(f"{len(vid_out)} video-frame rows -> {OUT_VID}")


if __name__ == "__main__":
    main()
