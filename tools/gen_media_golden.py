"""Golden generator for the media_decode / media_audio driver queries — an
INDEPENDENT decode of the deterministic real-format media fixtures.

Only the INPUT bytes are shared (ops.multimodal.synth_media_rows, like
pprl_input.csv for the JDK goldens); the PPM/BMP/WAV PARSERS here are written
fresh against the published format specs, with different structure from the
engine's codecs (regex header parse, explicit per-row loops, no numpy), so a
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

from pprl_scaling_framework_spark.ops.multimodal import synth_media_rows  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
OUT_IMG = os.path.join(GOLDEN_DIR, "media_decode.csv")
OUT_AUD = os.path.join(GOLDEN_DIR, "media_audio.csv")

N, SEED = 60, 7


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


if __name__ == "__main__":
    main()
