#!/usr/bin/env python3
"""Generate the committed multimodal decode fixtures + expected-feature
JSON (round-10 verdict item 9): tiny PNG / WAV / animated-GIF payloads
with DESIGNED pixel/sample content, written with nothing but the Python
stdlib, plus `expected.json` holding the feature values computed HERE —
an implementation independent of the JVM decode path — replicating the
engine's accumulation loops bit-for-bit (same IEEE operation order) so
the driver can hash-compare `mm_fixture_features` against DuckDB's
read_json of this file. This upgrades the multimodal family from
rows-only to an oracle-checked row: a JDK decode regression (or a luma
weight typo) now fails CORRECTNESS, not just ScalaTest.

Usage: python3 tools/make_mm_fixtures.py   (writes fixtures/mm/)
Deterministic: no RNG, no timestamps; rerunning must be byte-identical.
"""
import json
import os
import struct
import zlib
from decimal import Decimal, ROUND_HALF_UP

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "mm")
ASSETS = os.path.join(OUT, "assets")


def r6(x):
    """Spark round(x, 6): HALF_UP on the shortest decimal repr —
    BigDecimal.valueOf(double) uses Double.toString == Python repr."""
    return float(Decimal(repr(float(x)))
                 .quantize(Decimal("0.000001"), ROUND_HALF_UP))


def fnv(data):
    crc = 1469598103934665603
    for b in data:
        crc = ((crc ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return crc - (1 << 64) if crc >= (1 << 63) else crc


def byte_stats(data):
    s = sum(data)
    return len(data), r6(s / len(data)), fnv(data)


# ---- PNG: 8x8 RGB with a designed diagonal ramp ------------------------
W = H = 8
def px(x, y):
    # deterministic, varied, exactly representable 8-bit channels
    return ((x * 32 + 7) & 0xFF, (y * 32 + 11) & 0xFF, ((x + y) * 16 + 3) & 0xFF)

def make_png():
    raw = b""
    for y in range(H):
        raw += b"\x00"  # filter type 0 (None) per scanline
        for x in range(W):
            raw += bytes(px(x, y))
    def chunk(tag, body):
        c = tag + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 9))
            + chunk(b"IEND", b""))

def png_luma():
    # replicate Multimodal.decodeImage's accumulation loop exactly:
    # row-major, luma = 0.299*R + 0.587*G + 0.114*B, running += sum
    s = 0.0
    for y in range(H):
        for x in range(W):
            r, g, b = px(x, y)
            s += 0.299 * r + 0.587 * g + 0.114 * b
    return r6(s / (W * H))


# ---- WAV: 8 kHz mono 16-bit PCM, 1000-sample designed ramp -------------
N_SAMP, RATE = 1000, 8000
def sample(i):
    # signed triangle-ish ramp, exact int16 values
    v = (i * 37) % 20000 - 10000
    return v

def make_wav():
    data = b"".join(struct.pack("<h", sample(i)) for i in range(N_SAMP))
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, RATE, RATE * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data

def wav_rms():
    # replicate wavTrack + decodeWav: v/32768.0 normalization, sq += v*v
    sq = 0.0
    for i in range(N_SAMP):
        v = sample(i) / 32768.0
        sq += v * v
    import math
    return r6(math.sqrt(sq / N_SAMP))


# ---- GIF: 8x8, 2 frames of designed solid colors -----------------------
GW = GH = 8
FRAMES = [(200, 40, 40), (40, 40, 200)]  # palette colors, one per frame

def lzw_literals(indices):
    """GIF LZW block emitting every pixel as a literal 8-bit code with a
    CLEAR before each run — the classic 'uncompressed GIF' recipe: min
    code size 7 (clear=128, end=129), re-CLEAR every 125 codes so the
    code width never grows past 8 bits."""
    bits = []
    def emit(code):
        for k in range(8):
            bits.append((code >> k) & 1)
    emit(128)
    n = 0
    for i in indices:
        if n == 125:
            emit(128)
            n = 0
        emit(i)
        n += 1
    emit(129)
    data = bytearray()
    for j in range(0, len(bits), 8):
        byte = 0
        for k, b in enumerate(bits[j:j + 8]):
            byte |= b << k
        data.append(byte)
    out = bytearray([7])  # LZW minimum code size
    for j in range(0, len(data), 255):
        blk = data[j:j + 255]
        out.append(len(blk))
        out += blk
    out.append(0)
    return bytes(out)

def make_gif():
    # global palette: 128 entries (frame colors at 0 and 1, rest black)
    pal = bytearray()
    for c in (FRAMES + [(0, 0, 0)] * 126):
        pal += bytes(c)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", GW, GH, 0xF6, 0, 0)  # GCT, 128 entries
    out += pal
    out += bytes([0x21, 0xFF, 0x0B]) + b"NETSCAPE2.0" \
        + bytes([3, 1, 0, 0, 0])  # loop forever
    for f in range(len(FRAMES)):
        out += bytes([0x21, 0xF9, 4, 0, 10, 0, 0, 0])  # GCE, 0.1 s delay
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, GW, GH, 0)
        out += lzw_literals([f] * (GW * GH))
    out += b"\x3B"
    return bytes(out)

def gif_luma():
    # replicate decodeVideo: per-frame pixel loop, then lumas.sum / n
    lumas = []
    for (r, g, b) in FRAMES:
        s = 0.0
        for _ in range(GW * GH):
            s += 0.299 * r + 0.587 * g + 0.114 * b
        lumas.append(s / (GW * GH))
    acc = 0.0
    for v in lumas:   # Scala List.sum folds left
        acc += v
    return r6(acc / len(FRAMES))


def main():
    os.makedirs(ASSETS, exist_ok=True)
    png, wav, gif = make_png(), make_wav(), make_gif()
    rows = []
    for name, data in (("gray.png", png), ("ramp.wav", wav),
                       ("pulse.gif", gif)):
        with open(os.path.join(ASSETS, name), "wb") as f:
            f.write(data)
        n, mean, crc = byte_stats(data)
        base = {"name": name, "byte_len": n, "mean_byte": mean,
                "checksum": crc, "width": -1, "height": -1,
                "mean_luma": -1.0, "sample_rate": -1, "n_samples": -1,
                "rms": -1.0, "n_frames": -1, "real_decode": True}
        if name.endswith(".png"):
            base.update(kind="image", width=W, height=H,
                        mean_luma=png_luma())
        elif name.endswith(".wav"):
            base.update(kind="audio", sample_rate=RATE, n_samples=N_SAMP,
                        rms=wav_rms())
        else:
            base.update(kind="video", width=GW, height=GH,
                        mean_luma=gif_luma(), n_frames=len(FRAMES))
        rows.append(base)
    with open(os.path.join(OUT, "expected.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    print("wrote", ASSETS, "and expected.json:",
          [r["name"] for r in rows])


if __name__ == "__main__":
    main()
