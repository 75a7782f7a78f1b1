"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side machinery — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested. Decoding is layered (probed per worker):

- images: Pillow when importable; built-in pure-stdlib decoders for PNG
  (zlib inflate + scanline unfilter, color types 0/2, 8-bit, non-interlaced)
  and netpbm P5/P6 otherwise — REAL decodes, no external libraries;
- audio: soundfile when importable; built-in stdlib ``wave`` decoder for
  RIFF/WAV (PCM16) otherwise;
- video: PyAV when importable (first decodable frame -> image feature); no
  stdlib decoder exists, so rows degrade to status='unsupported' without it
  with a null feature (warn-and-skip, never job failure), unless
  ``fake=True`` substitutes the deterministic content-derived feature so the
  distributed plumbing can be exercised end-to-end for every kind.
"""

from __future__ import annotations

import hashlib
import io
import re
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), True),    # opaque bytes
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("status", T.StringType(), False),    # decoder used / error
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


# --------------------------------------------------------------------------
# built-in codecs (pure stdlib — real decodes, used when PIL/soundfile absent)
# --------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png_gray(pixels: list[list[int]]) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (filter 0) for test media."""
    h = len(pixels)
    w = len(pixels[0])

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_png(data: bytes):
    """-> (width, height, flat grayscale pixel list). Handles color types 0
    (gray) and 2 (RGB, luma-averaged), bit depth 8, filters 0-4,
    non-interlaced. Raises ValueError on anything else."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in (0, 2) or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR")
    raw = zlib.decompress(idat)
    bpp = 1 if ctype == 0 else 3
    stride = w * bpp
    out: list[int] = []
    prev = bytearray(stride)
    p = 0
    for _y in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 1:
                line[x] = (line[x] + a) & 0xFF
            elif f == 2:
                line[x] = (line[x] + b) & 0xFF
            elif f == 3:
                line[x] = (line[x] + (a + b) // 2) & 0xFF
            elif f == 4:  # Paeth
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        prev = line
        if ctype == 0:
            out.extend(line)
        else:
            out.extend((line[i] + line[i + 1] + line[i + 2]) // 3
                       for i in range(0, stride, 3))
    return w, h, out


_NETPBM_HEADER = re.compile(
    rb"\A(P[56])\s+(\d+)\s+(\d+)\s+(\d+)[\t\n\x0b\x0c\r ]")


def decode_netpbm(data: bytes):
    """P5 (gray) / P6 (RGB) binary netpbm -> (w, h, gray pixels).

    The header is parsed with an anchored regex ending at EXACTLY ONE
    whitespace byte after maxval (netpbm spec: a single separator before the
    raster) — a whitespace-run split would eat raster bytes that happen to be
    ASCII whitespace (0x09-0x0D, 0x20) and shift every pixel."""
    m = _NETPBM_HEADER.match(data)
    if not m:
        raise ValueError("not netpbm")
    w, h, maxval = int(m.group(2)), int(m.group(3)), int(m.group(4))
    body = data[m.end():]
    if m.group(1) == b"P5":
        pix = list(body[:w * h])
    else:
        pix = [(body[i] + body[i + 1] + body[i + 2]) // 3
               for i in range(0, 3 * w * h, 3)]
    if maxval != 255:
        pix = [p * 255 // maxval for p in pix]
    return w, h, pix


def encode_wav_pcm16(samples: list[int], rate: int = 8000) -> bytes:
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack("<%dh" % len(samples), *samples))
    return buf.getvalue()


def decode_wav(data: bytes):
    """-> (rate, mono float samples in [-1, 1]) via stdlib wave."""
    import wave
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(n)
    if width != 2:
        raise ValueError("only PCM16 supported by the stdlib path")
    ints = struct.unpack("<%dh" % (len(raw) // 2), raw)
    if ch > 1:  # average channels
        ints = [sum(ints[i:i + ch]) // ch for i in range(0, len(ints), ch)]
    return rate, [s / 32768.0 for s in ints]


# --------------------------------------------------------------------------
# feature extraction
# --------------------------------------------------------------------------


def _image_feature(w: int, h: int, pix: list[int], dim: int = 8) -> list[float]:
    """[mean, std, min, max, 4 histogram bins] over grayscale pixels."""
    import math
    n = len(pix) or 1
    mean = sum(pix) / n
    var = sum((p - mean) ** 2 for p in pix) / n
    hist = [0] * 4
    for p in pix:
        hist[min(p >> 6, 3)] += 1
    out = [mean / 255.0, math.sqrt(var) / 255.0,
           min(pix, default=0) / 255.0, max(pix, default=0) / 255.0,
           *[c / n for c in hist]]
    return [float(x) for x in out[:dim]] + [0.0] * max(0, dim - 8)


def _audio_feature(rate: int, samples: list[float], dim: int = 8) -> list[float]:
    """[duration_s, rms, zero-cross rate, peak, 4 coarse band energies]."""
    import math
    n = len(samples) or 1
    rms = math.sqrt(sum(s * s for s in samples) / n)
    zc = sum(1 for i in range(1, len(samples))
             if (samples[i - 1] < 0) != (samples[i] < 0)) / n
    peak = max((abs(s) for s in samples), default=0.0)
    # 4 coarse "bands": energy of 4 contiguous time quarters (cheap,
    # deterministic, library-free; a real pipeline would FFT here)
    q = max(1, n // 4)
    bands = [sum(s * s for s in samples[i * q:(i + 1) * q]) / q
             for i in range(4)]
    out = [n / rate, rms, zc, peak, *bands]
    return [float(x) for x in out[:dim]] + [0.0] * max(0, dim - 8)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decode+embed step."""
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def _decode_one(kind: str, payload: bytes, dim: int, pil, sf, av=None):
    """-> (status, feature | None). Never raises (warn-and-skip)."""
    try:
        if kind == "video":
            if av is not None:
                # first decodable frame -> grayscale image feature (the same
                # layered-probe pattern as PIL/soundfile; PyAV is absent in
                # this container, so rows degrade to 'unsupported' here and
                # decode for real on a cluster with the lib installed)
                with av.open(io.BytesIO(payload)) as container:
                    for frame in container.decode(video=0):
                        arr = frame.to_ndarray(format="gray")
                        h, w = arr.shape
                        return "pyav", _image_feature(
                            w, h, [int(x) for x in arr.reshape(-1)], dim)
                return "error:NoFrames", None
            return "unsupported", None
        if kind == "image":
            if pil is not None:
                img = pil.open(io.BytesIO(payload)).convert("L")
                w, h = img.size
                return "pil", _image_feature(w, h, list(img.getdata()), dim)
            if payload.startswith(_PNG_MAGIC):
                return "builtin-png", _image_feature(*decode_png(payload),
                                                     dim=dim)
            if payload[:2] in (b"P5", b"P6"):
                return "builtin-netpbm", _image_feature(
                    *decode_netpbm(payload), dim=dim)
            return "unsupported", None
        if kind == "audio":
            if sf is not None:
                data, rate = sf.read(io.BytesIO(payload))
                return "soundfile", _audio_feature(rate, list(data), dim)
            if payload.startswith(b"RIFF"):
                return "builtin-wav", _audio_feature(*decode_wav(payload),
                                                     dim=dim)
            return "unsupported", None
        return "unsupported", None  # unknown kind
    except Exception as e:  # decode failure -> error row, job continues
        return f"error:{type(e).__name__}", None


def decode_and_featurize(df: DataFrame, fake: bool = False,
                         dim: int = 8) -> DataFrame:
    """mapInPandas decode/feature-extract over binary payloads — batched
    bytes in, typed arrays out. Decoders are probed per worker: Pillow /
    soundfile when importable, pure-stdlib PNG/netpbm/WAV codecs otherwise;
    undecodable rows degrade to status='unsupported'/'error:*' with a null
    feature. ``fake=True`` bypasses decoding with the deterministic
    content-derived feature (plumbing tests, video rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = sf = av = None
        if not fake:
            try:
                from PIL import Image as pil  # type: ignore # noqa: N813
            except ImportError:
                pil = None
            try:
                import soundfile as sf  # type: ignore
            except ImportError:
                sf = None
            try:
                import av  # type: ignore
            except ImportError:
                av = None
        for pdf in batches:
            stats, feats = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if payload is None:
                    stats.append("null")
                    feats.append(None)
                elif fake:
                    stats.append("fake")
                    feats.append(_fake_feature(bytes(payload), dim))
                else:
                    st, ft = _decode_one(kind, bytes(payload), dim, pil, sf,
                                         av)
                    stats.append(st)
                    feats.append(ft)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0),
                "status": stats,
                "feature": feats,
            })

    return (df.repartition(F.col("media_id"))
            .mapInPandas(run, schema=FEATURES_SCHEMA))


def synthetic_media_df(spark, n: int = 64, real: bool = False) -> DataFrame:
    """Deterministic fake media table for tests/benches (no external data).
    ``real=True`` emits genuinely decodable payloads (PNG images, WAV audio)
    so the non-fake path is exercisable in-container; video stays opaque."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if real and kind == "image":
            side = 8 + (i % 4)
            pixels = [[(x * 37 + y * 11 + i) % 256 for x in range(side)]
                      for y in range(side)]
            payload = encode_png_gray(pixels)
            w = h = side
            dur = None
            mime = "image/png"
        elif real and kind == "audio":
            samples = [int(10000 * ((j * (i + 3)) % 17 - 8) / 8)
                       for j in range(800)]
            payload = encode_wav_pcm16(samples)
            w = h = None
            dur = 100
            mime = "audio/wav"
        else:
            payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
            w = h = 64 if kind == "image" else None
            dur = 1000 * i if kind != "image" else None
            mime = f"application/x-fake-{kind}"
        rows.append((i, kind, mime, w, h, dur, bytearray(payload)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media, frame_ts) — the
    explode-side of a frame extractor; the actual frame decode is the layered
    decoder above. Pure expression (sequence + explode), no Python."""
    vids = df.filter(F.col("kind") == "video")
    return (vids.withColumn(
        "frame_ts",
        F.explode(F.sequence(F.lit(0),
                             F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                             F.lit(every_ms))))
        .select("media_id", "frame_ts"))
