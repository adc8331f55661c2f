"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Real kernels (stdlib + numpy only, no media libs needed):
* images — binary PPM (P6), PNG (non-interlaced 8-bit RGB/RGBA, full
  five-filter scanline unfilter) AND baseline JPEG (sequential SOF0,
  4:4:4/4:2:0, Annex-K Huffman — full codec in `jpeg.py`):
  `_parse_ppm`/`encode_ppm`, `_parse_png`/`encode_png`,
  `_parse_jpeg`/`encode_jpeg`, nearest-neighbor `_resize_ppm`;
* audio — RIFF/WAVE 16-bit PCM: `_parse_wav`/`encode_wav`, per-channel
  mean+RMS features, nearest-neighbor `_resample_audio`;
* video — YUV4MPEG2 (Y4M, C420 chroma): `_parse_y4m`/`encode_y4m`,
  plane means, and REAL sampled-frame extraction (`extract_frames`)
  with integer BT.601 YUV→RGB emitted as P6 payloads.
Remaining codecs (progressive JPEG, MP3/Opus, MP4/H.264, exotic PNG
variants) are STUBS in this container (no codec libraries):
they raise NotImplementedError unless `fake=True`, in which case a
deterministic fake decoder (md5-seeded dimensions/features) exercises
the real Spark plumbing — schema, partitioning, Arrow batch shape, UDF
signature — end-to-end. Swap those branches for Pillow/av on a real
cluster.

Design notes for 100 TB of media:
* media bytes travel as `binary` columns in their own table keyed by
  media_ref (never duplicated per mention) — joins bring metadata, not
  payloads;
* decode runs via `mapInPandas` so each Arrow batch amortizes Python
  overhead and memory stays bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch;
* feature vectors come back as array<float> ready for
  datapipe.similarity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .jpeg import _parse_jpeg, encode_jpeg, is_jpeg

MEDIA_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media_table(spark, media_refs: list[tuple[str, str]]) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the
    ref (so tests have real binary columns without external data)."""
    rows = [
        (ref, kind, hashlib.md5(ref.encode()).digest() * 4, {"src": "synthetic"})
        for ref, kind in media_refs
    ]
    return spark.createDataFrame(rows, MEDIA_TABLE_SCHEMA)


# --- real PPM (P6) pixel kernel: numpy only --------------------------------


def is_ppm(payload) -> bool:
    return payload is not None and bytes(payload[:2]) == b"P6"


def _parse_ppm(payload: bytes):
    """P6 payload -> (width, height, HxWx3 uint8 array). Handles the
    format's whitespace-separated header and '#' comments."""
    import numpy as np

    buf = bytes(payload)
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval; a single
    # whitespace byte after maxval starts the raster
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":  # comment to end of line
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(buf) and not buf[i : i + 1].isspace():
            i += 1
        tokens.append(int(buf[start:i]))
    i += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    n = width * height * 3
    raster = np.frombuffer(buf, dtype=np.uint8, count=n, offset=i)
    return width, height, raster.reshape(height, width, 3)


def encode_ppm(arr) -> bytes:
    """HxWx3 uint8 array -> binary P6 payload."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


# --- real PNG (non-interlaced 8-bit RGB/RGBA): stdlib zlib + numpy --------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def is_png(payload) -> bool:
    return payload is not None and bytes(payload[:8]) == PNG_SIG


def _parse_png(payload: bytes):
    """PNG payload -> (width, height, HxWxC uint8 array) for bit depth
    8, color type 2 (RGB) / 6 (RGBA), non-interlaced — the common case
    a crawler actually stores. Pure stdlib zlib + numpy: chunk walk
    (IHDR/IDAT*/IEND, CRCs skipped on read), one inflate, per-scanline
    unfilter of all five PNG filter types (None/Sub/Up/Average/Paeth).
    Interlaced, paletted, grayscale or 16-bit inputs raise — those are
    the cases for a codec lib on a real cluster."""
    import struct
    import zlib

    import numpy as np

    buf = bytes(payload)
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, bytearray()
    width = height = channels = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # data + length/tag/CRC words
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
            if ctype not in (2, 6):
                raise ValueError(
                    f"unsupported PNG color type {ctype} (RGB=2/RGBA=6 only)"
                )
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ft == 0:  # None
            cur = line.copy()
        elif ft == 1:  # Sub: prefix sum per channel, wraps mod 256
            cur = (
                line.reshape(width, channels)
                .astype(np.uint64)
                .cumsum(axis=0)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ft == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256
        elif ft in (3, 4):  # Average / Paeth: serial left-dependency
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - channels]) if x >= channels else 0
                b = int(prev[x])
                if ft == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - channels]) if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return width, height, out.reshape(height, width, channels)


def encode_png(arr) -> bytes:
    """HxWx3 (RGB) or HxWx4 (RGBA) uint8 array -> non-interlaced 8-bit
    PNG with filter-0 scanlines — enough to round-trip the decode
    kernel and re-emit resized payloads without a codec lib."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c not in (3, 4):
        raise ValueError(f"encode_png needs 3 or 4 channels, got {c}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# --- real WAV (RIFF 16-bit PCM) audio kernel: stdlib struct + numpy --------


def is_wav(payload) -> bool:
    return (
        payload is not None
        and bytes(payload[:4]) == b"RIFF"
        and bytes(payload[8:12]) == b"WAVE"
    )


def _parse_wav(payload: bytes):
    """WAV payload -> (sample_rate, n_channels, (n_samples, n_channels)
    int16 array). RIFF chunk walk (fmt /data); 16-bit integer PCM only —
    compressed/float formats are the codec-lib cases and raise."""
    import struct

    import numpy as np

    buf = bytes(payload)
    if not is_wav(buf):
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, data = 12, None, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV format {fmt}/{bits}-bit (16-bit PCM only)"
                )
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV missing fmt /data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples) // channels
    return rate, channels, samples[: n * channels].reshape(n, channels)


def encode_wav(samples, sample_rate: int) -> bytes:
    """(n_samples, n_channels) int16 array -> RIFF/WAVE 16-bit PCM."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    n, ch = arr.shape
    body = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _wav_features(samples) -> list[float]:
    """Per-channel [mean, rms] in [-1, 1]/[0, 1] full-scale units —
    float64 over int arithmetic, exact-testable."""
    import numpy as np

    x = samples.astype("float64") / 32768.0
    means = x.mean(axis=0)
    rms = np.sqrt((x * x).mean(axis=0))
    return [float(v) for pair in zip(means, rms) for v in pair]


def _resample_audio(samples, src_rate: int, dst_rate: int):
    """Nearest-neighbor sample-rate conversion via the same integer
    index math as _resize_ppm (src = dst * src_rate // dst_rate)."""
    import numpy as np

    n = samples.shape[0]
    new_n = max(n * dst_rate // src_rate, 1)
    idx = (np.arange(new_n) * src_rate) // dst_rate
    return samples[np.minimum(idx, n - 1)]


# --- real Y4M (YUV4MPEG2, C420) video kernel: numpy only -------------------

Y4M_SIG = b"YUV4MPEG2 "


def is_y4m(payload) -> bool:
    return payload is not None and bytes(payload[:10]) == Y4M_SIG


def _parse_y4m(payload: bytes):
    """Y4M payload -> (width, height, [(Y, U, V) uint8 planes per
    frame]). C420 chroma (the Y4M default and its jpeg/mpeg2/paldv
    siting variants share the plane layout); other samplings raise."""
    import numpy as np

    buf = bytes(payload)
    if not is_y4m(buf):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = buf.index(b"\n")
    width = height = None
    chroma = "420"
    for tok in buf[10:nl].split(b" "):
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:].decode()
    if width is None or height is None:
        raise ValueError("Y4M missing W/H header tokens")
    if not chroma.startswith("420"):
        raise ValueError(f"unsupported Y4M chroma C{chroma} (C420* only)")
    ylen, clen = width * height, (width // 2) * (height // 2)
    pos, frames = nl + 1, []
    while pos < len(buf):
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        pos = buf.index(b"\n", pos) + 1
        y = np.frombuffer(buf, np.uint8, ylen, pos).reshape(height, width)
        u = np.frombuffer(buf, np.uint8, clen, pos + ylen).reshape(
            height // 2, width // 2
        )
        v = np.frombuffer(buf, np.uint8, clen, pos + ylen + clen).reshape(
            height // 2, width // 2
        )
        frames.append((y, u, v))
        pos += ylen + 2 * clen
    return width, height, frames


def encode_y4m(frames, width: int, height: int) -> bytes:
    """[(Y, U, V)] uint8 planes -> YUV4MPEG2 C420 payload."""
    head = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n" % (width, height)
    out = [head]
    for y, u, v in frames:
        out.append(b"FRAME\n")
        out.append(y.astype("uint8").tobytes())
        out.append(u.astype("uint8").tobytes())
        out.append(v.astype("uint8").tobytes())
    return b"".join(out)


def _y4m_features(frames) -> list[float]:
    """[mean Y, mean U, mean V] over all frames, in [0, 1]."""
    import numpy as np

    return [
        float(np.concatenate([f[i].reshape(-1) for f in frames]).astype("float64").mean())
        / 255.0
        for i in range(3)
    ]


def _yuv420_to_rgb(y, u, v):
    """Integer BT.601 full-range YUV->RGB with 2x nearest-neighbor
    chroma upsampling — deterministic (fixed-point x1024 arithmetic)."""
    import numpy as np

    yy = y.astype(np.int32)
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1).astype(np.int32) - 128
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1).astype(np.int32) - 128
    uu, vv = uu[: yy.shape[0], : yy.shape[1]], vv[: yy.shape[0], : yy.shape[1]]
    r = yy + (1436 * vv) // 1024
    g = yy - (352 * uu + 731 * vv) // 1024
    b = yy + (1815 * uu) // 1024
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _ppm_features(arr) -> list[float]:
    """Per-channel mean intensity in [0, 1] — the deterministic feature
    vector of the real decode path (float64 means, exact-testable)."""
    means = arr.astype("float64").mean(axis=(0, 1)) / 255.0
    return [float(m) for m in means]


def _resize_ppm(arr, new_w: int, new_h: int):
    """Nearest-neighbor resample via integer index math
    (src = dst * src_dim // dst_dim) — deterministic, numpy-only."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(new_h) * h) // new_h
    cols = (np.arange(new_w) * w) // new_w
    return arr[rows][:, cols]


def _decode_fake(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: md5(payload)-seeded dims + features."""
    out = []
    for ref, kind, payload in zip(pdf["media_ref"], pdf["kind"], pdf["payload"]):
        h = hashlib.md5(payload if payload is not None else ref.encode()).digest()
        width = 64 + h[0]
        height = 64 + h[1]
        n_frames = 1 if kind == "image" else 1 + h[2]
        feats = [round(b / 255.0, 6) for b in h[:8]]
        out.append((ref, kind, width, height, n_frames, feats))
    return pd.DataFrame(
        out, columns=["media_ref", "kind", "width", "height", "n_frames", "features"]
    )


def _decode_real(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real decode: PPM (P6) / PNG / baseline JPEG images, WAV (16-bit
    PCM) audio (width/height null, n_frames = samples, features =
    per-channel [mean, rms]), Y4M (C420) video (features = plane
    means); remaining formats (MP3/MP4/progressive JPEG) need codec
    libs this container lacks -> NotImplementedError."""
    out = []
    for ref, kind, payload in zip(pdf["media_ref"], pdf["kind"], pdf["payload"]):
        if kind == "image" and is_ppm(payload):
            w, h, arr = _parse_ppm(payload)
            out.append((ref, kind, w, h, 1, _ppm_features(arr)))
        elif kind == "image" and is_png(payload):
            w, h, arr = _parse_png(payload)
            out.append((ref, kind, w, h, 1, _ppm_features(arr)))
        elif kind == "image" and is_jpeg(payload):
            w, h, arr = _parse_jpeg(payload)
            out.append((ref, kind, w, h, 1, _ppm_features(arr)))
        elif kind == "audio" and is_wav(payload):
            _rate, _ch, samples = _parse_wav(payload)
            out.append((ref, kind, None, None, samples.shape[0], _wav_features(samples)))
        elif kind == "video" and is_y4m(payload):
            w, h, frames = _parse_y4m(payload)
            out.append((ref, kind, w, h, len(frames), _y4m_features(frames)))
        else:
            raise NotImplementedError(
                f"real decode for media_ref={ref!r} ({kind}): PPM (P6), "
                "non-interlaced 8-bit RGB/RGBA PNG, baseline JPEG, "
                "16-bit PCM WAV and C420 Y4M decode without codec libs; "
                "pass fake=True for the deterministic stub decoder"
            )
    return pd.DataFrame(
        out, columns=["media_ref", "kind", "width", "height", "n_frames", "features"]
    )


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over the media table.

    fake=False runs the REAL numpy PPM kernel (raises for formats that
    need codec libs); fake=True runs the deterministic stub decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_fake(pdf) if fake else _decode_real(pdf)

    # r6 (guide §4.1): ship ONLY the columns the kernel reads across the
    # Python boundary — Spark cannot see into the function, so without
    # the select the whole row (including the meta map) crosses Arrow
    # both ways and column pruning at the scan is defeated.
    return media.select("media_ref", "kind", "payload").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("new_width", T.IntegerType(), True),
        T.StructField("new_height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """(media_ref, width, height, new_width, new_height): target
    dimensions for aspect-ratio-preserving downscale to max_side —
    pure column arithmetic (no kernel needed); images already within
    bounds keep their dims (never upscaled)."""
    w, h = F.col("width"), F.col("height")
    longest = F.greatest(w, h)
    scale = F.when(longest > max_side, F.lit(max_side) / longest).otherwise(
        F.lit(1.0)
    )
    return decoded.filter(F.col("kind") == "image").select(
        "media_ref",
        "width",
        "height",
        F.greatest(F.floor(w * scale), F.lit(1)).cast("int").alias("new_width"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("int").alias("new_height"),
    )


def resize_media(
    media: DataFrame, plan: DataFrame, fake: bool = False
) -> DataFrame:
    """Arrow-batched resample of image payloads to the planned dims.
    fake=False runs the REAL nearest-neighbor numpy kernel on PPM (P6)
    payloads, re-encoding the result as P6 (raises for compressed
    formats that need codec libs); fake=True produces a deterministic
    md5-derived payload sized new_width*new_height/64 bytes, exercising
    the real join + mapInPandas plumbing without any pixel math."""
    joined = media.select("media_ref", "payload").join(plan, "media_ref")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, payload, nw, nh in zip(
                pdf["media_ref"], pdf["payload"], pdf["new_width"], pdf["new_height"]
            ):
                if fake:
                    seed = hashlib.md5(
                        (payload or b"") + f"|{nw}x{nh}".encode()
                    ).digest()
                    size = max(int(nw) * int(nh) // 64, 1)
                    body = (seed * (size // len(seed) + 1))[:size]
                elif is_ppm(payload):
                    _, _, arr = _parse_ppm(payload)
                    body = encode_ppm(_resize_ppm(arr, int(nw), int(nh)))
                elif is_png(payload):
                    _, _, arr = _parse_png(payload)
                    body = encode_png(_resize_ppm(arr, int(nw), int(nh)))
                elif is_jpeg(payload):
                    _, _, arr = _parse_jpeg(payload)
                    body = encode_jpeg(_resize_ppm(arr, int(nw), int(nh)))
                else:
                    raise NotImplementedError(
                        f"real resample for media_ref={ref!r}: only PPM "
                        "(P6), non-interlaced 8-bit RGB/RGBA PNG and "
                        "baseline JPEG resample without codec libs; pass "
                        "fake=True for the deterministic stub"
                    )
                out.append((ref, int(nw), int(nh), body))
            yield pd.DataFrame(
                out, columns=["media_ref", "new_width", "new_height", "payload"]
            )

    return joined.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_ref, frame_idx) sampling plan for video rows — pure
    column ops (sequence + filter); extract_frames is the second
    mapInPandas stage that decodes exactly the sampled frames."""
    return (
        decoded.filter(F.col("kind") == "video")
        .select(
            "media_ref",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_audio(media: DataFrame, resample_to: int | None = None) -> DataFrame:
    """Typed audio decode over WAV (16-bit PCM) payloads: sample rate,
    channel count, length and per-channel [mean, rms] features; with
    resample_to set, features/n_samples describe the nearest-neighbor
    resampled signal (the shape a feature-extraction model consumes).
    Arrow-batched mapInPandas like decode_media."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                rate, ch, samples = _parse_wav(payload)
                if resample_to is not None and resample_to != rate:
                    samples = _resample_audio(samples, rate, resample_to)
                    rate = resample_to
                out.append(
                    (ref, rate, ch, samples.shape[0], _wav_features(samples))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_ref", "sample_rate", "n_channels", "n_samples", "features",
                ],
            )

    return media.filter(F.col("kind") == "audio").select(
        "media_ref", "payload"
    ).mapInPandas(run, schema=AUDIO_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def extract_frames(media: DataFrame, plan: DataFrame) -> DataFrame:
    """REAL sampled-frame extraction for Y4M video: join the payload
    table to the frame_sample plan (payload travels ONCE per media_ref
    — the plan is collect_list'd per ref before the kernel so a video
    is decoded a single time however many frames are sampled), decode,
    convert each sampled frame YUV420->RGB (integer BT.601) and emit it
    as a P6 payload ready for the image kernels."""
    wanted = plan.groupBy("media_ref").agg(
        F.sort_array(F.collect_list("frame_idx")).alias("frame_idxs")
    )
    joined = media.select("media_ref", "payload").join(wanted, "media_ref")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, payload, idxs in zip(
                pdf["media_ref"], pdf["payload"], pdf["frame_idxs"]
            ):
                w, h, frames = _parse_y4m(payload)
                for i in idxs:
                    if 0 <= int(i) < len(frames):
                        y, u, v = frames[int(i)]
                        out.append(
                            (ref, int(i), w, h, encode_ppm(_yuv420_to_rgb(y, u, v)))
                        )
            yield pd.DataFrame(
                out, columns=["media_ref", "frame_idx", "width", "height", "payload"]
            )

    return joined.mapInPandas(run, schema=FRAME_SCHEMA)
