"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
functions over ``mapInPandas``.

PNG and WAV decode are REAL (round 10): PNG is zlib (stdlib) + per-
scanline unfiltering (numpy; filters 0-4 of the public PNG spec,
8-bit depth, no interlace) — ``decode_png``/``encode_png`` wired into
``decode_image``; WAV is a RIFF chunk walk + int16 PCM frames —
``decode_wav``/``encode_wav`` wired into ``audio_features``. Both run
as Arrow-batched ``mapInPandas`` stages. JPEG/MP3/video decode
remains STUBBED (``decode_image_stub`` — those codecs genuinely need
native libraries this container lacks); the stub is deterministic
byte arithmetic so the plumbing itself is SQL-oracle-verifiable, and
it stays the fallback for unrecognized payloads inside
``decode_image``/``audio_features``.

Scale notes: binary payloads ride in parquet binary columns; the
``mapInPandas`` path streams Arrow record batches (no per-row Python
round-trip), and ``spark.sql.files.maxPartitionBytes`` bounds batch
memory. Metadata-only transforms (type sniffing, byte stats) stay
JVM-side.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic-byte prefixes for cheap JVM-side type sniffing (hex strings).
_MAGIC = {
    "png": "89504E47",
    "jpeg": "FFD8FF",
    "gif": "47494638",
    "wav": "52494646",  # RIFF
    "mp3": "494433",  # ID3
}


def attach_binary_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """JVM-side metadata over an opaque binary column: byte length,
    md5 digest, and magic-byte media-type sniff. No Python involved."""
    col = F.col(bin_col)
    hexhead = F.upper(F.hex(F.substring(col, 1, 8)))
    sniff = F.lit("unknown")
    for name, magic in reversed(_MAGIC.items()):
        sniff = F.when(hexhead.startswith(magic), F.lit(name)).otherwise(sniff)
    return (
        df.withColumn("n_bytes", F.length(col))
        .withColumn("content_digest", F.md5(col))
        .withColumn("media_type", sniff)
    )


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: dimensions and an 8-dim feature
    derived from the byte content. Replace with a real decoder
    (PIL.Image.open etc.) outside this container."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    feature = [float((payload[i % n] if n else 0) / 255.0) for i in range(8)]
    return width, height, 3, feature


def decode_image_stub(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """'Decode' images via mapInPandas with Arrow batches — the real
    plumbing for a decode/feature-extract stage (STUB decoder inside).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": [],
                "n_bytes": [],
                "width": [],
                "height": [],
                "channels": [],
                "feature": [],
            }
            for payload in pdf[bin_col]:
                raw = bytes(payload) if payload is not None else b""
                w, h, c, feat = _fake_decode(raw)
                out["media_type"].append("stub")
                out["n_bytes"].append(len(raw))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(decode_batches, DECODED_IMAGE_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("target_width", T.IntegerType()),
        T.StructField("target_height", T.IntegerType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("n_bytes_out", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_image_stub(
    df: DataFrame,
    target_width: int = 64,
    target_height: int = 64,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """'Resize' stage plumbing via mapInPandas: binary in → binary out
    at a fixed target geometry (STUB resampler: deterministic
    byte-stride subsample/pad to exactly w*h*3 bytes — swap for a real
    resampler outside this container). The schema/batch shape is what a
    real resize stage ships: bounded output row size regardless of
    input payload size, which is what makes the downstream shuffle
    plannable at 100 TB."""
    out_len = target_width * target_height * 3

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": pdf[id_col].astype("int64"),
                "target_width": target_width,
                "target_height": target_height,
                "n_bytes_in": [],
                "n_bytes_out": [],
                "resized": [],
            }
            for payload in pdf[bin_col]:
                raw = bytes(payload) if payload is not None else b""
                if raw:
                    stride = max(len(raw) // out_len, 1)
                    sampled = raw[::stride][:out_len]
                else:
                    sampled = b""
                resized = sampled + b"\x00" * (out_len - len(sampled))
                rows["n_bytes_in"].append(len(raw))
                rows["n_bytes_out"].append(len(resized))
                rows["resized"].append(resized)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(resize_batches, RESIZED_IMAGE_SCHEMA)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # greyscale, RGB, grey+A, RGBA


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal REAL PNG encoder (public spec, stdlib only): 8-bit,
    colour type by channel count (len(pixels) / (w*h): 1=grey, 3=RGB,
    4=RGBA), filter 0 scanlines, one zlib IDAT. Used to synthesize
    deterministic fixtures that ``decode_png`` must round-trip
    bit-exactly."""
    channels, rem = divmod(len(pixels), width * height)
    if rem or channels not in (1, 3, 4):
        raise ValueError(f"pixels length {len(pixels)} != w*h*channels")
    ctype = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# Adam7 interlace passes: (x0, y0, dx, dy) per the public PNG spec.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(
    raw: bytes, off: int, w: int, h: int, bpp: int
) -> tuple[np.ndarray, int]:
    """Unfilter ``h`` scanlines of ``w*bpp`` bytes starting at ``off``
    in the inflated stream (all five spec filter types). Returns the
    (h, w*bpp) array and the new offset."""
    stride = w * bpp
    if len(raw) - off < h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1)
        off += 1 + stride
        if f == 0:  # None
            cur = line.copy()
        elif f == 2:  # Up — vectorized (uint8 addition wraps mod 256)
            cur = line + prev
        elif f in (1, 3, 4):  # Sub/Average/Paeth need the running left
            cur = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur
        prev = cur
    return out, off


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """REAL PNG decode, no imaging library: chunk walk → IHDR dims →
    zlib-inflate the IDAT stream → per-scanline unfilter (all five
    filter types of the public spec: None/Sub/Up/Average/Paeth).
    Supports 8-bit depth, colour types 0/2/4/6, both interlace modes
    (progressive Adam7 sub-images are unfiltered independently and
    merged back on the pass grid) — the shapes a training-data
    pipeline actually stores. Returns (width, height, channels, uint8
    array of shape (h, w, channels)).
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = channels = None
    interlace = 0
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace not in (0, 1) or ctype not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, type={ctype})"
                )
            channels = _PNG_CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        out, off = _unfilter(raw, 0, w, h, channels)
        if off != len(raw):
            raise ValueError("PNG scanline payload size mismatch")
        return int(w), int(h), int(channels), out.reshape(h, w, channels)
    # Adam7: seven independently-filtered sub-images, merged on the
    # pass grid; empty passes (sub-dimension 0) carry no scanlines
    img = np.empty((h, w, channels), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        w_p = (w - x0 + dx - 1) // dx
        h_p = (h - y0 + dy - 1) // dy
        if w_p <= 0 or h_p <= 0:
            continue
        sub, off = _unfilter(raw, off, w_p, h_p, channels)
        img[y0::dy, x0::dx] = sub.reshape(h_p, w_p, channels)
    if off != len(raw):
        raise ValueError("PNG scanline payload size mismatch")
    return int(w), int(h), int(channels), img


DECODED_REAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
    ]
)


def decode_image(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL image decode as an Arrow-batched ``mapInPandas`` stage:
    PNG payloads go through ``decode_png`` (actual zlib inflate +
    unfilter) and report true dimensions plus exact integer pixel
    aggregates; anything else falls back to the declared stub
    (media_type 'stub') so mixed-media corpora keep flowing. The
    integer pixel_sum makes the whole Python stage SQL-oracle
    checkable when fixtures are formula-generated."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in DECODED_REAL_SCHEMA.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                rows["doc_id"].append(int(doc_id))
                decoded = None
                if raw[:8] == _PNG_SIG:
                    # a truncated/16-bit/interlaced PNG must NOT kill
                    # the stage — fall back to the stub row so a single
                    # malformed file cannot abort a 100 TB run
                    try:
                        decoded = decode_png(raw)
                    except ValueError:
                        decoded = None
                if decoded is not None:
                    w, h, c, px = decoded
                    rows["media_type"].append("png")
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(c)
                    rows["pixel_sum"].append(int(px.sum(dtype=np.int64)))
                    rows["n_pixels"].append(w * h * c)
                else:
                    w, h, c, _feat = _fake_decode(raw)
                    rows["media_type"].append("stub")
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(c)
                    rows["pixel_sum"].append(0)
                    rows["n_pixels"].append(0)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, DECODED_REAL_SCHEMA)


def synth_png_column(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Deterministic PNG fixture generator (mapInPandas): for each id,
    a REAL PNG whose geometry and pixels are closed-form in the id —
    width = 8 + id % 9, height = 8 + (id // 9) % 9, RGB pixel
    (x, y, c) = (id*31 + y*7 + x*3 + c*11) % 256 — so a SQL oracle can
    reproduce the decoded aggregates without touching the codec, and a
    hash-exact match certifies the encode→decode round trip
    bit-for-bit."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = 8 + i % 9, 8 + (i // 9) % 9
                yy, xx, cc = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((i * 31 + yy * 7 + xx * 3 + cc * 11) % 256).astype(
                    np.uint8
                )
                payloads.append(encode_png(w, h, px.tobytes()))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), bin_col: payloads}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bin_col, T.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """Minimal REAL RIFF/WAVE encoder (public spec, stdlib only):
    PCM 16-bit mono. ``samples`` is an int16 array."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """REAL WAV decode, no audio library: RIFF chunk walk → fmt
    (PCM, 16-bit) → data chunk as an int16 sample array. Returns
    (sample_rate, n_channels, samples[frames, channels] or [frames]
    for mono)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt}, bits={bits})"
                )
        elif tag == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels].reshape(
            -1, channels
        )
    return int(rate), int(channels), samples


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("trough", T.IntegerType()),
        T.StructField("sample_sum", T.LongType()),
    ]
)


def audio_features(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio feature extraction as an Arrow-batched mapInPandas
    stage: RIFF/WAVE payloads are decoded for real (``decode_wav``)
    and reduced to exact integer features — frame count, duration,
    peak/trough, sample sum — the audio-curation analog of
    ``decode_image``. Non-WAV payloads emit media_type 'stub' with
    zeroed features (mixed-media corpora keep flowing)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                rows["doc_id"].append(int(doc_id))
                decoded = None
                if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    # unsupported variants (24-bit, non-PCM, truncated)
                    # fall back to the stub row instead of killing the
                    # stage
                    try:
                        decoded = decode_wav(raw)
                    except ValueError:
                        decoded = None
                if decoded is not None:
                    rate, ch, s = decoded
                    n = int(s.shape[0])
                    rows["media_type"].append("wav")
                    rows["sample_rate"].append(rate)
                    rows["n_channels"].append(ch)
                    rows["n_samples"].append(n)
                    rows["duration_ms"].append(n * 1000 // rate if rate else 0)
                    rows["peak"].append(int(s.max()) if n else 0)
                    rows["trough"].append(int(s.min()) if n else 0)
                    rows["sample_sum"].append(int(s.sum(dtype=np.int64)))
                else:
                    rows["media_type"].append("stub")
                    rows["sample_rate"].append(0)
                    rows["n_channels"].append(0)
                    rows["n_samples"].append(0)
                    rows["duration_ms"].append(0)
                    rows["peak"].append(0)
                    rows["trough"].append(0)
                    rows["sample_sum"].append(0)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak_abs", T.IntegerType()),
    ]
)


def audio_window_features(
    df: DataFrame,
    window_samples: int = 64,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-WINDOW audio features over real WAV decode — the
    segmentation stage a speech-curation pipeline runs before VAD /
    silence trimming: fixed-length sample windows, one output row per
    window with exact integer aggregates (sum, energy = Σ s², peak
    |s|). The 1→N mapInPandas shape over a decoded payload (the audio
    analog of ``video_frame_features``); the last window may be
    short. Stereo inputs are windowed over interleaved frames'
    per-channel samples flattened in frame order (mono in practice
    for ASR corpora). Non-WAV payloads are skipped."""
    if window_samples < 1:
        raise ValueError("window_samples must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in AUDIO_WINDOW_SCHEMA.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                if not (raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"):
                    continue
                try:
                    _rate, _ch, s = decode_wav(raw)
                except ValueError:
                    continue
                flat = np.asarray(s, dtype=np.int64).reshape(-1)
                for wi in range(0, max(1, len(flat)), window_samples):
                    win = flat[wi : wi + window_samples]
                    if not len(win):
                        break
                    rows["doc_id"].append(int(doc_id))
                    rows["window_idx"].append(wi // window_samples)
                    rows["n_samples"].append(int(len(win)))
                    rows["sample_sum"].append(int(win.sum()))
                    rows["energy"].append(int((win * win).sum()))
                    rows["peak_abs"].append(int(np.abs(win).max()))
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, AUDIO_WINDOW_SCHEMA)


def synth_wav_column(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic WAV fixture generator (mapInPandas): for each id,
    a REAL PCM16 mono WAV whose sample count and samples are
    closed-form in the id — n = 64 + id % 129, sample[i] =
    ((id*37 + i*101) % 65536) - 32768 — so a SQL oracle can reproduce
    the decoded features without touching the codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                n = 64 + i % 129
                idx = np.arange(n, dtype=np.int64)
                s = ((i * 37 + idx * 101) % 65536 - 32768).astype(np.int16)
                payloads.append(encode_wav(sample_rate, s))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), bin_col: payloads}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bin_col, T.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


def synth_wav_polarity_column(
    df: DataFrame,
    group_size: int = 2,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic WAV fixture with PLANTED POLARITY-INVERTED
    duplicates: ids in the same ``group_size`` block share one base
    signal; variant v flips the sign v times (v=0 original, v=1 phase
    inverted — the classic re-encode artifact an energy fingerprint
    must see through). base = id // group_size, n = 64 + base % 129,
    sample[i] = ±(((base*3571 + i*9973) % 65535) - 32767) — the 9973
    step wraps the range every ~6.5 samples so window energies vary
    (a slow step makes |s| monotone and every delta sign negative),
    and the 65535 modulus keeps the base in [-32767, 32767] so
    negation never overflows int16 and inversion is sample-exact.
    Closed-form in the id, so a SQL oracle replays the decoded
    windows without the codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                base, variant = i // group_size, i % group_size
                n = 64 + base % 129
                idx = np.arange(n, dtype=np.int64)
                s = (base * 3571 + idx * 9973) % 65535 - 32767
                if variant % 2:
                    s = -s
                payloads.append(encode_wav(sample_rate, s.astype(np.int16)))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), bin_col: payloads}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bin_col, T.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


def synth_wav_neardup_column(
    df: DataFrame,
    group_size: int = 3,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic WAV fixture with PLANTED NEAR-duplicates at a
    PROVABLE fingerprint Hamming distance: ids in the same
    ``group_size`` block share one base signal of n = 256 + base % 257
    samples (32-64 energy windows at window_samples=8, so
    ``audio_fingerprint``'s delta-sign key carries 31-63 meaningful
    bits and unrelated clips essentially never collide);
    variant 0 is the base, variant 1 is its polarity inversion
    (energy is sign-blind → fingerprint Hamming EXACTLY 0), variant 2
    zeroes every sample of the LAST 8-sample window — only the final
    window's energy changes, so only the final delta sign can move and
    the fingerprint Hamming is PROVABLY <= 1 (the clipped-tail
    re-encode a near-dup audio pass must still group). Variants >= 3
    alternate inversion parity on the variant-2 signal (same bound).
    base sample[i] = (((base·3571 + i·(9973 + 2·(base % 1237)))
    % 65535) − 32767) — the ``synth_wav_polarity_column`` phase
    formula with a PER-BASE sample step: with a fixed step two bases
    with nearby phases (base·3571 mod 65535 — gaps shrink as the
    corpus grows) produce near-equal window-energy sequences and the
    pair set fills with phase-correlated cross-base collisions (29k
    rows at sf0.1 vs ~5k planted); the per-base step decorrelates the
    slopes so pairs stay id-local. Closed-form in the id, so a SQL
    oracle replays windows, energies and deltas without the codec."""
    gs = int(group_size)
    if gs < 1:
        raise ValueError(
            f"synth_wav_neardup_column: group_size must be >= 1 (got {gs})"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                base, variant = i // gs, i % gs
                n = 256 + base % 257
                idx = np.arange(n, dtype=np.int64)
                step = 9973 + 2 * (base % 1237)
                s = (base * 3571 + idx * step) % 65535 - 32767
                if variant >= 2:
                    s[((n - 1) // 8) * 8 :] = 0
                if variant % 2:
                    s = -s
                payloads.append(encode_wav(sample_rate, s.astype(np.int16)))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), bin_col: payloads}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bin_col, T.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


def audio_fingerprint(
    df: DataFrame,
    window_samples: int = 8,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """ENERGY-DELTA audio fingerprint — the Shazam-family idea reduced
    to its exact-integer core: window the clip, compute per-window
    energy Σs² (exact int64, via the existing ``audio_window_features``
    Arrow stage), and pack the SIGNS of successive energy deltas into
    one long: delta w toggles bit (w-1) mod 63 (XOR fold), so the
    first 63 deltas land on distinct bits exactly as a plain pack and
    every later delta still CONTRIBUTES — two long clips that agree on
    their first 63 deltas but diverge later no longer collide into one
    dedup group (code-review r15: the silent false-merge on >64-window
    clips). PROVABLY invariant to polarity inversion (energy is
    sign-blind) and robust to constant gain in the direction
    production fingerprints care about — the compact key for
    exact/near re-encode audio dedup.

    Output: one row per decodable clip — (id, n_windows, fingerprint);
    dedup groups key on (n_windows, fingerprint) so clips of
    different length never collide through the zero-pad, and the XOR
    fold stays injective per delta GIVEN equal n_windows (two equal-
    length clips collide only on a genuine 63-bit toggle collision).

    Scale: decode + window is the one Arrow stage (clip-bounded
    state); the delta/pack stage is a JVM window over
    (clip, window_idx) — partitions are single clips (windows per
    clip is bounded by clip length, clips are the parallelism unit)
    — plus one map-side-combinable per-clip sum. Fingerprints
    shuffle downstream, never samples."""
    wf = audio_window_features(
        df, window_samples=window_samples, bin_col=bin_col, id_col=id_col
    )
    w = Window.partitionBy(id_col).orderBy("window_idx")
    delta = wf.select(
        id_col,
        "window_idx",
        (F.col("energy") > F.lag("energy").over(w)).alias("__up"),
    )
    return delta.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_windows"),
        # XOR fold: bit (window_idx - 1) % 63 per up-delta — identical
        # to the plain sum-of-distinct-bits pack for the first 63
        # deltas (XOR of disjoint bits IS their sum), and later deltas
        # toggle instead of vanishing
        F.coalesce(
            F.bit_xor(
                F.when(
                    F.col("__up"),
                    F.expr("shiftleft(1L, (window_idx - 1) % 63)"),
                ).otherwise(F.lit(0).cast("long"))
            ),
            F.lit(0).cast("long"),
        ).alias("fingerprint"),
    )


def audio_fingerprint_pairs(
    df: DataFrame,
    max_hamming: int = 1,
    window_samples: int = 8,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    bits: int = 63,
) -> DataFrame:
    """FUZZY near-duplicate AUDIO pairs — ``audio_fingerprint``
    Hamming distance <= ``max_hamming`` via the exact pigeonhole
    equi-join (VERDICT r16 #2: the cross-modal dedup matrix had fuzzy
    pairs for text and images but only exact-signature grouping for
    audio, so a clipped tail or one flipped energy delta broke the
    group). The ``image_phash_pairs`` segment machinery applied to the
    63-bit delta-sign fingerprint, BLOCKED on equal ``n_windows``:
    clips of different window counts never pair (their fingerprints
    are not comparable through the zero-pad — the
    ``audio_fingerprint`` dedup-key contract), so every join bucket is
    (n_windows, segment_idx, masked_value).

    Pigeonhole: per n_windows CLASS, the fingerprint's MEANINGFUL
    bits — min(n_windows − 1, ``bits``); positions above that are
    structurally zero — split into ``max_hamming + 1`` near-equal
    segments (widths/offsets computed per row from n_windows, so
    every clip in a class uses identical boundaries); two
    fingerprints within the distance agree on at least one segment —
    candidates come from a hash-partitioned equi-join, never a
    cartesian, and the exact ``bit_count(xor)`` filter keeps true
    pairs. Recall 1.0 by construction GIVEN equal n_windows.
    Segmenting a GLOBAL [0, bits) range instead (the first-draft
    shape, code-review r17) is wrong at scale: every segment lying
    wholly above a short clip's meaningful bits is constant zero, so
    each short n_windows class degenerates to a full N²/2 cross join
    through one (class, segment, 0) bucket — with per-class widths
    the degenerate bucket exists only for clips with fewer meaningful
    bits than segments (< max_hamming + 1 windows), which the
    fingerprint cannot discriminate anyway.

    Output: (id_a, id_b, n_windows, hamming), canonical id_a < id_b.

    Scale: decode + windowing is the one Arrow stage; only
    (id, int, long) fingerprint rows ever shuffle. Per-class bucket
    depth is 2^((n_windows−1) div (max_hamming+1)) — short clips
    still bucket shallowly (a 17-window clip at max_hamming=1 leaves
    8-bit buckets, N²/2⁸ per class), so at corpus scale either
    lengthen the analysis window so clips carry >= 25 windows per
    distance unit or tighten ``max_hamming`` (the
    ``image_phash_pairs`` narrow-segment discipline; the static
    warning below fires on the parameter-level version of the same
    hazard)."""
    n_seg = int(max_hamming) + 1
    if int(bits) // n_seg < 12:
        import warnings

        warnings.warn(
            f"audio_fingerprint_pairs: {bits}-bit fingerprint over "
            f"{n_seg} pigeonhole segments leaves ~{int(bits) // n_seg}-bit "
            f"buckets — expected candidates grow as N²/2^{int(bits) // n_seg} "
            f"per n_windows class (the image_phash_pairs measured failure "
            f"mode); tighten max_hamming or use longer clips",
            stacklevel=2,
        )
    sig = audio_fingerprint(
        df, window_samples=window_samples, bin_col=bin_col, id_col=id_col
    )
    # per-class segment geometry: meaningful bits = min(nw−1, bits)
    # (the XOR fold touches bits 0..62 only), split into n_seg
    # near-equal slices — width_i = q + (i < r), offset_i = i·q +
    # min(i, r) with q = eff div n_seg, r = eff mod n_seg. All JVM
    # integer expressions; clips with equal n_windows get identical
    # boundaries, which is all the pigeonhole argument needs.
    eff = F.least(
        F.greatest(F.col("n_windows").cast("long") - 1, F.lit(1).cast("long")),
        F.lit(int(bits)).cast("long"),
    )
    q = ((eff - F.pmod(eff, F.lit(n_seg))) / F.lit(n_seg)).cast("long")
    rr = F.pmod(eff, F.lit(n_seg))
    segs = []
    for i in range(n_seg):
        w_i = q + F.when(F.lit(i) < rr, F.lit(1)).otherwise(F.lit(0)).cast(
            "long"
        )
        off_i = F.lit(i).cast("long") * q + F.least(
            F.lit(i).cast("long"), rr
        )
        # (1L << w) − 1 is the w-ones mask for w <= 63 (two's-
        # complement wrap at w = 63 still yields all-ones minus sign);
        # call_function: the pyspark shiftleft/shiftrightunsigned
        # wrappers accept only literal ints for numBits, the SQL
        # expressions take columns
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), w_i.cast("int")
        ) - F.lit(1).cast("long")
        segs.append(
            F.struct(
                F.lit(i).alias("seg_idx"),
                F.call_function(
                    "shiftrightunsigned",
                    F.col("fingerprint"),
                    off_i.cast("int"),
                )
                .bitwiseAND(mask)
                .alias("seg_val"),
            )
        )
    # both self-join sides read the segmented frame; the lazy
    # checkpoint materializes the Arrow decode stage once, not twice
    segged = (
        sig.select(
            id_col,
            "n_windows",
            "fingerprint",
            F.explode(F.array(*segs)).alias("s"),
        )
        .select(id_col, "n_windows", "fingerprint", "s.seg_idx", "s.seg_val")
        .localCheckpoint(eager=False)
    )
    a, b = segged.alias("a"), segged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_windows") == F.col("b.n_windows"))
            & (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_windows").alias("n_windows"),
            F.bit_count(
                F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= int(max_hamming))
        .dropDuplicates(["id_a", "id_b"])
    )


def encode_y4m(width: int, height: int, frames: list[bytes]) -> bytes:
    """Minimal REAL YUV4MPEG2 (.y4m) encoder (public spec, stdlib
    only): C420 planar — each frame is a full-res Y plane followed by
    quarter-res U and V planes. ``frames`` is a list of concatenated
    Y+U+V plane bytes (w*h + 2*(w//2)*(h//2) each); w and h must be
    even."""
    if width % 2 or height % 2:
        raise ValueError("C420 needs even dimensions")
    frame_len = width * height + 2 * (width // 2) * (height // 2)
    for f in frames:
        if len(f) != frame_len:
            raise ValueError(f"frame length {len(f)} != {frame_len}")
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()
    return head + b"".join(b"FRAME\n" + f for f in frames)


def decode_y4m(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """REAL video decode, no media library: YUV4MPEG2 header parse →
    per-FRAME C420 planar split. Returns (width, height, [Y planes as
    uint8 (h, w) arrays]) — the luma stream a frame-level curation
    stage (blur/black-frame detection, scene stats) consumes. C420
    only (the overwhelmingly common layout); anything else raises."""
    if not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.index(b"\n")
    header, body = data[:nl].decode("ascii", "replace"), data[nl + 1 :]
    w = h = None
    colorspace = "C420"
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C":
            colorspace = tok
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if not colorspace.startswith("C420"):
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    frame_len = w * h + 2 * (w // 2) * (h // 2)
    lumas = []
    pos = 0
    while pos < len(body):
        # startswith with an offset — no O(clip) slice copy per frame
        if not body.startswith(b"FRAME", pos):
            raise ValueError("bad FRAME marker")
        pos = body.index(b"\n", pos) + 1  # FRAME params end at newline
        plane = body[pos : pos + frame_len]
        if len(plane) != frame_len:
            raise ValueError("truncated frame")
        lumas.append(
            np.frombuffer(plane, np.uint8, count=w * h).reshape(h, w)
        )
        pos += frame_len
    return int(w), int(h), lumas


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("luma_sum", T.LongType()),
        T.StructField("luma_min", T.IntegerType()),
        T.StructField("luma_max", T.IntegerType()),
    ]
)


def video_frame_features(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL per-frame video features as an Arrow-batched mapInPandas
    stage — the 1→N row shape of a frame-sampling pipeline
    (``frame_sample_plan`` is the JVM-side offset planner; this is the
    actual decode): one output row per frame with exact integer luma
    aggregates. Non-Y4M payloads are SKIPPED (no rows — a frame stage
    has nothing to say about a payload it cannot parse)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in VIDEO_FRAME_SCHEMA.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                if not raw.startswith(b"YUV4MPEG2"):
                    continue
                try:
                    w, h, lumas = decode_y4m(raw)
                except ValueError:
                    # truncated / non-C420 clip: skip it (same skip
                    # semantics as unrecognized payloads) rather than
                    # killing the stage
                    continue
                for fi, y in enumerate(lumas):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(fi)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["luma_sum"].append(int(y.sum(dtype=np.int64)))
                    rows["luma_min"].append(int(y.min()))
                    rows["luma_max"].append(int(y.max()))
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, VIDEO_FRAME_SCHEMA)


def synth_y4m_column(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Deterministic Y4M fixture generator (mapInPandas): per id a
    REAL C420 clip with closed-form geometry and luma —
    w = 8 + (id % 5)*2, h = 8 + ((id // 5) % 5)*2,
    n_frames = 2 + id % 4, Y[f](y, x) = (id*19 + f*61 + y*11 + x*7)
    % 256, constant chroma (id + f) % 256 — so a SQL oracle can
    reproduce the per-frame luma aggregates without touching the
    container."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = 8 + (i % 5) * 2, 8 + ((i // 5) % 5) * 2
                frames = []
                for f in range(2 + i % 4):
                    yy, xx = np.meshgrid(
                        np.arange(h), np.arange(w), indexing="ij"
                    )
                    y = ((i * 19 + f * 61 + yy * 11 + xx * 7) % 256).astype(
                        np.uint8
                    )
                    uv = np.full(
                        (h // 2) * (w // 2), (i + f) % 256, dtype=np.uint8
                    )
                    frames.append(y.tobytes() + uv.tobytes() + uv.tobytes())
                payloads.append(encode_y4m(w, h, frames))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), bin_col: payloads}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bin_col, T.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


def frame_sample_plan(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit one row
    per sampled offset (JVM-side; an actual frame decoder would be a
    mapInPandas over these offsets). Demonstrates the explode-to-frames
    shape without any media library."""
    col = F.col(bin_col)
    n_frames = F.least(
        F.greatest((F.length(col) / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return df.select(
        F.col(id_col),
        F.length(col).alias("n_bytes"),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "byte_offset_idx"),
    ).select(
        id_col,
        "n_bytes",
        "frame_idx",
        (F.col("byte_offset_idx") * every_n_bytes).alias("byte_offset"),
    )


RESIZED_REAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("weighted_sum", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
    ]
)


def resize_image(
    df: DataFrame,
    target_width: int = 4,
    target_height: int = 4,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL image resize as an Arrow-batched ``mapInPandas`` stage —
    the stub retired for PNG inputs: decode (zlib inflate + unfilter),
    NEAREST-NEIGHBOR resample to the target geometry with pure integer
    source indexing (sy = y·h // H, sx = x·w // W — exactly the
    arithmetic a SQL oracle replays), and reduce to exact integer
    aggregates: pixel_sum plus a position-WEIGHTED sum
    Σ pixel·((y·W + x)·channels + c + 1) so a permuted-but-same-
    multiset resample cannot pass. Non-PNG payloads fall back to the
    declared stub row (media_type 'stub'), keeping mixed corpora
    flowing.

    Scale: bounded output row size regardless of input payload
    (the resize-stage property that makes the downstream shuffle
    plannable at 100 TB); only (id, payload) crosses the Arrow
    boundary."""
    tw, th = int(target_width), int(target_height)
    if tw < 1 or th < 1:
        raise ValueError(
            f"resize_image: target geometry must be >= 1x1 (got {tw}x{th})"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in RESIZED_REAL_SCHEMA.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                rows["doc_id"].append(int(doc_id))
                decoded = None
                if raw[:8] == _PNG_SIG:
                    try:
                        decoded = decode_png(raw)
                    except ValueError:
                        decoded = None
                if decoded is not None:
                    w, h, c, px = decoded
                    sy = (np.arange(th, dtype=np.int64) * h) // th
                    sx = (np.arange(tw, dtype=np.int64) * w) // tw
                    out = px.reshape(h, w, c)[sy][:, sx]
                    weights = (
                        (
                            np.arange(th * tw * c, dtype=np.int64)
                        ).reshape(th, tw, c)
                        + 1
                    )
                    rows["media_type"].append("png")
                    rows["src_width"].append(w)
                    rows["src_height"].append(h)
                    rows["width"].append(tw)
                    rows["height"].append(th)
                    rows["channels"].append(c)
                    rows["pixel_sum"].append(
                        int(out.sum(dtype=np.int64))
                    )
                    rows["weighted_sum"].append(
                        int((out.astype(np.int64) * weights).sum())
                    )
                    rows["n_pixels"].append(th * tw * c)
                else:
                    w, h, c, _feat = _fake_decode(raw)
                    rows["media_type"].append("stub")
                    rows["src_width"].append(w)
                    rows["src_height"].append(h)
                    rows["width"].append(tw)
                    rows["height"].append(th)
                    rows["channels"].append(c)
                    rows["pixel_sum"].append(0)
                    rows["weighted_sum"].append(0)
                    rows["n_pixels"].append(0)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, RESIZED_REAL_SCHEMA)


def _ahash_schema(id_field: T.StructField) -> T.StructType:
    """image_ahash output schema, built around the CALLER's id column
    (name + type preserved — the module convention; a custom id_col is
    no longer silently renamed to doc_id)."""
    return T.StructType(
        [
            id_field,
            T.StructField("media_type", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("ahash_w0", T.LongType()),
            T.StructField("ahash_w1", T.LongType()),
        ]
    )


def image_ahash(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 8,
) -> DataFrame:
    """PERCEPTUAL AVERAGE-HASH (aHash) over the REAL PNG decode — the
    image-dedup fingerprint: byte-identical images are a tiny subset
    of visually-identical ones (re-encodes, brightness shifts), so
    training-data image dedup groups by a perceptual hash, not md5.

    Per image: real decode (zlib inflate + unfilter) → integer
    grayscale g = (r+g+b)//3 (channel 0 as-is for grey; alpha
    ignored) → ``grid``×``grid`` nearest-neighbor sample with the
    resize_image index arithmetic (sy = y·h // grid, sx = x·w //
    grid) → integer floor mean over the grid → bit(y,x) = 1 iff
    sample > mean → bits packed 32/long in row-major bit order
    (exact power-of-two sums, the binarize convention; grid=8 →
    exactly two words).

    EXACT brightness invariance, not approximate: adding d to every
    channel shifts each integer grayscale by exactly d ((r+g+b+3d)//3
    = g+d) and the floor mean by exactly d (floor(Σ(g+d)/64) =
    mean+d), so every strict comparison — and the hash — is unchanged.
    Hashes are therefore equal across brightness variants and stable
    under re-encodes, while any structural edit flips bits.

    Non-PNG payloads fall back to the declared stub row
    (media_type 'stub', zero hash) so mixed corpora keep flowing.

    Scale: one Arrow ``mapInPandas`` stage, bounded output row
    (id + 2 longs) regardless of payload size — grouping/joining on
    the hash downstream shuffles fingerprints, never pixels."""
    g = int(grid)
    if g < 1 or g * g > 64:
        raise ValueError(
            f"image_ahash: grid must be in [1, 8] so the hash packs "
            f"into two longs (got {g})"
        )

    out_schema = _ahash_schema(df.schema[id_col])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in out_schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                rows[id_col].append(doc_id)
                decoded = None
                if raw[:8] == _PNG_SIG:
                    try:
                        decoded = decode_png(raw)
                    except ValueError:
                        decoded = None
                if decoded is None:
                    rows["media_type"].append("stub")
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["ahash_w0"].append(0)
                    rows["ahash_w1"].append(0)
                    continue
                w, h, c, px = decoded
                px = px.reshape(h, w, c).astype(np.int64)
                if c >= 3:
                    gray = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
                else:
                    gray = px[:, :, 0]
                sy = (np.arange(g, dtype=np.int64) * h) // g
                sx = (np.arange(g, dtype=np.int64) * w) // g
                samp = gray[sy][:, sx]
                mean = int(samp.sum(dtype=np.int64)) // (g * g)
                bits = (samp > mean).astype(np.int64).ravel()  # row-major
                idx = np.arange(g * g, dtype=np.int64)
                w0 = int((bits * np.where(idx < 32, 1 << (idx % 32), 0)).sum())
                w1 = int(
                    (bits * np.where(idx >= 32, 1 << (idx % 32), 0)).sum()
                )
                rows["media_type"].append("png")
                rows["width"].append(w)
                rows["height"].append(h)
                rows["ahash_w0"].append(w0)
                rows["ahash_w1"].append(w1)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, out_schema)


def synth_png_variant_column(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    group_size: int = 4,
) -> DataFrame:
    """Deterministic NEAR-DUP PNG fixture generator: every
    ``group_size`` consecutive ids share one base image (geometry and
    pixels closed-form in base = id // group_size: the
    synth_png_column gradient plus a base-keyed bilinear term
    (y·x·(1 + base%7)) % 97 — pure gradients all threshold to the
    same half-plane bit pattern, so distinct bases need distinct
    STRUCTURE, not just offsets — held to %250) and each
    variant adds a per-id brightness shift of id % group_size — so
    the group's payloads are byte-DIFFERENT (md5 dedup fails) but
    perceptually identical (image_ahash groups them exactly, by the
    documented invariance). A SQL oracle reproduces the hashes from
    the formula alone."""
    gs = int(group_size)
    if gs < 1:
        raise ValueError(
            f"synth_png_variant_column: group_size must be >= 1 (got {gs})"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                base, shift = i // gs, i % gs
                w, h = 8 + base % 9, 8 + (base // 9) % 9
                yy, xx, cc = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = (
                    (
                        base * 31
                        + yy * 7
                        + xx * 3
                        + cc * 11
                        + (yy * xx * (1 + base % 7)) % 97
                    )
                    % 250
                    + shift
                ).astype(np.uint8)
                payloads.append(encode_png(w, h, px.tobytes()))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), bin_col: payloads}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bin_col, T.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


_PHASH_SCALE = 1 << 14


def phash_cos_table(n: int = 32, k: int = 8) -> list[list[int]]:
    """Fixed-point DCT-II cosine table: C[u][x] =
    round(cos(π·(2x+1)·u / 2n) · 2^14) — the INTEGER basis both the
    numpy hasher and the SQL oracle multiply by, so the transform is
    exact in int64 on both engines (no float DCT to diverge in the
    last ulp). Rounded rows for u > 0 sum to EXACTLY 0 (the ±cos
    pairs survive rounding with equal magnitudes), which makes every
    AC coefficient — hence the hash, which excludes DC — exactly
    invariant to a constant brightness shift."""
    import math

    return [
        [
            round(math.cos(math.pi * (2 * x + 1) * u / (2 * n)) * _PHASH_SCALE)
            for x in range(n)
        ]
        for u in range(k)
    ]


def _phash_schema(id_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            id_field,
            T.StructField("media_type", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("phash", T.LongType()),
        ]
    )


def image_phash(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    sample: int = 32,
    block: int = 8,
) -> DataFrame:
    """DCT PERCEPTUAL HASH (pHash) over the real PNG decode — the
    frequency-domain sibling of ``image_ahash``: aHash thresholds
    spatial samples (cheap, fooled by smooth gradients), pHash
    thresholds the image's LOW-FREQUENCY DCT coefficients, the
    standard robust fingerprint for scaled/re-encoded image dedup.

    Per image: real decode → integer grayscale (the image_ahash
    convention) → ``sample``×``sample`` nearest-neighbor grid →
    2-D DCT-II as two int64 matrix products with the fixed-point
    ``phash_cos_table`` basis (scale 2^14 — max |coeff| <
    32·255·2^28 ≈ 2^41, no overflow) → keep the top-left
    ``block``×``block`` coefficients, DROP the DC term → bit = coeff
    > lower-median of the remaining 63 → packed row-major into ONE
    long (bit i−1 for flat index i). Integer end-to-end: the oracle
    replays the identical arithmetic in SQL from the synthetic pixel
    formula, and a constant brightness shift provably cannot change
    any bit (AC basis rows sum to exactly 0).

    Non-PNG payloads fall back to the declared stub row (media_type
    'stub', zero hash), matching image_ahash.

    Scale: one Arrow ``mapInPandas`` stage; per-image work is two
    (8×32)·(32×32) integer matmuls; output is id + one long —
    downstream grouping shuffles fingerprints, never pixels."""
    n, k = int(sample), int(block)
    if k * k - 1 > 64:
        raise ValueError(
            f"image_phash: block {k} needs {k * k - 1} bits > 64"
        )
    ctab = np.array(phash_cos_table(n, k), dtype=np.int64)  # (k, n)
    out_schema = _phash_schema(df.schema[id_col])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {f.name: [] for f in out_schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                rows[id_col].append(doc_id)
                decoded = None
                if raw[:8] == _PNG_SIG:
                    try:
                        decoded = decode_png(raw)
                    except ValueError:
                        decoded = None
                if decoded is None:
                    rows["media_type"].append("stub")
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["phash"].append(0)
                    continue
                w, h, c, px = decoded
                px = px.reshape(h, w, c).astype(np.int64)
                if c >= 3:
                    gray = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
                else:
                    gray = px[:, :, 0]
                sy = (np.arange(n, dtype=np.int64) * h) // n
                sx = (np.arange(n, dtype=np.int64) * w) // n
                samp = gray[sy][:, sx]  # (n, n) int64
                coeffs = ctab @ samp @ ctab.T  # (k, k) exact int64
                flat = coeffs.ravel()[1:]  # drop DC, row-major
                med = int(np.sort(flat)[(flat.size - 1) // 2])  # lower median
                bits = (flat > med).astype(np.int64)
                ph = int(
                    (bits * (np.int64(1) << np.arange(flat.size, dtype=np.int64))).sum()
                )
                rows["media_type"].append("image/png")
                rows["width"].append(int(w))
                rows["height"].append(int(h))
                rows["phash"].append(ph)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, out_schema)


def image_phash_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    bits: int = 63,
) -> DataFrame:
    """Near-duplicate IMAGE pairs — pHash Hamming distance ≤
    ``max_hamming`` via the EXACT pigeonhole equi-join: where
    ``image_phash`` + group-by catches byte-identical fingerprints
    only, this catches re-encodes/slight crops whose 63-bit DCT
    fingerprints differ in a few bits (the standard image-dedup
    query; the ``simhash_pairs`` shape applied to the pHash family).

    Pigeonhole: the 63-bit hash splits into ``max_hamming + 1``
    disjoint segments; two hashes within the distance agree on at
    least one segment, so candidates come from an equi-join on
    (segment_index, masked_value) — a hash-partitioned shuffle, never
    a cartesian — and the exact ``bit_count(xor)`` filter keeps true
    pairs. Recall is 1.0 by construction (no LSH slack).

    Output: (id_a, id_b, hamming), canonical id_a < id_b.

    Undecodable payloads (media_type 'stub', hash 0) are excluded —
    they would all collide in one bucket and pair with each other
    meaninglessly.

    Scale: fingerprints (id + one long) shuffle, never pixels; per
    segment bucket the expected candidates grow as
    N²/2^(bits/(max_hamming+1)) — at web-crawl image counts widen the
    fingerprint BEFORE narrowing the distance:
    ``image_phash_pairs_wide`` runs the same pigeonhole over a
    255-bit (block=16) array-of-longs fingerprint whose segments are
    36-37 bits each, so the narrow-segment warning below never
    applies to it (VERDICT r15 #1; candidate-volume A/B in
    ``PHASH_PROBE.json``)."""
    n_seg = int(max_hamming) + 1
    if int(bits) // n_seg < 12:
        import warnings

        warnings.warn(
            f"image_phash_pairs: {bits}-bit hash over {n_seg} pigeonhole "
            f"segments leaves ~{int(bits) // n_seg}-bit buckets — expected "
            f"candidates grow as N²/2^{int(bits) // n_seg} and blow up at "
            f"corpus scale (the simhash_pairs measured failure mode); use "
            f"image_phash_pairs_wide (255-bit fingerprint, 36+-bit "
            f"segments) for web-crawl image counts",
            stacklevel=2,
        )
    sig = (
        image_phash(df, bin_col=bin_col, id_col=id_col)
        .filter(F.col("media_type") != "stub")
        .select(id_col, "phash")
    )
    widths = [
        bits // n_seg + (1 if i < bits % n_seg else 0) for i in range(n_seg)
    ]
    segs = []
    off = 0
    for i, w in enumerate(widths):
        mask = ((1 << w) - 1) << off
        segs.append(
            F.struct(
                F.lit(i).alias("seg_idx"),
                F.col("phash").bitwiseAND(F.lit(mask)).alias("seg_val"),
            )
        )
        off += w
    # both self-join sides read the segmented frame; the lazy
    # checkpoint materializes the Arrow decode stage once, not twice
    segged = (
        sig.select(id_col, "phash", F.explode(F.array(*segs)).alias("s"))
        .select(id_col, "phash", "s.seg_idx", "s.seg_val")
        .localCheckpoint(eager=False)
    )
    a, b = segged.alias("a"), segged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= int(max_hamming))
        .dropDuplicates(["id_a", "id_b"])
    )


def phash_wide_layout(total_bits: int, n_longs: int) -> list[int]:
    """Bit widths of the wide pHash's array-of-longs packing: the
    ``total_bits`` AC coefficients split into ``n_longs`` contiguous
    near-equal slices (first ``total_bits % n_longs`` get the extra
    bit), each packed LSB-first into its own long. One slice per long
    means every pigeonhole segment is a whole array element — the
    (segment_idx, masked_value) equi-join degenerates to
    (array index, element), no cross-long bit surgery on either
    engine. Shared by the operator and the SQL oracle (the
    ``phash_cos_table`` convention)."""
    tb, n = int(total_bits), int(n_longs)
    if n < 1 or tb < n:
        raise ValueError(f"phash_wide_layout: need 1 <= n_longs <= bits ({tb=}, {n=})")
    if tb // n + (1 if tb % n else 0) > 63:
        raise ValueError(
            f"phash_wide_layout: {tb} bits over {n} longs needs "
            f"{tb // n + 1} bits in one long (> 63) — raise n_longs"
        )
    return [tb // n + (1 if i < tb % n else 0) for i in range(n)]


def image_phash_wide(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    sample: int = 32,
    block: int = 16,
    n_longs: int | None = None,
) -> DataFrame:
    """WIDE DCT perceptual hash — ``image_phash`` past its 64-bit
    single-long ceiling (VERDICT r15 #1): the identical integer
    pipeline (real PNG decode → ``sample``×``sample`` nearest grid →
    exact fixed-point 2-D DCT-II → top-left ``block``×``block``
    coefficients minus DC → lower-median threshold) with the
    block²−1 bits (255 at the default block=16) packed ROW-MAJOR into
    an ``array<long>`` laid out by ``phash_wide_layout`` — so the
    pigeonhole segments of ``image_phash_pairs_wide`` are 36-37 bits
    instead of 9, and candidate volume at a distance cap stops being
    a corpus-scale hazard (N²/2³⁶ vs N²/2⁹ per segment).

    Brightness invariance carries over exactly: every u>0 row of the
    rounded cosine table sums to 0 (verified for k=16 at build time),
    so a constant shift cannot move any AC coefficient or the median.

    ``n_longs`` defaults to ceil(bits/63) (the repo's 63-bit-per-long
    pack convention); ``image_phash_pairs_wide`` passes
    max(max_hamming+1, that) so each segment IS one array element.
    Non-PNG payloads fall back to the stub row (all-zero longs).

    Scale: one Arrow ``mapInPandas`` stage, two (16×32)·(32×32)
    integer matmuls per image; output is id + n_longs longs —
    downstream joins shuffle fingerprints, never pixels."""
    n, k = int(sample), int(block)
    total_bits = k * k - 1
    nl = int(n_longs) if n_longs is not None else -(-total_bits // 63)
    widths = phash_wide_layout(total_bits, nl)
    offs = [0]
    for w_ in widths[:-1]:
        offs.append(offs[-1] + w_)
    ctab = np.array(phash_cos_table(n, k), dtype=np.int64)  # (k, n)
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("media_type", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("phash", T.ArrayType(T.LongType())),
        ]
    )
    shifts = [
        np.int64(1) << np.arange(w_, dtype=np.int64) for w_ in widths
    ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {f.name: [] for f in out_schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                rows[id_col].append(doc_id)
                decoded = None
                if raw[:8] == _PNG_SIG:
                    try:
                        decoded = decode_png(raw)
                    except ValueError:
                        decoded = None
                if decoded is None:
                    rows["media_type"].append("stub")
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["phash"].append([0] * nl)
                    continue
                w, h, c, px = decoded
                px = px.reshape(h, w, c).astype(np.int64)
                if c >= 3:
                    gray = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
                else:
                    gray = px[:, :, 0]
                sy = (np.arange(n, dtype=np.int64) * h) // n
                sx = (np.arange(n, dtype=np.int64) * w) // n
                samp = gray[sy][:, sx]  # (n, n) int64
                coeffs = ctab @ samp @ ctab.T  # (k, k) exact int64
                flat = coeffs.ravel()[1:]  # drop DC, row-major
                med = int(np.sort(flat)[(flat.size - 1) // 2])
                bits = (flat > med).astype(np.int64)
                rows["phash"].append(
                    [
                        int((bits[off : off + w_] * sh).sum())
                        for off, w_, sh in zip(offs, widths, shifts)
                    ]
                )
                rows["media_type"].append("image/png")
                rows["width"].append(int(w))
                rows["height"].append(int(h))
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, out_schema)


def image_phash_pairs_wide(
    df: DataFrame,
    max_hamming: int = 6,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    sample: int = 32,
    block: int = 16,
) -> DataFrame:
    """Near-duplicate image pairs over the WIDE (255-bit) pHash — the
    ``image_phash_pairs`` pigeonhole with the fingerprint widened
    instead of the distance narrowed (VERDICT r15 #1): the hash is
    laid out as max(max_hamming+1, ceil(bits/63)) longs
    (``phash_wide_layout``), every pigeonhole segment is EXACTLY one
    array element, and two hashes within the distance still must
    agree on at least one segment (differing bits touch at most
    max_hamming of the ≥ max_hamming+1 segments) — so candidates come
    from an equi-join on (segment_idx, segment_long), recall 1.0 by
    construction, and per-segment buckets are 2³⁶-deep instead of
    2⁹-deep (measured A/B in ``PHASH_PROBE.json``).

    Output: (id_a, id_b, hamming), canonical id_a < id_b, exact
    Hamming = Σ_j bit_count(xor(a[j], b[j])). Stubs excluded.

    Scale: fingerprints (id + ~7 longs) shuffle, never pixels; the
    join is a hash-partitioned equi-join, never a cartesian; extra
    segments only ever LOOSEN recall slack (already 1.0), so the
    ceil(bits/63) floor is free."""
    d = int(max_hamming)
    total_bits = int(block) * int(block) - 1
    n_seg = max(d + 1, -(-total_bits // 63))
    sig = (
        image_phash_wide(
            df, bin_col=bin_col, id_col=id_col, sample=sample,
            block=block, n_longs=n_seg,
        )
        .filter(F.col("media_type") != "stub")
        .select(id_col, "phash")
    )
    segged = (
        sig.select(
            id_col, "phash", F.posexplode("phash").alias("seg_idx", "seg_val")
        )
        .localCheckpoint(eager=False)
    )
    a, b = segged.alias("a"), segged.alias("b")
    hamming = F.aggregate(
        F.zip_with(
            F.col("a.phash"),
            F.col("b.phash"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= d)
        .dropDuplicates(["id_a", "id_b"])
    )


def synth_y4m_scenes_column(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Deterministic MULTI-SCENE Y4M fixture (mapInPandas): the
    ``synth_y4m_column`` geometry (w = 8 + (id % 5)·2,
    h = 8 + ((id // 5) % 5)·2) with n_frames = 4 + id % 3 and the luma
    pattern switching per SCENE instead of per frame —
    scene s = f // L with scene length L = 1 + id % 3,
    Y[f](y, x) = (id·19 + s·97 + y·11 + x·7) % 256, constant chroma.
    Consecutive frames inside a scene are bit-identical (diff 0);
    frames across a scene boundary differ everywhere — the ground
    truth a scene-cut detector must reproduce, and a SQL oracle can
    replay from the formula alone."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h = 8 + (i % 5) * 2, 8 + ((i // 5) % 5) * 2
                nf, scene_len = 4 + i % 3, 1 + i % 3
                frames = []
                for f in range(nf):
                    s = f // scene_len
                    yy, xx = np.meshgrid(
                        np.arange(h), np.arange(w), indexing="ij"
                    )
                    y = ((i * 19 + s * 97 + yy * 11 + xx * 7) % 256).astype(
                        np.uint8
                    )
                    uv = np.full(
                        (h // 2) * (w // 2), (i + s) % 256, dtype=np.uint8
                    )
                    frames.append(y.tobytes() + uv.tobytes() + uv.tobytes())
                payloads.append(encode_y4m(w, h, frames))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), bin_col: payloads}
            )

    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(bin_col, T.BinaryType())]
    )
    return df.select(id_col).mapInPandas(batches, out_schema)


def synth_y4m_variant_column(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    group_size: int = 2,
) -> DataFrame:
    """Deterministic NEAR-DUP multi-scene Y4M fixture: every
    ``group_size`` consecutive ids share one base video (geometry,
    frame count, scene length and luma STRUCTURE all closed-form in
    base = id // group_size — the ``synth_y4m_scenes_column`` formulas
    with the luma pattern held to %250) and each variant adds a
    per-id brightness shift of id % group_size, so payloads are
    byte-DIFFERENT (md5 dedup fails) but every frame pair's |diff| is
    shift-invariant (same scene cuts) and every keyframe's DCT hash
    is identical (AC basis rows sum to exactly 0) — the ground truth
    ``video_keyframe_signature`` dedup must reproduce, replayable in
    SQL from the formula alone."""
    gs = int(group_size)
    if gs < 1:
        raise ValueError(
            f"synth_y4m_variant_column: group_size must be >= 1 (got {gs})"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                base, shift = i // gs, i % gs
                w, h = 8 + (base % 5) * 2, 8 + ((base // 5) % 5) * 2
                nf, scene_len = 4 + base % 3, 1 + base % 3
                frames = []
                for f in range(nf):
                    s = f // scene_len
                    yy, xx = np.meshgrid(
                        np.arange(h), np.arange(w), indexing="ij"
                    )
                    y = (
                        (base * 19 + s * 97 + yy * 11 + xx * 7) % 250 + shift
                    ).astype(np.uint8)
                    uv = np.full(
                        (h // 2) * (w // 2), (base + s) % 256, dtype=np.uint8
                    )
                    frames.append(y.tobytes() + uv.tobytes() + uv.tobytes())
                payloads.append(encode_y4m(w, h, frames))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), bin_col: payloads}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bin_col, T.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


def synth_y4m_tail_variant_column(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    group_size: int = 3,
) -> DataFrame:
    """Deterministic Y4M fixture with BOTH accept- and reject-path
    near-dup candidates for ``video_keyframe_pairs``: every
    ``group_size`` consecutive ids share one base video (the
    ``synth_y4m_variant_column`` geometry/scene formulas, luma held to
    %250). Variant 0 is the base, variant 1 adds a +1 brightness shift
    (every per-frame diff and every AC DCT coefficient is PROVABLY
    shift-invariant → all keyframe hashes identical, pair Hamming 0),
    and variant 2 replaces the LAST scene's luma pattern with
    pattern + 131 (inside the %250) — earlier scenes stay
    bit-identical to the base (an exact shared keyframe → the pair IS
    a candidate) while the last keyframe hashes differently, so the
    per-keyframe Hamming verify decides the pair. Scene structure is
    provably preserved: within a scene frames stay identical, and at
    the boundary into the divergent last scene every pixel diff is
    exactly 22 or 228 (228 ≡ −22 mod 250), both > the threshold-8
    mean, so the cut still fires and n_scenes matches the base.
    Every base has >= 2 scenes (nf = 4 + base % 3, sl = 1 + base % 3
    → ceil(nf/sl) ∈ {2, 3, 4}), so variant 2 always shares at least
    scene 0.

    The gradient steps VARY PER BASE (step_y = 11 + 2·(base % 97),
    step_x = 7 + 2·((base // 97) % 89)): with fixed steps the pattern
    space has period lcm(250, 75) = 750 in base, so a large corpus
    repeats bit-identical videos and pair counts grow QUADRATICALLY
    from content collisions — a fixture artifact the 20× scale probe
    caught, not a plan property. Per-base steps widen the space
    ~8,600× so planted pairs stay id-local at probe scales. The cut
    proofs are step-independent (scene deltas are luma-constant
    shifts). Closed-form in the id — a SQL oracle replays cuts,
    keyframes and the integer DCT from the luma formula alone."""
    gs = int(group_size)
    if gs < 1:
        raise ValueError(
            f"synth_y4m_tail_variant_column: group_size must be >= 1 "
            f"(got {gs})"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                base, variant = i // gs, i % gs
                w, h = 8 + (base % 5) * 2, 8 + ((base // 5) % 5) * 2
                nf, scene_len = 4 + base % 3, 1 + base % 3
                sy, sx = 11 + 2 * (base % 97), 7 + 2 * ((base // 97) % 89)
                shift = 1 if variant == 1 else 0
                last_scene = (nf - 1) // scene_len
                frames = []
                for f in range(nf):
                    s = f // scene_len
                    tail = 131 if (variant >= 2 and s == last_scene) else 0
                    yy, xx = np.meshgrid(
                        np.arange(h), np.arange(w), indexing="ij"
                    )
                    y = (
                        (base * 19 + s * 97 + tail + yy * sy + xx * sx) % 250
                        + shift
                    ).astype(np.uint8)
                    uv = np.full(
                        (h // 2) * (w // 2), (base + s) % 256, dtype=np.uint8
                    )
                    frames.append(y.tobytes() + uv.tobytes() + uv.tobytes())
                payloads.append(encode_y4m(w, h, frames))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), bin_col: payloads}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(bin_col, T.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


def video_keyframe_signature(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    threshold: float = 8.0,
    sample: int = 32,
    block: int = 8,
) -> DataFrame:
    """VIDEO-LEVEL near-dup fingerprint — the whole-clip signature the
    image/audio dedup family was missing: real Y4M decode → scene
    boundaries (the ``video_scene_cuts`` mean-|luma diff| > threshold
    rule) → ONE keyframe per scene (its first frame) → each keyframe's
    63-bit DCT pHash over the luma plane (the exact ``image_phash``
    integer pipeline: ``sample``×``sample`` nearest grid, fixed-point
    cosine table, ``block``×``block`` AC block, lower-median
    threshold) → the ordered hashes joined into one signature string.
    Re-encoded / brightness-shifted copies of a video share the
    signature exactly (per-frame diffs and every AC coefficient are
    shift-invariant); videos differing in any scene's CONTENT or in
    scene COUNT do not.

    Output: one row per decodable clip — (id, n_scenes,
    keyframe_sig); dedup groups key on both (the ``audio_fingerprint``
    convention). Undecodable payloads are dropped (a corrupt clip has
    no scenes to sign).

    Scale: ONE Arrow ``mapInPandas`` stage with clip-bounded state
    (frames × pixels per clip; clips are the parallelism unit) — cut
    detection, keyframe hashing and signature assembly are all
    clip-local, so only (id, int, string) rows ever shuffle. Cite:
    scene rule = ``video_scene_cuts``; hash = ``image_phash``."""
    n, k = int(sample), int(block)
    if k * k - 1 > 64:
        raise ValueError(
            f"video_keyframe_signature: block {k} needs {k * k - 1} bits > 64"
        )
    thr = float(threshold)
    ctab = np.array(phash_cos_table(n, k), dtype=np.int64)  # (k, n)
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("n_scenes", T.IntegerType()),
            T.StructField("keyframe_sig", T.StringType()),
        ]
    )

    def _hash_luma(luma: np.ndarray) -> int:
        h, w = luma.shape
        sy = (np.arange(n, dtype=np.int64) * h) // n
        sx = (np.arange(n, dtype=np.int64) * w) // n
        samp = luma.astype(np.int64)[sy][:, sx]
        coeffs = ctab @ samp @ ctab.T
        flat = coeffs.ravel()[1:]
        med = int(np.sort(flat)[(flat.size - 1) // 2])
        bits = (flat > med).astype(np.int64)
        return int(
            (bits * (np.int64(1) << np.arange(flat.size, dtype=np.int64))).sum()
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {f.name: [] for f in out_schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                frames = None
                if raw[:9] == b"YUV4MPEG2":
                    try:
                        w, h, frames = decode_y4m(raw)
                    except ValueError:
                        frames = None
                if not frames:
                    continue  # undecodable/empty: no scenes to sign
                npix = w * h
                hashes = [_hash_luma(frames[0])]
                for f in range(1, len(frames)):
                    diff = int(
                        np.abs(
                            frames[f].astype(np.int64)
                            - frames[f - 1].astype(np.int64)
                        ).sum()
                    )
                    if diff > thr * npix:  # the video_scene_cuts rule
                        hashes.append(_hash_luma(frames[f]))
                rows[id_col].append(doc_id)
                rows["n_scenes"].append(len(hashes))
                rows["keyframe_sig"].append(":".join(str(x) for x in hashes))
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, out_schema)


def video_keyframe_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    threshold: float = 8.0,
    sample: int = 32,
    block: int = 8,
) -> DataFrame:
    """FUZZY near-duplicate VIDEO pairs — per-keyframe pHash Hamming
    verify over exact-keyframe candidates (VERDICT r16 #2: the video
    family keyed dedup on the exact joined signature string, so one
    re-encoded scene's few flipped DCT bits broke the group). Two
    videos pair when they have EQUAL scene counts, EVERY aligned
    keyframe pair is within ``max_hamming`` bits, and at least one
    aligned keyframe hash matches EXACTLY — the candidate contract.

    CANDIDATE semantics (documented, like the LSH pair ops): blocking
    is the equi-join on (n_scenes, scene_idx, keyframe_hash), so a
    pair whose EVERY keyframe drifted (no exact shared scene) is not
    emitted — recall is heuristic by design, the price of never
    comparing all video pairs; the per-scene pigeonhole bound says a
    missed pair has >= n_scenes single-bit drifts, i.e. distance >=
    n_scenes, which the ``max_hamming`` budget usually excludes
    anyway for short videos.

    Output: (id_a, id_b, n_scenes, max_scene_hamming), canonical
    id_a < id_b; ``max_scene_hamming`` is the largest aligned-keyframe
    Hamming distance (0 for exact re-encodes/brightness shifts).

    Scale: decode + cut detection + keyframe hashing is the ONE Arrow
    stage of ``video_keyframe_signature`` (clip-bounded state), pinned
    once (``localCheckpoint``) and shared by the exploded candidate
    join and both verify sides; only (id, int, hash) rows ever
    shuffle — pixels never leave the Arrow stage. Candidates come
    from a hash-partitioned equi-join on 63-bit hashes (bucket depth
    N²/2⁶³ per scene slot — no narrow-segment hazard), never a
    cartesian."""
    sig = (
        video_keyframe_signature(
            df,
            bin_col=bin_col,
            id_col=id_col,
            threshold=threshold,
            sample=sample,
            block=block,
        )
        .select(
            id_col,
            "n_scenes",
            F.transform(
                F.split("keyframe_sig", ":"), lambda s: s.cast("long")
            ).alias("__hashes"),
        )
        .localCheckpoint(eager=False)
    )
    ex = sig.select(
        id_col, "n_scenes", F.posexplode("__hashes").alias("scene_idx", "__h")
    )
    a, b = ex.alias("a"), ex.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.n_scenes") == F.col("b.n_scenes"))
            & (F.col("a.scene_idx") == F.col("b.scene_idx"))
            & (F.col("a.__h") == F.col("b.__h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        "n_scenes",
        F.col("__hashes").alias("__ha"),
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"), F.col("__hashes").alias("__hb")
    )
    max_h = F.array_max(
        F.zip_with(
            F.col("__ha"),
            F.col("__hb"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("int"),
        )
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", "n_scenes", max_h.alias("max_scene_hamming"))
        .filter(F.col("max_scene_hamming") <= int(max_hamming))
    )


def video_scene_cuts(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    threshold: float = 8.0,
) -> DataFrame:
    """SCENE-CUT detection over the real Y4M decode — the shot
    segmentation stage a video curation pipeline runs before frame
    sampling (one representative frame per scene beats every-Nth-frame
    when shots vary in length). Per consecutive frame pair, the exact
    integer sum of absolute luma differences; a pair is a cut when the
    MEAN absolute difference exceeds ``threshold`` (diff_sum >
    threshold · n_pixels — evaluated in integers-vs-double once, no
    per-pixel floats).

    Output: one row per consecutive pair — (id_col, frame_idx of the
    LATER frame, n_pixels, diff_sum, is_cut); single-frame clips yield
    no rows. Non-Y4M payloads fall back to the stub row (frame_idx 0,
    zero diff, media_type marker dropped — is_cut false).

    Scale: one Arrow ``mapInPandas`` stage, per-clip work linear in
    pixels×frames; output is frames-1 rows of five scalars per clip —
    downstream scene grouping shuffles cut flags, never pixels."""
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_pixels", T.IntegerType()),
            T.StructField("diff_sum", T.LongType()),
            T.StructField("is_cut", T.BooleanType()),
        ]
    )
    thr = float(threshold)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {f.name: [] for f in out_schema.fields}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                frames = None
                if raw[:9] == b"YUV4MPEG2":
                    try:
                        w, h, frames = decode_y4m(raw)
                    except ValueError:
                        frames = None
                if frames is None:
                    rows[id_col].append(doc_id)
                    rows["frame_idx"].append(0)
                    rows["n_pixels"].append(0)
                    rows["diff_sum"].append(0)
                    rows["is_cut"].append(False)
                    continue
                npix = w * h
                lumas = [fr.astype(np.int64) for fr in frames]  # (h, w)
                for f in range(1, len(lumas)):
                    dsum = int(np.abs(lumas[f] - lumas[f - 1]).sum())
                    rows[id_col].append(doc_id)
                    rows["frame_idx"].append(f)
                    rows["n_pixels"].append(npix)
                    rows["diff_sum"].append(dsum)
                    rows["is_cut"].append(dsum > thr * npix)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(batches, out_schema)
