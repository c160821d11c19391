"""Round-10 additions: real PNG codec (encode/decode, all five filter
types), decode_image's real/stub routing, exact_global_rank paths, and
the watermark-delayed threshold-alert variant's batch agreement.
"""

from __future__ import annotations

import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_etl_spark.operators import multimodal as mm

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _ref_image(w: int, h: int, channels: int, seed: int = 7) -> np.ndarray:
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(channels), indexing="ij"
    )
    return ((seed * 13 + yy * 5 + xx * 17 + cc * 29) % 256).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(channels):
    img = _ref_image(11, 7, channels)
    data = mm.encode_png(11, 7, img.tobytes())
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, c, out = mm.decode_png(data)
    assert (w, h, c) == (11, 7, channels)
    assert np.array_equal(out, img)


def _filter_scanlines(img: np.ndarray, filters: list[int]) -> bytes:
    """Reference FORWARD filterer (public PNG spec): produce the
    encoded scanline stream for a chosen per-row filter type, so the
    decoder's unfiltering of types 1-4 is tested against spec math,
    not against our own filter-0 encoder."""
    h, w, channels = img.shape
    flat = img.reshape(h, w * channels).astype(np.int64)
    stride, bpp = w * channels, channels
    out = bytearray()
    for y in range(h):
        f = filters[y]
        out.append(f)
        for i in range(stride):
            x = flat[y, i]
            a = flat[y, i - bpp] if i >= bpp else 0
            b = flat[y - 1, i] if y > 0 else 0
            c = flat[y - 1, i - bpp] if (y > 0 and i >= bpp) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((x - pred) & 0xFF)
    return bytes(out)


def test_png_decode_all_filter_types():
    img = _ref_image(9, 5, 3, seed=3)
    raw = _filter_scanlines(img, [0, 1, 2, 3, 4])

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, c, out = mm.decode_png(data)
    assert (w, h, c) == (9, 5, 3)
    assert np.array_equal(out, img)


def test_png_decode_rejects_non_png_and_bad_variants():
    with pytest.raises(ValueError):
        mm.decode_png(b"\xff\xd8\xffnot-a-png")
    img = _ref_image(4, 4, 3)
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)  # 16-bit depth

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
    with pytest.raises(ValueError):
        mm.decode_png(bad)


def test_decode_image_real_and_stub_routing(spark):
    from pyspark.sql import functions as F

    d = spark.range(6).select(F.col("id").alias("doc_id"))
    pngs = mm.synth_png_column(d, "doc_id")
    decoded = mm.decode_image(pngs).orderBy("doc_id").collect()
    assert all(r["media_type"] == "png" for r in decoded)
    for r in decoded:
        i = r["doc_id"]
        w, h = 8 + i % 9, 8 + (i // 9) % 9
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        expected = int(
            sum(
                (i * 31 + y * 7 + x * 3 + c * 11) % 256
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
        )
        assert r["pixel_sum"] == expected
        assert r["n_pixels"] == w * h * 3
    # non-PNG payload routes to the declared stub
    junk = d.select("doc_id", F.lit(b"plain-bytes").alias("payload"))
    stubbed = mm.decode_image(junk).collect()
    assert all(r["media_type"] == "stub" for r in stubbed)


def test_exact_global_rank_matches_global_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graph_etl_spark.operators import exact_global_rank

    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.length("text").alias("n_chars"))
    )
    ranked, total = exact_global_rank(
        d, "n_chars", ["n_chars", "doc_id"], out="r2", num_partitions=7
    )
    w = Window.orderBy("n_chars", "doc_id")
    expected = d.withColumn("r1", F.row_number().over(w))
    joined = ranked.join(expected, ["doc_id", "n_chars"])
    assert total == d.count()
    assert joined.filter(F.col("r1") != F.col("r2")).count() == 0


def test_negative_samples_string_ids_match_ground_truth(spark):
    """The range-partitioned zipWithIndex path (non-numeric ids) must
    equal a ground truth computed with the naive unpartitioned global
    window (fine at test scale — the thing the production path
    replaces)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from graph_etl_spark.operators import negative_samples
    from graph_etl_spark.operators.text import h56

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    sid = F.lpad(F.col("doc_id").cast("string"), 8, "0")
    ids = d.select(sid.alias("sid"))
    pairs = d.filter(F.col("doc_id") % 10 == 0).select(
        sid.alias("anchor_id"),
        F.lpad((F.col("doc_id") + 1).cast("string"), 8, "0").alias(
            "positive_id"
        ),
    ).join(ids.withColumnRenamed("sid", "positive_id"), "positive_id", "left_semi")
    got = negative_samples(pairs, ids, k=3, seed="x")
    # ground truth: single global window index + the same draw logic
    n = ids.count()
    idx = ids.select(
        F.col("sid").alias("__cid"),
        (F.row_number().over(Window.orderBy("sid")) - 1).alias("__idx"),
    )
    draws = pairs.select(
        "anchor_id",
        "positive_id",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("__j"),
    ).select(
        "*",
        (
            h56(
                F.concat_ws(
                    ":", F.lit("x"), "anchor_id", "positive_id",
                    F.col("__j").cast("string"),
                )
            )
            % F.lit(n)
        ).alias("__idx"),
    )
    w = Window.partitionBy("anchor_id", "positive_id").orderBy("__j")
    truth = (
        draws.join(idx, "__idx")
        .filter(
            (F.col("__cid") != F.col("anchor_id"))
            & (F.col("__cid") != F.col("positive_id"))
        )
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 3)
        .select(
            "anchor_id", "positive_id", "sample_rank",
            F.col("__cid").alias("negative_id"),
        )
    )
    assert got.count() > 0
    assert got.exceptAll(truth).count() == 0
    assert truth.exceptAll(got).count() == 0
