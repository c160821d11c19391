"""Round-11 additions: ADVICE regression fixes (gini int64 overflow,
mips_ivf_topk empty input, holt_linear window validation) plus the
round's new operators.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_etl_spark import operators as ops

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_gini_rank_value_product_survives_int64(spark):
    """ADVICE r10: Σ(r·x) must not wrap int64. Two docs whose ranks
    multiply huge values past 2^63 — the decimal(38,0) product-sum
    keeps the numerator exact where a long·long sum would go negative.
    """
    big = 2**62  # r=2 -> r*x = 2^63, one past int64 max
    df = spark.createDataFrame(
        [("a", 1), ("b", big)], "doc_id string, v long"
    )
    row = ops.gini_coefficient(df, "v", "doc_id").collect()[0]
    assert row["n"] == 2 and row["total"] == big + 1
    # exact formula: G = 2*(1*1 + 2*big)/(2*(big+1)) - 3/2
    expect = 2.0 * (1 + 2 * big) / (2.0 * (big + 1)) - 1.5
    assert row["gini"] == pytest.approx(expect, abs=1e-6)
    assert row["gini"] > 0  # the int64-wrapped sum went negative here


def test_mips_ivf_topk_empty_data_raises(spark):
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="non-empty"):
        ops.mips_ivf_topk(empty, q, k=1, nlist=2, nprobe=1)


def test_holt_linear_rejects_zero_window(spark):
    df = spark.createDataFrame(
        [("u", 1, 1.0)], "user_id string, ts int, v double"
    )
    with pytest.raises(ValueError, match="window_size"):
        ops.holt_linear(df, "user_id", "ts", "v", window_size=0)
