"""Int8 embedding quantization — the storage/ANN compression path.

Production vector pipelines store embeddings quantized (int8 per-vector
min/max, here) and run candidate search on the small codes, reserving
float math for re-ranking — 4x less storage and memory-bandwidth at
100 TB, where embedding IO dominates ANN cost.

Everything stays in JVM whole-stage codegen: higher-order ``transform``
/ ``aggregate`` over the array column, no Python, no shuffle (the
operator is per-row map-side; only downstream stats aggregate).

Cross-engine determinism: inputs are float32 widened to float64 (exact),
the quantizer is ``floor((x - mn) * 255 / (mx - mn) + 0.5)`` — IEEE
+,-,*,/ are correctly rounded and identical on every engine, and floor
avoids the round-half-up-on-decimal-repr trap of ``round()`` — so the
int codes are bit-identical in Spark and DuckDB and fully
oracle-checkable (no tolerance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["int8_quantize", "quantize_label_stats"]


def int8_quantize(df: DataFrame, vec_col: str) -> DataFrame:
    """Add ``qvec`` (array<bigint> of 0..255 codes), ``q_mn``/``q_mx``
    (the per-vector dequantization range).

    Constant vectors (mx == mn) quantize to all-zero codes.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    mn = F.array_min(x)
    mx = F.array_max(x)
    code = lambda v: F.when(
        mx > mn, F.floor((v - mn) * 255 / (mx - mn) + F.lit(0.5))
    ).otherwise(F.lit(0)).cast("bigint")
    return df.withColumns(
        {
            "q_mn": mn,
            "q_mx": mx,
            "qvec": F.transform(x, code),
        }
    )


def quantize_label_stats(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Per-label integer checksums of the quantized codes.

    (label, n_vecs, sum_q, sum_q2) — sum and sum-of-squares of every
    code in the label group: integer-exact, order-independent, and they
    pin each code's value tightly for the oracle gate.
    """
    zero = F.lit(0).cast("bigint")
    q = int8_quantize(df, vec_col)
    return (
        q.select(
            F.col(label_col).alias("label"),
            F.aggregate("qvec", zero, lambda a, v: a + v).alias("vq"),
            F.aggregate("qvec", zero, lambda a, v: a + v * v).alias("vq2"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("vq").alias("sum_q"),
            F.sum("vq2").alias("sum_q2"),
        )
    )
