"""Deterministic synthetic pages generator (BASELINE input_hint shape).

Used for the scaling benchmark and skew fixtures: `spark.range(n)` ->
pure JVM expressions (md5 chains), so generation is distributed, seeded,
and reproducible at any scale — no external data, no driver-side loops.

Skew knob: `hot_fraction` routes that share of rows to one hot cell
(the analogue of SETSM's densely-overlapping strips), exercising the
salting / AQE-skew paths.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sql import dialect as D


def synthetic_pages(spark: SparkSession, n_rows: int,
                    partitions: int | None = None,
                    hot_fraction: float = 0.0,
                    seed: int = 42) -> DataFrame:
    """pages(url, warc_epoch, warc_ts, group_id, text, lang, n_chars)
    derived deterministically from row id. text is a seeded md5 chain
    (~180-680 chars) so text-statistics operators have real work."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism * 2)
    sid = f"cast(id + {seed} as string)"
    # deterministic pseudo-text: 5-20 md5 words, space-separated
    nwords = f"(5 + pmod(cast(conv(substr(md5(concat('nw', {sid})), 1, 8), 16, 10) as bigint), 8))"
    text = (f"array_join(transform(sequence(1, {nwords}), "
            f"i -> substr(md5(concat({sid}, '-', cast(i as string))), 1, "
            f"    cast(4 + pmod(i, 8) as int))), ' ')")
    df = df.select(
        F.expr(f"concat('https://host', cast(pmod(id, {D.HOSTS}) as string), "
               f"'.example/p/', cast(id as string))").alias("url"),
        F.expr(f"cast({D.WARC_EPOCH0} + pmod(id * 37, 86400) as bigint)").alias("warc_epoch"),
        F.expr(f"concat('host', cast(pmod(id, {D.HOSTS}) as string))").alias("group_id"),
        F.col("id").alias("doc_id"),
        F.expr(text).alias("text"),
        F.expr(f"element_at(array('en','de','fr','es','zh'), "
               f"cast(pmod(id, 5) + 1 as int))").alias("lang"),
        F.col("id").alias("_id"),
    ).withColumn("n_chars", F.length("text")) \
     .withColumn("warc_ts", F.timestamp_seconds("warc_epoch"))

    df = (df.withColumn("lat", F.expr(D.lat_expr(D.SPARK)))
            .withColumn("lon", F.expr(D.lon_expr(D.SPARK))))
    if hot_fraction > 0:
        # route a deterministic slice of rows to one hot location
        hot = F.expr(f"pmod(_id, 1000) < {int(hot_fraction * 1000)}")
        df = (df.withColumn("lat", F.when(hot, F.lit(10.0000501)).otherwise(F.col("lat")))
                .withColumn("lon", F.when(hot, F.lit(20.0000501)).otherwise(F.col("lon"))))
    return (df.drop("_id")
              .withColumn("cell_x", F.expr(D.cell_x_expr()))
              .withColumn("cell_y", F.expr(D.cell_y_expr()))
              .withColumn("cell", F.expr(D.cell_id_from_xy())))


def clustered_embeddings(spark: SparkSession, n: int = 2000, dim: int = 64,
                         n_clusters: int = 20, noise: float = 0.15,
                         seed: int = 123) -> DataFrame:
    """Deterministic CLUSTERED embedding table (vec_id, embedding) — real
    embedding spaces are clustered, and ANN recall is only meaningfully
    measurable on clustered data (on uniform random vectors every bucket
    boundary cuts true neighbors). Rows = unit centroid + Gaussian noise,
    L2-normalized; generated driver-side (bounded n for tests/bench) and
    parallelized."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, n)
    vecs = cents[assign] + noise * rng.standard_normal((n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
