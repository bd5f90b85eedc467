"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata struct.
The Spark-side plumbing — schema, Arrow batching, mapInPandas signatures,
partition sizing — is real and tested; the codec step is stubbed because
image/audio libraries are not in this container:

- decode_stub raises NotImplementedError when strict=True (the marked
  integration point for PIL/ffmpeg at deploy time),
- with strict=False it produces a deterministic fake decode (dimensions +
  histogram derived from the bytes), so the downstream feature pipeline is
  exercised end-to-end.

Batch shape notes for 100 TB: binary payloads dominate row size, so
`spark.sql.files.maxPartitionBytes` should be sized for ~100-200 MB of
payload per task and `maxRecordsPerBatch` kept low (256-1024) to bound
Arrow batch memory; the metadata-only projections never touch the binary
column (column pruning drops it at the parquet scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("url string, media_type string, n_bytes long, "
                "width int, height int, format string, feature array<float>")

N_FEATURE_BINS = 16


def attach_media(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Treat a binary column as an opaque media payload + typed metadata."""
    return df.select(
        "url",
        F.col(payload_col).alias("payload"),
        F.lit("image/stub").alias("media_type"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )


def _fake_decode(buf: bytes) -> tuple[int, int, str, np.ndarray]:
    """Deterministic fake decode: dims from byte length, feature = byte
    histogram (16 bins, L1-normalized). Stands in for a real codec."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    width = int(16 + (len(buf) % 241))
    height = int(16 + (len(buf) % 199))
    hist, _ = np.histogram(arr, bins=N_FEATURE_BINS, range=(0, 256))
    total = max(int(hist.sum()), 1)
    return width, height, "stub", (hist / total).astype(np.float32)


def decode_features(df: DataFrame, strict: bool = False,
                    batch_hint: int = 512) -> DataFrame:
    """mapInPandas decode/feature-extract over binary payloads.

    strict=True: the real-codec integration point — raises
    NotImplementedError (no image/audio libs in this container).
    strict=False: deterministic fake decode; every downstream piece
    (schema, batching, feature vectors) is production-shaped.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; deploy-time "
                    "integration point (see operators/multimodal.py)")
            out = {"url": pdf["url"], "media_type": pdf["media_type"],
                   "n_bytes": pdf["n_bytes"]}
            decoded = [_fake_decode(b) for b in pdf["payload"]]
            out["width"] = pd.Series([d[0] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d[1] for d in decoded], dtype="int32")
            out["format"] = pd.Series([d[2] for d in decoded])
            out["feature"] = pd.Series([d[3] for d in decoded])
            yield pd.DataFrame(out)

    return df.mapInPandas(decode_batches, MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10,
                 ts_col: str = "warc_epoch") -> DataFrame:
    """Deterministic frame/sample selection over a media stream analogue:
    keep rows whose timestamp bucket hits the sampling phase (pure JVM)."""
    return df.where(F.pmod(F.col(ts_col), F.lit(every_n)) == 0)


def resize_features(df: DataFrame, out_dim: int = 8) -> DataFrame:
    """'Resize' = average-pool the feature vector to out_dim (JVM-side
    array algebra; the imresize analogue for feature space,
    cf. reference lib/raster_array_tools.py:766-979)."""
    factor = N_FEATURE_BINS // out_dim
    pooled = F.expr(
        f"transform(sequence(0, {out_dim - 1}), i -> "
        f"aggregate(slice(feature, i * {factor} + 1, {factor}), "
        f"cast(0.0 as float), (acc, x) -> acc + x) / {factor})")
    return df.withColumn("feature_pooled", pooled)
