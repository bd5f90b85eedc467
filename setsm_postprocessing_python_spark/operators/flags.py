"""Bitmask flags algebra — the engine's analogue of the reference bitmask.

Reference semantics: uint8 mask, bit 0 = EDGE, bit 1 = WATER, bit 2 = CLOUD
(lib/filter_scene.py:39-48; README bit table). Operations reproduced:
- flag computation from per-page statistics (mask_v2 predicate style,
  lib/filter_scene.py:461-679, recast to text statistics),
- bit-unset filtering: clear unselected bits, then mask>0
  (lib/scenes2strips.py:1160-1174, batch_mask.py:853-866),
- bit_or merge across members of a cell/group (lib/scenes2strips.py:691),
- mask application: value -> NULL where selected bits set
  (batch_mask.py:944-958 nodata policy, engine uses NULL never sentinels).

All pure JVM bit expressions — whole-stage codegen, no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..sql import dialect as D

BIT_EDGE = 1 << D.BIT_EDGE
BIT_WATER = 1 << D.BIT_WATER
BIT_CLOUD = 1 << D.BIT_CLOUD


def with_flags(df: DataFrame, text: str = "text", n_chars: str = "n_chars") -> DataFrame:
    """Compute the 3-bit `flags` column from page statistics."""
    return df.withColumn("flags", F.expr(D.flags_expr(D.SPARK, text, n_chars)))


def unset_bits(df: DataFrame, nowater: bool = False, nocloud: bool = False,
               flags: str = "flags") -> DataFrame:
    """Clear WATER/CLOUD bits per the reference's mask-select semantics
    (lib/scenes2strips.py:1160-1174): mask &= ~(1<<bit)."""
    keep = 0xFF
    if nowater:
        keep &= ~BIT_WATER
    if nocloud:
        keep &= ~BIT_CLOUD
    return df.withColumn(flags, F.col(flags).bitwiseAND(F.lit(keep)))


def masked(df: DataFrame, value_col: str, flags: str = "flags") -> DataFrame:
    """Apply mask: value -> NULL where any selected flag bit remains set
    (batch_mask.py:853-866 + nodata policy 944-958; NULL = nodata)."""
    return df.withColumn(
        value_col,
        F.when(F.col(flags) > 0, F.lit(None)).otherwise(F.col(value_col)),
    )


def cell_flags_merge(df: DataFrame, key: str = "cell", flags: str = "flags") -> DataFrame:
    """bit_or merge of flags across pages sharing a cell
    (lib/scenes2strips.py:691: MD = bitwise_or(MDsub, mdi)). Map-side
    partial aggregation applies (bit_or is associative/commutative)."""
    return df.groupBy(key).agg(
        F.expr(f"bit_or({flags})").alias("flags_merged"),
        F.count(F.lit(1)).alias("n_pages"),
    )
