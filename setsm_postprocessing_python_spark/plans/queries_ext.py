"""Query registry #2: training-data pipeline + strip-assembly queries.

Same twin-implementation contract as plans/queries.py: each Spark
DataFrame query paired with a DuckDB oracle where SQL-expressible;
procedural operators (greedy merge order, iterative coregistration,
LSH ANN) are rows-only checked by the driver and oracle-tested against
pure-numpy implementations in tests/.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import text as T
from ..operators import dedup as DD
from ..operators import merge as M
from ..operators import similarity as SIM
from ..operators.flags import with_flags
from ..sources import pages as P
from ..sql import dialect as D

_DD = D.DUCKDB
M31 = DD.MERSENNE31


def _with_cells(body: str, extra_ctes: str = "") -> str:
    extra = f", {extra_ctes}" if extra_ctes else ""
    return f"WITH {D.geo_ctes(_DD)}{extra} {body}"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = T.with_token_stats(P.pages(spark, sf_dir))
    return df.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                     "n_tokens", "n_unique", "n_bpe", "ttr_x1000")


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = T.with_quality(P.pages(spark, sf_dir))
    return df.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                     "len_score", "div_score", "sw_score", "quality")


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = T.with_langid(P.pages(spark, sf_dir))
    return df.select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang_pred")


def q_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-bigram-profile language-ID (the n-gram heuristic variant)."""
    df = T.with_langid_ngram(P.pages(spark, sf_dir))
    return df.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                     "lang_pred_ngram")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = P.pages(spark, sf_dir)
    df.createOrReplaceTempView("_fp_pages")
    return spark.sql(T.fingerprint_sql(D.SPARK, "_fp_pages"))


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint invariant: html -> extract_text is byte-identical to
    the stored text per url. Output carries the md5 of both sides plus the
    equality flag so the oracle check IS the invariant check."""
    from ..functions.text import extract_text

    df = P.pages(spark, sf_dir, with_html=True)
    ext = df.withColumn("extracted", extract_text(F.col("html")))
    return ext.select(
        "url",
        F.md5("extracted").alias("extracted_md5"),
        F.md5("text").alias("text_md5"),
        (F.col("extracted") == F.col("text")).alias("byte_identical"))


def q_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elevation percentile spread per group: p80(z) - p20(z) with the
    adaptive-threshold select (lib/filter_scene.py:1526-1544): spread
    bucketed to the reference's threshold ladder."""
    df = P.geocoded_pages(spark, sf_dir).withColumn("z", F.expr(D.z_expr(D.SPARK)))
    agg = df.groupBy("group_id").agg(
        F.expr("percentile(z, 0.8) - percentile(z, 0.2)").alias("spread"))
    thresh = F.expr(
        "CASE WHEN spread < 40 THEN 10.5 WHEN spread < 50 THEN 15.0 "
        "WHEN spread < 75 THEN 19.0 WHEN spread < 90 THEN 27.0 "
        "ELSE 50.0 END")
    return agg.select("group_id", F.round("spread", 6).alias("spread"),
                      thresh.alias("stdev_thresh"))


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.jaccard_pairs(P.pages(spark, sf_dir), threshold_pct=50)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.lsh_candidate_pairs(P.pages(spark, sf_dir))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash(P.pages(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "simhash")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash_near_pairs(P.pages(spark, sf_dir), max_hamming=3)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return SIM.brute_force_topk(emb, k=3)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return SIM.embedding_near_dup(emb, threshold=0.5)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (rows-only driver check; recall vs brute force is
    asserted in tests/test_similarity.py)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return SIM.lsh_topk(emb, dim=64, k=3)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantizer lists + nprobe search (rows-only;
    recall asserted in tests)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return SIM.ivf_topk(emb, dim=64, k=3)


# ---------------------------------------------------------------------------
# strip assembly (merge order / coreg / feather)
# ---------------------------------------------------------------------------

def q_merge_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = M.with_footprint(P.geocoded_pages(spark, sf_dir))
    return M.merge_order(df)


def q_coregister(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = P.geocoded_pages(spark, sf_dir)
    return M.coregister_pairs(df, M.host_pair)


def q_feather_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = with_flags(P.geocoded_pages(spark, sf_dir))
    fb = M.feather_blend(df)
    # round the float blend for cross-engine hashing (sum order inside
    # groupBy partials is partitioning-dependent at the last ulp)
    return fb.select("pair", "block", F.round("w", 6).alias("w"),
                     F.round("z_blend", 6).alias("z_blend"),
                     "n_pages", "flags_merged")


# ---------------------------------------------------------------------------
# geospatial extras
# ---------------------------------------------------------------------------

def q_s2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real S2 level-13 cell ids (pure-numpy Hilbert encode in an Arrow
    UDF; rows-only check — not SQL-expressible; invariants in tests/test_s2.py)."""
    from ..functions.s2 import with_s2_cell

    df = with_s2_cell(P.geocoded_pages(spark, sf_dir))
    return df.select("url", "cell_s2")


def q_ring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-ring mean/std of the page z-score (local-stdev analogue,
    lib/filter_scene.py:1517-1524)."""
    from ..operators.neighborhood import ring_stat

    df = P.geocoded_pages(spark, sf_dir).withColumn("z", F.expr(D.z_expr(D.SPARK)))
    out = ring_stat(df, "z", ring=1)
    return out.select("cell", F.col("n_in_ring").cast("bigint").alias("n_in_ring"),
                      F.round("ring_mean", 6).alias("ring_mean"),
                      F.round("ring_std", 6).alias("ring_std"))


def q_ring_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-ring Shannon entropy of lang (entropyfilt analogue,
    lib/raster_array_tools.py:2541-2750)."""
    from ..operators.neighborhood import ring_entropy

    df = P.geocoded_pages(spark, sf_dir)
    out = ring_entropy(df, "lang", ring=1)
    return out.select("cell", F.round("ring_entropy", 6).alias("ring_entropy"))


def q_adaptive_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quad-tree assignment (split while >max_pages; rows-only —
    iterative tiling is not single-statement SQL)."""
    from ..operators.tiles import adaptive_tiles, assign_tiles_pip

    df = P.geocoded_pages(spark, sf_dir)
    tiles = adaptive_tiles(df, max_pages=50, max_depth=8)
    return assign_tiles_pip(df, tiles).select("url", "tile_id")


def q_hex_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex-grid cell ids (H3-style axial binning; rows-only — numpy cube
    rounding, invariants in tests/test_hexgrid.py)."""
    from ..functions.hexgrid import with_hex_cell

    df = with_hex_cell(P.geocoded_pages(spark, sf_dir))
    return df.select("url", "cell_hex")


def q_hex_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN over the hex index: hex k-ring expansion + cell-local join
    (rows-only; cross-checked vs brute force in tests/test_hexgrid.py)."""
    from ..functions.hexgrid import hex_knn

    return hex_knn(P.geocoded_pages(spark, sf_dir), k_neighbors=3, ring=1)


def q_feather_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D feather weight field (cogrouped distance-BFS UDF; rows-only —
    monotone-gradient semantics tested in tests/test_feather_field.py)."""
    fw = M.feather_weight_field(P.geocoded_pages(spark, sf_dir))
    return fw.select("pair", "block", F.round("w", 6).alias("w"))


def q_footprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group footprint hull + bounding rect (getFPvertices /
    rectFootprint analogues; rows-only — hull is procedural, properties
    tested in tests/test_footprint.py)."""
    from ..operators.footprint import group_footprints

    fp = group_footprints(P.geocoded_pages(spark, sf_dir))
    return fp.select("group_id", "n_cells", "n_vertices",
                     F.round("hull_area", 6).alias("hull_area"), "wkt")


def q_bwareaopen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component size filter over occupied coarse blocks
    (bwareaopen analogue; rows-only — iterative label propagation)."""
    from ..operators.components import bwareaopen

    df = P.geocoded_pages(spark, sf_dir)
    blocks = (df.select(
        F.expr(D.block_x_expr(D.SPARK)).alias("cell_x"),
        F.expr(D.block_y_expr(D.SPARK)).alias("cell_y"))
        .distinct()
        .withColumn("cell", F.expr(D.cell_id_from_xy())))
    return bwareaopen(blocks, min_size=3).select("cell", "component", "csize")


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def _shingles_cte() -> str:
    return (f"sh AS (SELECT DISTINCT doc_id, unnest({DD.shingles_expr(_DD)}) "
            f"AS shingle FROM cells)")


def _minhash_params_values() -> str:
    vals = ", ".join(f"({i}, {a}, {b})"
                     for i, (a, b) in enumerate(DD.MINHASH_PARAMS))
    return f"params(i, a, b) AS (VALUES {vals})"


ORACLES: dict[str, str] = {
    "q_token_stats": _with_cells(
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        + ", ".join(f"{e} AS {n}" for n, e in T.token_stats_exprs(_DD).items())
        + " FROM cells"),
    "q_quality": _with_cells(
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        + ", ".join(f"{e} AS {n}" for n, e in T.quality_exprs(_DD).items())
        + " FROM cells"),
    "q_langid": _with_cells(
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        f"{T.langid_expr(_DD)} AS lang_pred FROM cells"),
    "q_langid_ngram": _with_cells(
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        f"{T.langid_ngram_expr(_DD)} AS lang_pred_ngram FROM cells"),
    "q_fingerprint": _with_cells(
        T.fingerprint_sql(_DD, "cells").replace(
            "SELECT doc_id,", "SELECT CAST(doc_id AS BIGINT) AS doc_id,")),
    "q_jaccard_pairs": _with_cells(
        f"""SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
                   inter, na, nb
            FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(count(*) AS BIGINT) AS inter,
                     any_value(sa.n_sh) AS na, any_value(sb.n_sh) AS nb
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              JOIN sizes sa ON sa.doc_id = a.doc_id
              JOIN sizes sb ON sb.doc_id = b.doc_id
              GROUP BY a.doc_id, b.doc_id
            ) WHERE inter * 100 >= 50 * (na + nb - inter)""",
        extra_ctes=_shingles_cte()
        + ", sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh "
          "FROM sh GROUP BY doc_id)"),
    "q_minhash_lsh": _with_cells(
        f"""SELECT CAST(a.doc_id AS BIGINT) AS id_a,
                   CAST(b.doc_id AS BIGINT) AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared_bands
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_sig = b.band_sig
             AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id""",
        extra_ctes=_shingles_cte() + f""",
        {_minhash_params_values()},
        minh AS (
          SELECT doc_id, p.i AS hash_idx,
                 min((p.a * {D.hex8_i64('shingle', 1, _DD)} + p.b) % {M31}) AS minhash
          FROM sh CROSS JOIN params p GROUP BY doc_id, p.i
        ),
        bands AS (
          -- NB: DuckDB int '/' yields DOUBLE and double->int CAST rounds
          -- (Spark truncates); floor() makes both dialects agree
          SELECT doc_id, CAST(floor(hash_idx / {DD.ROWS_PER_BAND}) AS INT) AS band,
                 string_agg(hash_idx || ':' || minhash, ','
                            ORDER BY hash_idx || ':' || minhash) AS band_sig
          FROM minh GROUP BY doc_id, CAST(floor(hash_idx / {DD.ROWS_PER_BAND}) AS INT)
        )"""),
    "q_simhash": _with_cells(
        """SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(sum(bitval) AS BIGINT) AS simhash FROM bitsum
           GROUP BY doc_id""",
        extra_ctes=f"""
        toks AS (SELECT doc_id, unnest({D.tokens_expr(_DD)}) AS tok FROM cells),
        contrib AS (
          SELECT doc_id, j.j,
                 sum(CASE WHEN (({D.hex8_i64('tok', 1, _DD)} >> j.j) & 1) = 1
                     THEN 1 ELSE -1 END) AS s
          FROM toks CROSS JOIN (SELECT unnest(range(0, {DD.SIMHASH_BITS})) AS j) j
          GROUP BY doc_id, j.j
        ),
        bitsum AS (
          SELECT doc_id,
                 CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END AS bitval
          FROM contrib
        )"""),
    "q_simhash_pairs": _with_cells(
        f"""SELECT CAST(a.doc_id AS BIGINT) AS id_a,
                   CAST(b.doc_id AS BIGINT) AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
        extra_ctes=f"""
        toks AS (SELECT doc_id, unnest({D.tokens_expr(_DD)}) AS tok FROM cells),
        contrib AS (
          SELECT doc_id, j.j,
                 sum(CASE WHEN (({D.hex8_i64('tok', 1, _DD)} >> j.j) & 1) = 1
                     THEN 1 ELSE -1 END) AS s
          FROM toks CROSS JOIN (SELECT unnest(range(0, {DD.SIMHASH_BITS})) AS j) j
          GROUP BY doc_id, j.j
        ),
        sig AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j)
                          ELSE 0 END) AS BIGINT) AS simhash
          FROM contrib GROUP BY doc_id
        )"""),
    "q_cosine_topk": f"""
        WITH d AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        pairs AS (
          SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
                 list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                 AS cosine
          FROM d a JOIN d b ON a.vec_id <> b.vec_id
        )
        SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(nbr_id AS BIGINT) AS nbr_id,
               cosine, CAST(sim_rank AS INT) AS sim_rank FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                     ORDER BY cosine DESC, nbr_id ASC) AS sim_rank
          FROM pairs
        ) WHERE sim_rank <= 3""",
    "q_embedding_near_dup": f"""
        WITH d AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        )
        SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
               list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
               AS cosine
        FROM d a JOIN d b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
              >= 0.5""",
    "q_feather_blend": _with_cells(
        f"""SELECT pair, block, round(w, 6) AS w, round(z_blend, 6) AS z_blend,
                   n_pages, flags_merged FROM (
              SELECT j.pair, j.block,
                     least(greatest((CAST(j.bx - mn.bx0 AS DOUBLE)
                       / greatest(CAST(mn.bx1 - mn.bx0 AS DOUBLE), 1.0)
                       - 0.25) / (0.55 - 0.25), 0.0), 1.0) AS w,
                     least(greatest((CAST(j.bx - mn.bx0 AS DOUBLE)
                       / greatest(CAST(mn.bx1 - mn.bx0 AS DOUBLE), 1.0)
                       - 0.25) / (0.55 - 0.25), 0.0), 1.0) * (j.sza / j.na)
                     + (1.0 - least(greatest((CAST(j.bx - mn.bx0 AS DOUBLE)
                       / greatest(CAST(mn.bx1 - mn.bx0 AS DOUBLE), 1.0)
                       - 0.25) / (0.55 - 0.25), 0.0), 1.0)) * (j.szb / j.nb)
                       AS z_blend,
                     j.na + j.nb AS n_pages,
                     CAST(j.fla | j.flb AS INT) AS flags_merged
              FROM j JOIN mn ON j.pair = mn.pair
            )""",
        extra_ctes=f"""
        base AS (
          SELECT *, {D.z_expr(_DD)} AS z,
                 {D.block_x_expr(_DD)} AS bx,
                 {D.block_id_expr(_DD)} AS block,
                 CAST(substring(group_id, 5) AS INT) AS hostnum,
                 CAST(floor(CAST(substring(group_id, 5) AS INT) / 2) AS BIGINT) AS pair,
                 {D.flags_expr(_DD)} AS flags
          FROM cells
        ),
        agg AS (
          SELECT pair, block, bx, hostnum % 2 AS side,
                 sum(z) AS sz, CAST(count(*) AS BIGINT) AS n, bit_or(flags) AS fl
          FROM base GROUP BY pair, block, bx, hostnum % 2
        ),
        j AS (
          SELECT a.pair, a.block, a.bx, a.sz AS sza, a.n AS na, a.fl AS fla,
                 b.sz AS szb, b.n AS nb, b.fl AS flb
          FROM (SELECT * FROM agg WHERE side = 0) a
          JOIN (SELECT * FROM agg WHERE side = 1) b
            ON a.pair = b.pair AND a.block = b.block
        ),
        mn AS (
          SELECT pair, min(bx) AS bx0, max(bx) AS bx1
          FROM (SELECT pair, block, bx FROM j) GROUP BY pair
        )"""),
}


ORACLES["q_extract_text"] = _with_cells(
    """SELECT url, md5(extracted) AS extracted_md5, md5(text) AS text_md5,
              (extracted = text) AS byte_identical
       FROM (SELECT url, text,
                    regexp_replace(regexp_replace(
                      decode(encode('<html><body>' || text || '</body></html>')),
                      '^<html><body>', ''), '</body></html>$', '') AS extracted
             FROM cells)""")

ORACLES["q_percentile_gate"] = _with_cells(
    f"""SELECT group_id, round(spread, 6) AS spread,
          CASE WHEN spread < 40 THEN 10.5 WHEN spread < 50 THEN 15.0
               WHEN spread < 75 THEN 19.0 WHEN spread < 90 THEN 27.0
               ELSE 50.0 END AS stdev_thresh
        FROM (SELECT group_id,
                     quantile_cont(z, 0.8) - quantile_cont(z, 0.2) AS spread
              FROM (SELECT group_id, {D.z_expr(_DD)} AS z FROM cells)
              GROUP BY group_id)""")

ORACLES["q_ring_stats"] = _with_cells(
    """SELECT o.target_cell AS cell, CAST(o.n AS BIGINT) AS n_in_ring,
              round(o.s / o.n, 6) AS ring_mean,
              round(sqrt(greatest(o.ss / o.n - (o.s / o.n) * (o.s / o.n), 0.0)), 6)
                AS ring_std
       FROM (
         SELECT (p.cell_y + f.dy) * 131072 + (p.cell_x + f.dx) AS target_cell,
                sum(p.s) AS s, sum(p.ss) AS ss, sum(p.n) AS n
         FROM (SELECT cell_x, cell_y, sum(z) AS s, sum(z * z) AS ss,
                      count(*) AS n
               FROM zc GROUP BY cell_x, cell_y) p
         CROSS JOIN offs f GROUP BY 1
       ) o
       JOIN (SELECT DISTINCT cell FROM cells) c ON o.target_cell = c.cell""",
    extra_ctes=D.ring_offsets_values(1)
    + f", zc AS (SELECT *, {D.z_expr(_DD)} AS z FROM cells)")

ORACLES["q_ring_entropy"] = _with_cells(
    """SELECT e.target_cell AS cell,
              round(log2(CAST(e.N AS DOUBLE)) - e.nlogn / e.N, 6) AS ring_entropy
       FROM (
         SELECT target_cell, sum(n) AS N,
                sum(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE))) AS nlogn
         FROM (
           SELECT (p.cell_y + f.dy) * 131072 + (p.cell_x + f.dx) AS target_cell,
                  p.lang, sum(p.n) AS n
           FROM (SELECT cell_x, cell_y, lang, count(*) AS n
                 FROM cells GROUP BY cell_x, cell_y, lang) p
           CROSS JOIN offs f GROUP BY 1, 2
         ) GROUP BY target_cell
       ) e
       JOIN (SELECT DISTINCT cell FROM cells) c ON e.target_cell = c.cell""",
    extra_ctes=D.ring_offsets_values(1))


QUERIES = {
    "q_token_stats": q_token_stats,
    "q_extract_text": q_extract_text,
    "q_percentile_gate": q_percentile_gate,
    "q_s2_cells": q_s2_cells,          # rows-only (numpy Hilbert encode)
    "q_ring_stats": q_ring_stats,
    "q_ring_entropy": q_ring_entropy,
    "q_adaptive_tiles": q_adaptive_tiles,  # rows-only (iterative tiling)
    "q_bwareaopen": q_bwareaopen,          # rows-only (iterative CC)
    "q_hex_cells": q_hex_cells,            # rows-only (numpy hex binning)
    "q_footprints": q_footprints,          # rows-only (convex hull fold)
    "q_feather_field": q_feather_field,    # rows-only (cogrouped BFS field)
    "q_hex_knn": q_hex_knn,                # rows-only (hex k-ring kNN)
    "q_quality": q_quality,
    "q_langid": q_langid,
    "q_langid_ngram": q_langid_ngram,
    "q_fingerprint": q_fingerprint,
    "q_jaccard_pairs": q_jaccard_pairs,
    "q_minhash_lsh": q_minhash_lsh,
    "q_simhash": q_simhash,
    "q_simhash_pairs": q_simhash_pairs,
    "q_cosine_topk": q_cosine_topk,
    "q_embedding_near_dup": q_embedding_near_dup,
    "q_ann_lsh": q_ann_lsh,            # rows-only (no oracle)
    "q_ann_ivf": q_ann_ivf,            # rows-only (IVF nprobe search)
    "q_merge_order": q_merge_order,    # rows-only (procedural greedy fold)
    "q_coregister": q_coregister,      # rows-only (iterative LSQ)
    "q_feather_blend": q_feather_blend,
}
