"""input_hint invariant: byte-identical extracted text per url."""

from __future__ import annotations

import pyspark.sql.functions as F

from setsm_postprocessing_python_spark.functions.text import extract_text
from setsm_postprocessing_python_spark.sources.pages import pages


def test_extract_text_byte_identical(spark):
    df = pages(spark, "/root/testdata/sf0.01", with_html=True)
    ext = df.withColumn("extracted", extract_text(F.col("html")))
    bad = ext.where(F.col("extracted") != F.col("text")).count()
    total = ext.count()
    assert bad == 0 and total == 500

    # byte-level (not just string-equality): utf-8 bytes match exactly
    sample = ext.limit(20).collect()
    for r in sample:
        assert r.extracted.encode("utf-8") == r.text.encode("utf-8")


def test_langid_and_quality_are_deterministic(spark):
    from setsm_postprocessing_python_spark.functions.text import (
        with_langid, with_quality)

    df = pages(spark, "/root/testdata/sf0.001")
    a = {(r.doc_id): (r.lang_pred, r.quality)
         for r in with_quality(with_langid(df)).select(
             "doc_id", "lang_pred", "quality").collect()}
    b = {(r.doc_id): (r.lang_pred, r.quality)
         for r in with_quality(with_langid(df)).select(
             "doc_id", "lang_pred", "quality").collect()}
    assert a == b
    assert all(0 <= q <= 100 for (_, q) in a.values())
