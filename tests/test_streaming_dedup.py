"""Streaming near-dup dedup (round 6): foreachBatch probe + exactly-once
signature-state growth (streaming/stream.write_stream_dedup).

Claims pinned:
  1. the cumulative union of per-batch pair outputs equals the full
     lsh_candidate_pairs over everything streamed (every pair emitted by
     exactly one batch);
  2. replaying the last batch by hand (the Structured Streaming crash
     contract: the last uncommitted batch re-runs) rewrites a
     row-identical pairs dir even though the state table already holds
     that batch's signatures, and the signature ingest no-ops.
"""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_dir(spark):
    """Documents split across several files so maxFilesPerTrigger yields
    multiple micro-batches."""
    d = Path(tempfile.mkdtemp(prefix="stream_dedup_")) / "docs"
    (spark.read.parquet(f"{SF}/documents.parquet")
     .select("doc_id", "text").repartition(3).write.parquet(str(d)))
    yield str(d)
    shutil.rmtree(d.parent, ignore_errors=True)


def test_stream_dedup_pairs_equal_full_recompute(spark, docs_dir, tmp_path):
    from setsm_postprocessing_python_spark.operators import dedup as DD
    from setsm_postprocessing_python_spark.sources import bucketed as B
    from setsm_postprocessing_python_spark.streaming.stream import (
        write_stream_dedup)

    table = "t_stream_dedup_sigs"
    wd = str(tmp_path / "dedup")
    static = spark.read.parquet(docs_dir)
    try:
        _, did = DD.ensure_signature_layout(
            spark, f"{wd}/sigs", table, build=lambda: static.limit(0),
            meta={"stream": table}, n_buckets=4)
        assert did

        stream = (spark.readStream.schema(static.schema)
                  .option("maxFilesPerTrigger", "1").parquet(docs_dir))
        q = (write_stream_dedup(stream, wd, table,
                                checkpoint_dir=str(tmp_path / "ckpt"),
                                n_buckets=4)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(240), "stream did not finish in 240s"

        rec = json.loads(
            (Path(f"{wd}/sigs") / B.LAYOUT_MARKER).read_text())
        assert len(rec["ingests"]) >= 2  # really ran multiple batches

        # 1. cumulative pairs == full recompute over everything streamed
        all_pairs = spark.read.parquet(f"{wd}/pairs")
        got = {(r.id_a, r.id_b): r.n_shared_bands
               for r in all_pairs.collect()}
        want = {(r.id_a, r.id_b): r.n_shared_bands
                for r in DD.lsh_candidate_pairs(static).collect()}
        assert got == want
        # each pair emitted by exactly ONE batch (the dict compare above
        # would silently absorb cross-batch duplicates)
        assert all_pairs.count() == len(want)
        assert want, "sf0.001 documents must contain near-dup pairs"
        # state grew to one signature row set per doc
        spark.catalog.refreshTable(table)
        assert spark.table(table).count() == DD.band_signatures(
            static).count()

        # 2. crash replay: the state already holds every batch's
        # signatures, so a replayed probe hits the overlap case — it
        # must report the TRUE distinct-band counts (no self-pairs, no
        # inflation); probing the whole corpus against the grown state
        # exercises it for every batch at once
        replay = {(r.id_a, r.id_b): r.n_shared_bands
                  for r in DD.incremental_lsh_pairs(
                      DD.band_signatures(static),
                      spark.table(table)).collect()}
        assert replay == want
        # and the replayed signature ingest no-ops (the checkfile)
        last = sorted(int(i.rsplit("-", 1)[1])
                      for i in rec["ingests"])[-1]
        _, did_replay = B.ensure_bucketed_ingest(
            spark, f"{wd}/sigs", table, build=lambda: static.limit(1),
            ingest_id=f"stream-batch-{last}", n_buckets=4,
            key="band_sig")
        assert not did_replay
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
