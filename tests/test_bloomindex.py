"""File-level bloom skip index: pruning power + the no-false-negative
contract that makes pruning safe."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.catalog import load
from rsyslog_nginx_clickhouse_spark.plans.bloomindex import (
    bloom_candidate_files,
    read_bloom_pruned,
    write_bloom_indexed,
)


def _build(spark, sf_dir, tmp_path, files=16):
    ev = (load(spark, sf_dir, "events")
          .select("event_id", "user_id", "event_type", "value"))
    path = str(tmp_path / "bloom_events")
    write_bloom_indexed(ev, path, index_col="event_id",
                        cluster_col="user_id", files=files)
    return ev, path


def test_bloom_prunes_and_matches_direct(spark, sf_dir, tmp_path):
    """The point of the index: a point lookup on the non-cluster
    column must scan a strict subset of files (min/max stats cannot
    prune it — every file spans the id domain), and the pruned result
    must equal the unpruned filter exactly."""
    ev, path = _build(spark, sf_dir, tmp_path)
    n_files = len(glob.glob(os.path.join(path, "*.parquet")))
    probes = [11, 197, 983]
    cands = bloom_candidate_files(spark, path, probes)
    # 3 keys live in <= 3 files; fp rate ~1.6%/file keeps cands far
    # below the full listing — pruning is real, not vacuous
    assert 0 < len(cands) < n_files
    got = {tuple(r) for r in
           read_bloom_pruned(spark, path, "event_id", probes).collect()}
    want = {tuple(r) for r in
            ev.where(F.col("event_id").isin(probes)).collect()}
    assert got == want and len(want) == len(probes)


def test_bloom_has_no_false_negatives(spark, sf_dir, tmp_path):
    """Conjunctive membership (ALL k positions present) can never drop
    the file that truly holds a key: for a sample of keys, the file
    owning each key is always in its candidate set."""
    ev, path = _build(spark, sf_dir, tmp_path)
    sample = [r.event_id for r in
              ev.select("event_id").orderBy("event_id").limit(200)
                .collect()][::10]  # 20 spread-out keys
    truth = {r.event_id: r.file for r in
             (spark.read.parquet(path)
              .select(F.input_file_name().alias("file"), "event_id")
              .where(F.col("event_id").isin(sample))).collect()}
    for key in sample:
        cands = bloom_candidate_files(spark, path, [key])
        assert truth[key] in cands


def test_bloom_absent_key_returns_empty(spark, sf_dir, tmp_path):
    """A key outside the domain: candidates are (almost always) empty,
    and even when a false positive survives, the residual predicate
    makes the RESULT empty — correctness never rests on the index."""
    _, path = _build(spark, sf_dir, tmp_path)
    assert read_bloom_pruned(spark, path, "event_id",
                             [10 ** 12 + 7]).count() == 0


def test_bloom_empty_probe_list_is_no_candidates(spark, sf_dir,
                                                 tmp_path):
    """Zero probe values → zero candidate files and an empty pruned
    read, not an opaque reduce()/createDataFrame crash (ADVICE r7)."""
    _, path = _build(spark, sf_dir, tmp_path, files=8)
    assert bloom_candidate_files(spark, path, []) == []
    assert read_bloom_pruned(spark, path, "event_id", []).count() == 0


def test_bloom_index_is_index_sized(spark, sf_dir, tmp_path):
    """The side index must stay O(files · keys_per_file · k) position
    entries — state, not data: it never exceeds k positions per
    distinct key and one row per file."""
    ev, path = _build(spark, sf_dir, tmp_path, files=8)
    idx = spark.read.parquet(path + "_idx")
    assert idx.count() == len(glob.glob(os.path.join(path, "*.parquet")))
    n_keys = ev.select("event_id").distinct().count()
    total_positions = idx.select(
        F.sum(F.size("bits")).alias("s")).collect()[0]["s"]
    assert total_positions <= 3 * n_keys
