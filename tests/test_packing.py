"""Greedy sequence packing: the next-fit recurrence, its determinism
across partitionings, and the packing-efficiency bound it carries."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_nginx_clickhouse_spark.operators.packing import (
    greedy_pack,
    packing_stats,
)


def _pack(spark, rows, capacity, parts=1):
    df = spark.createDataFrame(rows, "shard int, doc_id long, size long")
    if parts > 1:
        df = df.repartition(parts)
    out = greedy_pack(df, capacity)
    return sorted((r.shard, r.doc_id, r.size, r.bin_id, r.bin_offset)
                  for r in out.collect())


def test_next_fit_hand_computed(spark):
    # capacity 10, sizes in id order: 4,5,3,10,1,11,2
    # bins: [4,5] fill 9 | [3] +10 overflows -> [10] | ... wait: 3 fits
    # after 9? 9+3>10 -> new bin [3,1]? walk it precisely below.
    rows = [(0, i, s) for i, s in enumerate([4, 5, 3, 10, 1, 11, 2])]
    got = _pack(spark, rows, 10)
    # id0:4 -> bin0 off0 (fill 4); id1:5 -> bin0 off4 (fill 9)
    # id2:3 -> 9+3>10 -> bin1 off0 (fill 3); id3:10 -> 3+10>10 -> bin2
    # id4:1 -> 10+1>10 -> bin3 off0 (fill 1); id5:11 oversize -> bin4
    # id6:2 -> 11+2>10 -> bin5 off0
    want = [(0, 0, 4, 0, 0), (0, 1, 5, 0, 4), (0, 2, 3, 1, 0),
            (0, 3, 10, 2, 0), (0, 4, 1, 3, 0), (0, 5, 11, 4, 0),
            (0, 6, 2, 5, 0)]
    assert got == want


def test_packing_is_partition_invariant(spark):
    """The assignment must depend only on the data: re-running over a
    different input partitioning gives bit-identical bins — the
    property that makes the recursive-CTE oracle valid."""
    import random

    rng = random.Random(7)
    rows = [(i % 3, i, rng.randint(1, 60)) for i in range(300)]
    a = _pack(spark, rows, 100, parts=1)
    b = _pack(spark, rows, 100, parts=17)
    assert a == b


def test_packing_invariants_and_stats(spark):
    """Structural contract: per shard, bin ids are 0..max dense in doc
    order; offsets are running fills; no bin exceeds capacity unless
    it holds a single oversize doc; stats waste matches bins·C−payload
    and next-fit's <2× bound holds (every closed bin pair sums >C)."""
    import random

    rng = random.Random(11)
    cap = 100
    rows = [(i % 4, i, rng.randint(1, 60)) for i in range(400)]
    df = spark.createDataFrame(rows, "shard int, doc_id long, size long")
    packed = greedy_pack(df, cap)
    data = {}
    for r in packed.collect():
        data.setdefault((r.shard, r.bin_id), []).append(
            (r.doc_id, r.size, r.bin_offset))
    for (shard, bin_id), docs in data.items():
        docs.sort()
        fill = 0
        for _, size, off in docs:
            assert off == fill
            fill += size
        assert fill <= cap or len(docs) == 1  # oversize-alone rule
    stats = {r.shard: (r.n_bins, r.payload, r.waste)
             for r in packing_stats(packed, cap).collect()}
    for shard, (n_bins, payload, waste) in stats.items():
        assert waste == n_bins * cap - payload
        # next-fit bound: adjacent bins can't both be <half full
        # (else the second's docs would have fit) => total fill >
        # (n_bins-1) * cap/2
        assert payload * 2 > (n_bins - 1) * cap


def test_packing_plan_single_shuffle(spark, sf_dir):
    """One exchange on the shard key feeds the applyInPandas pass —
    the shape that holds at shards ~= cores."""
    from rsyslog_nginx_clickhouse_spark.queries import load_all

    q = load_all()["sequence_packing_plan"].spark
    plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    # hashpartitioning(shard) for the groupBy + the presentation sort
    assert len(exchanges) == 2
    assert any("hashpartitioning" in ln for ln in exchanges)
    assert any("rangepartitioning" in ln for ln in exchanges)


def test_packed_sequences_assemble_exactly(spark, sf_dir):
    """The gather must concatenate each bin's member texts in doc
    order with the \\x1e separator: replay the join driver-side from
    the plan + raw text and compare hashes; payload must equal the
    sum of member sizes (n_chars == len(text) for the testdata)."""
    import hashlib

    from rsyslog_nginx_clickhouse_spark.catalog import load
    from rsyslog_nginx_clickhouse_spark.queries import load_all
    from rsyslog_nginx_clickhouse_spark.queries.pipeline import (
        _PACK_CAPACITY,
        _PACK_SHARDS,
    )

    reg = load_all()
    plan = {r.doc_id: (r.shard, r.bin_id)
            for r in reg["sequence_packing_plan"].spark(spark, sf_dir)
            .collect()}
    text = {r.doc_id: r.text for r in
            load(spark, sf_dir, "documents").select("doc_id", "text")
            .collect()}
    bins: dict[tuple, list] = {}
    for doc_id in sorted(plan):
        bins.setdefault(plan[doc_id], []).append(doc_id)
    got = {(r.shard, r.bin_id): (r.n_docs, r.payload, r.seq_hash)
           for r in reg["packed_sequences"].spark(spark, sf_dir)
           .collect()}
    assert set(got) == set(bins)
    for key, members in bins.items():
        seq = "\x1e".join(text[d] for d in members)
        payload = sum(len(text[d]) for d in members)
        assert payload <= _PACK_CAPACITY or len(members) == 1
        assert got[key] == (len(members), payload,
                            hashlib.md5(seq.encode()).hexdigest())
    assert plan and all(s < _PACK_SHARDS for s, _ in bins)
