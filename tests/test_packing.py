"""Sequence-packing operators: stream (concat-and-chunk) and greedy
first-fit. Both deterministic in document-id order within a group."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instructionspipe_spark.operators.packing import pack_greedy_firstfit, pack_token_stream


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, grp string, n_tokens long")


def test_pack_token_stream_positions(spark):
    rows = [
        (1, "a", 300),
        (2, "a", 300),  # spans windows 0 -> 1 (starts at 300)
        (3, "a", 12),
        (4, "a", 0),    # occupies nothing
        (5, "b", 600),  # oversized: spans 0 -> 1 alone
    ]
    out = {
        r["doc_id"]: (r["start_bin"], r["start_offset"], r["end_bin"])
        for r in pack_token_stream(_df(spark, rows), "doc_id", "n_tokens", "grp", 512).collect()
    }
    assert out[1] == (0, 0, 0)
    assert out[2] == (0, 300, 1)        # 300..599 crosses the 512 boundary
    assert out[3] == (1, 88, 1)         # 600..611
    assert out[4] == (1, 100, 0)        # zero tokens: end before start
    assert out[5] == (0, 0, 1)          # groups pack independently


def test_pack_greedy_firstfit_bins(spark):
    rows = [
        (1, "a", 400),
        (2, "a", 200),  # does not fit bin 0 (rem 112) -> bin 1
        (3, "a", 100),  # fits bin 0
        (4, "a", 700),  # oversized -> own bin 2
        (5, "a", 300),  # bin 1 (rem 312)
        (6, "b", 10),   # separate group restarts at bin 0
    ]
    out = {
        r["doc_id"]: r["bin_id"]
        for r in pack_greedy_firstfit(_df(spark, rows), "doc_id", "n_tokens", "grp", 512).collect()
    }
    assert out == {1: 0, 2: 1, 3: 0, 4: 2, 5: 1, 6: 0}


def test_pack_greedy_capacity_invariant(spark):
    """Property: per (group, bin), total tokens <= capacity unless the bin
    holds a single oversized document; result identical across input
    partitionings."""
    import random

    rng = random.Random(7)
    rows = [(i, f"g{i % 3}", rng.randint(0, 700)) for i in range(200)]
    cap = 512
    for parts in (1, 7):
        df = _df(spark, rows).repartition(parts)
        packed = pack_greedy_firstfit(df, "doc_id", "n_tokens", "grp", cap)
        agg = (
            packed.groupBy("grp", "bin_id")
            .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
            .collect()
        )
        for r in agg:
            assert r["tot"] <= cap or r["n"] == 1, (r["grp"], r["bin_id"], r["tot"], r["n"])
        if parts == 1:
            baseline = sorted((r["doc_id"], r["bin_id"]) for r in packed.collect())
        else:
            assert sorted((r["doc_id"], r["bin_id"]) for r in packed.collect()) == baseline


def test_pack_token_stream_invariants(spark):
    """Property: offsets stay inside the window, bins are monotone in id
    order per group, and the stream is gapless — each document starts
    exactly where the previous one ended."""
    import random

    rng = random.Random(11)
    rows = [(i, f"g{i % 2}", rng.randint(0, 900)) for i in range(300)]
    cap = 512
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tokens long")
    out = sorted(
        pack_token_stream(df, "doc_id", "n_tokens", "grp", cap).collect(),
        key=lambda r: (r["grp"], r["doc_id"]),
    )
    pos = {}
    for r in out:
        assert 0 <= r["start_offset"] < cap
        expected = pos.get(r["grp"], 0)
        assert r["start_bin"] * cap + r["start_offset"] == expected  # gapless
        pos[r["grp"]] = expected + r["n_tokens"]
        if r["n_tokens"] > 0:
            assert r["end_bin"] * cap <= expected + r["n_tokens"] - 1 < (r["end_bin"] + 1) * cap
        else:
            assert r["end_bin"] == r["start_bin"] - 1


def test_lm_block_manifest_invariants(spark):
    """Manifest rows partition the token stream: every block except each
    group's last carries exactly `capacity` tokens, per-doc contributions
    sum to the doc's token count, and zero-token docs vanish."""
    from pyspark.sql import functions as F

    from instructionspipe_spark.operators.packing import lm_block_manifest

    docs = spark.createDataFrame(
        [(0, "g", 5), (1, "g", 12), (2, "g", 0), (3, "g", 7), (10, "h", 3)],
        "doc_id long, grp string, n_tokens long",
    )
    out = lm_block_manifest(docs, "doc_id", "n_tokens", "grp", capacity=8).collect()
    assert all(r["n_tokens"] > 0 for r in out)
    assert not any(r["doc_id"] == 2 for r in out)
    per_doc = {}
    per_block = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
        per_block[(r["grp"], r["block_id"])] = per_block.get((r["grp"], r["block_id"]), 0) + r["n_tokens"]
    assert per_doc == {0: 5, 1: 12, 3: 7, 10: 3}
    # g stream = 24 tokens = blocks 0,1,2 full at 8; h stream = 3 tokens in block 0
    assert per_block == {("g", 0): 8, ("g", 1): 8, ("g", 2): 8, ("h", 0): 3}
    # doc 1 spans blocks 0->2 (starts at offset 5)
    doc1 = sorted((r["block_id"], r["n_tokens"]) for r in out if r["doc_id"] == 1)
    assert doc1 == [(0, 3), (1, 8), (2, 1)]
