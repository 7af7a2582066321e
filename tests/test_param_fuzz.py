"""Parameter-space differential fuzz: the oracle GENERATORS in registry.py
are functions of the operator parameters — so the driver-gate methodology
extends beyond the gated defaults. Each case builds the Spark operator and
the DuckDB oracle for the SAME parameter combo and diffs values, locking
the whole (num_perm, bands, threshold / bits, radius / n, seed) space, not
one point of it. Runs at sf0.001 (500 docs) to stay fast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def documents(spark):
    from instructionspipe_spark import load_tables

    return load_tables(spark, SF_DIR)["documents"]


@pytest.mark.parametrize(
    "num_perm,bands,threshold",
    [(8, 2, 0.3), (16, 8, 0.7), (8, 4, 0.5)],
)
def test_minhash_dedup_param_space(spark, documents, duck, num_perm, bands, threshold):
    from instructionspipe_spark.operators.dedup import minhash_lsh_dedup
    from instructionspipe_spark.registry import _minhash_dedup_oracle

    got = minhash_lsh_dedup(
        documents, "doc_id", "text", num_perm=num_perm, bands=bands, threshold=threshold
    ).select("doc_id", "lang")
    assert_df_equal(got, duck.query(_minhash_dedup_oracle(num_perm, bands, threshold)))


@pytest.mark.parametrize("bits,bands,radius", [(48, 6, 2), (16, 4, 1), (32, 8, 5)])
def test_simhash_near_dedup_param_space(spark, documents, duck, bits, bands, radius):
    from instructionspipe_spark.operators.dedup import simhash_near_dedup
    from instructionspipe_spark.registry import _simhash_near_dedup_oracle

    got = simhash_near_dedup(
        documents, "doc_id", "text", bits=bits, bands=bands, radius=radius
    ).select("doc_id", "lang")
    assert_df_equal(got, duck.query(_simhash_near_dedup_oracle(bits, bands, radius)))


@pytest.mark.parametrize("n,seed", [(5, 11), (50, 0)])
def test_weighted_sample_param_space(spark, documents, duck, n, seed):
    from instructionspipe_spark.operators.sampling import weighted_sample
    from instructionspipe_spark.operators.textstats import _lower_tokens, quality_score_from_tokens
    from instructionspipe_spark.registry import _weighted_sample_oracle

    toked = documents.select(
        "doc_id", "lang", "text", _lower_tokens(F.col("text")).alias("__toks")
    )
    weighted = toked.select(
        "doc_id", "lang", quality_score_from_tokens(F.col("text"), F.col("__toks")).alias("quality")
    )
    got = weighted_sample(weighted, "quality", n, seed=seed, id_cols=["doc_id"], group_cols=["lang"])
    assert_df_equal(got, duck.query(_weighted_sample_oracle(n, seed)))
