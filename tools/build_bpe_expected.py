"""Build the expected-token-count fixture that gives ``bpe_token_counts``
a value-hash oracle (it was the registry's only rows-only check).

The BPE merge loop isn't expressible in one DuckDB query, but the tokenizer
is deterministic — so the expected counts CAN be precomputed with the very
same driver-side ``functions/bpe.py`` code the Spark UDF ships to workers,
and the oracle becomes a plain join against this table. Keyed by
``md5(text)`` (hex over UTF-8 bytes — identical semantics in hashlib and
DuckDB's ``md5()``), so one fixture covers every scale factor regardless of
doc_id overlap.

Regenerate after changing the merge table or the tokenizer:

    python tools/build_bpe_expected.py

Reads /root/testdata/sf{0.001,0.01,0.1}/documents.parquet; writes
fixtures/bpe_expected.parquet (repo-local — /root/testdata is read-only).
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from instructionspipe_spark.functions.bpe import BpeTokenizer  # noqa: E402

SF_DIRS = ("sf0.001", "sf0.01", "sf0.1")


def main() -> int:
    tok = BpeTokenizer.fixture()
    expected: dict[str, int] = {}
    for sf in SF_DIRS:
        path = os.path.join("/root/testdata", sf, "documents.parquet")
        texts = pq.read_table(path, columns=["text"]).column("text").to_pylist()
        for text in texts:
            key = hashlib.md5((text or "").encode("utf-8")).hexdigest()
            if key not in expected:
                expected[key] = tok.count(text)
        print(f"# {sf}: {len(texts)} docs, fixture now {len(expected)} distinct texts")
    keys = sorted(expected)
    table = pa.table(
        {
            "text_md5": pa.array(keys, pa.string()),
            "n_tokens_bpe": pa.array([expected[k] for k in keys], pa.int64()),
        }
    )
    out_dir = os.path.join(REPO, "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "bpe_expected.parquet")
    pq.write_table(table, out)
    print(f"# wrote {out}: {table.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
