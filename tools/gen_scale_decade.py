"""Generate a 10x decade above sf0.1 for the documents/embeddings tables —
the inputs of the slowest bench queries — so tools/scale_probe.py can fit
scaling exponents over a SECOND decade (sf0.1 -> sf1). A quadratic term that
the first decade's fixed overhead masks shows up here (VERDICT r6 item 6).

The driver's testdata is read-only and its generator is not available, so
this reproduces the LAWS measured from sf0.1 rather than the exact bytes:

- documents (50,000 rows): per-doc word counts resampled from the sf0.1
  empirical count distribution, lang/source from their empirical marginals,
  ~5% of docs near-copies of an earlier doc with ~10% of words mutated.
  The vocabulary is the crucial DELIBERATE deviation: the driver's corpus
  draws every doc from the same 31 words, which makes ~35% of ALL doc
  pairs genuine jaccard>=0.5 near-dups (measured on sf0.1) — under that
  law every dedup operator is quadratic BY OUTPUT SIZE at any corpus
  scale, so a probe over it measures corpus pathology, not plan shape
  (that regime is the lsh_bucket_stats/template-strip-first diagnostic
  case, covered by SKEW.md). A real 10x corpus grows its vocabulary, so
  sf1 extends the 31 real words with 279 synthetic tokens under a zipf
  frequency law, keeping random-pair jaccard low and candidate pairs
  dominated by the injected ~5% near-dups — the regime where a scaling
  exponent says something about the PLAN.
- embeddings (20,000 rows): 64-d unit-normalized gaussians (measured sf0.1
  law: unit norms, ~N(0, 1/64) coords), labels 0..9 uniform, ~3% near-dups
  (earlier vector + 5% noise, renormalized).

Deterministic (numpy seed 42). Output: /root/repo/.scale/sf1/*.parquet
(gitignored scratch — sf name parseable by scale_probe's float(...) rule).

Usage: python tools/gen_scale_decade.py [n_docs n_vecs [sf_name [vocab]]]
       defaults: 50000 20000 sf1 310. The third decade (VERDICT r7 #6) is
       `python tools/gen_scale_decade.py 500000 20000 sf10 980` — vocabulary
       grows ~ sqrt(corpus) (Heaps' law beta=0.5), keeping random-pair
       jaccard sparse at 10x so the probe still measures plan shape.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SCALE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale")


def gen_documents(rng: np.random.RandomState, n: int, vocab: int = 310) -> pa.Table:
    import duckdb

    real_words = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT UNNEST(string_split(text, ' ')) w "
            f"FROM '{SRC}/documents.parquet' ORDER BY 1"
        ).fetchall()
    ]
    # Extended zipf vocabulary: real words keep the high-frequency ranks so
    # the text still looks like the source corpus; the synthetic tail makes
    # random-pair shingle overlap sparse (see module docstring).
    words = real_words + [f"tok{k}" for k in range(vocab - len(real_words))]
    wprob = 1.0 / np.arange(1, len(words) + 1, dtype=float)
    wprob /= wprob.sum()
    counts_pool = np.array(
        [
            r[0]
            for r in duckdb.sql(
                f"SELECT len(string_split(text, ' ')) FROM '{SRC}/documents.parquet'"
            ).fetchall()
        ]
    )
    langs, lfreq = zip(
        *duckdb.sql(
            f"SELECT lang, COUNT(*) FROM '{SRC}/documents.parquet' GROUP BY 1 ORDER BY 1"
        ).fetchall()
    )
    lprob = np.array(lfreq, dtype=float)
    lprob /= lprob.sum()

    counts = counts_pool[rng.randint(0, len(counts_pool), size=n)]
    total = int(counts.sum())
    word_idx = rng.choice(len(words), size=total, p=wprob)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    lang_idx = rng.choice(len(langs), size=n, p=lprob)
    src_idx = rng.randint(0, 20, size=n)
    dup_flag = rng.rand(n) < 0.05

    words_arr = np.array(words)
    texts: list[str] = []
    for i in range(n):
        if dup_flag[i] and i > 0:
            j = rng.randint(0, i)
            toks = texts[j].split(" ")
            n_mut = max(1, len(toks) // 10)
            for pos in rng.randint(0, len(toks), size=n_mut):
                toks[pos] = words_arr[rng.randint(0, len(words_arr))]
            texts.append(" ".join(toks))
        else:
            texts.append(" ".join(words_arr[word_idx[starts[i] : starts[i] + counts[i]]]))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([langs[k] for k in lang_idx]),
            "source": pa.array([f"src{k}" for k in src_idx]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.RandomState, n: int, dim: int = 64) -> pa.Table:
    vecs = rng.randn(n, dim).astype(np.float32)
    dup_flag = rng.rand(n) < 0.03
    for i in range(1, n):
        if dup_flag[i]:
            j = rng.randint(0, i)
            vecs[i] = vecs[j] + 0.05 * rng.randn(dim).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 10, size=n), type=pa.int32()),
        }
    )


def gen_events(rng: np.random.RandomState, n: int) -> pa.Table:
    """Events under the measured sf0.1 laws: ~66 events/user (users =
    n/66), ts uniform over the same 30-day window, 5 uniform event types,
    value ~ Exp(mean 50) clipped at 560 and rounded to cents, props the
    single-key JSON. Keeps the calendar span FIXED as n grows (the driver's
    own law: sf0.01 -> sf0.1 grows density, not duration), so windowed /
    cohort operators scale by per-window mass, not window count."""
    n_users = max(1, n // 66)
    base_us = np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC in epoch-us
    span_us = np.int64(30 * 24 * 3600 * 1_000_000)
    ts_us = base_us + rng.randint(0, span_us, size=n, dtype=np.int64)
    types = np.array(["signup", "click", "error", "view", "purchase"])
    value = np.round(np.clip(rng.exponential(50.0, size=n), 0.0, 560.0), 2)
    k = rng.randint(0, 100, size=n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
            "user_id": pa.array(rng.randint(0, n_users, size=n), type=pa.int64()),
            "event_type": pa.array(types[rng.randint(0, 5, size=n)]),
            "value": pa.array(value, type=pa.float64()),
            "props": pa.array(['{"k": %d}' % x for x in k]),
        }
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    sf_name = sys.argv[3] if len(sys.argv) > 3 else "sf1"
    vocab = int(sys.argv[4]) if len(sys.argv) > 4 else 310
    out = os.path.join(SCALE_ROOT, sf_name)
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(42)
    docs = gen_documents(rng, n_docs, vocab=vocab)
    pq.write_table(docs, os.path.join(out, "documents.parquet"))
    emb = gen_embeddings(rng, n_vecs)
    pq.write_table(emb, os.path.join(out, "embeddings.parquet"))
    n_events = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", str(n_docs * 20)))
    ev = gen_events(rng, n_events)
    pq.write_table(ev, os.path.join(out, "events.parquet"))
    print(
        f"wrote {n_docs} documents ({vocab}-word vocab), {n_vecs} embeddings, "
        f"{n_events} events -> {out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
