"""Deduplication family (SURVEY.md G2-G5 + north-star dedup ops).

Reference behaviors re-specified for scale and determinism:

- exact dedup keeps ``v[0]`` per group in input order
  (``apps/etl/etl_sampling_by_key.py:42-47``) — input order does not exist in
  a distributed engine, so the survivor is the row minimizing an explicit
  tie-break key (deterministic under any partitioning);
- MinHash-LSH near-dedup (``apps/etl/etl_slimpajama_dc_proc.py:41-86,147-158``)
  keeps an in-memory LSH index and drops a record if it has more than
  ``most_dup`` *previously inserted* matches — order-dependent and
  single-node. Here: shingle -> MinHash signature -> band buckets -> shared
  bucket candidate pairs -> drop the larger id of each verified pair. The
  result is order-independent and runs as joins/aggregations that shuffle on
  band hashes (uniform by construction, so no skew).

All hashing is md5-based (built-in, available identically in DuckDB) so every
operator here is oracle-checkable.

Two execution engines per fingerprint, identical results (asserted in tests):

- ``engine="expr"`` — pure Catalyst expressions (sequence/transform/aggregate).
  No Python workers at all; the fallback for JVM-only deployments.
- ``engine="arrow"`` (default) — normalization stays a JVM regex, then one
  Arrow-batched pandas UDF computes shingles + md5 + signature with a
  per-batch shingle vocabulary (shingles are Zipfian, so each distinct
  shingle is hashed once per batch, not once per occurrence) and vectorized
  numpy for the permutation/vote math. Measured 3.4-3.7x faster than the
  expression path at sf0.1: Catalyst higher-order lambdas evaluate
  interpreted per element, and the 32 simhash vote passes plus per-char
  substring generation dominate. Notably the md5 itself is ~free — swapping
  it for xxhash64 measured within noise (+-3%), so the cheap-hash swap the
  profile suggested was attacking the wrong term; both engines keep md5 and
  full DuckDB oracle parity.

Document-length complexity: the expression shingler is O(len^2) per
document — Spark's ``substr(i, n)`` locates code point i by walking the
UTF8String from the start, so per-shingle cost grows with position (a
50k-char document takes minutes). The Arrow kernel slices a Python str
(O(1) indexing): linear in document length. For corpora with long
documents the kernel is not merely faster, it is the only shape that
scales.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints must resolve `pd`
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from instructionspipe_spark.functions.text import char_ngrams, shingle_normalize
from instructionspipe_spark.functions.vectors import cosine_similarity


def exact_dedup(df: DataFrame, keys: list[str], tiebreak: list[str]) -> DataFrame:
    """Keep exactly one row per key group: the row with the smallest
    ``tiebreak`` value. ``dropDuplicates`` would be cheaper by a sort but
    returns an arbitrary row; a deterministic survivor is worth the
    ``row_number`` (still a single shuffle, AQE handles skew)."""
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in tiebreak])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def multi_key_dedup(df: DataFrame, key_sets: list[list[str]], tiebreak: list[str]) -> DataFrame:
    """Sequential dedup over several key sets (reference
    ``etl_sampling_by_key.py:50-53`` folds dedup over keys)."""
    for keys in key_sets:
        df = exact_dedup(df, keys, tiebreak)
    return df


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# Universal-hash family over the 48-bit base hash: permutation i is
# h_i(x) = (A[i]*x + B[i]) mod 2^48, with A odd 12-bit and B 48-bit constants
# derived from md5 of the permutation index — deterministic, no RNG state,
# reproducible in any engine (A[i]*x < 2^61 never overflows signed 64-bit).
_MOD = 1 << 48


def _perm_constants(num_perm: int) -> tuple[list[int], list[int]]:
    import hashlib

    a = [int(hashlib.md5(f"a{i}".encode()).hexdigest()[:3], 16) | 1 for i in range(num_perm)]
    b = [int(hashlib.md5(f"b{i}".encode()).hexdigest()[:12], 16) for i in range(num_perm)]
    return a, b


def base_hash48(s: Column) -> Column:
    """48-bit integer hash of a string: first 12 hex chars of md5.
    (DuckDB mirror: ``CAST('0x' || substr(md5(s),1,12) AS BIGINT)``.)"""
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# Arrow shingle kernels
# ---------------------------------------------------------------------------
#
# One pandas UDF per (operator, params): normalized text in, signature out.
# The expensive inner loop — shingle windows, md5, permutations / bit votes —
# runs vectorized in numpy over a per-batch shingle vocabulary. Python str
# slicing counts code points exactly like Spark's substr, and hashlib.md5 of
# the UTF-8 encoding matches Spark/DuckDB md5, so results are bit-identical
# to the expression engine (asserted in tests/test_operators.py).

_KERNELS: dict[tuple, object] = {}


def _batch_vocab(norm, ngram: int):
    """Per-doc arrays of shingle-vocabulary indices plus the vocabulary's
    48-bit md5 hashes. ``digest()[:6] big-endian == int(hexdigest[:12], 16)``."""
    import hashlib

    vocab: dict[str, int] = {}
    doc_idx: list = []
    for s in norm:
        if s is None or len(s) < ngram:
            doc_idx.append(None)
            continue
        seen = {s[j : j + ngram] for j in range(len(s) - ngram + 1)}
        idx = np.empty(len(seen), dtype=np.int64)
        for k, sh in enumerate(seen):
            v = vocab.get(sh)
            if v is None:
                v = len(vocab)
                vocab[sh] = v
            idx[k] = v
        doc_idx.append(idx)
    hashes = np.fromiter(
        (int.from_bytes(hashlib.md5(sh.encode()).digest()[:6], "big") for sh in vocab),
        dtype=np.int64,
        count=len(vocab),
    )
    return doc_idx, hashes


def _minhash_kernel(num_perm: int, ngram: int):
    key = ("minhash", num_perm, ngram)
    if key in _KERNELS:
        return _KERNELS[key]
    from pyspark.sql.types import ArrayType, LongType

    a_np = np.array(_perm_constants(num_perm)[0], dtype=np.int64)
    b_np = np.array(_perm_constants(num_perm)[1], dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def kernel(norm: pd.Series) -> pd.Series:
        doc_idx, hashes = _batch_vocab(norm, ngram)
        # vocab x num_perm permutation table; a < 2^12 and h < 2^48 keep
        # a*h+b under 2^61 — no int64 overflow.
        perms = (hashes[:, None] * a_np[None, :] + b_np[None, :]) % _MOD
        out = np.full(len(norm), None, dtype=object)
        for i, idx in enumerate(doc_idx):
            if idx is not None:
                out[i] = perms[idx].min(axis=0).tolist()
        return pd.Series(out)

    _KERNELS[key] = kernel
    return kernel


def _jaccard_kernel(ngram: int):
    """Pairwise n-gram Jaccard over two NORMALIZED text columns. NULL (not
    NaN: Spark orders NaN above every double, so ``NaN >= t`` would pass the
    verify filter) when the union is empty, matching the expression
    ``jaccard``."""
    key = ("jaccard", ngram)
    if key in _KERNELS:
        return _KERNELS[key]
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def kernel(a: pd.Series, b: pd.Series) -> pd.Series:
        # Each document appears in several candidate pairs; memoize its
        # shingle set per batch (keyed by the normalized text) so set
        # construction is paid once per distinct doc, not once per pair.
        memo: dict[str, frozenset] = {}

        def shingles(s):
            if s is None or len(s) < ngram:
                return frozenset()
            v = memo.get(s)
            if v is None:
                v = frozenset(s[j : j + ngram] for j in range(len(s) - ngram + 1))
                memo[s] = v
            return v

        out = np.full(len(a), None, dtype=object)
        for i in range(len(a)):
            sa, sb = shingles(a.iat[i]), shingles(b.iat[i])
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter  # inclusion-exclusion: no union set
            if union:
                out[i] = inter / union
        return pd.Series(out)

    _KERNELS[key] = kernel
    return kernel


def _simhash_kernel(bits: int, ngram: int):
    key = ("simhash", bits, ngram)
    if key in _KERNELS:
        return _KERNELS[key]
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def kernel(norm: pd.Series) -> pd.Series:
        doc_idx, hashes = _batch_vocab(norm, ngram)
        bit_tbl = ((hashes[:, None] >> np.arange(bits, dtype=np.int64)) & 1).astype(np.int32)
        powers = np.int64(1) << np.arange(bits, dtype=np.int64)
        out = np.full(len(norm), None, dtype=object)
        for i, idx in enumerate(doc_idx):
            if idx is not None:
                s = bit_tbl[idx].sum(axis=0, dtype=np.int64)
                # vote > 0  <=>  set-bit count * 2 > shingle count
                out[i] = int(((s * 2 > len(idx)).astype(np.int64) * powers).sum())
        return pd.Series(out)

    _KERNELS[key] = kernel
    return kernel


def minhash_signature(
    text: Column, num_perm: int = 16, ngram: int = 3, engine: str = "arrow"
) -> Column:
    """MinHash signature as ``array<bigint>`` of length ``num_perm``.

    One md5 per distinct shingle, then ``num_perm`` cheap affine
    permutations — the standard tensoring trick, so cost is
    ``|shingles| + num_perm × |shingles|`` integer ops rather than
    ``num_perm × |shingles|`` cryptographic hashes. Per-row computation:
    no shuffle, embarrassingly parallel across rows in either engine.

    Empty shingle sets yield NULL signature entries (filter short docs first
    — the reference's low-length filter P5 does exactly this).
    """
    if engine == "arrow":
        return _minhash_kernel(num_perm, ngram)(shingle_normalize(text))
    shingles = F.array_distinct(char_ngrams(text, n=ngram))
    return minhash_signature_from_shingles(shingles, num_perm)


def minhash_signature_from_shingles(shingles: Column, num_perm: int = 16) -> Column:
    """MinHash signature over a precomputed distinct-shingle array column —
    lets callers share one shingle projection across signature and
    verification branches."""
    a_const, b_const = _perm_constants(num_perm)
    hashes = F.transform(shingles, base_hash48)

    def perm_min(hs: Column, a: int, b: int) -> Column:
        # NB: single-arg lambda only — a two-arg lambda would receive the
        # array index as its second argument from transform().
        return F.array_min(F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MOD)))

    # Let-binding via a 1-element array: the md5-per-shingle hash array is
    # evaluated ONCE and bound to the lambda variable; referencing `hashes`
    # directly in all num_perm branches would copy the expression tree and
    # recompute the cryptographic hashes num_perm times (no CSE across
    # higher-order lambdas in Catalyst).
    # NULL signature (not an array of NULLs) for empty shingle sets: a
    # shared all-NULL signature would put every sub-ngram document into the
    # same LSH bucket and, without jaccard verification, collapse them all.
    # The guard lives INSIDE the lambda on the let-bound array — wrapping
    # the outer expression would re-evaluate the shingles and break the
    # let-binding (10x measured on the simhash twin).
    return F.element_at(
        F.transform(
            F.array(hashes),
            lambda hs: F.when(
                F.size(hs) > 0,
                F.array(*[perm_min(hs, a_const[i], b_const[i]) for i in range(num_perm)]),
            ),
        ),
        1,
    )


def minhash_band_hashes(sig: Column, bands: int, rows_per_band: int) -> Column:
    """LSH band hashes: split the signature into ``bands`` slices of
    ``rows_per_band`` and hash each slice. Returns ``array<string>``."""
    idx = F.sequence(F.lit(0), F.lit(bands - 1))

    def bands_of(s: Column) -> Column:
        return F.transform(
            idx,
            lambda b: F.md5(
                F.concat(
                    b.cast("string"),
                    F.lit("|"),
                    F.array_join(
                        F.transform(
                            F.slice(s, b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    ),
                )
            ),
        )

    # Let-bind the signature so it is computed once, not once per band.
    return F.element_at(F.transform(F.array(sig), bands_of), 1)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    ngram: int = 3,
    engine: str = "arrow",
) -> DataFrame:
    """Candidate near-duplicate pairs ``(id_a < id_b)`` sharing >= 1 LSH band.

    Each bucket member is paired with the bucket's min-id representative
    only — |bucket|-1 pairs instead of the all-pairs |bucket|^2/2. This is
    the property that keeps near-dedup alive at 100 TB: boilerplate-heavy
    corpora produce mega-buckets (5k synthetic docs already yield 2.9M
    all-pairs candidates), and representative pairing makes candidate count
    linear in input size while still dropping every bucket member that
    verifies against the representative. Plan shape: narrow projection ->
    persist (__id, __sig) -> posexplode bands -> two-phase min over
    (band_idx, band_hash) (map-side partial agg + AQE-splittable join-back;
    skew-immune, see _sig_band_pairs) -> filter.

    Persist lifecycle: intermediates are cached via
    ``session.managed_persist`` and freed by the NEXT registry-query build;
    direct library callers in a long-lived session should wrap calls in
    ``session.persist_scope()`` (or call ``release_persisted()``) after
    consuming the result.
    """
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    sig = minhash_signature(F.col(text_col), num_perm=num_perm, ngram=ngram, engine=engine)
    with_sig = df.select(F.col(id_col).alias("__id"), sig.alias("__sig"))
    return _sig_band_pairs(with_sig, bands, num_perm // bands)


def _banded_frame(with_sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(__id, __band_idx, __band_hash) — one row per (doc, band). Stage
    order matters: explode the cheap band INDEX, then hash the signature
    slice per exploded row (exploding a precomputed band-hash array would
    put the nested lambda under Generate, interpreted, ~5x slower).
    NULL-signature rows (no shingles) are dropped: they never pair."""
    exploded = with_sig.select(
        "__id", "__sig", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("__band_idx")
    )
    return exploded.select(
        "__id",
        "__band_idx",
        F.md5(
            F.concat(
                F.col("__band_idx").cast("string"),
                F.lit("|"),
                F.array_join(
                    F.transform(
                        F.slice(F.col("__sig"), F.col("__band_idx") * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                ),
            )
        ).alias("__band_hash"),
    ).filter(F.col("__band_hash").isNotNull())


def _sig_band_pairs(
    with_sig: DataFrame, bands: int, rows_per_band: int, distinct: bool = True
) -> DataFrame:
    """Bucket-representative candidate pairs from an (__id, __sig) frame
    (banding/stage-order rationale: _banded_frame).

    ``distinct=False`` skips the pair dedup exchange: callers whose
    downstream already collapses duplicates (the dedup operators distinct
    the LOSER ids) save a shuffle; a pair then appears once per shared band
    (~1.3x rows), which the memoized verification absorbs for less than the
    exchange cost.
    """
    from instructionspipe_spark.session import managed_persist

    # The two-phase representative min below reads the banded frame TWICE
    # (groupBy branch + join-back branch). Persist BANDED, not just the
    # signature frame: re-deriving banded per branch re-runs the explode +
    # per-row md5 over docs x bands rows, which the skew A/B (SKEW.md)
    # measured as the bulk of the two-phase constant factor. Banded is
    # narrow — (id, band_idx, 32-char hash) ~60 B/row — so caching it costs
    # far less than the corpus text it came from (MEMORY_AND_DISK default).
    banded = managed_persist(_banded_frame(with_sig, bands, rows_per_band))
    # Two-phase min, NOT a window: Window.partitionBy(band, hash) puts every
    # row of a hot bucket on ONE task — a boilerplate-heavy corpus with
    # millions of identical signatures makes that a straggler no AQE can
    # split. groupBy.min gets a map-side partial aggregate (the hot bucket
    # collapses to one row per input task before the exchange), and the
    # join-back is a plain shuffle join AQE's skew handling CAN split.
    reps = banded.groupBy("__band_idx", "__band_hash").agg(F.min("__id").alias("__min_id"))
    pairs = (
        banded.join(reps, ["__band_idx", "__band_hash"])
        .filter(F.col("__id") > F.col("__min_id"))
        .select(F.col("__min_id").alias("id_a"), F.col("__id").alias("id_b"))
    )
    return pairs.distinct() if distinct else pairs


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Jaccard similarity of two shingle arrays (duplicates tolerated).

    Inclusion-exclusion (|union| = |A| + |B| - |intersection|) rather than a
    second array_union hash set per pair — same trick as the Arrow kernel and
    ngram_jaccard_pairs; ~2x on verification-bound dedups. The identity only
    holds for SETS, so both inputs are passed through ``array_distinct``
    here; callers that already hold distinct arrays pay one no-op dedup pass
    (array_distinct over a distinct array is O(len)), callers that don't get
    correct similarities instead of silently inflated sizes."""
    a = F.array_distinct(shingles_a)
    b = F.array_distinct(shingles_b)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter.cast("double") / union.cast("double"))


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold: float | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Drop near-duplicates: for every candidate pair (optionally verified at
    ``jaccard >= threshold``), the row with the larger id is removed. The
    survivor choice (min id) replaces the reference's insertion-order rule
    with a deterministic one. Left-anti join keeps the plan shuffle-minimal.

    Verification joins the (small) candidate-pair frame back to the
    normalized TEXT, not to precomputed shingle arrays: the shingle array is
    ~10x the text it came from, so shuffling/persisting it loses to
    re-deriving shingle sets inside the Arrow jaccard kernel per pair. The
    pair frame is bounded by the near-duplicate count, so AQE picks a
    broadcast join and the corpus side streams — no wide shuffle at scale.

    Persist lifecycle: intermediates are cached via
    ``session.managed_persist`` and freed by the NEXT registry-query build;
    direct library callers in a long-lived session should wrap calls in
    ``session.persist_scope()`` (or call ``release_persisted()``) after
    consuming the result.
    """
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    sig = minhash_signature(F.col(text_col), num_perm=num_perm, ngram=ngram, engine=engine)
    with_sig = df.select(F.col(id_col).alias("__id"), sig.alias("__sig"))
    # distinct=False: the loser-id set is distinct'd below, so deduping the
    # pair frame here would only add an exchange.
    pairs = _sig_band_pairs(with_sig, bands, num_perm // bands, distinct=False)
    if threshold is not None:
        if engine == "arrow":
            nrm_a = df.select(F.col(id_col).alias("id_a"), shingle_normalize(F.col(text_col)).alias("__na"))
            nrm_b = df.select(F.col(id_col).alias("id_b"), shingle_normalize(F.col(text_col)).alias("__nb"))
            verify = _jaccard_kernel(ngram)(F.col("__na"), F.col("__nb")) >= F.lit(threshold)
        else:
            # jaccard() distincts internally; passing raw char_ngrams keeps
            # exactly one array_distinct pass per side, not two.
            nrm_a = df.select(
                F.col(id_col).alias("id_a"),
                char_ngrams(F.col(text_col), n=ngram).alias("__na"),
            )
            nrm_b = df.select(
                F.col(id_col).alias("id_b"),
                char_ngrams(F.col(text_col), n=ngram).alias("__nb"),
            )
            verify = jaccard(F.col("__na"), F.col("__nb")) >= F.lit(threshold)
        pairs = pairs.join(nrm_a, "id_a").join(nrm_b, "id_b").filter(verify).select("id_a", "id_b")
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def _lsh_greedy_filter(
    membership: DataFrame, most_dup: int, id_type, max_iter: int = 50
) -> DataFrame:
    """Losers of the reference's sequential LSH-index greedy
    (``etl_slimpajama_dc_proc.py:147-158``) over a ``(__id, __bucket)``
    membership frame: processing ids ASCENDING, a doc is dropped when more
    than ``most_dup`` previously-KEPT docs share >= 1 bucket with it;
    kept docs are inserted into the index, dropped docs are not.

    Distribution strategy: decisions only interact within a connected
    component of the bucket-sharing graph, so components run in parallel
    and only the (bounded, near-dup-sized) component itself is sequential.
    Components come from min-label propagation over the bucket-STAR edges
    (member <-> bucket-min representative — linear in membership, same
    connectivity as the all-pairs graph, no quadratic pair
    materialization); each iteration is one join + map-side-combined min,
    ``localCheckpoint``-pinned so the loop's lineage stays flat (use a
    checkpoint dir on a real cluster). Iterations are bounded by component
    diameter — near-dup clusters are bucket-stars, so 2-3 in practice.

    Returns a 1-column frame ``__loser`` of dropped ids."""
    membership = membership.select("__id", "__bucket").distinct()
    reps = membership.groupBy("__bucket").agg(
        F.min("__id").alias("__rep"), F.count(F.lit(1)).alias("__n")
    )
    # singleton buckets contribute no neighbors: drop them before anything
    mem = membership.join(
        reps.filter(F.col("__n") >= 2).select("__bucket", "__rep"), "__bucket"
    )
    from instructionspipe_spark.session import managed_persist

    mem = managed_persist(mem)
    star = mem.filter(F.col("__id") != F.col("__rep")).select("__rep", "__id")
    edges = star.select(F.col("__rep").alias("a"), F.col("__id").alias("b")).unionAll(
        star.select(F.col("__id").alias("a"), F.col("__rep").alias("b"))
    )
    edges = managed_persist(edges.distinct())
    labels = mem.select("__id").distinct().withColumn("__comp", F.col("__id"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("__id").alias("b"), F.col("__comp").alias("__nc")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("__nc").alias("__nmin"))
            .select(F.col("a").alias("__id"), "__nmin")
        )
        new_labels = labels.join(nbr_min, "__id", "left").select(
            "__id",
            F.least(F.col("__comp"), F.coalesce(F.col("__nmin"), F.col("__comp"))).alias(
                "__comp"
            ),
        ).localCheckpoint()
        changed = (
            new_labels.join(
                labels.select("__id", F.col("__comp").alias("__old")), "__id"
            )
            .filter(F.col("__comp") != F.col("__old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"component labeling did not converge in {max_iter} iterations "
            "— pathological chain-shaped bucket graph; raise max_iter"
        )

    grouped = mem.select("__id", "__bucket").join(labels, "__id")
    out_schema = T.StructType([T.StructField("__loser", id_type)])
    K = int(most_dup)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        kept_by_bucket: dict = {}
        dropped = []
        for doc_id, grp in pdf.groupby("__id", sort=True):
            nbrs: set = set()
            buckets = grp["__bucket"].unique()
            for b in buckets:
                s = kept_by_bucket.get(b)
                if s:
                    nbrs.update(s)
            if len(nbrs) <= K:
                for b in buckets:
                    kept_by_bucket.setdefault(b, set()).add(doc_id)
            else:
                dropped.append(doc_id)
        return pd.DataFrame({"__loser": pd.Series(dropped, dtype=pdf["__id"].dtype)})

    return grouped.groupBy("__comp").applyInPandas(greedy, schema=out_schema)


def minhash_lsh_dedup_most_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    most_dup: int = 0,
    num_perm: int = 16,
    bands: int = 4,
    ngram: int = 3,
    engine: str = "arrow",
) -> DataFrame:
    """MinHash-LSH near-dedup with the reference's ``most_dup`` knob
    (``etl_slimpajama_dc_proc.py:147-158``): accept a doc while at most
    ``most_dup`` previously-kept docs share an LSH bucket with it —
    exact insertion-order greedy semantics under ascending ``id_col``
    (the reference's file order; dropped docs never enter the index, so a
    doc whose only matches were themselves dropped survives).

    This is the faithful-semantics sibling of :func:`minhash_lsh_dedup`
    (which uses order-free pair-drop semantics and optional exact-jaccard
    verification): candidates here are banding-only, exactly like the
    reference's ``MinHashLshManagement.query_with_n_grams``. Scale shape:
    linear bucket membership (no pair materialization), per-component
    sequential greedy via ``applyInPandas`` — component size is the bound,
    and a boilerplate-heavy corpus should strip templates first (SCALE.md)
    exactly as for every banded dedup here."""
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    sig = minhash_signature(F.col(text_col), num_perm=num_perm, ngram=ngram, engine=engine)
    with_sig = df.select(F.col(id_col).alias("__id"), sig.alias("__sig"))
    # __band_hash already folds the band index into the md5, so it IS the
    # bucket key (same construction as the DuckDB oracle's bucket).
    banded = _banded_frame(with_sig, bands, num_perm // bands).select(
        "__id", F.col("__band_hash").alias("__bucket")
    )
    losers = _lsh_greedy_filter(banded, most_dup, df.schema[id_col].dataType)
    return df.join(
        losers.select(F.col("__loser").alias(id_col)), id_col, "left_anti"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def cross_corpus_near_dups(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    num_perm: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold: float = 0.5,
    engine: str = "arrow",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Fuzzy decontamination: (corpus_id, eval_id, jaccard) for every
    corpus row whose text is a MinHash near-duplicate (``jaccard >=
    threshold``) of an eval/benchmark row — the fuzzy complement of the
    exact n-gram ``contamination_screen`` (which misses lightly edited or
    truncated contamination).

    ``bucket_cap`` (opt-in) is this operator's instance of the hot-bucket
    law (r10 probe: alpha 1.27 over sf1 -> sf10 on the template-heavy
    synthetic, same class as incremental_minhash_dedup's measured r9 law):
    an EVAL-side banding bucket holding more than ``cap`` eval rows is
    boilerplate mass (benchmark headers, shared prompt templates), and
    every corpus row colliding with it fans out cap+ candidates. Capping
    the EVAL side — the side the candidates multiply against — bounds
    candidate volume at cap x |corpus banded rows|: LINEAR in corpus size
    no matter how hot the corpus's own buckets are, which is the side a
    decontamination run cannot control. Recall: a contaminated pair is
    missed only if every band it collides on is over-cap on the EVAL side,
    i.e. the benchmark row is itself template-saturated — strip benchmark
    boilerplate first (SCALE.md cap-selection rule).

    Scale contract mirrors contamination_screen: the eval side is SMALL
    (benchmarks are thousands of rows, the corpus is billions), so its
    banded frame broadcasts and the corpus streams through one equi-join on
    (band_idx, band_hash) — candidates only ACROSS sides, never the
    corpus-vs-corpus pair explosion. Verification is one Arrow jaccard per
    candidate, bounded by the true contamination count. The broadcast is
    STATS-GATED (``broadcast_if_small``), not forced: a user decontaminating
    against an eval side that outgrew the session broadcast threshold gets a
    sort-merge join, not a driver OOM.

    Persist lifecycle: intermediates are cached via
    ``session.managed_persist`` and freed by the NEXT registry-query build;
    direct library callers in a long-lived session should wrap calls in
    ``session.persist_scope()`` (or call ``release_persisted()``) after
    consuming the result.
    """
    eval_id_col = eval_id_col or id_col
    eval_text_col = eval_text_col or text_col
    from instructionspipe_spark.session import (
        broadcast_if_small,
        ensure_parallelism,
        managed_persist,
    )

    rows_per_band = num_perm // bands

    def side_banded(df: DataFrame, idc: str, txtc: str, persist: bool) -> DataFrame:
        sig = minhash_signature(F.col(txtc), num_perm=num_perm, ngram=ngram, engine=engine)
        with_sig = df.select(F.col(idc).alias("__id"), sig.alias("__sig"))
        if persist:
            with_sig = managed_persist(with_sig)
        return _banded_frame(with_sig, bands, rows_per_band)

    corpus = ensure_parallelism(corpus)
    cb = side_banded(corpus, id_col, text_col, persist=False)  # streams once
    eb = side_banded(eval_df, eval_id_col, eval_text_col, persist=True).select(
        F.col("__id").alias("__eval_id"), "__band_idx", "__band_hash"
    )
    if bucket_cap is not None:
        # Census over the (small, persisted-upstream) eval banded frame;
        # over-cap eval buckets generate no candidates.
        bucket_sizes = eb.groupBy("__band_idx", "__band_hash").agg(
            F.count(F.lit(1)).alias("__bc")
        )
        eb = eb.join(
            bucket_sizes.filter(F.col("__bc") <= bucket_cap).select(
                "__band_idx", "__band_hash"
            ),
            ["__band_idx", "__band_hash"],
        )
    pairs = (
        cb.join(broadcast_if_small(eb), ["__band_idx", "__band_hash"])
        .select(F.col("__id").alias("corpus_id"), F.col("__eval_id").alias("eval_id"))
        .distinct()
    )
    nrm_c = corpus.select(F.col(id_col).alias("corpus_id"), shingle_normalize(F.col(text_col)).alias("__nc"))
    nrm_e = eval_df.select(F.col(eval_id_col).alias("eval_id"), shingle_normalize(F.col(eval_text_col)).alias("__ne"))
    return (
        pairs.join(nrm_c, "corpus_id")
        .join(broadcast_if_small(nrm_e), "eval_id")
        .select(
            "corpus_id",
            "eval_id",
            F.round(_jaccard_kernel(ngram)(F.col("__nc"), F.col("__ne")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def minhash_band_store(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    ngram: int = 3,
    engine: str = "arrow",
) -> DataFrame:
    """The persistable MinHash-LSH signature store: one ``(__id, __band_idx,
    __band_hash)`` row per (document, band). This is the frame a 100 TB
    pipeline writes to parquet ONCE per corpus and appends per increment, so
    :func:`incremental_minhash_dedup` never re-signs the accumulated corpus
    — each nightly batch pays signatures only for its own rows plus one
    streamed equi-join against the store. NULL-signature docs (no shingles)
    are absent by construction: they never pair.

    The signing parameters are stamped into the output as constant columns
    (``__num_perm``, ``__bands``, ``__ngram``): band hashes from different
    parameterizations are incompatible — joining them yields zero candidates
    SILENTLY — so consumers (:func:`incremental_minhash_dedup`) verify the
    stamp in-plan and raise instead of admitting every batch row."""
    rows_per_band = num_perm // bands
    sig = minhash_signature(F.col(text_col), num_perm=num_perm, ngram=ngram, engine=engine)
    return _banded_frame(
        df.select(F.col(id_col).alias("__id"), sig.alias("__sig")), bands, rows_per_band
    ).select(
        "*",
        F.lit(num_perm).cast("int").alias("__num_perm"),
        F.lit(bands).cast("int").alias("__bands"),
        F.lit(ngram).cast("int").alias("__ngram"),
    )


def _validated_band_store(
    store: DataFrame, num_perm: int, bands: int, ngram: int
) -> DataFrame:
    """Verify a band store's stamped signing parameters match the consumer's,
    in-plan: a mismatched store joins on incompatible band hashes and yields
    zero candidates SILENTLY (every batch row admitted as kept=true), so the
    check is a ``raise_error`` wrapped around the join key — distributed, no
    extra action, fails the job on the first mismatched row. Pre-stamp stores
    (no ``__num_perm`` column) pass through unchecked for compatibility; the
    result carries only the join/identity columns either way."""
    if "__num_perm" not in store.columns:
        return store
    # eqNullSafe, not ==: a NULL stamp under plain equality makes stamp_ok
    # NULL, ~NULL is NULL, and when() falls through to otherwise — the
    # corrupt row would pass validation silently, the exact failure mode
    # this check exists to kill. Null-safe equality makes NULL != literal.
    stamp_ok = (
        F.col("__num_perm").eqNullSafe(F.lit(num_perm))
        & F.col("__bands").eqNullSafe(F.lit(bands))
        & F.col("__ngram").eqNullSafe(F.lit(ngram))
    )
    msg = (
        "minhash band store parameter mismatch: store was signed with "
        "different (num_perm, bands, ngram) than this consumer expects "
        f"(num_perm={num_perm}, bands={bands}, ngram={ngram}); band hashes "
        "are incompatible and would silently produce zero candidates"
    )
    return store.select(
        "__id",
        "__band_idx",
        F.when(~stamp_ok, F.raise_error(F.lit(msg)))
        .otherwise(F.col("__band_hash"))
        .alias("__band_hash"),
    )


def incremental_minhash_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    batch_id_col: str | None = None,
    batch_text_col: str | None = None,
    num_perm: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold: float = 0.5,
    engine: str = "arrow",
    corpus_store: DataFrame | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Incremental near-dedup: admit a NEW batch against an accumulated
    corpus. One row per batch record — ``(batch_id, dup_of, jaccard,
    kept)`` where ``dup_of`` is the best-matching corpus id (max verified
    jaccard, min id on ties — deterministic in any engine via the
    pre-rounded score), NULL + ``kept=true`` when no corpus row clears
    ``threshold``. The reference dedups only whole static corpora
    (``apps/etl/etl_slimpajama_dc_proc.py``); incremental admission is what
    a continuously-crawling 100 TB pipeline actually runs nightly.

    Scale shape: the CORPUS side is the big one and streams exactly once —
    through one equi-join on ``(band_idx, band_hash)`` against the batch's
    banded frame (stats-gated broadcast). Pass ``corpus_store`` (a persisted
    :func:`minhash_band_store` frame read back from parquet) and the corpus
    text is never re-signed; verification re-reads only the candidate
    corpus rows. Candidates exist only ACROSS sides — batch-vs-batch and
    corpus-vs-corpus pairs are never formed. Best-match election is a
    two-phase ``groupBy.max`` on a ``(jaccard, -id)`` struct (map-side
    combine; a hot batch row matching millions of boilerplate corpus rows
    collapses per input task, never on one window task).

    Persist lifecycle: the batch signature frame is cached via
    ``session.managed_persist`` and freed by the NEXT registry-query build;
    direct library callers in a long-lived session should wrap calls in
    ``session.persist_scope()`` (or call ``release_persisted()``) after
    consuming the result.
    """
    batch_id_col = batch_id_col or id_col
    batch_text_col = batch_text_col or text_col
    from instructionspipe_spark.session import (
        broadcast_if_small,
        ensure_parallelism,
        managed_persist,
    )

    rows_per_band = num_perm // bands
    corpus = ensure_parallelism(corpus)
    if corpus_store is None:
        corpus_store = minhash_band_store(
            corpus, id_col, text_col, num_perm=num_perm, bands=bands, ngram=ngram, engine=engine
        )
    corpus_store = _validated_band_store(corpus_store, num_perm, bands, ngram)
    sig = minhash_signature(F.col(batch_text_col), num_perm=num_perm, ngram=ngram, engine=engine)
    batch_sig = managed_persist(
        batch.select(F.col(batch_id_col).alias("__id"), sig.alias("__sig"))
    )
    bb = _banded_frame(batch_sig, bands, rows_per_band).select(
        F.col("__id").alias("__batch_id"), "__band_idx", "__band_hash"
    )
    if bucket_cap is not None:
        # Template-noise guard (OPT-IN, default off): a banding bucket with
        # thousands of members is boilerplate mass, not near-dup signal —
        # measured on the sf10 synthetic tier, hot buckets (top ~2.4% of
        # the corpus EACH) drove 185M candidate pairs of which 99.99%
        # failed exact verification, turning candidate volume quadratic in
        # corpus size. Excluding over-cap buckets bounds per-bucket pair
        # fan-out at cap * batch_bucket_size. Recall cost: a true near-dup
        # pair is missed only if EVERY band it collides on is over-cap —
        # i.e. both docs are template-saturated, the regime SCALE.md says
        # to template-strip first. The cap is a candidate-generation knob;
        # verification semantics are unchanged.
        bucket_sizes = corpus_store.groupBy("__band_idx", "__band_hash").agg(
            F.count(F.lit(1)).alias("__bc")
        )
        corpus_store = corpus_store.join(
            bucket_sizes.filter(F.col("__bc") <= bucket_cap).select(
                "__band_idx", "__band_hash"
            ),
            ["__band_idx", "__band_hash"],
        )
    pairs = (
        corpus_store.join(broadcast_if_small(bb), ["__band_idx", "__band_hash"])
        .select(F.col("__batch_id").alias("batch_id"), F.col("__id").alias("corpus_id"))
        .distinct()
    )
    nrm_c = corpus.select(
        F.col(id_col).alias("corpus_id"), shingle_normalize(F.col(text_col)).alias("__nc")
    )
    nrm_b = batch.select(
        F.col(batch_id_col).alias("batch_id"),
        shingle_normalize(F.col(batch_text_col)).alias("__nb"),
    )
    verified = (
        pairs.join(nrm_c, "corpus_id")
        .join(broadcast_if_small(nrm_b), "batch_id")
        .select(
            "batch_id",
            "corpus_id",
            F.round(_jaccard_kernel(ngram)(F.col("__nb"), F.col("__nc")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )
    best = verified.groupBy("batch_id").agg(
        F.max(F.struct(F.col("jaccard"), (-F.col("corpus_id")).alias("__neg_id"))).alias("__m")
    )
    return (
        batch.select(F.col(batch_id_col).alias("batch_id"))
        .join(best, "batch_id", "left")
        .select(
            F.col("batch_id").alias(batch_id_col),
            (-F.col("__m.__neg_id")).alias("dup_of"),
            F.col("__m.jaccard").alias("jaccard"),
            F.col("__m").isNull().alias("kept"),
        )
    )


def simhash(text: Column, bits: int = 32, ngram: int = 3, engine: str = "arrow") -> Column:
    """SimHash fingerprint as a BIGINT built from ``bits`` bit-votes.

    Each distinct shingle contributes +1/-1 per bit of its 48-bit base hash;
    the fingerprint bit is 1 when the vote sum is positive. One md5 per
    shingle, then shift/mask arithmetic — per-row computation, no shuffle,
    mirrored in SQL with ``>>`` and ``%``. The arrow engine matters most
    here: the expression form needs ``bits`` interpreted vote passes over
    the shingle hash array, the kernel one vectorized matrix reduction.

    Empty shingle sets (text shorter than ``ngram``, empty, or NULL) yield a
    NULL fingerprint, NOT 0 — an all-zero fingerprint would silently collapse
    every short-but-different document into one dedup survivor. NULL rows
    pass through both dedup operators untouched (the same contract as the
    NULL MinHash signature); run the low-length filter (P5) first to drop
    them explicitly.
    """
    if not 1 <= bits <= 48:
        raise ValueError(
            f"simhash bits={bits}: the per-shingle base hash is 48-bit "
            "(md5 slice, see base_hash48), so fingerprints support at most "
            "48 voted bit positions"
        )
    if engine == "arrow":
        return _simhash_kernel(bits, ngram)(shingle_normalize(text))
    shingles = F.array_distinct(char_ngrams(text, n=ngram))
    hashes = F.transform(shingles, base_hash48)

    def vote_sum(hs: Column, b: int) -> Column:
        return F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, b) % 2) * 2 - 1,
        )

    def fingerprint(hs: Column) -> Column:
        out = F.lit(0).cast("long")
        for b in range(bits):
            out = out + F.when(vote_sum(hs, b) > 0, F.lit(2**b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        # NULL guard INSIDE the lambda, on the let-bound array: wrapping the
        # whole element_at(transform(...)) in when(size(shingles) > 0, ...)
        # re-evaluates the shingle expression AND broke the let-binding shape
        # (10x measured on simhash_near_dedup).
        return F.when(F.size(hs) > 0, out)

    # Same let-binding trick as minhash_signature: hash each shingle once,
    # then run all `bits` vote passes over the bound array.
    return F.element_at(F.transform(F.array(hashes), fingerprint), 1)


def simhash_dedup(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32, ngram: int = 3, engine: str = "arrow"
) -> DataFrame:
    """Exact-fingerprint SimHash dedup: rows with identical simhash collapse
    to the min-id survivor. (Hamming-radius matching would bucket by bit
    bands, same LSH shape as MinHash.)"""
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    with_fp = df.withColumn("__fp", simhash(F.col(text_col), bits=bits, ngram=ngram, engine=engine))
    # NULL fingerprints (sub-ngram texts) are not comparable: they pass
    # through; only rows with a real fingerprint deduplicate.
    nulls = with_fp.filter(F.col("__fp").isNull()).drop("__fp")
    deduped = exact_dedup(with_fp.filter(F.col("__fp").isNotNull()), ["__fp"], [id_col]).drop("__fp")
    return deduped.unionByName(nulls)


# ---------------------------------------------------------------------------
# N-gram Jaccard pairs + embedding near-dup
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
    min_jaccard: float = 0.0,
    ngram: int = 3,
) -> DataFrame:
    """All pairs (id_a < id_b) with their n-gram Jaccard similarity.

    ``block_col`` is the blocking key (only rows sharing it are compared) —
    mandatory at scale; the unblocked form is O(n^2) and only for tests.
    """
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    sh = df.select(
        F.col(id_col).alias("__id"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
        F.array_distinct(char_ngrams(F.col(text_col), n=ngram)).alias("__sh"),
    ).withColumn("__n", F.size("__sh"))
    # The pair stage is O(block^2) BY DESIGN (jaccard_pairs_lsh is the
    # linear scale path); what matters is the constant and the spread.
    # |union| = |A| + |B| - |intersection| over distinct arrays, so one
    # array_intersect replaces intersect+union (the union built a second
    # hash set per candidate pair — measured ~2x on the sf0.1 en block).
    # The min_jaccard filter deliberately stays a post-join Filter Catalyst
    # pushes into the join condition; the division semantics (double
    # compare, not a cleared-denominator integer form) must match the
    # oracle's exactly.
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    if block_col:
        cond = cond & (F.col("a.__blk") == F.col("b.__blk"))
    inter = F.size(F.array_intersect(F.col("a.__sh"), F.col("b.__sh")))
    union = F.col("a.__n") + F.col("b.__n") - inter
    jac = F.when(
        union > 0, inter.cast("double") / union.cast("double")
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )


def word_ngram_hash_ids(
    df: DataFrame, id_col: str, text_col: str, ngram_words: int = 5
) -> DataFrame:
    """Distinct word-``n``-gram 48-bit hashes per document: (id, __h) rows.

    The contamination-screen primitive. Expression-only, and shaped for the
    interpreted-Generate trap: the explode input is the cheap position
    sequence; the n-gram string (concat over a token slice) and its hash
    are computed AFTER the explode, inside codegen. Shuffle cost is one
    distinct on (id, hash) — 8-byte keys, uniform."""
    from instructionspipe_spark.functions.text import shingle_normalize
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    toks = F.filter(F.split(shingle_normalize(F.col(text_col)), " "), lambda t: t != "")
    cnt = F.size(F.col("__toks"))
    # sequence(1, 0) is DESCENDING [1, 0], not empty — guard short docs.
    seq = F.when(
        cnt >= ngram_words, F.sequence(F.lit(1), cnt - F.lit(ngram_words - 1))
    ).otherwise(F.array().cast("array<int>"))
    exploded = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(F.col(id_col), F.col("__toks"), F.explode(seq).alias("__i"))
    )
    gram = F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__i"), ngram_words))
    return exploded.select(F.col(id_col), base_hash48(gram).alias("__h")).distinct()


def contamination_screen(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_words: int = 5,
    min_shared: int = 3,
) -> DataFrame:
    """Train/eval contamination screen: for every (train doc, eval doc)
    pair, count the distinct word-n-grams they share; report pairs at or
    above ``min_shared`` — the standard pre-training hygiene check that a
    benchmark's text leaked into the corpus.

    Scale shape: the eval side is benchmarks (tiny vs a 100 TB corpus), so
    its hash set broadcasts; the corpus streams through one equi-join on
    the 8-byte n-gram hash, then one aggregate keyed by the (train, eval)
    pair — bounded by true overlap, never corpus x eval. The broadcast is
    stats-gated (``broadcast_if_small``): an eval side over the session
    threshold degrades to a sort-merge join instead of a driver OOM."""
    from instructionspipe_spark.session import broadcast_if_small

    t = word_ngram_hash_ids(train, id_col, text_col, ngram_words).withColumnRenamed(
        id_col, "train_id"
    )
    e = word_ngram_hash_ids(eval_df, id_col, text_col, ngram_words).withColumnRenamed(
        id_col, "eval_id"
    )
    return (
        t.join(broadcast_if_small(e), "__h")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column; keep-min-id
    dedup composes via a left-anti join exactly like minhash_lsh_dedup.
    At scale, block first (LSH / IVF bucket from operators.similarity).

    Vectors are unit-normalized per ROW before the pairwise join, so each
    pair costs one dot product — norms are never recomputed per pair."""
    from instructionspipe_spark.functions.vectors import dot_product, l2_normalize
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    cols = [F.col(id_col).alias("__id"), l2_normalize(F.col(vec_col)).alias("__nv")]
    if block_col:
        cols.append(F.col(block_col).alias("__blk"))
    v = df.select(*cols)
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    if block_col:
        cond = cond & (F.col("a.__blk") == F.col("b.__blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            dot_product(F.col("a.__nv"), F.col("b.__nv")).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def simhash_band_buckets(fp: Column, bands: int, bits_per_band: int) -> Column:
    """LSH over fingerprint bits: array of ``bands`` integer buckets, band b
    = bits [b*bits_per_band, (b+1)*bits_per_band) of the fingerprint."""
    mask = (1 << bits_per_band) - 1
    return F.array(
        *[F.shiftright(fp, b * bits_per_band).bitwiseAND(F.lit(mask)) for b in range(bands)]
    )


def simhash_near_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    bands: int = 4,
    radius: int = 3,
    ngram: int = 3,
    engine: str = "arrow",
) -> DataFrame:
    """Hamming-radius SimHash near-dedup: docs whose fingerprints differ in
    <= ``radius`` bits collapse to the min-id survivor.

    LSH on bit-bands: a pair within ``radius`` differing bits has, by
    pigeonhole, at least one of ``bands`` bands fully intact whenever
    ``radius < bands`` — so candidate recall is EXACT (no false negatives),
    unlike MinHash banding which is probabilistic. Candidates pair each
    bucket member with the bucket's min-id representative (linear in bucket
    size, same scale guarantee as minhash_lsh_candidates); verification is
    one ``bit_count(xor)`` per pair. Plan: per-row fingerprint expression ->
    explode ``bands`` ints -> one shuffle on (band, bucket) -> popcount
    filter -> left-anti join.

    Replaces the reference's order-dependent in-memory near-dedup
    (``apps/etl/etl_slimpajama_dc_proc.py:116-158``) with a deterministic,
    shuffle-bounded formulation.

    Persist lifecycle: intermediates are cached via
    ``session.managed_persist`` and freed by the NEXT registry-query build;
    direct library callers in a long-lived session should wrap calls in
    ``session.persist_scope()`` (or call ``release_persisted()``) after
    consuming the result.
    """
    assert radius < bands, "exact recall needs radius < bands (pigeonhole)"
    from instructionspipe_spark.session import ensure_parallelism

    from instructionspipe_spark.session import managed_persist

    bits_per_band = bits // bands
    # Persisted: the two-phase representative min reads the banded frame
    # twice (groupBy + join-back); caching (id, fp) — 16 bytes/doc — keeps
    # the simhash kernel single-pass. (Unlike the minhash path, banding
    # here is a bit-shift per row, so persisting dfp rather than the
    # bands-times-larger banded frame is the right trade.)
    #
    # Constant pinned (r5 A/B at sf0.1, 5-rep medians, release between runs):
    # persist-dfp 0.98 s ≈ persist-banded 0.94 s ≈ dfp+broadcast-reps 1.00 s
    # ≈ both 1.01 s — placement is inside noise, no accidental
    # double-materialization. The Arrow fingerprint kernel alone is 0.31 s;
    # the rest is band-shuffle + join-back + anti-join. The old window
    # formulation REBUILT under the same harness measures 1.47 s — the r3
    # "0.72 s" it was compared against was a last-warm-run sample, not a
    # cold-build median, so the reported r4 regression was methodology; the
    # shipped two-phase path is faster locally AND skew-safe (SKEW.md).
    dfp = managed_persist(
        ensure_parallelism(df).select(
            F.col(id_col).alias("__id"),
            simhash(F.col(text_col), bits=bits, ngram=ngram, engine=engine).alias("__fp"),
        )
    )
    # NB: no isNotNull prefilter on __fp — Catalyst would push it through
    # the projection by SUBSTITUTING the whole fingerprint expression into
    # the predicate (recomputing it per row, 6x measured). NULL-fp rows are
    # harmless: their pairs fail the bit_count(xor) predicate (NULL), so
    # they never lose.
    banded = dfp.select(
        "__id",
        "__fp",
        F.posexplode(simhash_band_buckets(F.col("__fp"), bands, bits_per_band)).alias(
            "__band_idx", "__bucket"
        ),
    )
    # Two-phase min (groupBy partial agg + join-back) instead of a window:
    # same skew rationale as _sig_band_pairs — a bucket holding millions of
    # identical fingerprints must not land on a single window task.
    reps = banded.groupBy("__band_idx", "__bucket").agg(
        F.min(F.struct("__id", "__fp")).alias("__rep")
    )
    pairs = (
        banded.join(reps, ["__band_idx", "__bucket"])
        .filter(F.col("__id") > F.col("__rep.__id"))
        .filter(
            F.bit_count(F.col("__fp").bitwiseXOR(F.col("__rep.__fp"))) <= F.lit(radius)
        )
        .select(F.col("__id").alias(id_col))
        .distinct()
    )
    return df.join(pairs, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Corpus-wide exact block dedup (C4-style)
# ---------------------------------------------------------------------------

def _word_block_frames(
    df: DataFrame, id_col: str, text_col: str, block_words: int
) -> tuple[DataFrame, DataFrame]:
    """Shared block machinery for word_block_dedup / template_block_strip:
    ``base`` = (__id, __w, __nb) per doc, ``hashed`` = (__id, __bi, __btext,
    __h) per block. Stage order per the Generate rule: explode the
    cheap block index, slice/concat/hash per exploded row in codegen.

    Survivor election downstream is min(struct(__id, __bi)) — lexicographic
    on the raw columns, so any orderable id type (long, string, decimal)
    works with no packed-key overflow at any id magnitude."""
    assert block_words >= 1
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    nb_raw = F.ceil(F.size("__w") / F.lit(block_words)).cast("long")
    base = df.select(F.col(id_col).alias("__id"), words.alias("__w")).select(
        "__id",
        "__w",
        nb_raw.alias("__nb"),
    )
    # sequence(0, -1) would be DESCENDING, not empty — guard zero-block docs.
    blocks = base.filter(F.col("__nb") > 0).select(
        "__id",
        "__w",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("__nb") - 1)).alias("__bi"),
    ).select(
        "__id",
        "__bi",
        F.concat_ws(
            " ", F.slice(F.col("__w"), (F.col("__bi") * block_words + 1).cast("int"), block_words)
        ).alias("__btext"),
    )
    hashed = blocks.select(
        "__id",
        "__bi",
        "__btext",
        F.md5(F.col("__btext")).alias("__h"),
    )
    return base, hashed


def _reassemble_blocks(base: DataFrame, kept: DataFrame, id_col: str) -> DataFrame:
    """Rebuild documents from surviving blocks in block order; docs whose
    every block was cut come back as ''."""
    reassembled = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__bi", "__btext"))),
                lambda s: s["__btext"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        base.select("__id", F.col("__nb").alias("n_blocks"))
        .join(reassembled, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "n_blocks",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        )
    )


def word_block_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_words: int = 8,
) -> DataFrame:
    """C4-style corpus-wide exact block dedup: split each document into
    consecutive ``block_words``-word blocks; every block TEXT that occurs
    more than once in the corpus survives only at its FIRST occurrence
    (minimal ``(doc_id, block_idx)``) and is cut everywhere else; documents
    are reassembled from their surviving blocks in order.

    The C4 pipeline (Raffel et al. 2020, §2.2) does this at the
    three-sentence granularity; fixed word windows are the
    tokenizer/punctuation-free equivalent, deterministic across engines.

    Output: ``(id_col, text, n_blocks, n_kept)`` — ``text`` is the
    reassembled document ('' when every block was cut), ``n_blocks``/
    ``n_kept`` the before/after block counts (0 for empty/whitespace docs).

    Scale shape: explode cheap block INDEXES (the slice + join happens on
    exploded rows, in codegen, not under Generate); one shuffle keyed by the
    block md5 (uniform by construction); survivor election is the same
    two-phase groupBy-min + join-back as the LSH representatives — a
    boilerplate block occurring 10^9 times collapses map-side, never on one
    task; reassembly is one groupBy on the doc id. No pairwise anything.
    """
    base, hashed = _word_block_frames(df, id_col, text_col, block_words)
    # Two-phase first-occurrence election on min(struct(__id, __bi)):
    # partial-aggregates map-side like the packed-long variant, but is exact
    # for any orderable id type and cannot overflow at any id magnitude.
    first = hashed.groupBy("__h").agg(
        F.min(F.struct("__id", "__bi")).alias("__first")
    )
    kept = (
        hashed.join(first, "__h")
        .filter(
            (F.col("__id") == F.col("__first.__id"))
            & (F.col("__bi") == F.col("__first.__bi"))
        )
        .select("__id", "__bi", "__btext")
    )
    return _reassemble_blocks(base, kept, id_col)


def template_block_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_words: int = 8,
    max_doc_frequency: int = 2,
) -> DataFrame:
    """Boilerplate template removal: cut every ``block_words``-word block
    whose text appears in MORE than ``max_doc_frequency`` distinct documents
    — headers, footers, cookie banners, licence blurbs — from EVERY
    document (no survivor, unlike :func:`word_block_dedup`'s
    first-occurrence rule: a block that common is template, not content).
    The action the ``frequent_ngrams`` / ``lsh_bucket_stats`` diagnostics
    point at; RefinedWeb/C4-style pipelines run exactly this before
    near-dedup so mega-buckets never form.

    Output: ``(id_col, text, n_blocks, n_kept)`` like word_block_dedup.

    Scale shape: same single block explode (cheap index first, slice+hash
    in codegen); the doc-frequency census is a two-level aggregate —
    distinct (block, doc) collapses map-side, then one count per block md5
    (uniform shuffle keys); the filter join is block-keyed, reassembly one
    groupBy on the doc id. A template block in 10^9 docs collapses per
    input task, never on one reducer.
    """
    base, hashed = _word_block_frames(df, id_col, text_col, block_words)
    freq = (
        hashed.select("__h", "__id")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
    )
    kept = (
        hashed.join(freq, "__h")
        .filter(F.col("__df") <= max_doc_frequency)
        .select("__id", "__bi", "__btext")
    )
    return _reassemble_blocks(base, kept, id_col)


def lsh_bucket_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    ngram: int = 3,
    engine: str = "arrow",
    top_k: int = 10,
) -> DataFrame:
    """LSH health check: the ``top_k`` largest band buckets with their
    member counts — run BEFORE a near-dedup pass to spot mega-buckets (a
    bucket holding 30% of the corpus means boilerplate that deserves
    template stripping / word_block_dedup first, and predicts where the
    two-phase representative election will be earning its keep).

    Output: ``(band_idx, band_hash, n_docs, rank)``; rank orders buckets
    within each band by size desc (ties by hash asc).

    Scale shape: the same single banding pass the dedup operators run, then
    ONE count aggregation with map-side partials (the mega-bucket itself
    collapses per task) over (band, hash); the per-band top-k window is
    rank-limited, so Spark's WindowGroupLimit keeps each map task to k rows
    per band before the exchange.
    """
    from instructionspipe_spark.session import ensure_parallelism

    d = ensure_parallelism(df)
    sig = minhash_signature(F.col(text_col), num_perm=num_perm, ngram=ngram, engine=engine)
    with_sig = d.select(F.col(id_col).alias("__id"), sig.alias("__sig"))
    banded = _banded_frame(with_sig, bands, num_perm // bands)
    sizes = banded.groupBy("__band_idx", "__band_hash").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("__band_idx").orderBy(F.desc("n_docs"), F.asc("__band_hash"))
    return (
        sizes.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("__band_idx").alias("band_idx"),
            F.col("__band_hash").alias("band_hash"),
            "n_docs",
            "rank",
        )
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 8,
    threshold: float = 0.92,
    round_digits: int = 6,
    trained: bool = False,
    seed: int = 42,
    max_iter: int = 10,
    assign_levels: int = 1,
    super_probes: int = 2,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space near-duplicate removal
    — cluster the corpus into ``n_cells`` coarse cells, form cosine pairs
    ONLY within a cell, and cut every vector that has a smaller-id neighbor
    above ``threshold`` (deterministic stand-in for the paper's
    keep-one-per-semantic-cluster rule; the reference has no embedding
    operators at all). This is the semantic complement to MinHash — it
    catches paraphrases and re-encodings that share no shingles.

    Two quantizer modes like :func:`ivfadc_topk`: default deterministic
    (cells = the ``n_cells`` lowest-id vectors; fully SQL-expressible,
    oracle-checkable) or ``trained=True`` (``pyspark.ml`` KMeans — the
    production configuration).

    Output: one row per non-null-normalizable input vector —
    ``(id_col, cell, kept, dup_of, cosine)`` where ``dup_of`` is the
    smallest same-cell id above threshold (NULL + kept=true otherwise).

    Scale shape: pairs exist only WITHIN a cell (the SemDeDup design point:
    at 100 TB n_cells is ~1e5, cells are ~1e4 rows, so the within-cell
    pairwise is bounded while cross-cell pairs — overwhelmingly non-dups —
    are never formed); the cell assignment is a broadcast of n_cells
    centroids + a two-phase groupBy-max argmax (map-side combine, no
    window over the corpus); the loser election is the dedup family's
    two-phase ``groupBy(id_b).min(id_a)`` + one join back. Boundary pairs
    split across cells are missed by construction — the documented
    SemDeDup trade (raise n_cells overlap via a second clustering pass if
    that loss matters).

    ``assign_levels=2`` (opt-in) replaces the flat n x n_cells assignment
    argmax with HIERARCHICAL routing: centroids are grouped under
    ceil(sqrt(n_cells)) super-centroids (the lowest-id centroids; each
    child routes to its nearest super, itself for a super's own cell), a
    vector picks its best super then its best child WITHIN that super —
    O(n * sqrt(k)) candidate dot products instead of O(n * k). The r10
    probe measured the flat assignment as the operator's only superlinear
    term once cells scale with the corpus (k ∝ n makes flat assignment
    O(n²/cell_size); alpha 1.16 at the fourth decade, pairwise itself
    alpha 1.00 on balanced cells). Routing is approximate at super-cell
    boundaries — a vector whose true-best cell's child lives under a
    different super lands in a neighboring cell — which changes only the
    PARTITION (the same documented SemDeDup boundary trade as n_cells),
    never the verified cosine of an emitted pair; both levels tie-break
    (rounded cos desc, lowest id) so the assignment is deterministic and
    SQL-replayable (`semantic_dedup_two_level` oracle row).
    """
    from instructionspipe_spark.functions.vectors import dot_product, l2_normalize
    from instructionspipe_spark.session import ensure_parallelism, managed_persist

    df = ensure_parallelism(df)
    v = df.select(F.col(id_col).alias("__id"), l2_normalize(F.col(vec_col)).alias("__nv")).filter(
        F.col("__nv").isNotNull()
    )
    if trained:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        v_ml = v.withColumn("__mlvec", array_to_vector(F.col("__nv").cast("array<double>")))
        model = KMeans(
            k=n_cells, seed=seed, maxIter=max_iter,
            featuresCol="__mlvec", predictionCol="__cell",
        ).fit(v_ml)
        # L2-normalize the centroids before the dot-product argmax so the
        # assignment is spherical-kmeans (cosine argmax), not a
        # norm-weighted proxy of the fitted model's Euclidean predict —
        # over L2-normalized inputs, argmax cos(v, c/|c|) == argmin
        # ||v - c|| up to the centroid-norm term, and normalizing removes
        # that term exactly (ADVICE r6).
        cent = df.sparkSession.createDataFrame(
            [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
            ["__cell", "__cent"],
        ).select(
            "__cell",
            l2_normalize(F.col("__cent").cast("array<double>")).alias("__cent"),
        )
    else:
        cent = (
            v.orderBy("__id")
            .limit(n_cells)
            .select(F.col("__id").alias("__cell"), F.col("__nv").alias("__cent"))
        )
    if assign_levels not in (1, 2):
        raise ValueError(f"assign_levels must be 1 or 2, got {assign_levels}")

    def _argmax(df: DataFrame, keys: list, vec: str, cand_id: str, cand_vec: str, out: str) -> DataFrame:
        """Two-phase groupBy-max argmax on a (rounded-cos, -candidate_id)
        struct — map-side combine, lowest candidate id on ties."""
        return (
            df.select(
                *keys,
                vec,
                F.struct(
                    F.round(dot_product(F.col(vec), F.col(cand_vec)), round_digits).alias("__c"),
                    (-F.col(cand_id)).alias("__neg"),
                ).alias("__s"),
            )
            .groupBy(*keys)
            .agg(F.max("__s").alias("__m"), F.first(vec).alias(vec))
            .select(*keys, (-F.col("__m.__neg")).alias(out), vec)
        )

    if assign_levels == 2:
        import math

        n_super = math.isqrt(max(n_cells - 1, 0)) + 1  # ceil(sqrt(n_cells))
        sup = (
            cent.orderBy("__cell")
            .limit(n_super)
            .select(F.col("__cell").alias("__super"), F.col("__cent").alias("__scent"))
        )
        # child centroid -> super routing: k x sqrt(k), tiny, broadcast both
        # sides. A super's own cell routes to itself (cos = 1 is the max).
        c2s = _argmax(
            cent.crossJoin(F.broadcast(sup)).withColumnRenamed("__cent", "__cvec"),
            ["__cell"], "__cvec", "__super", "__scent", "__super",
        ).withColumnRenamed("__cvec", "__cent")
        # vector -> top `super_probes` supers: n x sqrt(k) candidates. One
        # probe is NOT enough — measured at the fourth decade, single-probe
        # routing skews cell occupancy 4x (max cell 2,951 -> 11,892 on
        # balanced data) because a misrouted vector is forced onto its
        # super's best child, and the pairwise term is quadratic in the
        # hottest cell. Probing the top-2 supers (IVF's n_probe trick)
        # widens each vector's candidate children enough to restore the
        # flat assignment's balance while keeping O(n * sqrt(k)) dots.
        # The per-vector top-P window is safe: partitions are size
        # sqrt(k), never a hot key.
        w = Window.partitionBy("__id").orderBy(
            F.desc("__c"), F.asc("__super")
        )
        vsup = (
            v.crossJoin(F.broadcast(sup))
            .select(
                "__id",
                "__nv",
                "__super",
                F.round(
                    dot_product(F.col("__nv"), F.col("__scent")), round_digits
                ).alias("__c"),
            )
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= super_probes)
            .select("__id", "__nv", "__super")
        )
        # vector -> best child across its probed supers: each cell belongs
        # to exactly one super, so candidates never duplicate.
        assigned = managed_persist(
            _argmax(
                vsup.join(F.broadcast(c2s), "__super"),
                ["__id"], "__nv", "__cell", "__cent", "__cell",
            ).select("__id", "__cell", "__nv")
        )
    else:
        assigned = managed_persist(
            _argmax(
                v.crossJoin(F.broadcast(cent)), ["__id"], "__nv", "__cell", "__cent", "__cell"
            ).select("__id", "__cell", "__nv")
        )
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = (
        a.join(b, (F.col("a.__cell") == F.col("b.__cell")) & (F.col("a.__id") < F.col("b.__id")))
        .select(
            F.col("a.__id").alias("__id_a"),
            F.col("b.__id").alias("__id_b"),
            F.round(dot_product(F.col("a.__nv"), F.col("b.__nv")), round_digits).alias("__cos"),
        )
        .filter(F.col("__cos") >= F.lit(threshold))
    )
    losers = pairs.groupBy("__id_b").agg(
        F.min(F.struct("__id_a", "__cos")).alias("__l")
    )
    return (
        assigned.join(losers, assigned["__id"] == losers["__id_b"], "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__cell").alias("cell"),
            F.col("__l").isNull().alias("kept"),
            F.col("__l.__id_a").alias("dup_of"),
            F.col("__l.__cos").alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Sliding-window (suffix-array-style) span dedup — Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better"
# (arXiv:2107.06499). The paper's ExactSubstr dedup builds a suffix array,
# which does not distribute; the standard cluster-scale approximation is
# sliding k-token window hashing — every duplicated substring of >= k tokens
# is covered by at least one duplicated k-gram window, so removing
# repeated-window occurrences removes the long duplicated substrings the
# suffix array would find (plus a bounded fringe of < k-1 tokens).
# word_block_dedup (above) cuts NON-overlapping fixed blocks and misses any
# duplicate that straddles a block boundary at a different offset; the
# sliding window is offset-invariant.
# ---------------------------------------------------------------------------


def _span_frames(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """Shared sliding-span machinery: ``base`` = (__id, __w, __n) per doc,
    ``spans`` = (__id, __i, __h) per k-token window (1-based start position;
    __h = md5 of the space-joined window text). Stage order per the Generate
    rule: explode the cheap start INDEX, slice/join/hash per exploded row in
    codegen — never materialize the k-token strings under Generate.

    Hashing to a fixed-width md5 before the shuffle keeps the exchange
    payload bounded (32 hex chars) regardless of token lengths; md5 (not
    xxhash64) because the DuckDB oracle computes the identical digest, so
    parity is structural."""
    if k < 2:
        raise ValueError(
            f"span dedup: window size k ({k}) must be >= 2 — a 1-token "
            "window degenerates to exact token dedup"
        )
    from instructionspipe_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = df.select(
        F.col(id_col).alias("__id"), words.alias("__w")
    ).select("__id", "__w", F.size("__w").cast("long").alias("__n"))
    # sequence(1, 0) would be DESCENDING, not empty — guard short docs.
    spans = (
        base.filter(F.col("__n") >= k)
        .select(
            "__id",
            "__w",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("__n") - (k - 1))
            ).alias("__i"),
        )
        .select(
            "__id",
            "__i",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("__w"), F.col("__i").cast("int"), k))
            ).alias("__h"),
        )
    )
    # Both consumers read base twice (tokens + final length join) and spans
    # twice (first-occurrence election + dropper join). The plan trees
    # differ per branch so ReuseExchange never dedups them, and an
    # unpersisted spans re-slices and re-md5s every window per branch —
    # measured 4 scans and a 1.19 fourth-decade exponent at 5M docs
    # (persisting brings it to ~1.0). MEMORY_AND_DISK: the span frame is
    # fixed-width (id, i, 32-hex hash), so even a disk-spilled read beats
    # recomputing the window hash pass.
    from instructionspipe_spark.session import managed_persist

    return managed_persist(base), managed_persist(spans)


def span_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 12
) -> DataFrame:
    """Per-document duplicated-span census: for every document, how many of
    its sliding ``k``-token windows occur MORE than once in the corpus
    (counting all occurrences, intra-document repeats included — Lee et al.
    dedup any span occurring >= 2 times anywhere).

    Output: ``(id_col, n_spans, n_dup_spans, dup_frac)``; docs shorter than
    ``k`` tokens have 0 spans and dup_frac 0.0. Run this BEFORE
    :func:`span_dedup` to size the cut (the diagnostic-first pattern of
    lsh_bucket_stats).

    Scale shape: one explode of window indexes; the census is a groupBy on
    the span md5 — partial aggregation collapses a boilerplate span occurring
    10^9 times map-side, so the shuffle carries one row per DISTINCT span;
    the count joins back span-keyed (AQE handles residual skew), and the
    per-doc rollup is one groupBy on the doc id. No pairwise anything,
    no windows over hot keys.
    """
    base, spans = _span_frames(df, id_col, text_col, k)
    counts = spans.groupBy("__h").agg(F.count(F.lit(1)).alias("__c"))
    per_doc = (
        spans.join(counts, "__h")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("__c") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
    )
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0).cast("long"))
    n_dup = F.coalesce(F.col("n_dup_spans"), F.lit(0).cast("long"))
    return (
        base.select("__id")
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            n_spans.alias("n_spans"),
            n_dup.alias("n_dup_spans"),
            F.round(
                F.when(n_spans == 0, F.lit(0.0)).otherwise(
                    n_dup.cast("double") / n_spans
                ),
                4,
            ).alias("dup_frac"),
        )
    )


def span_dedup(
    df: DataFrame, id_col: str, text_col: str, k: int = 12
) -> DataFrame:
    """Sliding-window exact span dedup: every ``k``-token window text that
    occurs more than once in the corpus survives only at its FIRST
    occurrence (minimal ``(doc_id, position)``); every token position
    covered by any other occurrence of a duplicated window is removed, and
    documents are reassembled from the surviving tokens in order.

    Deterministic masking rule (identical in the DuckDB oracle): a token
    position is cut iff it lies inside >= 1 non-first occurrence of a
    duplicated window — including self-overlapping repeats ("a a a a ...")
    inside one document. Docs shorter than ``k`` pass through unchanged.

    Output: ``(id_col, text, n_tokens, n_removed)``.

    Scale shape: window-index explode + md5 shuffle as in
    :func:`span_dedup_stats`; first-occurrence election is the same
    two-phase groupBy-min(struct) + join-back as word_block_dedup — a hot
    boilerplate span collapses map-side, never on one task. The coverage
    explode multiplies only NON-FIRST duplicated occurrences by k (bounded
    by the duplicated mass, not the corpus); kept-token election is one
    left-anti join on (doc, position) and reassembly one groupBy on the doc
    id.
    """
    base, spans = _span_frames(df, id_col, text_col, k)
    elected = spans.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__c"),
        F.min(F.struct("__id", "__i")).alias("__first"),
    )
    droppers = (
        spans.join(elected.filter(F.col("__c") > 1), "__h")
        .filter(
            ~(
                (F.col("__id") == F.col("__first.__id"))
                & (F.col("__i") == F.col("__first.__i"))
            )
        )
        .select("__id", "__i")
    )
    covered = droppers.select(
        "__id",
        F.explode(
            F.sequence(F.col("__i"), F.col("__i") + (k - 1))
        ).alias("__pos"),
    ).distinct()
    toks = base.select(
        "__id",
        F.posexplode("__w").alias("__p0", "__tok"),
    ).select("__id", (F.col("__p0") + 1).cast("long").alias("__pos"), "__tok")
    kept = toks.join(covered, ["__id", "__pos"], "left_anti")
    reassembled = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tok"))),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    return (
        base.select("__id", F.col("__n").alias("n_tokens"))
        .join(reassembled, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "n_tokens",
            (
                F.col("n_tokens")
                - F.coalesce(F.col("__n_kept"), F.lit(0).cast("long"))
            ).alias("n_removed"),
        )
    )
