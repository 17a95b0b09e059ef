"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of each choice):

- **Exact** dedup is a hash-aggregate on a content hash — one shuffle on
  md5(text), no driver data, AQE handles skew from giant duplicate
  clusters.
- **MinHash+LSH** avoids the O(n²) pair space: tokenize ONCE, compute
  the K per-seed minhashes PER ROW with higher-order functions over the
  (distinct) shingle-hash array (``minhash_signature`` — a pure map, NO
  shuffle; each seed is one ``array_min`` over a cheap per-element
  rehash), band the signature, and self-join on the band bucket with
  both sides co-partitioned on (band, bucket) so one exchange is reused.
  Only documents sharing a band bucket are candidate pairs, so the join
  cardinality tracks true duplicate density, not n². (An earlier
  explode→K-min-aggs draft shuffled K longs per doc; the per-row HOF
  form eliminated that shuffle entirely — the band join's exchange is
  the only one left.)
- **SimHash** is a 64-bit weighted-bit-vote fingerprint; near-duplicates
  differ in few bits. The per-bit votes are computed per-row with
  higher-order functions over the (distinct) shingle-hash array — one
  tokenization pass, no shuffle at all for fingerprints; banding the 64
  bits into (max_hamming+1) blocks finds all pairs within the distance
  via equi-joins (pigeonhole) — again no n² pair space.
- **n-gram Jaccard** verifies candidate pairs exactly; it only ever runs
  on the (small) candidate set produced by LSH/SimHash.

Everything is expressed with built-in functions + higher-order functions,
except the SimHash bit-vote kernel — a vectorized Arrow-batched numpy
pass (unpackbits/reduceat), chosen because the pure-Column form re-scans
each shingle array 64 times (see ``_simhash_votes_batch``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sleeper_spark.functions.text import bind_once, content_md5, tokens


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to cluster parallelism when the source is coarser
    (e.g. one small parquet file → one task). CPU-bound derivations would
    otherwise run on a single core; at real scale the input already has
    ≥parallelism partitions and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Group identical texts: (content hash, canonical keeper id, count).
    One hash-agg shuffle; keeper = min id for determinism."""
    return (
        df.groupBy(content_md5(text_col).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def drop_exact_duplicates(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each identical-text group.
    min_by avoids a self-join: single aggregation, then semi-join back."""
    keep = (
        df.groupBy(content_md5(text_col).alias("content_hash"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

def shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles as strings (token n-grams), distinct.

    Guarded with when(): Spark's sequence() runs DESCENDING when start >
    stop, so short documents need an explicit empty array, not sequence(1,0).
    """
    # the token array is lambda-bound (bind_once): captured inside the
    # transform lambda it would re-run the tokenizer regex per SHINGLE
    # — O(tokens^2) per document. The when() guard stays inside the
    # binding so sequence(1, 0) never evaluates for short documents.
    def _grams(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n >= k,
            F.transform(F.sequence(F.lit(1), n - k + 1),
                        lambda i: F.array_join(F.slice(t, i, k), " ")),
        ).otherwise(F.array().cast("array<string>"))

    return F.array_distinct(bind_once(tokens(col), _grams))


def shingle_hashes(col: Column | str, k: int = 3) -> Column:
    """Distinct k-shingle HASHES without materialising shingle strings:
    hash each token once, then fold k adjacent token hashes with
    ``xxhash64(acc, next)`` (zip_with over shifted slices). For LSH-style
    consumers only the shingle's hash matters, and skipping the string
    build makes shingling ~8x faster at document scale."""
    # the per-token hash array is lambda-bound (bind_once): the fold
    # below references it k+2 times, and each reference to a captured
    # tree would re-tokenize and re-hash the whole document — binding
    # makes tokenization + hashing run exactly once per row
    def _fold(th: Column) -> Column:
        n = F.size(th)
        combined = th
        for j in range(1, k):
            combined = F.zip_with(
                combined, F.slice(th, j + 1, F.greatest(n - j, F.lit(0))),
                lambda a, b: F.xxhash64(a, b))
        valid = F.slice(combined, 1, F.greatest(n - k + 1, F.lit(0)))
        return F.when(n >= k, valid).otherwise(
            F.array().cast("array<bigint>"))

    return F.array_distinct(
        bind_once(F.transform(tokens(col), lambda t: F.xxhash64(t)), _fold))


def portable_shingle_hashes(col: Column | str, k: int = 3) -> Column:
    """Distinct k-shingle hashes computed from md5 of the shingle STRING:
    hash = (hi32 << 32) | lo32 from the first 16 hex chars of md5. Slower
    than :func:`shingle_hashes` (materialises shingle strings + a crypto
    hash) but reproducible in any SQL engine that has md5 — used by the
    oracle-verified driver query so DuckDB can recompute identical SimHash
    fingerprints. Production default stays the xxhash64 flavor.

    The gram strings are built with the same zip_with fold over shifted
    slices as :func:`shingle_hashes` — NOT with :func:`shingles` — for
    two reasons: (1) no expression is captured inside a lambda, so the
    token array is never re-tokenized per gram, and (2) this column
    feeds :func:`simhash_fingerprints`'s Arrow UDF, and a nested lambda
    CAPTURING an outer lambda variable in a Python UDF's input breaks
    ExtractPythonUDFs on a deduplicated self-join branch (the relation
    dedup re-aliases attributes but not lambda-variable ids, the
    variable reads as a free reference, extraction skips the UDF, and
    the interpreted projection then cannot evaluate it — reproduced on
    Spark 4.1). zip_with's tail positions pair with null and concat_ws
    skips nulls, but every such position is sliced away by the n-k+1
    truncation, exactly as in shingle_hashes. Gram values and
    first-occurrence order (array_distinct) are identical to the
    shingles() form."""
    toks = tokens(col)
    n = F.size(toks)

    def _h(s: Column) -> Column:
        hx = F.md5(s)
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
        return F.shiftleft(hi, 32).bitwiseOR(lo)

    combined = toks
    for j in range(1, k):
        combined = F.zip_with(
            combined, F.slice(toks, j + 1, F.greatest(n - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b))
    valid = F.slice(combined, 1, F.greatest(n - k + 1, F.lit(0)))
    grams = F.array_distinct(
        F.when(n >= k, valid).otherwise(F.array().cast("array<string>")))
    return F.transform(grams, _h)


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for seed s in 0..K-1, min over shingles of
    xxhash64(shingle, s). ONE nested higher-order expression (transform
    over an int seed sequence) instead of K separate
    array_min/transform trees: the per-seed values are identical
    (xxhash64 of the same (shingle, int-seed) pair), but the plan
    carries 2 lambda functions instead of 2K — K-proportional Catalyst
    analysis was the dominant driver-side cost of every LSH entry
    (guide §7.3, measured 1.13s -> 0.44s per pass at K=32).

    The shingle column is lambda-BOUND (bind_once): a projection alias
    does not survive CollapseProject, so a raw ``shingle_col`` captured
    inside the per-seed lambda re-inlines the whole tokenize+shingle
    tree and re-evaluates it for every one of the K seeds — the exact
    O(K·tokens) class the r12 plan lint
    (tests/test_r12_optim.py::test_bind_once_invariant_across_text_operators)
    exists to catch, and where it first fired."""
    return bind_once(
        shingle_col,
        lambda shs: F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda s: F.array_min(
                F.transform(shs, lambda sh: F.xxhash64(sh, s)))))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, mh0..mhK-1) MinHash signature table, computed per row.

    Tokenization/shingling runs exactly once per document; each seed's
    minhash is ``array_min(transform(shingles, xxhash64(_, seed)))`` —
    a pure map with NO shuffle anywhere in the signature stage.
    Documents with no shingles (shorter than k words) produce no
    signature and are never candidates.
    """
    w = _signature_array(df, text_col, id_col, num_hashes, shingle_k)
    return w.select("__id", *[F.col("__sig")[s].alias(f"mh{s}")
                              for s in range(num_hashes)])


def _signature_array(df, text_col, id_col, num_hashes,
                     shingle_k) -> DataFrame:
    """``(__id, __sig)`` with the signature kept as ONE array column —
    the internal shape banding folds over without ever projecting K
    separate mh columns (K-proportional plan width was the dominant
    driver-side cost of every LSH entry; guide §7.3)."""
    # spread the RAW input first: projected-then-repartitioned would put
    # the Project below the Exchange and hash every shingle on the
    # source's (possibly single) partition. Shingle-less rows (fewer
    # than k tokens — exactly the rows whose signature would be null)
    # are dropped HERE on a cheap token-count test, so the null-drop
    # filter never needs to reference (and with pushdown substitution,
    # recompute) the signature expression itself.
    sh = (_spread(df)
          .where(F.size(tokens(text_col)) >= F.lit(shingle_k))
          .select(F.col(id_col).alias("__id"),
                  shingle_hashes(text_col, shingle_k).alias("__sh")))
    # per-row signature: ONE nested transform over the (distinct)
    # shingle-hash column (see minhash_signature: identical values,
    # 2 lambdas instead of 2K in the plan) — no shuffle at all. The
    # projection boundary keeps __sig materialised once per row. Rows
    # with no shingles get null mins and are dropped — never
    # candidates.
    return sh.select("__id", minhash_signature(F.col("__sh"), num_hashes)
                     .alias("__sig"))


def _band_bucket_rows(sig_df: DataFrame, id_out: str, num_hashes: int,
                      bands: int) -> DataFrame:
    """Explode ``(__id, __sig)`` into ``(id_out, band, bucket)`` rows.
    bucket = xxhash64 over the band's r-element signature SLICE — the
    multi-argument and array forms of xxhash64 fold elements through
    the identical accumulator, so bucket values (and therefore every
    collision) are bit-identical to hashing the r extracted mh columns,
    while the plan carries one transform lambda instead of K column
    extractions + bands hash expressions."""
    r = num_hashes // bands
    # __sig is lambda-bound: when CollapseProject folds the upstream
    # signature projection into this select, a bare col("__sig") inside
    # the per-band lambda would re-inline (and re-evaluate) the entire
    # K-seed signature tree once PER BAND (see minhash_signature)
    return sig_df.select(
        F.col("__id").alias(id_out),
        F.explode(bind_once(F.col("__sig"), lambda sig: F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.xxhash64(F.slice(sig, b * r + 1, F.lit(r)))
                 .alias("bucket"))))).alias("bb"),
    ).select(id_out, "bb.band", "bb.bucket")


def banded_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """The persistable LSH index rows of a corpus: ``(id_col, band,
    bucket)``, B rows per document — one band bucket per r-signature
    slice. This is the table an INCREMENTAL dedup pipeline stores
    (e.g. ingested into a SleeperTable keyed on (band, bucket)):
    signatures are computed once per document ever, and each new batch
    joins only its own bands against the index
    (:func:`incremental_minhash_pairs`)."""
    assert num_hashes % bands == 0
    sig = _signature_array(df, text_col, id_col, num_hashes, shingle_k)
    return _band_bucket_rows(sig, id_col, num_hashes, bands)


def incremental_minhash_pairs(
    index_df: DataFrame,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate pairs TOUCHING NEW DOCUMENTS only: the new batch's
    band rows join against the existing corpus index (``index_df``,
    the :func:`banded_buckets` shape — old text is never re-read, old
    signatures never recomputed) plus the batch itself for new-vs-new
    pairs. Cost scales with the BATCH and the buckets it touches, not
    with corpus size — the shape a daily-crawl dedup actually runs,
    instead of the full O(corpus) pair join per increment.

    ``index_df`` must not already contain the new batch's rows (ids on
    both sides are compared, so overlap would only cost extra join
    work, but keeping the contract sharp keeps the index append
    exactly-once). Same (num_hashes, bands, shingle_k) as the index
    build, or buckets are meaningless."""
    nb = banded_buckets(new_df, text_col, id_col, num_hashes, bands,
                        shingle_k)
    nb = nb.repartition("band", "bucket")
    right = (index_df.select(id_col, "band", "bucket")
             .unionByName(nb)
             .withColumnRenamed(id_col, "__rid"))
    pairs = (
        nb.join(right, ["band", "bucket"])
        .where(F.col(id_col) != F.col("__rid"))
        .select(F.least(id_col, "__rid").alias("id_a"),
                F.greatest(id_col, "__rid").alias("id_b"))
        .distinct()
    )
    return pairs


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate duplicate pairs (id_a < id_b, band-bucket collision).

    rows_per_band = num_hashes / bands sets the similarity knee:
    P(candidate) = 1 - (1 - s^r)^b for Jaccard s.
    """
    assert num_hashes % bands == 0
    banded = _banded_buckets(df, text_col, id_col, num_hashes, bands,
                             shingle_k)
    # materialise one exchange on the join keys: both sides of the
    # self-join reuse it (ReuseExchange), so the signature pipeline runs
    # once, and the join is co-partitioned. B rows per doc — tiny shuffle.
    banded = banded.repartition("band", "bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, ["band", "bucket"])
        .where(F.col("l.__id") < F.col("r.__id"))
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify of candidates)
# ---------------------------------------------------------------------------

def _banded_buckets(df, text_col, id_col, num_hashes, bands,
                    shingle_k) -> DataFrame:
    """``(__id, band, bucket)`` rows — B per document: the shared
    banding step behind the candidate join and the band audit."""
    assert num_hashes % bands == 0
    sig = _signature_array(df, text_col, id_col, num_hashes, shingle_k)
    return _band_bucket_rows(sig, "__id", num_hashes, bands)


def lsh_band_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """Pre-join observability for the banded LSH plan (r9 VERDICT
    perf-watch item): the candidate-pair volume per (band, bucket) —
    ``n_docs`` colliding documents implies ``n_docs*(n_docs-1)/2``
    candidate pairs from that bucket — WITHOUT running the self-join.
    One hash aggregation over the banding frame (cost O(docs × bands),
    the same map-side work the join's build would do), so at 100× data
    a skewed band shows up as a NUMBER in this frame rather than as a
    verify-stage timeout: run the audit first, and if the top bucket's
    ``n_pairs`` alone rivals the whole corpus, cap or salt that bucket
    (or raise rows_per_band) before paying for the join.

    Returns the ``top_n`` heaviest buckets as ``(band, bucket, n_docs,
    n_pairs)``, heaviest first; buckets with a single document carry
    zero pairs and are dropped."""
    banded = _banded_buckets(df, text_col, id_col, num_hashes, bands,
                             shingle_k)
    return (banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .where(F.col("n_docs") >= 2)
            .withColumn("n_pairs",
                        (F.col("n_docs") * (F.col("n_docs") - 1) / 2)
                        .cast("long"))
            .orderBy(F.desc("n_pairs"), "band", "bucket")
            .limit(top_n))


def jaccard_similarity(a: Column, b: Column) -> Column:
    """Exact Jaccard over two shingle arrays (arrays already distinct)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def verified_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash-LSH candidates filtered by exact n-gram Jaccard >= threshold.
    The expensive exact measure touches only LSH survivors."""
    cand = minhash_candidate_pairs(df, text_col, id_col, num_hashes,
                                   bands, shingle_k)
    # spread the (tiny) candidate pair list before the exact verify:
    # AQE coalesces it to one partition by byte size, serialising the
    # CPU-bound array_intersect step (same fix as similarity_join)
    cand = cand.repartition(df.sparkSession.sparkContext.defaultParallelism)
    # localCheckpoint: the shingle table feeds BOTH join probes below;
    # without materialisation Catalyst re-tokenizes every document twice
    # (once per join side) — tokenization dominates, so this halves the
    # query. Lineage truncation also keeps the plan small when this runs
    # inside a larger pipeline.
    sh = df.select(F.col(id_col).alias("__id"),
                   shingles(text_col, shingle_k).alias("__sh")) \
        .localCheckpoint()
    out = (
        cand.join(sh.withColumnsRenamed({"__id": "id_a", "__sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"__id": "id_b", "__sh": "sh_b"}), "id_b")
        .withColumn("jaccard", F.round(jaccard_similarity(F.col("sh_a"), F.col("sh_b")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into clusters: (doc_id, component_id)
    with component_id = the minimum doc id reachable through the pair
    graph — the keep-one step of a dedup pipeline (keep component_id,
    drop the rest).

    Distributed min-label propagation: each round every node adopts the
    minimum label among itself and its neighbours; converges in
    O(diameter) rounds (near-dup clusters are shallow — chains of
    transitive near-dups — so this is 2-4 rounds in practice). Each
    round is ONE Spark action: the new label table is marked for a LAZY
    ``localCheckpoint`` and the changed-label count is aggregated in the
    same job that materialises it — no standalone convergence-check
    action, and the checkpoint still cuts the growing lineage so round
    N's plan does not replay rounds 1..N-1.

    Raises ``RuntimeError`` if the graph has not converged after
    ``max_iterations`` rounds — one-hop-per-round propagation on a
    deeper-diameter graph would otherwise silently return labels that
    are NOT the transitive closure (corrupting keep-one dedup); callers
    with adversarially deep chain graphs should raise the cap (rounds
    are cheap) or pre-contract the graph.
    """
    n_part = pairs.sparkSession.sparkContext.defaultParallelism
    # partition the edge table by the join key ONCE: every round's
    # edges⋈labels join then reuses this layout (localCheckpoint
    # preserves outputPartitioning), so the per-round shuffle moves only
    # the label table — at scale the edge table is the heavy side and
    # re-shuffling it O(rounds) times was the dominant per-round cost
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges = edges.repartition(n_part, "dst").localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    changed = None
    prev_ck = None  # the previous round's CHECKPOINTED df (not a .drop view)
    for _ in range(max_iterations):
        # one union-aggregate computes the new label AND whether it
        # changed: each node contributes its own (label, own=label) row;
        # each in-edge contributes the neighbour's label. min(label) is
        # the propagation step, min(own) recovers the node's previous
        # label (exactly one own row per node), and label < own is the
        # change flag — the old neighbour_min + left-join-back shape
        # paid a second shuffle of the label table per round for the
        # same answer.
        contrib = (
            edges.join(labels.repartition(n_part, "node"),
                       edges.dst == labels.node)
            .select("src", "label", F.lit(None).cast("long").alias("own"))
        )
        new_labels = (
            contrib.unionByName(
                labels.select(F.col("node").alias("src"), "label",
                              F.col("label").alias("own")))
            .groupBy("src")
            .agg(F.min("label").alias("label"), F.min("own").alias("own"))
            .select(
                F.col("src").alias("node"), "label",
                # a node's label only ever decreases; it changed this
                # round iff a neighbour's label beat the previous one
                (F.col("label") < F.col("own")).cast("int").alias("__chg"),
            )
        ).localCheckpoint(eager=False)
        # ONE job: the aggregate both materialises the lazy checkpoint
        # (every partition is computed and cached) and returns the
        # changed count — no separate convergence-check action
        changed = new_labels.agg(F.sum("__chg")).collect()[0][0] or 0
        labels = new_labels.drop("__chg")
        # round N is materialised and self-contained, so round N-1's
        # checkpoint blocks are dead — release them so a deep graph does
        # not pin O(rounds) label tables in executor storage. NB
        # DataFrame.unpersist() cannot do this: localCheckpoint caches
        # its RDD outside the Dataset cache manager.
        _release_local_checkpoint(prev_ck)
        prev_ck = new_labels
        if changed == 0:
            break
    if changed:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"rounds ({changed} labels still changing); the pair graph's "
            "diameter exceeds the cap — raise max_iterations")
    # the returned labels read only the final checkpoint — the edge
    # table's blocks are dead too (unless zero rounds ran and labels
    # still derives straight from edges)
    if prev_ck is not None:
        _release_local_checkpoint(edges)
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("component_id"))


def _release_local_checkpoint(df) -> None:
    """Free the storage blocks of a MATERIALISED ``localCheckpoint``
    DataFrame that will never be read again.

    ``DataFrame.unpersist()`` is a no-op here — the checkpoint's RDD is
    cached outside the Dataset cache manager — so this reaches the
    ``LogicalRDD`` plan node the checkpoint rewrote the Dataset to and
    unpersists ITS rdd (verified empirically: the storage entry
    disappears; any later read of the df fails, which is why callers
    only pass dfs whose last reader has completed). Degrades to a no-op
    on plan shapes it does not recognise (e.g. Spark Connect)."""
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 - cleanup must never break the job
        pass


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def _bit64(i: int) -> int:
    """Bit i as a SIGNED 64-bit literal — 1<<63 overflows a Java Long, so
    the top bit is Long.MIN_VALUE's bit pattern."""
    return (1 << i) if i < 63 else -(1 << 63)


def simhash(col: Column | str, k_shingle: int = 2) -> Column:
    """64-bit SimHash: per-bit majority vote over shingle hashes.

    For each bit i, count shingles whose hash has bit i set vs unset; the
    fingerprint's bit i = 1 iff the vote is positive. Implemented with
    higher-order functions over the shingle array — per-row, no shuffle.
    """
    # the shingle-hash array is lambda-bound (bind_once): the 64 per-bit
    # votes each reference it, and a captured tree would re-shingle and
    # re-hash the document 65 times per row — binding makes the
    # (already expensive) shingle build run exactly once
    def _vote(hashes: Column) -> Column:
        n = F.size(hashes)
        bits = F.array(*[
            (
                F.size(F.filter(hashes, lambda h: h.bitwiseAND(F.lit(_bit64(i))) != 0)) * 2 > n
            ).cast("long") * F.lit(_bit64(i))
            for i in range(64)
        ])
        return F.aggregate(bits, F.lit(0).cast("long"),
                           lambda a, b: a.bitwiseOR(b))

    return bind_once(
        F.transform(shingles(col, k_shingle), lambda sh: F.xxhash64(sh)),
        _vote)


def hamming_distance64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def _simhash_votes_batch(arrays) -> "object":
    """Vectorized bit-vote fingerprints for a batch of shingle-hash
    arrays: one ``unpackbits`` over the concatenated hashes, one
    ``reduceat`` per-document sum, one ``packbits`` back to int64. All
    numpy C loops — replaces 64 codegen'd array passes per row (the HOF
    form re-traversed every shingle array 64 times and was the single
    hottest stage of simhash_pairs at sf0.1)."""
    import numpy as np

    lens = np.fromiter((len(a) for a in arrays), dtype=np.int64,
                       count=len(arrays))
    nonempty = lens > 0
    ne_lens = lens[nonempty]
    out = np.zeros(len(arrays), dtype=np.int64)
    if ne_lens.size:
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in arrays if len(a)])
        offsets = np.zeros(len(ne_lens), dtype=np.int64)
        np.cumsum(ne_lens[:-1], out=offsets[1:])
        # (total, 64) bit matrix, column j == bit j (little-endian host)
        bits = np.unpackbits(flat.view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little")
        votes = np.add.reduceat(bits.astype(np.int32), offsets, axis=0)
        fp_bits = (votes * 2 > ne_lens[:, None]).astype(np.uint8)
        out[nonempty] = np.packbits(fp_bits, axis=1, bitorder="little") \
                          .view(np.int64).ravel()
    return out, nonempty


def _make_simhash_udf():
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    # return type as a DataType instance: a DDL string would need an
    # active SparkContext to parse when executors re-import this module
    @pandas_udf(LongType())
    def _udf(sh: pd.Series) -> pd.Series:
        vals, masks = [], []
        # sub-batch so the (total_shingles x 64) int32 vote matrix stays
        # bounded (~256 MB at 1M shingles) whatever the arrow batch size
        start, budget = 0, 1_000_000
        arrays = sh.to_list()
        while start < len(arrays):
            end, total = start, 0
            while end < len(arrays) and total < budget:
                total += len(arrays[end])
                end += 1
            v, ne = _simhash_votes_batch(arrays[start:end])
            vals.append(v)
            masks.append(ne)
            start = end
        if not vals:
            return pd.Series(np.empty(0, dtype=np.int64), dtype="Int64")
        # null for shingle-less docs: filtering on the UDF OUTPUT keeps
        # the expensive shingle+hash expression evaluated ONCE (a
        # size(sh)>0 pre-filter gets pushed below the projection and
        # Catalyst duplicates the whole expression into the scan filter)
        out = pd.Series(np.concatenate(vals), dtype="Int64")
        out[~np.concatenate(masks)] = pd.NA
        return out

    # nondeterministic marker as an optimizer barrier: without it the
    # isnotnull(__fp) filter is pushed below the _spread exchange and the
    # whole shingle+hash+UDF pipeline is evaluated TWICE — once on the
    # (possibly single) source partition
    return _udf.asNondeterministic()


_simhash_votes_udf = _make_simhash_udf()


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 2,
    portable_hash: bool = False,
) -> DataFrame:
    """(id, fingerprint) via vectorized per-row bit-vote counting.

    Fingerprints are a pure map — NO shuffle, scales with input
    partitions. The votes run in ONE Arrow-batched numpy pass
    (unpackbits → reduceat → packbits, see :func:`_simhash_votes_batch`);
    the previous 64-higher-order-filter form re-scanned each shingle
    array 64 times JVM-side and was ~6x slower at sf0.1. Semantics are
    bit-identical: fingerprint bit i = 1 iff the strict majority of
    (distinct) shingle hashes has bit i set.

    ``portable_hash=True`` switches shingle hashing from xxhash64 chains
    to :func:`portable_shingle_hashes` (md5-based) so an external SQL
    engine can recompute identical fingerprints for verification.
    """
    hasher = portable_shingle_hashes if portable_hash else shingle_hashes
    sh = _spread(df).select(F.col(id_col).alias("__id"),
                            hasher(text_col, k_shingle).alias("__sh"))
    return (sh.select("__id", _simhash_votes_udf(F.col("__sh")).alias("__fp"))
            .where(F.col("__fp").isNotNull()))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    k_shingle: int = 2,
    portable_hash: bool = False,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of each other's SimHash.

    Pigeonhole banding: split 64 bits into max_hamming+1 blocks; any pair
    within the distance agrees exactly on >= 1 block, so equi-joining on
    (block_id, block_value) finds all such pairs without an n² cross join.
    """
    nblocks = max_hamming + 1
    width = 64 // nblocks
    fp = simhash_fingerprints(df, text_col, id_col, k_shingle, portable_hash)
    blocks = fp.select(
        "__id", "__fp",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("block"),
                F.shiftrightunsigned(F.col("__fp"), b * width)
                 # signed-64 mask: (1<<64)-1 does not fit a Java long
                 # (max_hamming=0 -> one 64-bit block); -1 is all-ones
                 .bitwiseAND(F.lit(-1 if width >= 64 else (1 << width) - 1))
                 .alias("bval"),
            )
            for b in range(nblocks)
        ])).alias("bb"),
    ).select("__id", "__fp", "bb.block", "bb.bval")
    # one exchange on the join keys, reused by both sides of the self-join
    # (ReuseExchange): the fingerprint pipeline runs once and the join is
    # co-partitioned — same shape as minhash_candidate_pairs
    blocks = blocks.repartition("block", "bval")
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(r, ["block", "bval"])
        .where(F.col("l.__id") < F.col("r.__id"))
        .select(
            F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"),
            hamming_distance64(F.col("l.__fp"), F.col("r.__fp")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact set-similarity join (prefix filtering — AllPairs/PPJoin family)
# ---------------------------------------------------------------------------

def similarity_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """EXACT thresholded Jaccard self-join via prefix filtering: every
    pair (id_a < id_b) with round(J, 4) >= threshold — no LSH
    approximation, no O(n²) pair space. The AllPairs/PPJoin candidate
    bound (Bayardo et al., WWW'07; Xiao et al., WWW'08 — public
    algorithms, re-derived here for DataFrame ops):

    order the universe of shingles by ascending document frequency
    (rarest first). For a set of n shingles, its PREFIX is the first
    ``n - ceil(t*n) + 1`` shingles in that order. If J(x, y) >= t, then
    |x ∩ y| >= t * max(|x|, |y|), so x and y MUST share at least one
    prefix shingle under any common global order — equi-joining on
    prefix shingles finds every qualifying pair. Rarest-first makes the
    prefix shingles the LOW-frequency ones, so candidate buckets stay
    small (a hot boilerplate shingle can never enter a prefix unless a
    document is almost entirely boilerplate). PPJoin's POSITIONAL
    filter prunes further: a prefix hit at position (p_l, p_r) can
    lead to at most ``1 + min(n_l - p_l, n_r - p_r)`` overlapping
    shingles, and a qualifying pair needs
    ``ceil(t/(1+t) * (n_l + n_r))`` — candidates failing that bound
    drop before the dedup/verify.

    The whole pipeline runs on 64-bit shingle HASHES
    (:func:`shingle_hashes` — tokens hashed once, k-gram fold), never
    materialised shingle strings: set sizes, prefixes, and the final
    Jaccard are identical to the string computation unless two distinct
    shingles collide in 64 bits (a merged token only ever RAISES a
    pair's Jaccard — never drops a qualifying pair — and perturbs J by
    ~1/n; at any realistic corpus the result is exact).

    Shapes at scale: one hash-agg for document frequencies (shuffle on
    the shingle hash), one shuffle to regroup (__id) for the
    rarest-first sort (per-doc state bounded by document length), one
    equi-join on prefix hashes (bucket sizes bounded by prefix rarity
    + the size-ratio and positional filters), then the exact Jaccard
    verify touches only surviving candidates. No driver-side data.

    The verify compares ``round(J, 4) >= threshold`` (cross-engine
    stable); candidates are generated with a slightly RELAXED bound
    ``t - 5e-5`` so a pair whose raw J sits just under t but rounds up
    is still found — output therefore matches an oracle that rounds.
    """
    t_gen = max(threshold - 5e-5, 0.0)
    sh = (_spread(df)
          .select(F.col(id_col).alias("__id"),
                  shingle_hashes(text_col, shingle_k).alias("__sh"))
          .where(F.size("__sh") > 0)
          # feeds the frequency agg, the prefix build, and BOTH verify
          # probes — materialise once (same rationale as
          # verified_near_duplicates)
          .localCheckpoint())
    ex = sh.select("__id", F.explode("__sh").alias("g"))
    dfreq = ex.groupBy("g").agg(F.count("*").alias("__df"))
    ordered = (
        ex.join(dfreq, "g")
        .groupBy("__id")
        # rarest-first: lexicographic (document-frequency, hash) —
        # deterministic under frequency ties
        .agg(F.sort_array(F.collect_list(F.struct("__df", "g")))
             .alias("__ord")))
    n = F.size("__ord")
    plen = (n - F.ceil(F.lit(t_gen) * n) + 1).cast("int")
    pref = ordered.select(
        "__id", n.alias("__n"),
        F.posexplode(F.transform(F.slice("__ord", F.lit(1), plen),
                                 lambda s: s["g"])).alias("__p", "g"))
    # one exchange on the prefix hash, reused by both self-join sides
    pref = pref.repartition("g")
    l, r = pref.alias("l"), pref.alias("r")
    nl, nr = F.col("l.__n"), F.col("r.__n")
    # overlap needed for J >= t on sets: i >= t/(1+t) * (n_l + n_r)
    need = F.ceil(F.lit(t_gen / (1.0 + t_gen)) * (nl + nr))
    remaining = F.lit(1) + F.least(nl - F.col("l.__p") - 1,
                                   nr - F.col("r.__p") - 1)
    cand = (
        l.join(r, "g")
        .where((F.col("l.__id") < F.col("r.__id"))
               # size-ratio filter: J <= min(n)/max(n)
               & (F.least(nl, nr).cast("double")
                  >= F.lit(t_gen) * F.greatest(nl, nr))
               # positional filter (PPJoin): past this prefix hit there
               # are not enough shingles left to reach the overlap bound
               & (remaining >= need))
        .select(F.col("l.__id").alias("id_a"),
                F.col("r.__id").alias("id_b"))
        .distinct()
        # explicit numeric repartition (AQE keeps user-specified
        # counts): the distinct's output is a few KB of id pairs, so
        # AQE coalesces it to ONE partition — and the downstream exact
        # verify (array_intersect over full shingle arrays, the
        # expensive per-pair step) then runs serially (measured: a
        # single 2.1s task while 31 cores idle). Shuffling the tiny
        # pair list costs nothing; the verify is CPU-bound (guide §2.5).
        .repartition(df.sparkSession.sparkContext.defaultParallelism))
    # verify: |a ∪ b| = |a| + |b| - |a ∩ b| (arrays are distinct), so one
    # array_intersect per pair — half the per-pair hash-set work of
    # intersect + union
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sh.withColumnsRenamed({"__id": "id_a", "__sh": "sh_a"}),
                  "id_a")
        .join(sh.withColumnsRenamed({"__id": "id_b", "__sh": "sh_b"}),
              "id_b")
        .withColumn("jaccard",
                    F.round(inter.cast("double") / union, 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def contamination_safe_split(df: DataFrame, pairs: DataFrame,
                             eval_pct: int = 10, id_col: str = "doc_id",
                             n_buckets: int = 100,
                             salt: int = 7) -> DataFrame:
    """Train/eval split that near-duplicates can NEVER straddle:
    ``(id_col, component_id, split)`` where the whole near-dup cluster
    follows its component id into one side. Splitting documents
    independently leaks eval answers into training through paraphrase
    duplicates (the standard contamination failure LSH dedup exists to
    prevent); bucketing the CLUSTER id closes that door by
    construction.

    The split decision is :func:`sampling.bucket_expr` over the
    component id — deterministic pure arithmetic, so the split is
    reproducible in any engine and resampling-stable as the corpus
    grows (documents only change side if their cluster's minimum id
    changes). Docs in no pair are singleton clusters of themselves.
    Cost: the cluster resolution itself; the split is a codegen'd
    expression on top."""
    from sleeper_spark.functions.sampling import bucket_expr
    comp = connected_components(pairs)
    labeled = (df.select(id_col)
               .join(comp, id_col, "left")
               .withColumn("component_id",
                           F.coalesce("component_id", F.col(id_col))))
    return labeled.select(
        id_col, "component_id",
        F.when(bucket_expr("component_id", n_buckets, salt) < eval_pct,
               F.lit("eval")).otherwise(F.lit("train")).alias("split"))


def _delete_one(c: Column) -> Column:
    """Array of strings obtained by deleting each single character of
    ``c`` (empty array for the empty string — sequence(1, 0) would run
    DESCENDING, the same guard as shingles())."""
    L = F.length(c)
    grams = F.transform(
        F.sequence(F.lit(1), L),
        lambda i: F.concat(c.substr(F.lit(1), i - 1), c.substr(i + 1, L)))
    return F.when(L >= 1, grams).otherwise(
        F.array().cast("array<string>"))


def deletion_variants(c: Column, max_dist: int) -> Column:
    """The SymSpell delete-neighborhood: every string reachable from
    ``c`` by deleting up to ``max_dist`` characters (distinct,
    including ``c`` itself). If edit_distance(a, b) <= d then the two
    neighborhoods intersect (delete the characters touched by the
    alignment on each side), so an equi-join on variants is a COMPLETE
    candidate generator for a bounded-distance join; the exact
    levenshtein refilter restores precision."""
    out = F.array_distinct(F.concat(F.array(c), _delete_one(c)))
    for _ in range(max_dist - 1):
        out = F.array_distinct(F.concat(
            out, F.flatten(F.transform(out, _delete_one))))
    return out


def edit_distance_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str = "doc_id",
    max_dist: int = 1,
    max_len: int = 64,
) -> DataFrame:
    """All pairs of rows whose ``key_col`` strings are within
    ``max_dist`` Levenshtein edits — the TYPO-duplicate join (titles,
    names, product keys) that shingle/MinHash methods structurally
    miss at short lengths (one edit in a 10-char key destroys most of
    its shingles, but two 10k-char documents need ~thousands of edits
    to fall below a Jaccard threshold).

    Scale shape: SymSpell deletion-neighborhood candidate generation —
    each key expands to O(len^max_dist) delete variants (a pure map),
    candidates equi-join on the variant hash bucket, then the exact
    JVM ``levenshtein`` refilter. Work ∝ keys sharing a variant, never
    all-pairs; the per-variant bucket caveat matches the LSH band
    joins (a boilerplate key shared by M rows costs M² in its bucket —
    dedupe exact duplicates first). ``max_len`` bounds the variant
    fan-out; longer keys raise rather than silently exploding the map
    stage (truncate keys first — a bounded-edit join on long texts is
    the wrong tool; use the shingle/MinHash family).

    Output: ``id_a, id_b, dist`` (ids ordered, exact distances,
    dist <= max_dist). Reference analog: none.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if max_dist > 2:
        raise ValueError(
            "max_dist > 2 explodes the deletion neighborhood "
            "(O(len^d) variants per key); use the shingle/MinHash "
            "family for looser matching")
    over = df.where(F.length(key_col) > max_len).limit(1).collect()
    if over:
        raise ValueError(
            f"{key_col!r} holds strings longer than max_len={max_len} "
            f"(e.g. {over[0][key_col][:40]!r}...) — truncate or hash "
            "the key first; the variant fan-out is O(len^max_dist)")
    ex = df.select(
        F.col(id_col).alias("__id"), F.col(key_col).alias("__s"),
        F.explode(deletion_variants(F.col(key_col), max_dist))
        .alias("__v"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (a.join(b, (F.col("a.__v") == F.col("b.__v"))
                   & (F.col("a.__id") < F.col("b.__id"))
                   & (F.abs(F.length("a.__s") - F.length("b.__s"))
                      <= max_dist))
            .select(F.col("a.__id").alias("id_a"),
                    F.col("a.__s").alias("__sa"),
                    F.col("b.__id").alias("id_b"),
                    F.col("b.__s").alias("__sb"))
            .distinct())
    return (cand
            .withColumn("dist", F.levenshtein("__sa", "__sb"))
            .where(F.col("dist") <= max_dist)
            .select("id_a", "id_b", F.col("dist").cast("int").alias("dist")))
