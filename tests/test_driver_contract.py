"""Driver-contract regression net: entry/queries/oracle_sql stay
importable, aligned, and runnable. The full oracle comparison lives in
tools/check_oracle.py (run it before shipping operator changes)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle():
    """Round 2 contract: every queries() entry is oracle-verified (the
    ground-truth / recomputation oracles cover the dedup, ANN, and
    multimodal operators), and the driver's 50-query gate sees all of
    them (r01 recorded exactly the first 50 entries)."""
    qk = set(em.queries())
    ok = set(em.oracle_sql())
    assert qk == ok, f"mismatch: {qk ^ ok}"
    # round 3 added ivf_topk + embedding_near_duplicates (the two round-2
    # operators that lacked driver oracles), dedup_clusters
    # (connected-components resolution) and near_dup_keep_one (the
    # retained corpus after keep-one dedup); round 4 added the three
    # deterministic sampling operators (fraction/stratified/reservoir)
    # contiguous token-budget sharding, and the time-series quartet
    # (as-of join, sessionize, bucketed range join, rolling window),
    # then the corpus-construction set (doc chunking, tf-idf top terms,
    # train/test contamination), per-vector int8 embedding quantization,
    # per-group exact percentiles, streaming dedup, corpus bigram
    # frequency tables, repetition scores, domain-mix sampling, and
    # product-quantization ANN (ADC), the salted skew-safe join, and
    # the analytics-breadth set (TPC-H Q5/Q18, ROLLUP, lag/lead/ntile),
    # the N-invariant batch point lookup, the Gopher-rules composite
    # quality filter, IVF-PQ composite ANN, native streaming session
    # windows, the full outer join, sorted collect-set aggregation, and
    # width_bucket histograms; round 5 added multi-probe LSH, the
    # recall@10 gate joining every approximate ANN tier against
    # brute-force ground truth, TPC-H Q4/Q7/Q10/Q19 (Q4/Q19 adapted to
    # the fixture's columns), C4-style corpus line dedup, the PII
    # scrub, Z-order clustering keys, the deterministic corpus
    # shuffle, the value-column file-skipping lifecycle query, and
    # TPC-H Q6 + Q15; round 6 added ann_index_selection (recall-gated
    # index choice), the twelve remaining TPC-H queries (q2, q8, q9,
    # q11-q14, q16, q17, q20-q22 — the suite is now complete), the
    # HyperLogLog register sketch, its streaming windowed variant,
    # verbatim-span (exact-substring) dedup, the persistent
    # table-level ANN index search, the copy-on-write delete_where
    # lifecycle, SemDeDup semantic dedup, keyword search
    # (all/any + BM25 + inverted-index stats), max_by last-writer-wins
    # upsert, the streamed upsert (stream_ingest -> max_by collapse),
    # incremental MinHash dedup against a persisted band index, the
    # exact prefix-filtering similarity join, sharded heavy hitters,
    # the pruned branch diff, BPE pair counting, the zero-shuffle
    # co-keyed join, the incremental materialized view, the secondary
    # index, RRF hybrid search, and bigram LM quality scoring —
    # round 7 adds exact winsorization (distributed prefix-sum
    # quantiles), MAD outlier quarantine, asymmetric containment
    # decontamination, the hot-value secondary-index semi-join lookup,
    # per-group exact quantiles and winsorize, equi-depth quantile
    # binning, the ordered conversion funnel (unbounded + 1-day
    # conversion-window variants), cohort retention, per-group MAD
    # fences, and the bounded edit-distance typo-dup join —
    # round 8 adds the mergeable quantile-sketch tier (raw continuous
    # doubles, budget-verified), the per-group md5 reservoir, per-group
    # equi-depth binning, and the continuous streaming funnel —
    # round 9 adds the composite-index leading-prefix range lookup,
    # per-group sketch quantiles, C4 boilerplate line stripping,
    # streaming cohort retention, the time-travel snapshot read, and
    # copy-on-write update_where, atomic MERGE upsert, and CHECK
    # constraints and the functional (expression) secondary index —
    # round 10 adds the index-nested-loop lookup_join, the split-point
    # advisor, exact-row point deletes, CDC replication, the
    # exactly-once streaming merge, and filtered vector search —
    # round 11 adds conditional MERGE (merge_when), time-series gap
    # filling, the schema-evolution lifecycle entry,
    # table-integrated filtered ANN (file-pruned scan), the zero-copy
    # table clone (branch-divergence proof), hopping windows (batch +
    # streaming twins), first-order Markov event transitions, and
    # deterministic negative sampling + hard-negative mining for
    # contrastive training, the first-seen cumulative-distinct
    # growth curve, CUBE aggregation, per-source language entropy,
    # consecutive 3-step path mining, CTAS (create_as with
    # advisor-derived split points), and the files-metadata manifest +
    # metadata-only count
    # round 11 added the analytics set: UNPIVOT melt, value-range
    # (interval) window frames, recursive-CTE-oracled transitive
    # closure with min-hop BFS, the Pareto frontier (skyline), market-
    # basket association rules, the CUSUM drift series, integer-micro
    # PageRank (unrolled-CTE oracle), per-type Gini inequality, and
    # the two-sample Kolmogorov–Smirnov drift statistic
    # plus week-over-week growth / 4-week moving average, the pairwise
    # per-source KS drift matrix, smoothed target encoding, the
    # chi-squared source/lang independence statistic, and cross-source
    # quantile normalization (value-domain ECDF matching), plus the
    # info-theory trio: source/lang mutual information, the Markov
    # entropy rate of the event process, and the Benford first-digit
    # audit over order totals, exact-dyadic EWMA trend smoothing, RFM
    # quartile segmentation, the 2-D month x price-band heatmap, and
    # the decile-lift table over the DSIR selector's score ranking,
    # the Mann-Whitney U rank-sum drift statistic, the two-proportion
    # A/B z-test, and the weekday seasonality profile, plus atomic
    # snapshot rollback (write-path time travel via one set-difference
    # MERGE_FILES commit);
    # round 12 appends longdoc_repetition (synthetic multi-kilotoken
    # documents so the bind_once O(tokens^2)-class is a timed number)
    assert len(qk) == 226


def test_registry_order_append_only():
    """r11 VERDICT Next #1/#2: the driver samples the FIRST 50 entries
    of queries() for its correctness gate, so any insertion ahead of an
    existing entry silently rotates queries out of driver verification
    (r11's partial round manufactured a false 'dropped: tpch_q11-q15'
    signal this way). The registry is append-only from round 12 on:
    the committed order file is an exact PREFIX of the live registry —
    new entries may only appear after every existing one. When adding
    an entry, append its name to tests/registry_order_r12.txt too."""
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "registry_order_r12.txt")) as f:
        golden = f.read().split()
    actual = list(em.queries().keys())
    assert actual[:len(golden)] == golden, (
        "queries() order changed ahead of existing entries — this "
        "rotates the driver's 50-entry correctness window; append "
        "new entries at the END only")
    for extra in actual[len(golden):]:
        raise AssertionError(
            f"new entry {extra!r} is not in registry_order_r12.txt — "
            "append it there so the order stays pinned")


def test_entry_smoke(spark):
    df = em.entry(spark)
    assert df.schema.simpleString() == \
        "struct<user_id:bigint,event_type:string,n:bigint>"
    assert df.count() > 0


@pytest.mark.parametrize("name", [
    "range_query", "aggregation_sum_min_max", "tpch_q1", "join_agg",
    "window_topn", "dedup_exact_groups", "ann_brute_force",
])
def test_representative_queries_run(spark, name):
    df = em.queries()[name](spark, SF)
    assert df.columns  # resolvable plan
    df.limit(5).collect()  # executable
