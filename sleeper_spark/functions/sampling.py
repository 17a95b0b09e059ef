"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus pipeline needs samples that are (a) reproducible across
runs and engines — a re-run of the pipeline must pick the SAME rows, or
downstream dedup/eval splits churn — and (b) computable without a
global pass. All three operators here key off a pure-arithmetic
congruential bucket of a stable id column, so sampling is a codegen'd
filter/limit with no RNG state, no seed plumbing, and bit-identical
results in any SQL engine (the DuckDB oracles run the same formula).

Beyond-reference surface (the reference engine has no sampling
operator); shapes chosen for 100 TB:

- ``sample_fraction``  — pure filter, predicate-pushdown friendly, no
  shuffle: every executor gates its own rows.
- ``stratified_sample`` — fixed N per stratum via ranked window;
  Spark's WindowGroupLimit prunes each group to N before the final
  sort, so the shuffle carries only strata keys worth of heads.
- ``reservoir_sample``  — global fixed N as order-by-bucket + limit,
  which Spark executes as TakeOrderedAndProject (per-partition top-N,
  then a driver-side merge of N-row heads — never a full sort).

The congruential bucket is intentionally simple (multiplicative hash on
``key % 1000003``): portable, overflow-free under ANSI arithmetic, and
uniform enough for sampling whole buckets. For adversarial key
distributions swap ``bucket_expr`` for ``xxhash64`` — every operator
takes the bucket column as an injectable expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: modulus for the congruential bucket — prime, small enough that
#: (key % P) * 31 + salt never overflows int64 under ANSI mode
_P = 1000003


def bucket_expr(key: Column | str, n_buckets: int = 100,
                salt: int = 7) -> Column:
    """Portable deterministic bucket in [0, n_buckets): the same formula
    is expressible in any SQL dialect, so oracles and cross-engine
    pipelines reproduce the exact sample.

    ``pmod`` (not ``%``) so NEGATIVE keys land in [0, n_buckets) too —
    SQL ``%`` keeps the dividend's sign, and a raw-% bucket would be
    negative for negative keys, always passing ``bucket < percent``
    (a "7% sample" keeping 100% of negative-id rows). Positive keys are
    unaffected, so existing oracles reproduce the identical row set;
    an ANSI-SQL replica of a signed-key sample needs the same
    double-mod adjustment (``((expr % n) + n) % n``)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.pmod(k, _P) * 31 + salt, n_buckets)


def sample_fraction(df: DataFrame, key: str, percent: int,
                    n_buckets: int = 100, salt: int = 7) -> DataFrame:
    """Keep rows whose bucket < ``percent`` — a deterministic ~percent%
    sample. Pure filter: no shuffle, pushdown-eligible, and the SAME
    rows survive on every run and engine."""
    return df.where(bucket_expr(key, n_buckets, salt) < F.lit(percent))


def stratified_sample(df: DataFrame, strata: list[str], key: str,
                      n_per_stratum: int, salt: int = 7) -> DataFrame:
    """Fixed-size deterministic sample per stratum: rank rows inside
    each stratum by (bucket, key) — the key tie-break makes the rank
    total and engine-independent — and keep the first N.

    Scale shape: one shuffle on the strata columns; WindowGroupLimit
    (pinned in tests/test_plans.py for the window queries) truncates
    each group to N rows map-side before the exchange."""
    w = Window.partitionBy(*strata).orderBy(
        bucket_expr(key, _P, salt).asc(), F.col(key).asc())
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= n_per_stratum)
            .drop("__rk"))


def pack_token_budget(df: DataFrame, token_col: str, budget: int,
                      strata: list[str], order_col: str,
                      shard_col: str = "shard_id") -> DataFrame:
    """Contiguous token-budget sharding: within each stratum, documents
    in ``order_col`` order are assigned to the shard where their first
    token lands — ``(prefix_tokens_before_doc) div budget``. Every shard
    holds ~budget tokens of contiguous documents (the standard
    training-data sharding step before sequence packing), fully
    deterministic, integer arithmetic only.

    Scale shape: one shuffle on the strata columns, then a linear
    running sum per stratum — no global sort; shards per stratum can be
    computed independently on every executor that owns a stratum."""
    w = Window.partitionBy(*strata).orderBy(F.col(order_col).asc())
    cum = F.sum(token_col).over(w)
    before = (cum - F.col(token_col)).cast("long")
    # integer `div` (not floor of a double) keeps the assignment exact
    # at any prefix-sum magnitude
    return (df.withColumn("__before__", before)
            .withColumn(shard_col, F.expr(f"__before__ div {budget}"))
            .drop("__before__"))


def reservoir_sample(df: DataFrame, key: str, n: int,
                     salt: int = 7) -> DataFrame:
    """Global fixed-size deterministic sample: the N rows with the
    smallest (bucket, key). Spark executes orderBy+limit as
    TakeOrderedAndProject — per-partition top-N heads merged on the
    driver, O(N) driver memory, no full sort at any scale."""
    return (df.orderBy(bucket_expr(key, _P, salt).asc(),
                       F.col(key).asc())
            .limit(n))


def grouped_reservoir(df: DataFrame, group_cols: list[str], key: str,
                      n_per_group: int,
                      rank_col: str | None = None) -> DataFrame:
    """EXACT n-per-group deterministic reservoir — the "n examples per
    domain" selection step, pairing the per-group stats operators.
    Rows rank inside their group by ``(md5(key), key)`` and the first N
    survive.

    Why md5 and not :func:`bucket_expr`: the congruential bucket is
    MONOTONE in the key below ``_P/31`` (~32k), so for small-id groups
    "sample n" would degenerate to "first n by id" — fine for
    fraction-gating whole buckets, not for a reservoir meant to look
    uniform. md5 of the key's decimal string is an engine-portable
    scramble (DuckDB: ``md5(CAST(k AS VARCHAR))``), so the exact same
    rows survive in any SQL engine, every run — no RNG state anywhere.

    Scale shape: one shuffle on the group columns; WindowGroupLimit
    truncates each group to N rows MAP-SIDE before the exchange, so the
    shuffle carries ~N rows per group however large the groups are.
    ``rank_col`` optionally keeps the 1-based rank in the output."""
    h = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key).asc())
    out = (df.withColumn("__rk", F.row_number().over(w))
           .where(F.col("__rk") <= n_per_group))
    if rank_col is None:
        return out.drop("__rk")
    return out.withColumnRenamed("__rk", rank_col)


def mix_sample(df: DataFrame, key: str, percent: Column,
               n_buckets: int = 100, salt: int = 7) -> DataFrame:
    """Domain-mixing sample: keep each row with a per-row target
    percentage (usually a CASE/arithmetic expression over the row's
    source/domain column) — the data-mixing step that reweights corpus
    composition toward a target distribution before training.

    Same congruential bucket as ``sample_fraction`` but the threshold
    varies per row, so one codegen'd filter realises an entire mixing
    table: no shuffle, no per-source scans, reproducible across runs
    and engines."""
    return df.where(bucket_expr(key, n_buckets, salt) < percent)


def grouped_exact_split(df: DataFrame, group_cols: list[str], key: str,
                        fractions: dict[str, float],
                        split_col: str = "split") -> DataFrame:
    """Deterministic train/val/test split with EXACT per-group counts:
    every group contributes floor-exact proportions to every split, so
    a rare language is never starved out of val by sampling variance
    (``sample_fraction``'s per-row coin gives binomial counts; this
    gives arithmetic ones). Rows rank inside their group by the same
    engine-portable ``(md5(key), key)`` scramble as
    :func:`grouped_reservoir`; split i takes ranks in
    ``(floor(c_{i-1} * n_g), floor(c_i * n_g)]`` where c_i are the
    cumulative fractions — remainder rows (from flooring) fall to the
    LAST split, making the assignment a total function. Fractions must
    sum to 1 (within 1e-9). One shuffle on the group columns; the rank
    window and the group-count window share it. The whole rule is pure
    rank arithmetic — a SQL oracle reproduces the exact assignment."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    tot = sum(fractions.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {tot}")
    names = list(fractions.keys())
    h = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key).asc())
    wg = Window.partitionBy(*group_cols)
    rk = F.row_number().over(w)
    n_g = F.count(F.lit(1)).over(wg)
    # cumulative-fraction fences as floor(c_i * n); shared float64
    # products, floor not round, so every engine lands the same fence
    cum = 0.0
    assign = None
    for name in names[:-1]:
        cum += fractions[name]
        fence = F.floor(F.lit(cum) * n_g)
        cond = rk <= fence
        assign = (F.when(cond, F.lit(name)) if assign is None
                  else assign.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    assign = last if assign is None else assign.otherwise(last)
    return (df.withColumn("__rk", rk).withColumn("__ng", n_g)
            .withColumn(split_col, assign)
            .drop("__rk", "__ng"))


def interleave_domains(df: DataFrame, domain_col: str, key: str,
                       pos_col: str = "pos") -> DataFrame:
    """Deterministic round-robin domain interleave for TRAINING ORDER:
    assign every row a strictly-ordered position such that reading in
    position order cycles through the domains (one web doc, one code
    doc, one wiki doc, ...) instead of streaming each domain's shard
    en bloc — the curriculum-mixing step after :func:`mix_sample`
    decides WHAT to keep, this decides WHEN it is seen.

    ``pos = (rank_g - 1) * D + domain_index``: rank within the domain
    by the portable ``(md5(key), key)`` scramble, D = number of
    domains, domain_index from the sorted domain list. Positions are a
    pure per-row computation off one domain-partitioned window plus an
    array_position over the D-element literal domain list (D driver
    scalars — domains are few by definition) — NO global row_number (a
    single-partition window is the classic driver-choke at scale); the
    sequence has
    gaps once short domains run dry (a domain's slot goes unused) but
    order is what matters for a data loader, not density. Writing
    sorted by ``pos`` range-partitions cleanly since rank dominates
    the ordering."""
    domains = [r[0] for r in
               df.select(domain_col).distinct().collect()
               if r[0] is not None]  # NULL domain -> NULL pos below
    if not domains:
        return df.withColumn(pos_col, F.lit(None).cast("long"))
    d = len(domains)
    idx = F.array_position(
        F.lit(sorted(domains)), F.col(domain_col)).cast("long") - 1
    h = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col(key).asc())
    rk = F.row_number().over(w).cast("long")
    return df.withColumn(pos_col, (rk - F.lit(1)) * d + idx)
