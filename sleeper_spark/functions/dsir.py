"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS, public method): pick raw-corpus documents whose hashed n-gram
distribution looks like a small target domain, by importance weights
``log p_target(x) - log q_raw(x)`` under bag-of-hashed-ngrams models,
then resample with Gumbel-top-k.

This is the step a 100 TB pretraining pipeline runs to tilt a web-scale
crawl toward a curated domain (Wikipedia/books/code) without training a
classifier. Everything here is declarative DataFrame algebra:

- **Features** are hashed unigram+bigram buckets (a fixed B-dim
  multinomial). Hashing is md5-derived so any SQL engine reproduces the
  bucket ids bit-for-bit (same recipe as
  ``dedup.portable_shingle_hashes``).
- **Fitting** each model is ONE hash aggregate over exploded grams —
  combine-friendly; the shuffle carries at most B rows per side.
- **The model IS a DataFrame**: the per-bucket log-weight table is at
  most B rows, broadcast to the scoring join. No driver-side state.
- **Scoring** is an explode → broadcast-join → per-doc sum. Per-bucket
  log-weights round to MICRO units (1e-6, stored as longs) before
  summation so each document's weight is an exact integer sum — float
  addition order across engines cannot perturb it (the repo-wide
  determinism idiom, see functions/lm.py).
- **Resampling** is Gumbel-top-k with a DETERMINISTIC portable Gumbel:
  uniform from the md5 hash of the doc id, ``g = -ln(-ln(u))``. A
  re-run — in Spark or in the DuckDB oracle — picks the same sample.
  Spark executes the top-k as TakeOrderedAndProject (per-partition
  heads, never a global sort).

Reference parity note: the reference engine has no data-selection
surface; this is beyond-reference functionality motivated by the
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sleeper_spark.functions.lm import _bigrams_given
from sleeper_spark.functions.text import bind_once, tokens

#: default feature-space size: 1024 buckets — the paper's 10k hashed
#: n-gram dimensionality scaled down for test corpora (pass
#: ``n_buckets=10_000`` to match the paper); at 100 TB the weight table
#: is still only n_buckets rows — always broadcastable.
DEFAULT_BUCKETS = 1024


def hashed_gram_buckets(col: Column | str,
                        n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Array of feature-bucket ids for one document: unigrams + adjacent
    bigrams, each md5-hashed to a 64-bit int (hi<<32 | lo of the first
    16 hex chars) and folded into [0, n_buckets) with pmod. NOT
    distinct — multiplicity is the multinomial count. Portable: the
    oracle recomputes identical buckets from the same md5 arithmetic."""
    # one tokenizer pass feeds BOTH the unigram and the bigram stream:
    # the token array is lambda-bound (bind_once) and the bigram
    # builder consumes the bound variable directly
    grams = bind_once(tokens(col),
                      lambda t: F.concat(t, _bigrams_given(t)))

    def _bucket(g: Column) -> Column:
        hx = F.md5(g)
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
        return F.pmod(F.shiftleft(hi, 32).bitwiseOR(lo), F.lit(n_buckets))

    return F.transform(grams, _bucket)


def fit_bucket_counts(df: DataFrame, text_col: str = "text",
                      n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Sufficient statistics of a bag-of-hashed-ngrams model:
    ``(bucket, cnt)`` over the corpus. One explode + one hash
    aggregate; output ≤ n_buckets rows."""
    return (df.select(F.explode(hashed_gram_buckets(text_col, n_buckets))
                      .alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("cnt")))


def logweight_table_from_counts(target_counts: DataFrame,
                                raw_counts: DataFrame,
                                n_buckets: int = DEFAULT_BUCKETS,
                                alpha: float = 0.5) -> DataFrame:
    """Weight table from ALREADY-FITTED ``(bucket, cnt)`` statistics —
    the incremental path: persist the two count tables once (each is
    ≤ n_buckets rows), then score every future batch against them
    without re-reading either corpus (same pattern as the persisted
    MinHash band index, dedup.incremental_minhash_pairs)."""
    # materialise both count tables (≤ n_buckets rows each): every one
    # is referenced TWICE below (its total and the full-outer join),
    # and Catalyst shares no subtrees — without the cut each reference
    # re-runs the full corpus explode+aggregate that produced the
    # counts (measured: the fit stages executed twice per side at
    # sf0.1; at 100 TB that is two spare corpus passes). A ≤B-row
    # localCheckpoint is free by comparison (guide §3.3/§5).
    # lazy: the first consuming action materialises both (the RDDs are
    # marked persistent at creation, so the second reference in the
    # same job reads the cache) — eager checkpoints paid two extra
    # standalone jobs per call for the same reuse
    tc = target_counts.withColumnRenamed("cnt", "tc") \
        .localCheckpoint(eager=False)
    rc = raw_counts.withColumnRenamed("cnt", "rc") \
        .localCheckpoint(eager=False)
    # coalesce: an EMPTY count table (e.g. a target sample with no
    # grams yet) sums to NULL, which would NULL every weight — and the
    # scorer's final coalesce would then silently report 0 instead of
    # the smoothed (c+alpha)/(0+alpha*B) weights. Caught by the
    # hypothesis property test on an all-empty target.
    totals = tc.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("tt")) \
        .crossJoin(rc.agg(F.coalesce(F.sum("rc"), F.lit(0)).alias("rt")))
    ab = float(alpha) * n_buckets
    joined = tc.join(rc, "bucket", "full_outer") \
        .crossJoin(F.broadcast(totals))
    lw = (F.log((F.coalesce("tc", F.lit(0)).cast("double") + F.lit(alpha))
                / (F.col("tt").cast("double") + F.lit(ab)))
          - F.log((F.coalesce("rc", F.lit(0)).cast("double") + F.lit(alpha))
                  / (F.col("rt").cast("double") + F.lit(ab))))
    return joined.select("bucket",
                         F.round(lw * 1e6).cast("long").alias("lw_micro"))


def dsir_logweight_table(target: DataFrame, raw: DataFrame,
                         text_col: str = "text",
                         n_buckets: int = DEFAULT_BUCKETS,
                         alpha: float = 0.5) -> DataFrame:
    """Per-bucket importance log-weight table ``(bucket, lw_micro)``:
    ``round(1e6 * (ln p̂_target(b) - ln q̂_raw(b)))`` with Lidstone
    smoothing ``(c + alpha) / (total + alpha * B)`` on both sides.
    ≤ n_buckets rows — broadcastable at any corpus scale. Buckets never
    observed in EITHER corpus are absent; their weight is zero-ish and
    they cannot appear in a scored document drawn from ``raw`` anyway
    (the raw fit sees every raw gram)."""
    return logweight_table_from_counts(
        fit_bucket_counts(target, text_col, n_buckets),
        fit_bucket_counts(raw, text_col, n_buckets),
        n_buckets, alpha)


def score_with_weights(docs: DataFrame, weight_table: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Score ANY document batch against a (possibly persisted) weight
    table: explode grams → broadcast join → exact integer per-doc sums.
    Grams hashing to a bucket absent from the table (never seen in the
    fitted corpora) contribute nothing — at scoring time there is no
    principled weight for them, and dropping beats inventing one."""
    ex = docs.select(F.col(id_col),
                     F.explode(hashed_gram_buckets(text_col, n_buckets))
                     .alias("bucket"))
    return _score_exploded(docs, ex, weight_table, id_col)


def _score_exploded(docs: DataFrame, ex: DataFrame,
                    weight_table: DataFrame, id_col: str) -> DataFrame:
    """Scoring tail shared by :func:`score_with_weights` and
    :func:`dsir_logweights`: ``ex`` is the pre-exploded ``(id_col,
    bucket)`` gram stream of ``docs``."""
    scored = (ex.join(F.broadcast(weight_table), "bucket")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_grams"),
                   F.sum("lw_micro").alias("logweight_micro")))
    return (docs.select(id_col).join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                    .alias("n_grams"),
                    F.coalesce("logweight_micro", F.lit(0)).cast("long")
                    .alias("logweight_micro")))


def dsir_logweights(raw: DataFrame, target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = DEFAULT_BUCKETS,
                    alpha: float = 0.5) -> DataFrame:
    """Per-document importance log-weight: ``(id_col, n_grams,
    logweight_micro)`` where ``logweight_micro`` is the exact integer
    sum of per-gram bucket log-weights (micro units). Documents with no
    grams score 0 over 0 features (weight-neutral, kept so the output
    covers every raw document). Plan shape: ONE gram-hashing pass over
    ``raw`` — the exploded (id, bucket) stream is materialised
    executor-local and feeds BOTH the raw-model fit and the scoring
    join (previously the raw corpus was hashed once for the fit and
    again for scoring; with the count tables' own double-evaluation
    that made three raw passes per call). The materialisation is the
    same byte volume a shuffle of the gram stream would spill, traded
    for two full corpus re-reads at 100 TB. Then: broadcast join to
    the ≤B-row weight table → one hash aggregate."""
    ex = raw.select(F.col(id_col),
                    F.explode(hashed_gram_buckets(text_col, n_buckets))
                    .alias("bucket")).localCheckpoint(eager=False)
    wt = logweight_table_from_counts(
        fit_bucket_counts(target, text_col, n_buckets),
        ex.groupBy("bucket").agg(F.count("*").alias("cnt")),
        n_buckets, alpha)
    return _score_exploded(raw, ex, wt, id_col)


def deterministic_gumbel_micro(id_col: Column | str) -> Column:
    """Portable deterministic Gumbel(0,1) noise in micro units:
    ``u = (md5-hash(id) mod 2^20 + 0.5) / 2^20`` (u ∈ (0,1), never 0/1
    so both logs are finite), ``g = -ln(-ln(u))``, rounded to a long.
    The same md5 + ln arithmetic reproduces it in any SQL engine, so a
    'random' resample is still oracle-checkable and re-run-stable."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hx = F.md5(c.cast("string"))
    h = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    u = (F.pmod(h, F.lit(1 << 20)).cast("double") + F.lit(0.5)) \
        / F.lit(float(1 << 20))
    return F.round(-F.log(-F.log(u)) * 1e6).cast("long")


def dsir_resample(scored: DataFrame, k: int, id_col: str = "doc_id",
                  temperature: float | None = None) -> DataFrame:
    """Gumbel-top-k importance resampling over a
    :func:`dsir_logweights` output: keep the k documents maximising
    ``logweight/temperature + gumbel(id)`` — a without-replacement
    sample from the softmax of the importance weights (Gumbel-max
    trick, public method). ``temperature=None`` selects greedily (pure
    top-k by weight). Ties break on id, so the sample is a fixed SET.
    Spark executes this as TakeOrderedAndProject: per-partition k-row
    heads merged on the driver — no global sort at any scale.

    The sort key FLOORS (never rounds) the shared double: ``lw/τ`` sits
    on exact .5 boundaries whenever τ divides the micro weight, where
    round-half conventions could diverge across engines — floor of one
    shared IEEE double never does (same hazard class as lm.py's
    truncation note)."""
    if temperature is None:
        key = F.col("logweight_micro").cast("double")
    else:
        key = (F.col("logweight_micro").cast("double")
               / F.lit(float(temperature))
               + deterministic_gumbel_micro(id_col).cast("double"))
    return (scored
            .withColumn("sample_key_micro", F.floor(key).cast("long"))
            .orderBy(F.col("sample_key_micro").desc(), F.col(id_col))
            .limit(k))
