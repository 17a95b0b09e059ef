"""Keyword search over a document corpus: tokenization, an inverted
index (term -> posting list), and all/any-term search.

Beyond-reference: the reference's value columns are opaque to its
queries; a training-data pipeline needs "find the documents mentioning
these terms" both ad hoc (one scan) and repeatedly (an index table).

Scale design — two execution shapes, chosen by use:

* ``keyword_search`` (ad hoc): ZERO-shuffle scan. The term set is a
  literal array, matching is ``array_intersect`` over the document's
  distinct tokens — whole-stage codegen, no explode, no aggregation;
  the cost is exactly one pass over the text column regardless of how
  many terms are probed.
* ``inverted_index`` (repeated queries): one explode + groupBy shuffle
  builds (term, doc_id, tf) postings. Persisted into a SleeperTable
  KEYED on (term, doc_id), the posting lists arrive range-partitioned
  and sorted, so a term lookup is the engine's own point query —
  partition pruning + first-row-key Bloom filters open only the files
  that hold the term's postings (tests/test_search.py proves the
  composition). That is the classic search-engine layout expressed as
  LSM table mechanics rather than a bespoke index format.

Tokenization is shared by both shapes and by the DuckDB oracles:
lowercase, then maximal ``[a-z0-9]+`` runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"


def tokens(text_col: Column | str) -> Column:
    """All tokens of a text column, in order (with duplicates)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Posting table ``(term, doc_id, tf)`` — one explode + one
    hash-aggregate (partial map-side combine collapses each document's
    repeats before the shuffle, so shuffle bytes ~ distinct terms per
    doc, not token count)."""
    return (
        df.select(F.col(id_col),
                  F.explode(tokens(text_col)).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def posting_stats(index_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-term corpus stats ``(term, df, tf_total)`` from a posting
    table — the inputs to idf weighting and stopword caps."""
    return index_df.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"))


def keyword_search(df: DataFrame, terms: list[str], mode: str = "all",
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Documents matching ``terms`` as ``(id_col, n_matched)`` —
    ``mode='all'`` requires every term, ``'any'`` at least one.
    Zero-shuffle: distinct-token intersection against the literal term
    array inside codegen; the only job cost is the scan (and Parquet
    reads just ``id_col`` + ``text_col``)."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    if not terms:
        raise ValueError("terms must be non-empty")
    # lowercase BEFORE dedup: 'Vector' and 'vector' are one term
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    lits = F.array(*[F.lit(t) for t in uniq])
    n = F.size(F.array_intersect(F.array_distinct(tokens(text_col)), lits))
    need = len(uniq) if mode == "all" else 1
    return (df.select(F.col(id_col), n.alias("n_matched"))
            .where(F.col("n_matched") >= need))


def bm25_search(df: DataFrame, terms: list[str],
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """BM25-ranked any-term search: ``(id_col, score)`` for every
    document matching at least one term, Lucene's idf form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Scale shape: per-term tf is a codegen'd ``size(filter(tokens, =t))``
    over ONE tokenization — no explode, no posting join. The corpus
    stats BM25 needs (N, avgdl, per-term df) reduce to a SINGLE 1-row
    aggregate that broadcast-cross-joins back onto the scan: two passes
    over the text column total, zero driver-side data, any corpus size.

    Determinism for oracle parity: every aggregate is integer-exact
    (counts and a long token-length sum); avgdl is one double division
    of exact longs, and the score rounds to 6 digits — the same recipe
    that keeps the cosine operators hash-stable across engines."""
    if not terms:
        raise ValueError("terms must be non-empty")
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    def _tf(term: str):
        # separate scope per term: a default-arg lambda would have
        # arity 2 and Spark would hand it (element, index)
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(term)))

    toks = toks.select(
        F.col(id_col),
        F.size("__toks").alias("__dl"),
        *[_tf(t).alias(f"__tf{i}") for i, t in enumerate(uniq)],
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__dlsum"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
          for i in range(len(uniq))],
    )
    j = toks.crossJoin(F.broadcast(stats))
    navg = F.col("__dlsum").cast("double") / F.col("__n").cast("double")
    score = F.lit(0.0)
    for i in range(len(uniq)):
        tf = F.col(f"__tf{i}").cast("double")
        dfreq = F.col(f"__df{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (F.col("__n").cast("double") - dfreq + F.lit(0.5))
            / (dfreq + F.lit(0.5)))
        score = score + idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("__dl").cast("double")
                              / navg))
    return (j.where(sum(F.col(f"__tf{i}") for i in range(len(uniq)))
                    > 0)
            .select(F.col(id_col), F.round(score, 6).alias("score")))


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             score_col: str = "score", k: int = 10, k_each: int = 20,
             rrf_k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists (Cormack et al., SIGIR'09
    — the standard hybrid-search combiner): each list contributes
    ``1/(rrf_k + rank)`` for its top ``k_each`` ids; ids are scored by
    the SUM of contributions and the fused top-``k`` returned.

    Scale shape: each list is capped FIRST with orderBy().limit(k_each)
    — Spark's TakeOrdered, a per-partition heap with no global sort —
    so the rank window then runs over <= k_each rows per list, and the
    fusion aggregate sees <= len(rankings) x k_each rows total,
    whatever the corpus size behind the lists.

    Determinism: ranks tie-break on the id; contributions are INTEGER
    ``1e9 DIV (rrf_k + rank)`` so the fused score is an exact long sum
    (float addition order across lists can differ between engines —
    integer sums cannot). Output: ``(id_col, rrf_score)`` by
    (rrf_score desc, id)."""
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = []
    for r in rankings:
        capped = r.select(id_col, score_col) \
            .orderBy(F.col(score_col).desc(), id_col).limit(k_each)
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        parts.append(
            capped.withColumn("__rank", F.row_number().over(w))
            .select(id_col,
                    F.expr(f"1000000000 DIV ({rrf_k} + __rank)")
                    .alias("__c")))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (allp.groupBy(id_col)
            .agg(F.sum("__c").cast("long").alias("rrf_score"))
            .orderBy(F.col("rrf_score").desc(), id_col)
            .limit(k))
