"""Corpus-construction operators for training-data pipelines: document
chunking, TF-IDF term scoring, and train/test contamination detection.

All built from DataFrame ops + Column expressions — no Python UDFs, so
every operator is codegen'd JVM-side and scales with the scan:

- chunking is a per-row ``transform`` + ``posexplode`` (no shuffle);
- TF-IDF is two hash aggregations (term counts, doc frequency) and a
  broadcast of one scalar (corpus size);
- contamination is a shingle-exploded equi-join — the same
  bucketed-by-content shape as the MinHash band join (dedup.py), never
  an all-pairs compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sleeper_spark.functions.dedup import shingles
from sleeper_spark.functions.text import bind_once, tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 40,
    stride: int = 30,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    step before sequence packing / embedding in a training pipeline.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + window)``; starts
    run every ``stride`` tokens while they fall inside the document (an
    empty document still yields one empty chunk, so no doc is silently
    dropped). Pure per-row expressions + ``posexplode``: zero shuffle,
    each task chunks its own rows — the 100 TB shape is the scan itself.

    Output: ``id_col, chunk_id, n_chunk_tokens, chunk_text``.
    """
    # the token array is a lambda-bound value (bind_once), never an
    # expression captured inside the transform lambda: a captured tree
    # would re-run the tokenizer regex for EVERY chunk — O(tokens^2)
    # per document instead of O(tokens)
    def _chunks(t: Column) -> Column:
        # token-start positions: 0, stride, 2*stride, ... < max(n, 1)
        starts = F.sequence(F.lit(0), F.greatest(F.size(t) - 1, F.lit(0)),
                            F.lit(stride))
        return F.transform(starts, lambda s: F.array_join(
            F.slice(t, s + 1, window), " "))

    out = df.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("__n_tokens"),
        F.posexplode(bind_once(tokens(text_col), _chunks))
        .alias("chunk_id", "chunk_text"),
    )
    return out.select(
        id_col,
        "chunk_id",
        # tokens actually in this chunk: min(window, n - start), >= 0
        F.greatest(
            F.least(F.lit(window),
                    F.col("__n_tokens") - F.col("chunk_id") * stride),
            F.lit(0)).alias("n_chunk_tokens"),
        "chunk_text",
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF.

    ``score = tf * ln((N + 1) / (df + 1))`` with raw term counts —
    integer inputs to one ``ln`` and one multiply, so the double result
    is bit-identical across engines.

    Two shuffles (term counts per doc, doc frequency per term) + a
    1-row broadcast for N; the per-doc top-k is a WindowGroupLimit
    (rank pre-pruned map-side), never a full sort of the term table.
    """
    terms = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    # ONE tokenization: document frequency derives from the tf table
    # (its rows are distinct (doc, term) pairs, so a plain count per
    # term IS countDistinct(doc)) instead of re-exploding the corpus
    # for a second aggregation over the raw term stream (guide §1.2);
    # tf is materialised LAZILY for its two consumers — the eager
    # checkpoint ran as an extra blocking job before the real action
    # and cost more than it saved (interleaved A/B at sf0.1: eager
    # ~2.0s, lazy ~1.4s, no checkpoint ~2.5s per pass, identical
    # values). n_docs must still come from the raw frame — a document
    # with no tokens has no tf row but counts toward N.
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")).localCheckpoint(eager=False)
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .join(F.broadcast(n_docs))
        .select(
            id_col, "term",
            (F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
             ).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", F.round("score", 4).alias("score"),
                F.col("rank").cast("int").alias("rank"))
    )


def contamination_check(
    test_df: DataFrame,
    train_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
    max_train_df: int | None = 1000,
) -> DataFrame:
    """Train/test contamination: for each test document, which training
    documents share at least one ``ngram``-token shingle, and how much.

    The eval-leakage scan a training pipeline runs before shipping a
    benchmark split. Shingle-exploded equi-join — work is proportional
    to shared content, bucketed by shingle hash across the cluster, so
    disjoint corpora cost one pass over each side and no pairwise
    compare. Test side is usually the small one: Catalyst broadcasts it
    when it fits.

    **Hot-shingle guard** (C4-style): a shingle whose *train-side
    document frequency* exceeds ``max_train_df`` is boilerplate
    (navigation chrome, license headers, templated markup), not a
    leakage signal — and at web-corpus scale its join output is
    ``(test matches) × df``, an M×N hot-key blow-up. Such shingles are
    dropped BEFORE the join: one extra hash aggregation over the train
    shingle table computes per-shingle df, the (tiny) over-cap list is
    broadcast, and a left-anti join removes those keys. The joined
    relation is then bounded by ``n_matching_shingles × max_train_df``
    per key regardless of corpus size. Pass ``max_train_df=None`` for
    the exact unguarded semantics.

    Output: ``test_id, n_train_docs, n_shared_shingles`` (only test
    docs with >= 1 surviving overlap).
    """
    t = test_df.select(
        F.col(id_col).alias("test_id"),
        F.explode(shingles(text_col, ngram)).alias("sh"))
    tr = train_df.select(
        F.col(id_col).alias("train_id"),
        F.explode(shingles(text_col, ngram)).alias("sh"))
    if max_train_df is not None:
        # shingles() is distinct-per-doc, so count == document frequency
        hot = (tr.groupBy("sh")
               .agg(F.count(F.lit(1)).alias("__df"))
               .where(F.col("__df") > max_train_df)
               .select("sh"))
        tr = tr.join(F.broadcast(hot), "sh", "left_anti")
    return (
        t.join(tr, "sh")
        .groupBy("test_id")
        .agg(
            F.countDistinct("train_id").alias("n_train_docs"),
            F.countDistinct("sh").alias("n_shared_shingles"),
        )
    )


def containment_pairs(
    test_df: DataFrame,
    train_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
    threshold: float = 0.5,
    max_train_df: int | None = 1000,
) -> DataFrame:
    """ASYMMETRIC contamination: per (test, train) pair, the fraction
    of the TEST document's shingles present in the train document —
    ``|shingles(test) ∩ shingles(train)| / |shingles(test)|``.

    This is the leak Jaccard misses: a 200-token eval question pasted
    verbatim into a 50k-token train document has near-zero Jaccard
    (the union is dominated by the train doc) but containment ~1.0.
    Published decontamination recipes gate on exactly this ratio.

    Same scale shape as :func:`contamination_check`: shingle-exploded
    equi-join bucketed by shingle (work ∝ shared content, never
    pairwise over the corpora), with the C4-style hot-shingle guard
    dropping train-side boilerplate (df > ``max_train_df``) before the
    join. The guard removes boilerplate from the NUMERATOR only, so
    guarded containment is a lower bound — template chrome can't push
    a pair over the threshold. ``shingles()`` is distinct-per-doc, so
    plain counts are exact set sizes.

    Output: ``test_id, train_id, n_shared, n_test_shingles,
    containment`` for pairs with containment >= ``threshold``.
    """
    t = test_df.select(
        F.col(id_col).alias("test_id"),
        F.explode(shingles(text_col, ngram)).alias("sh"))
    sizes = t.groupBy("test_id").agg(
        F.count(F.lit(1)).alias("n_test_shingles"))
    tr = train_df.select(
        F.col(id_col).alias("train_id"),
        F.explode(shingles(text_col, ngram)).alias("sh"))
    if max_train_df is not None:
        hot = (tr.groupBy("sh")
               .agg(F.count(F.lit(1)).alias("__df"))
               .where(F.col("__df") > max_train_df)
               .select("sh"))
        tr = tr.join(F.broadcast(hot), "sh", "left_anti")
    pairs = (t.join(tr, "sh")
             .groupBy("test_id", "train_id")
             .agg(F.count(F.lit(1)).alias("n_shared")))
    # sizes is one row per test doc — the small side by convention;
    # AQE broadcasts it when it fits
    return (pairs.join(sizes, "test_id")
            .withColumn("containment",
                        F.col("n_shared") / F.col("n_test_shingles"))
            .where(F.col("containment") >= threshold)
            .select("test_id", "train_id", "n_shared",
                    "n_test_shingles", "containment"))


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide line deduplication (the C4 preprocessing step:
    boilerplate lines — navigation chrome, cookie banners, license
    headers — repeat across millions of pages; keep each distinct line
    only at its FIRST occurrence, ordered by (doc_id, line_no)).

    Shape: explode lines with position, find each line's first
    occurrence with a hash AGGREGATION (``min(struct(doc_id, line_no))``
    — partial map-side combine collapses a million-fold duplicated line
    to one row per map task, where the window-function formulation would
    sort the full hot key in one reducer), broadcast-free equi-join
    back, reassemble per doc. Two shuffles (line agg + doc regroup),
    both combine-friendly.

    Output: ``id_col, n_lines, n_kept, text_dedup`` (every doc appears,
    possibly with empty ``text_dedup``).
    """
    lines = F.split(F.col(text_col), "\n")
    e = df.select(
        F.col(id_col),
        F.posexplode(lines).alias("line_no", "line"))
    first = (e.groupBy("line")
             .agg(F.min(F.struct(id_col, "line_no")).alias("__first")))
    kept = e.join(first, "line").where(
        (F.col(f"__first.{id_col}") == F.col(id_col))
        & (F.col("__first.line_no") == F.col("line_no")))
    per_doc = (kept.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("line_no", "line"))),
                            lambda s: s["line"]),
                        "\n").alias("text_dedup")))
    # size(NULL) is -1 under Spark's legacy sizeOfNull — a NULL-text doc
    # must report 0 lines (posexplode already drops it from the kept set)
    totals = df.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(lines)).alias("n_lines"))
    return (totals.join(per_doc, id_col, "left")
            .select(id_col, "n_lines",
                    F.coalesce("n_kept", F.lit(0)).cast("int")
                    .alias("n_kept"),
                    F.coalesce("text_dedup", F.lit("")).alias("text_dedup")))


def ngrams(col: Column | str, n: int = 2) -> Column:
    """ALL token n-grams (with repeats — counting wants the multiset,
    unlike dedup's distinct ``shingles``)."""
    # bind the token array once (bind_once): captured inside the lambda
    # it would re-tokenize per gram — O(tokens^2) per document. The
    # when() guard stays INSIDE the binding so sequence(1, 0) is never
    # evaluated for short documents (it would run DESCENDING).
    def _grams(t: Column) -> Column:
        sz = F.size(t)
        return F.when(
            sz >= n,
            F.transform(F.sequence(F.lit(1), sz - n + 1),
                        lambda i: F.array_join(F.slice(t, i, n), " ")),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(tokens(col), _grams)


def ngram_top_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 100,
) -> DataFrame:
    """Corpus-wide top-``k`` n-grams by occurrence count — the
    frequency-table scan behind C4-style boilerplate detection ("most
    common lines/n-grams are navigation chrome, strip them").

    explode → one hash aggregation (map-side partial combine) → ranked
    take. The final take is ``TakeOrderedAndProject`` (per-partition
    k-row heads merged on the driver), never a global sort of the
    n-gram table. Ties broken by the n-gram string, so the top-k set is
    deterministic across engines.
    """
    grams = df.select(F.explode(ngrams(text_col, n)).alias("ngram"))
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return counts.orderBy(F.col("n_occurrences").desc(),
                          F.col("ngram").asc()).limit(k)


def repetition_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Within-document repetition signals (the Gopher-style quality
    rules): fraction of duplicate n-grams and duplicate lines. High
    values flag boilerplate/generated text for filtering.

    Pure per-row higher-order expressions — no shuffle, no UDF; the
    100 TB cost is the scan itself.

    Output: ``id_col, n_ngrams, dup_ngram_frac, dup_line_frac``.
    """
    # the gram and line arrays are lambda-bound (bind_once) inside each
    # output column: the dup fractions reference them ~4 times each,
    # and every captured-tree reference would rebuild the gram array
    # (tokenize + join) or re-split the text per row
    def _dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0,
            F.round((n - F.size(F.array_distinct(arr))).cast("double")
                    / n, 4)).otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col),
        F.size(ngrams(text_col, ngram)).alias("n_ngrams"),
        bind_once(ngrams(text_col, ngram), _dup_frac)
        .alias("dup_ngram_frac"),
        bind_once(F.split(F.col(text_col), "\n"), _dup_frac)
        .alias("dup_line_frac"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 8,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.2,
    max_dup_ngram_frac: float = 0.5,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
) -> DataFrame:
    """Gopher-style quality-rules filter: the composite keep/drop
    decision a pretraining pipeline ships, built from the individual
    signals (token counts, punctuation ratio, mean token length,
    duplicate-trigram fraction) as ONE codegen'd predicate over the
    scan — no UDFs, no shuffle, filter-pushdown friendly.

    Returns the RETAINED rows (the corpus that ships). Thresholds are
    deliberately explicit keyword arguments: a pipeline pins them in
    code, and the same arithmetic runs in any SQL engine for audits.
    """
    c = F.col(text_col)
    punct_ratio = (
        F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
        / F.greatest(F.length(c), F.lit(1)))

    # every token-derived signal is built INSIDE one higher-order lambda
    # whose variable binds the tokenizer output — naming the array in a
    # projection doesn't survive Catalyst (predicate pushdown re-inlines
    # project aliases into the filter, re-running regexp_extract_all per
    # reference; measured 17.8s vs sub-second at sf0.1), but a lambda
    # variable is evaluated exactly once by construction
    def keep_given(t):
        n_toks = F.size(t)
        mean_len = (F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x))
                    .cast("double") / F.greatest(n_toks, F.lit(1)))
        g_total = F.greatest(n_toks - 2, F.lit(0))
        g_uniq = F.size(F.array_distinct(F.when(
            n_toks >= 3,
            F.transform(F.sequence(F.lit(1), n_toks - 2),
                        lambda i: F.array_join(F.slice(t, i, 3), " ")))
            .otherwise(F.array().cast("array<string>"))))
        dup_frac = F.when(
            g_total > 0, (g_total - g_uniq).cast("double") / g_total
        ).otherwise(F.lit(0.0))
        return (
            (n_toks >= min_tokens)
            & (n_toks <= max_tokens)
            & (dup_frac <= max_dup_ngram_frac)
            & (mean_len >= min_mean_token_len)
            & (mean_len <= max_mean_token_len)
        )

    keep = (
        F.element_at(F.transform(F.array(tokens(text_col)), keep_given), 1)
        & (punct_ratio <= max_punct_ratio)
    )
    return df.where(keep)


def document_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """(id, span_start, span_md5) for every ``window``-token rolling
    window (every ``stride`` tokens) of every document with at least
    ``window`` tokens. The md5 of the joined tokens is the span's
    identity — 32 bytes per span on the wire however long the window,
    and reproducible in any engine with md5 (the oracle recomputes it).

    Pure per-row expressions + posexplode: zero shuffle. Span count per
    doc is ~tokens/stride, so the exploded table is a constant factor
    of the corpus token count — the 100 TB shape is linear, unlike
    suffix-array substring dedup which needs a global sort of every
    suffix."""
    # the token array is lambda-bound (bind_once): captured inside the
    # transform lambda it would re-run the tokenizer regex per SPAN —
    # O(tokens^2 / stride) per document instead of the linear shape the
    # paragraph above promises
    def _spans(t: Column) -> Column:
        starts = F.sequence(F.lit(0), F.size(t) - window, F.lit(stride))
        return F.transform(
            starts, lambda s: F.md5(F.array_join(F.slice(t, s + 1, window),
                                                 " ")))

    return (df.where(F.size(tokens(text_col)) >= window)
            .select(F.col(id_col),
                    F.posexplode(bind_once(tokens(text_col), _spans))
                    .alias("span_idx", "span_md5"))
            .select(id_col,
                    (F.col("span_idx") * stride).alias("span_start"),
                    "span_md5"))


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Verbatim ``window``-token sequences appearing in MORE THAN ONE
    document: (span_md5, n_docs, n_occurrences). The scalable
    approximation of exact-substring training-data dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022):
    rolling fixed-width windows catch any shared verbatim run of
    >= window + stride - 1 tokens, via hash-aggregation instead of a
    corpus-wide suffix array."""
    sp = document_spans(df, text_col, id_col, window, stride)
    return (sp.groupBy("span_md5")
            .agg(F.countDistinct(id_col).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .where(F.col("n_docs") >= 2))


def verbatim_overlap_share(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Per-document share of rolling token windows that also appear in
    ANOTHER document — the filter signal for dropping documents that are
    mostly verbatim copies: (id, n_spans, n_dup_spans, dup_share).

    One explode + one hash aggregate + one equi-join on span_md5 (both
    sides partitioned by the join key; never pairwise over documents)."""
    sp = document_spans(df, text_col, id_col, window, stride)
    per_span = sp.groupBy("span_md5").agg(
        F.countDistinct(id_col).alias("__n_docs"))
    dup = F.when(F.col("__n_docs") >= 2, 1).otherwise(0)
    return (sp.join(per_span, "span_md5")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum(dup).alias("n_dup_spans"))
            .withColumn("dup_share",
                        F.round(F.col("n_dup_spans").cast("double")
                                / F.col("n_spans"), 4)))


# ---------------------------------------------------------------------------
# BPE tokenizer training primitives
# ---------------------------------------------------------------------------

def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) across the corpus — the vocabulary table BPE
    training actually consumes. ONE explode + ONE combine-friendly hash
    aggregate; the output is vocabulary-sized (sub-linear in corpus
    size), which is what makes tokenizer training feasible at 100 TB:
    every later step runs on this bounded table, never the corpus."""
    from sleeper_spark.functions.text import tokens
    return (df.select(F.explode(tokens(text_col)).alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq")))


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    top: int = 50) -> DataFrame:
    """Adjacent character-pair frequencies weighted by word frequency —
    the statistic the FIRST merge of byte-pair-encoding training picks
    its argmax from (Sennrich et al. 2016, public algorithm). Output:
    top-``top`` (pair, n) by (n desc, pair) — deterministic ties.

    Scale shape: the pair explosion runs over the DISTINCT-word
    vocabulary (each word's pairs weighted by its corpus frequency),
    not over the corpus — a word seen a billion times is charified
    once. Pairs via substring(word, i, 2): pure codegen, no UDFs."""
    wf = word_frequencies(df, text_col)
    pairs = F.expr(
        "CASE WHEN length(word) >= 2 THEN "
        "transform(sequence(1, length(word) - 1), "
        "i -> substring(word, i, 2)) "
        "ELSE array() END")
    return (wf.select(F.explode(pairs).alias("pair"),
                      F.col("freq"))
            .groupBy("pair").agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "pair")
            .limit(top))


def learn_bpe_merges(df: DataFrame, text_col: str = "text",
                     n_merges: int = 100,
                     max_vocab: int = 100_000) -> list[tuple[str, str]]:
    """Classic BPE merge-rule training: repeatedly merge the most
    frequent adjacent symbol pair (ties broken lexicographically for
    determinism) over the word-frequency vocabulary.

    Distribution boundary: ONE Spark job reduces the corpus to its
    (word, freq) vocabulary, truncated to the ``max_vocab`` most
    frequent words (by (freq desc, word) — deterministic); the merge
    loop then runs driver-side on that bounded table, exactly like
    every real tokenizer trainer (the corpus-sized step is the
    counting, not the merging). Returns the ordered merge list."""
    vocab_rows = (word_frequencies(df, text_col)
                  .orderBy(F.col("freq").desc(), "word")
                  .limit(max_vocab).collect())
    vocab: dict[tuple[str, ...], int] = {}
    for r in vocab_rows:
        w = tuple(r["word"])
        vocab[w] = vocab.get(w, 0) + r["freq"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        top_n = max(counts.values())
        best_pair = min(p for p, n in counts.items() if n == top_n)
        merges.append(best_pair)
        merged = "".join(best_pair)
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best_pair):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + freq
        vocab = new_vocab
    return merges


def bpe_segment(col: Column | str,
                merges: list[tuple[str, str]]) -> Column:
    """Apply learned merge rules to a text column: array<string> of BPE
    symbols per row. Each word becomes a space-separated symbol string;
    each merge rule is ONE literal replace ("a b" -> "ab") applied in
    training order — a deep but linear codegen'd expression tree, no
    UDF, so segmenting a 100 TB corpus stays a pure map."""
    from sleeper_spark.functions.text import tokens
    words = tokens(col)
    sym = F.transform(
        words,
        # char-split: regex split on the gap between characters (split
        # on "" appends a trailing empty string in Spark)
        lambda w: F.array_join(F.filter(F.split(w, ""),
                                        lambda c: c != ""), " "))
    def _apply_rule(pat: str, merged: str):
        return lambda s: F.replace(s, F.lit(pat), F.lit(merged))

    for a, b in merges:
        sym = F.transform(sym, _apply_rule(a + " " + b, a + b))
    return F.flatten(F.transform(sym, lambda s: F.split(s, " ")))


def grouped_boilerplate_ngrams(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Per-group boilerplate phrases: the top-``k`` n-grams of each
    group ranked by DOCUMENT frequency (distinct docs containing the
    phrase — cross-document repetition is what makes chrome/license
    headers boilerplate; within-doc loops are repetition_scores'
    business). The per-DOMAIN twin of :func:`ngram_top_counts`: one
    corpus's navigation chrome differs per language/site, so a global
    top-k drowns the small domains.

    Shape: per-doc DISTINCT grams explode (array_distinct caps each
    doc's contribution at one per phrase), one hash aggregation to
    (group, gram, df) — cost ∝ distinct phrases, map-side combined —
    then a group-partitioned rank that Spark truncates map-side
    (WindowGroupLimit) before the exchange. Ties rank by the gram
    string: deterministic top-k in any engine. Phrases below
    ``min_df`` docs are dropped (df=1 is not boilerplate)."""
    grams = df.select(
        *group_cols, F.col(id_col).alias("__doc"),
        F.explode(F.array_distinct(ngrams(text_col, n))).alias("ngram"))
    counts = (grams.groupBy(*group_cols, "ngram")
              .agg(F.count(F.lit(1)).alias("df"))
              .where(F.col("df") >= min_df))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("df").desc(), F.col("ngram").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def strip_boilerplate_lines(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 3,
) -> DataFrame:
    """Boilerplate REMOVAL — the step after detection in the C4
    pipeline: a line appearing in ``min_df`` or more DISTINCT documents
    of its group (language/site/domain) is chrome (navigation, cookie
    banners, license headers), and every occurrence is stripped from
    every document of that group. Line-level exact match — the C4
    rule; reference-free (no known-good phrase list needed:
    cross-document repetition itself is the evidence).

    Differs from :func:`dedup_lines` in WHAT survives: dedup keeps the
    FIRST occurrence of a repeated line (dedup semantics); this drops
    ALL occurrences once the line crosses the boilerplate threshold
    (cleaning semantics — the first cookie banner is as worthless as
    the millionth), and scopes the evidence per group so one
    language's chrome never bleeds into another's threshold.

    Shape: explode lines with position; per-group line document
    frequency via ``distinct -> hash agg`` (per-doc distinct first, so
    a single doc repeating its own line cannot manufacture
    boilerplate); LEFT ANTI join back on (group, line) — the
    boilerplate set is a tiny fraction of distinct lines, which AQE
    broadcasts when it fits — then reassemble per doc by line_no.
    Everything is hash aggregation + joins: combine-friendly,
    no hot-key window. NULL group keys join null-unsafely (their lines
    are never stripped), matching plain SQL equality.

    Output: ``group_cols..., id_col, n_lines, n_kept, text_stripped``
    — every input doc appears (possibly with empty ``text_stripped``),
    so downstream counts stay honest."""
    lines = F.split(F.col(text_col), "\n")
    e = df.select(
        *group_cols, F.col(id_col),
        F.posexplode(lines).alias("line_no", "line"))
    boiler = (e.select(*group_cols, id_col, "line").distinct()
              .groupBy(*group_cols, "line")
              .agg(F.count(F.lit(1)).alias("__df"))
              .where(F.col("__df") >= min_df)
              .select(*group_cols, "line"))
    kept = e.join(boiler, [*group_cols, "line"], "left_anti")
    # reassemble + rejoin on (*group_cols, id_col), not id_col alone:
    # ids need only be unique WITHIN their group (the natural shape for
    # per-language/per-site corpora this API invites) — keying on the
    # bare id would interleave same-id docs from different groups into
    # one text_stripped and fan out the final join. Null-safe equality
    # so NULL group keys (whose lines are never stripped — see above)
    # still get their reassembled text back.
    per_doc = (kept.groupBy(*group_cols, id_col)
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("line_no", "line"))),
                            lambda s: s["line"]),
                        "\n").alias("text_stripped")))
    totals = df.select(
        *group_cols, F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(lines)).alias("n_lines"))
    t, p = totals.alias("__sbl_t"), per_doc.alias("__sbl_p")
    cond = None
    for c in [*group_cols, id_col]:
        eq = F.col(f"__sbl_t.{c}").eqNullSafe(F.col(f"__sbl_p.{c}"))
        cond = eq if cond is None else (cond & eq)
    return (t.join(p, cond, "left")
            .select(*[F.col(f"__sbl_t.{c}") for c in group_cols],
                    F.col(f"__sbl_t.{id_col}").alias(id_col),
                    F.col("__sbl_t.n_lines"),
                    F.coalesce("n_kept", F.lit(0)).cast("int")
                    .alias("n_kept"),
                    F.coalesce("text_stripped", F.lit(""))
                    .alias("text_stripped")))
