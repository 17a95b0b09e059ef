"""Distributed Naive Bayes text classification — closed-form training.

A training-data pipeline labels documents at corpus scale (language,
domain, quality tier) with cheap linear classifiers (fastText-style).
Gradient methods need iterative passes; multinomial Naive Bayes does
not — its MLE is a pair of hash aggregates, so both TRAINING and
SCORING are single declarative Spark plans with no driver-side model:

- ``nb_train``: per-(label, token) counts + per-label totals + doc
  priors — three combine-friendly aggregates over exploded tokens. The
  model IS a set of DataFrames (vocabulary-sized at most).
- ``nb_predict``: explode scored docs to (id, token) occurrences, fan
  out across the (tiny, broadcast) label list, left-join the count
  table, Lidstone-smooth, and sum per (id, label); argmax via a
  per-id window (rows per id = #labels, so the window state is O(L)).

Determinism: per-token log-likelihoods round to MICRO units (longs)
before summation — per-document scores are exact integer sums, immune
to float addition order (repo idiom, see functions/lm.py). Ties on the
argmax break on label order, so predictions are a fixed function of
the corpus in any engine.

Scale shape: the shuffles carry (a) vocab×L count rows, (b) token
occurrences keyed by (token,label) for the join — AQE handles hot
tokens — and (c) L rows per doc for the argmax. No collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sleeper_spark.functions.text import tokens


def nb_train(df: DataFrame, text_col: str = "text",
             label_col: str = "label"
             ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Multinomial NB sufficient statistics:
    ``counts (label, token, c)``, ``label_stats (label, t_total,
    n_docs, prior_micro)``, ``vocab (v, n_total)`` — everything
    ``nb_predict`` needs, all still-lazy DataFrames."""
    lab = F.col(label_col).alias("label")
    ex = df.select(lab, F.explode(tokens(text_col)).alias("token"))
    # materialise the (label, token) count table: it is vocab×L-sized
    # (tiny next to the corpus) but feeds THREE consumers — the totals
    # aggregate, the vocabulary count, and nb_predict's likelihood
    # join — and Catalyst shares no subtrees across actions, so
    # without the cut every consumer re-tokenizes and re-aggregates
    # the whole corpus (measured: the explode+count stage ran 4x per
    # nb_classify call; at 100 TB that is 4 full corpus passes where
    # one suffices). localCheckpoint keeps it executor-resident and
    # truncates the plan (guide §3.3 / §5).
    counts = (ex.groupBy("label", "token").agg(F.count("*").alias("c"))
              .localCheckpoint())
    totals = counts.groupBy("label").agg(F.sum("c").alias("t_total"))
    ndocs = df.groupBy(lab).agg(F.count("*").alias("n_docs"))
    n = df.agg(F.count("*").alias("n_total"))
    # ndocs LEFT-joins totals: a label whose training docs contain no
    # tokens has no count rows, but it still has a prior and must stay
    # a candidate class (its likelihoods are the pure alpha floor) —
    # an inner join would silently drop it from the model, found by
    # the exactness property test (test_classify_property.py)
    label_stats = (ndocs.join(totals, "label", "left")
                   .crossJoin(F.broadcast(n))
                   .select("label",
                           F.coalesce("t_total", F.lit(0)).cast("long")
                           .alias("t_total"), "n_docs",
                           F.round(F.log(F.col("n_docs").cast("double")
                                         / F.col("n_total").cast("double"))
                                   * 1e6).cast("long")
                           .alias("prior_micro")))
    vocab = counts.select("token").distinct() \
        .agg(F.count("*").alias("v"))
    return counts, label_stats, vocab


def nb_predict(df: DataFrame, counts: DataFrame, label_stats: DataFrame,
               vocab: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", alpha: float = 1.0) -> DataFrame:
    """Score every document against every label and keep the argmax:
    ``(id_col, predicted_label, score_micro)`` where ``score_micro =
    prior_micro + Σ_tokens round(1e6 · ln((c + α)/(t_total + α·V)))``
    (Lidstone smoothing; unseen (token,label) pairs contribute the
    α-floor). Zero-token documents fall back to the max-prior label —
    every input row is classified."""
    labels = label_stats.select("label", "t_total", "prior_micro") \
        .crossJoin(F.broadcast(vocab))
    ex = df.select(F.col(id_col), F.explode(tokens(text_col))
                   .alias("token"))
    lp = (ex.crossJoin(F.broadcast(labels))
          .join(counts, ["label", "token"], "left")
          .select(id_col, "label",
                  F.round(F.log(
                      (F.coalesce("c", F.lit(0)).cast("double")
                       + F.lit(alpha))
                      / (F.col("t_total").cast("double")
                         + F.lit(alpha) * F.col("v").cast("double")))
                      * 1e6).cast("long").alias("lp_micro")))
    doc_label = (lp.groupBy(id_col, "label")
                 .agg(F.sum("lp_micro").alias("ll_micro")))
    scored = (doc_label
              .join(label_stats.select("label", "prior_micro"), "label")
              .select(id_col, "label",
                      (F.col("ll_micro") + F.col("prior_micro"))
                      .alias("score_micro")))
    # zero-token docs never appear in `ex`; give them prior-only
    # scores. "Never in ex" is exactly "tokens(text) is empty or
    # null", so test THAT with one cheap scan instead of the previous
    # left-anti join against scored's ids — which re-executed the
    # whole explode/join/aggregate chain a second time just to find
    # the handful of token-less documents (size() returns -1 for a
    # null array, hence <= 0).
    missing = (df.where(F.size(tokens(text_col)) <= 0).select(id_col)
               .crossJoin(F.broadcast(
                   label_stats.select("label",
                                      F.col("prior_micro")
                                      .alias("score_micro")))))
    allscores = scored.unionByName(missing.select(id_col, "label",
                                                  "score_micro"))
    w = Window.partitionBy(id_col).orderBy(F.col("score_micro").desc(),
                                           F.col("label"))
    return (allscores.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(id_col, F.col("label").alias("predicted_label"),
                    "score_micro"))


def nb_classify(df: DataFrame, text_col: str = "text",
                label_col: str = "label", id_col: str = "doc_id",
                alpha: float = 1.0) -> DataFrame:
    """Self-train-and-score convenience: fit NB on ``df``'s own labels,
    classify every row, and return the per-document verdict joined back
    to the true label: ``(id_col, label, predicted_label,
    score_micro)`` — the confusion table a pipeline audits before
    trusting the classifier on unlabeled data."""
    counts, label_stats, vocab = nb_train(df, text_col, label_col)
    pred = nb_predict(df, counts, label_stats, vocab, text_col,
                      id_col, alpha)
    truth = df.select(F.col(id_col), F.col(label_col).alias("label"))
    return truth.join(pred, id_col).select(id_col, "label",
                                           "predicted_label",
                                           "score_micro")
