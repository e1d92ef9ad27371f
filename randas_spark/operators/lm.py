"""Corpus-statistical language-model scoring (CCNet-style quality
signal).

A cheap LM perplexity proxy without any model artifact: train bigram
statistics on the corpus itself, then score each document by its mean
add-one-smoothed bigram log-probability

    score(d) = mean over bigrams (w1,w2) of  ln( (c(w1 w2)+1) / (c(w1)+V) )

Low scores → improbable word sequences (garbled/boilerplate/outlier
text); the CCNet recipe buckets a corpus by exactly this kind of score.
Deterministic and engine-portable (counts + ln), unlike a real KenLM.

Plan: one explode for bigram instances, one for unigrams; two count
aggregations (shuffled on the gram — bounded by vocabulary, not corpus);
the scoring join hits those count tables, which are vocabulary-sized →
broadcast when the vocab fits, shuffle otherwise; final mean groups by
doc. Docs with <2 tokens have no bigrams and drop out (score undefined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from randas_spark.functions.text import tokens


def _bigrams_of(toks) -> F.Column:
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    # guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
    # single-token docs must yield no bigrams, matching DuckDB's empty
    # generate_series(1, 0).
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def bigram_lm_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, n_bigrams, lm_score): mean smoothed bigram log-prob under
    corpus-trained counts. Self-trained: the same frame is both the
    training corpus and the scored set."""
    from randas_spark.operators.dedup import fan_out

    # Materialize the TOKEN table once: the bigram stream feeds the c2
    # count AND the scoring join, and the unigram stream feeds c1 AND
    # the vocab count — unmaterialized, each broadcast subtree re-ran
    # the tokenizer over the corpus (4 full scans; measured 11.4 s at
    # sf0.1, 1.36 s with this checkpoint — the shingle-table lesson).
    tk = (
        fan_out(df)
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks"))
        .localCheckpoint()
    )
    bg = tk.select("doc_id", F.explode(_bigrams_of(F.col("toks"))).alias("bg"))
    ug = tk.select(F.explode(F.col("toks")).alias("w"))

    c2 = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = ug.groupBy(F.col("w").alias("w1")).agg(F.count(F.lit(1)).alias("c1"))
    vocab = ug.agg(F.countDistinct("w").alias("v"))

    logp = F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
    return (
        bg.join(F.broadcast(c2), "bg")
        .withColumn("w1", F.split(F.col("bg"), " ")[0])
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(logp).alias("lm_score_raw"),
        )
    )
