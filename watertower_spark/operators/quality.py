"""Statistical quality scoring for training-data pipelines.

CCNet (Wenzek et al. 2020, §3.2) ranks Common-Crawl documents by
language-model perplexity and keeps the low-perplexity head.  The
environment ships no LM, so ``bigram_lm_perplexity`` implements the
same signal self-trained: a maximum-likelihood word-bigram model is
fitted on the corpus itself (one pass of relational aggregates) and
every document is scored by the perplexity of its own token stream
under that model.  Boilerplate-heavy and templated documents score LOW
(their bigrams dominate the corpus), statistically unusual ones score
HIGH — the same ordering CCNet's head/middle/tail split keys on, with
the sign convention that low ppl = most "in-distribution".

Fully relational (window lead + three aggregates + two joins on
bounded keys: the distinct-bigram and distinct-term spaces, both far
below the token count, with partial aggregation ahead of every
exchange); no Python, no model artifact to ship.  Because the model is
MLE on the scoring corpus itself, every observed bigram has p > 0 —
no smoothing needed, and the scores are deterministic for a given
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bigram_lm_perplexity(tokens: DataFrame, round_to: int | None = None) -> DataFrame:
    """(doc_id, n_bigrams, ppl) for every doc with >= 2 tokens.

    ``tokens`` is the analyzer stream (doc_id, pos, term).  ppl =
    exp(-mean ln P(w_i | w_{i-1})) with MLE P = c(w1,w2)/c(w1·) counted
    over the whole input.  Docs with fewer than two tokens have no
    bigram and are not returned (a quality gate has nothing to score).
    """
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tokens.select("doc_id", "pos", "term", F.lead("term").over(w).alias("nxt"))
        .where(F.col("nxt").isNotNull())
    )
    c12 = big.groupBy("term", "nxt").agg(F.count("*").alias("n12"))
    c1 = big.groupBy("term").agg(F.count("*").alias("n1"))
    p = c12.join(c1, "term").select(
        "term", "nxt", (F.col("n12").cast("double") / F.col("n1")).alias("p")
    )
    ppl = F.exp(-F.avg(F.log("p")))
    if round_to is not None:
        ppl = F.round(ppl, round_to)
    return (
        big.join(p, ["term", "nxt"])
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_bigrams"), ppl.alias("ppl"))
    )
