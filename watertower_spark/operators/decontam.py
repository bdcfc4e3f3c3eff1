"""Benchmark decontamination for training-data pipelines.

Every serious pre-training pipeline removes training documents that
overlap the evaluation benchmarks before training (GPT-3 Appendix C,
Gopher §A.2.2, Llama 2 §A.6): a training doc is *contaminated* when it
shares at least one n-token gram (n typically 8-13) with any benchmark
item.  This module implements that as two operators over analyzer token
streams:

- ``contamination_report(tokens, bench_tokens, n)`` — per contaminated
  doc, how many distinct n-grams hit and how many distinct benchmark
  items were touched.
- ``decontaminate(docs, tokens, bench_tokens, n)`` — the cleaned corpus
  (contaminated docs dropped) plus the report, as one lazy composition.

Scale posture (the whole point of the operator): the benchmark side is
*tiny* relative to a crawl corpus — 10^4..10^6 grams vs 10^12 documents
— so the gram join is a **broadcast hash join by construction**; the
corpus token stream is never shuffled for the probe.  The only wide
exchange is the final per-doc aggregate, whose key space includes
doc_id (skew-free, map-side partial agg).  Gram construction is the
same lead-window pass the quality battery uses (per-doc window
partitioning — no global hot keys).

Both sides take ``(id, pos, term)`` token streams rather than raw text
so the caller picks the analyzer once (the engine's analyzers or the
SQL-expressible simple tokenizer) and contamination is defined over
exactly the tokens the model would train on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: gram separator — unit separator, cannot appear in whitespace-split terms
_SEP = chr(1)


def _grams(tokens: DataFrame, id_col: str, n: int) -> DataFrame:
    """(id, gram) stream of complete n-grams via one lead-window pass."""
    w = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, n)]
    return (
        tokens.select(
            id_col,
            F.concat_ws(_SEP, *cols).alias("gram"),
            cols[-1].isNotNull().alias("complete"),
        )
        .where("complete")
        .drop("complete")
    )


def contamination_report(
    tokens: DataFrame, bench_tokens: DataFrame, n: int = 8
) -> DataFrame:
    """(doc_id, n_hit_grams, n_bench_ids) for every contaminated doc.

    ``tokens`` is the corpus stream (doc_id, pos, term); ``bench_tokens``
    the benchmark stream (bench_id, pos, term).  A doc appears iff it
    shares >= 1 complete n-gram with >= 1 benchmark item;
    ``n_hit_grams`` counts its DISTINCT overlapping grams and
    ``n_bench_ids`` the distinct benchmark items matched.  Docs or
    bench items shorter than n tokens contribute no grams (an item
    that cannot form one n-gram cannot be leaked verbatim at that n).

    Physical plan: benchmark grams are deduped then **broadcast**; the
    corpus gram stream probes them map-side (no corpus shuffle), and
    the two distinct-counts aggregate by doc_id with map-side partials.
    """
    cg = _grams(tokens, "doc_id", n)
    bg = _grams(bench_tokens, "bench_id", n).distinct()
    hits = cg.join(F.broadcast(bg), "gram")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("gram").alias("n_hit_grams"),
        F.countDistinct("bench_id").alias("n_bench_ids"),
    )


def decontaminate(
    docs: DataFrame,
    tokens: DataFrame,
    bench_tokens: DataFrame,
    n: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """(clean_docs, report): drop every contaminated doc from ``docs``.

    The report is the ``contamination_report`` output — materialize it
    for the audit trail (what was removed and why) the same way the
    cleaning cascade exposes per-stage lineage.  The anti-join keys on
    doc_id only; Spark broadcasts the report side when it is within
    ``autoBroadcastJoinThreshold`` (the common case — contamination is
    a vanishing fraction of a crawl corpus), falling back to a shuffle
    join when an adversarial benchmark set contaminates everything.
    """
    report = contamination_report(tokens, bench_tokens, n=n)
    clean = docs.join(report.select("doc_id"), "doc_id", "left_anti")
    return clean, report
