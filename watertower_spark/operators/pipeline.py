"""End-to-end corpus-cleaning pipeline for LLM training data.

Composes the individually-oracled cleaning operators in the order real
web-corpus pipelines run them (C4 / CCNet / MassiveText lineage):

1. boilerplate-line removal  (``dedup.remove_frequent_lines`` — C4 §2.2)
2. quality filtering         (``quality.gopher_quality_signals`` — Gopher A1.1)
3. PII scrub                 (``pii.redact_pii`` — ROOTS-style)
4. exact deduplication       (md5 groups, keep the smallest doc_id)
5. near-deduplication        (``dedup.minhash_lsh_pairs`` — MinHash+LSH)

Every stage is lazy — ``clean_corpus`` returns the cleaned DataFrame
plus a dict of the intermediate DataFrames, and nothing is computed
until the caller acts.  Scale posture is inherited from the stages:
the line pass is two bounded-key shuffles, the quality filter and PII
scrub are zero-shuffle narrow maps, exact dedup is one hash groupBy,
and MinHash is a capped band join — no stage is quadratic and nothing
collects to the driver, so the composition runs at crawl scale.

Near-dup removal keeps, for every LSH-verified pair, the smaller
doc_id: a doc is dropped iff it pairs with ANY smaller surviving-stage
doc.  For clusters this is the standard greedy convention (the
globally smallest member always survives; chain members may keep more
than one representative when similarity is not transitive) — the same
keeper rule the exact-dedup stage and ``dedup.duplicate_spans`` use.
``near_dup_transitive=True`` upgrades the stage to one-doc-per-
connected-component (``dedup.connected_components`` — the GPT-3/Gopher
clustering convention), at the cost of the CC iteration's extra
log²-many small shuffles over the pair graph — and of laziness: the
CC loop checkpoints per round, so that one stage computes when
``clean_corpus`` is called rather than when the result is acted on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from watertower_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
    remove_frequent_lines,
)
from watertower_spark.operators.pii import redact_pii
from watertower_spark.operators.quality import gopher_quality_signals


def _ws_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, term): lowercase whitespace tokens — the cheap
    relational tokenization the dedup stages key on (posexplode, one
    narrow map; the search analyzers are for the index, not here)."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower(text_col), r"\s+"), lambda x: x != F.lit(""))
        ).alias("pos", "term"),
    )


def clean_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_line_docs: int = 2,
    apply_gopher: bool = True,
    apply_pii: bool = True,
    near_dup_threshold: float = 0.8,
    near_dup_transitive: bool = False,
    minhash_hashes: int = 32,
    minhash_bands: int = 8,
) -> tuple[DataFrame, dict]:
    """Run the full cleaning cascade over ``docs`` (doc_id, text, ...).

    Returns ``(clean_docs, stages)``: ``clean_docs`` has the input
    columns with ``text_col`` replaced by the fully cleaned text, and
    ``stages`` maps stage name → the lazy DataFrame it produced
    (inspect/count them for a lineage report).  All non-text columns
    pass through untouched.
    """
    other_cols = [c for c in docs.columns if c not in (text_col, "doc_id")]
    stages: dict = {}

    # 1. cross-doc boilerplate lines (C4): every doc keeps a row.
    lined = remove_frequent_lines(docs.select("doc_id", F.col(text_col).alias("text")),
                                  min_docs=min_line_docs)
    cur = lined.select("doc_id", F.col("clean_text").alias("text"))
    stages["line_dedup"] = cur

    # 2. Gopher surface-statistics filter: keep flagged docs only.
    if apply_gopher:
        flags = gopher_quality_signals(cur, text_col="text")
        cur = cur.join(flags.where("gopher_flag").select("doc_id"), "doc_id")
        stages["gopher_filter"] = cur

    # 3. PII scrub (after filtering: no point scrubbing dropped docs).
    if apply_pii:
        cur = redact_pii(cur, text_col="text").select(
            "doc_id", F.col("clean_text").alias("text")
        )
        stages["pii_scrub"] = cur

    # 4. exact dedup on the cleaned text: keep the smallest doc_id per
    # md5 group (one map-side-combinable min aggregate, no windows).
    keepers = (
        cur.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    cur = cur.join(keepers, "doc_id")
    stages["exact_dedup"] = cur

    # 5. MinHash+LSH near-dup: drop docs pairing with a smaller doc_id.
    pairs = minhash_lsh_pairs(
        _ws_tokens(cur), n_hashes=minhash_hashes, bands=minhash_bands,
        threshold=near_dup_threshold,
    )
    if near_dup_transitive:
        comp = connected_components(pairs)
        victims = comp.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
    else:
        victims = pairs.select(F.greatest("da", "db").alias("doc_id")).distinct()
    cur = cur.join(victims, "doc_id", "left_anti")
    stages["near_dedup"] = cur

    if other_cols:
        cur = cur.join(docs.select("doc_id", *other_cols), "doc_id")
    return cur.select("doc_id", *other_cols, "text"), stages
