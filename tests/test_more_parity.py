"""Additional reference parity: JA substitute (q5), default-language path
(q9), and the larger httpstatus corpus E2E."""

import pytest

from watertower_spark.operators.index_build import build_index
from watertower_spark.operators.search import SearchEngine
from watertower_spark.sources import corpus


def _mk(spark, rows):
    docs = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=corpus.DOC_SCHEMA,
    )
    tags = spark.createDataFrame([(r["url"], r["tags"]) for r in rows], schema=corpus.TAG_SCHEMA)
    return docs, tags


def test_q5_japanese_substitute(spark, tmp_index_root):
    """search_test.go:143-171: index the JA blog doc, 'ドリル' finds it.
    Our 'ja' analyzer is a bigram substitute (kagome unavailable) —
    membership holds because phrase adjacency of bigrams ≡ substring."""
    d = corpus.JA_BLOG_DOC
    rows = [corpus._to_row(d["unique_key"], d["title"], d["content"], "ja", d["tags"], 0)]
    docs, tags = _mk(spark, rows)
    idx = f"{tmp_index_root}/ja"
    build_index(docs, tags, idx)
    eng = SearchEngine(spark, idx)
    assert eng.search("ドリル", None, "ja").count() == 1
    assert eng.search("存在しない言葉", None, "ja").count() == 0


def test_q9_default_language_path(spark, tmp_index_root):
    """database_test.go:189-242: empty doc lang + engine default language
    'en' — 'programming' (stemmed) matches the Go doc."""
    d = corpus.NGRAM_DOC
    rows = [corpus._to_row(d["unique_key"], d["title"], d["content"], "", d["tags"], 0)]
    docs, tags = _mk(spark, rows)
    idx = f"{tmp_index_root}/deflang"
    build_index(docs, tags, idx, default_lang="en")
    eng = SearchEngine(spark, idx)
    assert eng.search("programming", None, "").count() == 1
    assert eng.search("programs", None, "").count() == 1  # same stem
    assert eng.search("zebra", None, "").count() == 0


@pytest.fixture(scope="module")
def http_engine(spark, tmp_index_root):
    docs, tags = corpus.corpus_df(spark, corpora=("httpstatus",))
    idx = f"{tmp_index_root}/httpstatus"
    build_index(docs, tags, idx, default_lang="en", docs_per_shard=16)
    return SearchEngine(spark, idx)


def test_httpstatus_corpus_search(http_engine):
    # 'the server' is a frequent adjacent pair in the corpus (36 docs)
    res = http_engine.search("the server", None, "en").collect()
    assert len(res) > 0
    assert all("the server" in r["text"].lower() for r in res)
    # stems unify 'redirects'/'redirect'
    a = {r["doc_id"] for r in http_engine.search("redirect", None, "en").collect()}
    b = {r["doc_id"] for r in http_engine.search("redirects", None, "en").collect()}
    assert a == b and a


def test_bm25_or_semantics(http_engine):
    """OR membership ⊇ AND membership; scores of AND-docs identical."""
    q = "request header"
    or_rows = {r["doc_id"]: r["score"] for r in
               http_engine.search(q, None, "en", mode="bm25", operator="or", k=100).collect()}
    and_rows = {r["doc_id"]: r["score"] for r in
                http_engine.search(q, None, "en", mode="bm25").collect()}
    assert set(and_rows) <= set(or_rows)
    assert len(or_rows) > len(and_rows)  # docs with only one of the terms
    for d, s in and_rows.items():
        assert abs(or_rows[d] - s) < 1e-9


def test_bm25_or_missing_term_ignored(http_engine):
    # OR semantics: a nonexistent term contributes nothing, doesn't veto
    a = {r["doc_id"] for r in
         http_engine.search("request zzznoterm", None, "en", mode="bm25",
                            operator="or", k=200).collect()}
    b = {r["doc_id"] for r in
         http_engine.search("request", None, "en", mode="bm25",
                            operator="or", k=200).collect()}
    assert a == b and a


def test_httpstatus_bm25_vs_parity_membership(http_engine):
    """Membership (which docs match) is scoring-independent: both scorers
    return the same doc set for the same query (SURVEY.md §7/M3)."""
    q = "request header"
    parity = {r["doc_id"] for r in http_engine.search(q, None, "en").collect()}
    bm25 = {r["doc_id"] for r in http_engine.search(q, None, "en", mode="bm25").collect()}
    assert parity == bm25 and parity
