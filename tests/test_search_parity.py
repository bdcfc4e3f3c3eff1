"""End-to-end search parity: the reference's Go test cases re-expressed.

Each case cites its source in /root/reference (FIXTURES.md §3 query set).
Index is built once per corpus via the real distributed build pipeline.
"""

import math

import pytest

from watertower_spark.operators.index_build import build_index
from watertower_spark.operators.search import SearchEngine
from watertower_spark.sources import corpus


@pytest.fixture(scope="session")
def search_engine(spark, tmp_index_root):
    """searchData corpus (7 docs, search_test.go:76-141), lang=en."""
    docs, tags = corpus.corpus_df(spark, corpora=("searchdata",))
    idx = f"{tmp_index_root}/searchdata"
    build_index(docs, tags, idx, docs_per_shard=3)  # force multiple shards
    return SearchEngine(spark, idx)


@pytest.fixture(scope="session")
def phrase_engine(spark, tmp_index_root):
    """Single-doc phrase corpus (search_test.go:183-191)."""
    d = corpus.PHRASE_DOC
    rows = [corpus._to_row(d["unique_key"], d["title"], d["content"], "en", d["tags"], 0)]
    docs = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=corpus.DOC_SCHEMA,
    )
    tags = spark.createDataFrame([(r["url"], r["tags"]) for r in rows], schema=corpus.TAG_SCHEMA)
    idx = f"{tmp_index_root}/phrase"
    build_index(docs, tags, idx)
    return SearchEngine(spark, idx)


@pytest.fixture(scope="session")
def ngram_engine(spark, tmp_index_root):
    """n-gram fallback corpus (database_test.go:146-152), lang=''."""
    d = corpus.NGRAM_DOC
    rows = [corpus._to_row(d["unique_key"], d["title"], d["content"], "", d["tags"], 0)]
    docs = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=corpus.DOC_SCHEMA,
    )
    idx = f"{tmp_index_root}/ngram"
    build_index(docs, None, idx)
    return SearchEngine(spark, idx)


# --- TestSearchEN (search_test.go:38-61): q1-q4 ---------------------------

def test_q1_simple_word_search(search_engine):
    rows = search_engine.search("post", None, "en").collect()
    assert len(rows) > 0
    urls = {r["url"] for r in rows}
    # docs containing stem("post"): 200 OK and 201 Created
    assert urls == {"fixture://search/200 OK", "fixture://search/201 Created"}


def test_q2_simple_tag_search(search_engine):
    rows = search_engine.search("", ["NoBody"], "en").collect()
    assert {r["url"] for r in rows} == {
        "fixture://search/100 Continue",
        "fixture://search/101 Switching Protocol",
        "fixture://search/102 Processing",
        "fixture://search/103 Early Hints",
    }
    assert all(r["score"] == 0.0 for r in rows)


def test_q3_word_and_tag(search_engine):
    rows = search_engine.search("post", ["200"], "en").collect()
    assert {r["url"] for r in rows} == {"fixture://search/200 OK"}


def test_q4_word_tag_conflict(search_engine):
    assert search_engine.search("post", ["NoBody"], "en").count() == 0


def test_missing_term_empty(search_engine):
    assert search_engine.search("zzzmissing", None, "en").count() == 0


def test_missing_tag_empty(search_engine):
    assert search_engine.search("", ["NoSuchTag"], "en").count() == 0


def test_duplicate_query_word(search_engine):
    # database_test.go:311-465 dedupe: "post post" dedupes to one term but
    # becomes a phrase constraint (positions [0,1]) — doc needs adjacent
    # repetition, which no fixture has.
    assert search_engine.search("post post", None, "en").count() == 0


# --- TF-IDF scoring parity (search.go:170-189, Q6/Q7) ---------------------

def test_tfidf_scores_and_ascending_order(search_engine):
    rows = search_engine.search("request", None, "en").collect()
    assert len(rows) > 0
    # scores must match (1+ln tf)·ln(N/df) with N=7 docs
    # df = number of docs containing stem 'request'
    urls_tf = {}
    from watertower_spark.analyzers import analyze_document, split_title_body
    docs, _ = _fixture_local()
    for url, text in docs:
        tokens, _, _ = analyze_document(*split_title_body(text), "en")
        if "request" in tokens:
            urls_tf[url] = len(tokens["request"])
    df = len(urls_tf)
    for r in rows:
        want = (1.0 + math.log(urls_tf[r["url"]])) * math.log(7.0 / df)
        assert abs(r["score"] - want) < 1e-9, r["url"]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores)  # ASCENDING (search.go:108-111)


def _fixture_local():
    rows = corpus.fixture_rows(("searchdata",))
    return [(r["url"], r["text"]) for r in rows], rows


# --- Phrase search (search_test.go:202-211): q6/q7 -------------------------

def test_q6_phrase_match(phrase_engine):
    assert phrase_engine.search("POST request", None, "en").count() == 1


def test_q7_phrase_non_adjacent(phrase_engine):
    assert phrase_engine.search("after request", None, "en").count() == 0


# --- n-gram fallback (database_test.go:164-171): q8 ------------------------

def test_q8_ngram_search(ngram_engine):
    assert ngram_engine.search("Go", None, "").count() == 1
    assert ngram_engine.search("G", None, "").count() == 1
    assert ngram_engine.search("xq", None, "").count() == 0


# --- BM25 mode -------------------------------------------------------------

def test_bm25_topk(search_engine):
    rows = search_engine.search("request", None, "en", mode="bm25", k=2).collect()
    assert len(rows) == 2
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_frozen_golden_rank(search_engine):
    # Frozen BM25 golden (k1=1.2, b=0.75, Robertson idf), deterministic
    # tie-break by doc_id: '201 Created' (tf=2, short doc) outranks
    # '202 Accepted' (tf=3, long doc) — length normalization at work.
    rows = search_engine.search("request", None, "en", mode="bm25").collect()
    assert len(rows) == 6  # every searchData doc with stem 'request'
    assert rows[0]["url"] == "fixture://search/201 Created"
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
