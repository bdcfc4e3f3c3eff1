"""Randomized maintenance-churn differential test.

test_maintenance.py pins each mutation once; this applies a SEQUENCE of
random append/upsert/remove batches and, after every step, compares
random searches against a fresh independent PyOracle built from the
current logical corpus — catching interaction bugs (stale doc lengths,
avgdl drift, doc_len/posting divergence, shard-hole handling) that
single-op tests can't see."""

import random

import pytest

from watertower_spark.operators.index_build import build_index, load_manifest
from watertower_spark.operators.maintenance import (
    append_documents,
    remove_documents,
    upsert_documents,
)
from watertower_spark.operators.search import SearchEngine
from watertower_spark.sources import corpus
from tests.test_random_parity import PyOracle

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
SEED = 4242


def _row(rng, i):
    title = " ".join(rng.choices(WORDS, k=rng.randint(1, 3)))
    body = " ".join(rng.choices(WORDS, k=rng.randint(5, 40)))
    return corpus._to_row(f"mrnd/{i:04d}", title, body, "en",
                          [f"g{rng.randint(0, 2)}"], i)


def _mk(spark, rows):
    docs = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=corpus.DOC_SCHEMA,
    )
    tags = spark.createDataFrame(
        [(r["url"], r["tags"]) for r in rows], schema=corpus.TAG_SCHEMA
    )
    return docs, tags


def _check(eng, live_rows, rng, step):
    oracle = PyOracle(list(live_rows.values()))
    for _ in range(3):
        q = " ".join(rng.choices(WORDS, k=rng.randint(1, 2)))
        mode = "parity" if rng.random() < 0.5 else "bm25"
        want = oracle.search(q, None, mode)
        got = [(r["url"], r["score"])
               for r in eng.search(q, None, "en", mode=mode).collect()]
        assert len(got) == len(want), (
            f"step {step}: q={q!r} mode={mode}: {len(got)} vs {len(want)}"
        )
        for (gu, gs), (wu, ws) in zip(got, want):
            assert gu == wu, f"step {step}: q={q!r} order {gu} vs {wu}"
            assert abs(gs - ws) < 1e-9, f"step {step}: q={q!r} score {gs} vs {ws}"


def test_random_maintenance_churn(spark, tmp_index_root):
    rng = random.Random(SEED)
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        rows = [_row(rng, next_id + j) for j in range(n)]
        next_id += n
        return rows

    live = {r["url"]: r for r in fresh_rows(40)}
    idx = f"{tmp_index_root}/maint_churn"
    docs, tags = _mk(spark, list(live.values()))
    build_index(docs, tags, idx, default_lang="en", docs_per_shard=16)
    _check(SearchEngine(spark, idx), live, rng, "build")

    for step in range(5):
        op = rng.choice(["append", "upsert", "remove"])
        if op == "append":
            rows = fresh_rows(rng.randint(3, 10))
            for r in rows:
                live[r["url"]] = r
            docs, tags = _mk(spark, rows)
            append_documents(spark, idx, docs, tags)
        elif op == "upsert":
            victims = rng.sample(sorted(live), k=min(4, len(live)))
            rows = []
            for u in victims:
                body = " ".join(rng.choices(WORDS, k=rng.randint(5, 40)))
                changed = {**live[u],
                           "text": live[u]["text"].split("\n\n")[0] + "\n\n" + body}
                live[u] = changed
                rows.append(changed)
            docs, tags = _mk(spark, rows)
            upsert_documents(spark, idx, docs, tags)
        else:
            victims = rng.sample(sorted(live), k=min(3, len(live) - 5))
            for u in victims:
                del live[u]
            urls = spark.createDataFrame([(u,) for u in victims], "url string")
            remove_documents(spark, idx, urls)

        m = load_manifest(idx)
        assert m["doc_count"] == len(live), f"step {step} ({op}): doc_count drift"
        _check(SearchEngine(spark, idx), live, rng, f"{step}:{op}")
