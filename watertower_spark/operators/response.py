"""Elasticsearch-shaped search responses.

The reference serves `/indexes/{index}/_search` with an ES-compatible
payload (webapi/restapi/handlers.go:92-183): `took` in ms, `hits.hits`
items carrying `_id`/`_index`/`_type: "_doc"`/`_score`/`_source`
(the Document minus engine internals, convertToResultDocument,
handlers.go:81-90), `hits.max_score`, and `hits.total.value`.

The batch engine has no HTTP server (SURVEY §3.3 — pytest drives the
engine directly), but the RESPONSE SHAPE is part of the reference's
observable surface, so it ships as a driver-side builder: run any
engine search, collect, and wrap.  A service layer (Flask, Lambda,
whatever) can return the dict verbatim.
"""

from __future__ import annotations

import time


def _source_doc(row) -> dict:
    """convertToResultDocument (handlers.go:81-90): unique_key, title,
    content, lang, tags, metadata — title/content recovered from the
    stored text by the same first-blank-line split used at analysis."""
    from watertower_spark.analyzers import split_title_body

    title, body = split_title_body(row["text"] or "")
    src = {
        "unique_key": row["url"],
        "title": title,
        "content": body,
        "lang": row["lang"],
    }
    d = row.asDict()
    if d.get("metadata") is not None:
        src["metadata"] = dict(d["metadata"])
    if d.get("tags") is not None:
        src["tags"] = list(d["tags"])
    return src


def search_response(engine, search_word: str, tags: list | None = None,
                    lang: str = "", mode: str = "bm25", k: int | None = 10,
                    operator: str = "and", index_name: str = "default") -> dict:
    """Run a search and shape the ES-compatible response dict.

    `_id` mirrors the reference's docID encoding: `d` + lowercase hex
    (entity.go:26-33)."""
    t0 = time.time()
    rows = engine.search(search_word, tags, lang=lang, mode=mode, k=k,
                         operator=operator).collect()
    took_ms = int((time.time() - t0) * 1000)
    hits = [
        {
            "_id": f"d{int(r['doc_id']):x}",
            "_index": index_name,
            "_type": "_doc",
            "_score": float(r["score"]),
            "_source": _source_doc(r),
        }
        for r in rows
    ]
    max_score = max((h["_score"] for h in hits), default=0.0)
    return {
        "took": took_ms,
        "timed_out": False,
        "_shards": None,
        "hits": {
            "hits": hits,
            "max_score": max_score,
            "total": {"value": len(hits), "relation": ""},
        },
    }
