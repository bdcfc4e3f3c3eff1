"""Driver correctness-gate queries: Spark implementation + DuckDB oracle.

Each entry in QUERIES is ``name -> (spark_fn, oracle_sql_or_None)``.
The driver runs the Spark DataFrame and the oracle SQL side by side at
sf=0.01 and compares row count + schema + order-insensitive value hash,
so:

- column NAMES and TYPES must match exactly between the two sides;
- every float is rounded identically on both sides;
- the tokenizer used here is the SQL-expressible 'simple' analyzer
  (whitespace split → drop empties → position → rstrip '.,:"' → lower).
  The full English analyzer (Porter2 etc.) is pinned by pytest goldens
  instead — stemming is not expressible in SQL.

Relational queries stay entirely JVM-side (whole-stage codegen, zero
Python).  The engine_* queries drive the real index-build + search
kernels and are cross-checked against equivalent SQL.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

BM25_K1 = 1.2
BM25_B = 0.75

# --------------------------------------------------------------- tokenizer

_TRIM_RE = '[.,:"]+$'


def tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, term) — the simple analyzer, relationally."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    return docs.select(
        "doc_id", F.posexplode(ws).alias("pos", "raw")
    ).select(
        "doc_id",
        "pos",
        F.lower(F.regexp_replace("raw", _TRIM_RE, "")).alias("term"),
    )


# DuckDB CTE computing the identical (doc_id, pos, term) stream.
TOK_CTE = r"""
WITH __ws AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
  FROM documents
), tok AS (
  SELECT doc_id,
         p - 1 AS pos,
         lower(regexp_replace(w, '[.,:"]+$', '')) AS term
  FROM (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS p FROM __ws)
)
"""


# ------------------------------------------------------------- relational

def q_doc_id_map(spark, sf_dir):
    """Distributed dense doc-id assignment vs SQL row_number (I2)."""
    from watertower_spark.operators.index_build import assign_doc_ids
    from watertower_spark.sources.corpus import adapt_driver_documents

    docs, _ = adapt_driver_documents(spark, sf_dir)
    return assign_doc_ids(docs, num_ranges=16).select(
        "url", F.col("doc_id").alias("assigned_id")
    )


ORACLE_DOC_ID_MAP = """
SELECT printf('doc://%012d', doc_id) AS url,
       row_number() OVER (ORDER BY printf('doc://%012d', doc_id)) AS assigned_id
FROM documents
"""


def q_term_stats(spark, sf_dir):
    """Posting-list stats: df (docs containing term) + cf (occurrences)."""
    t = tokens(spark, sf_dir)
    return t.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf")
    )


ORACLE_TERM_STATS = TOK_CTE + """
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf FROM tok GROUP BY term
"""


def q_doc_stats(spark, sf_dir):
    t = tokens(spark, sf_dir)
    return t.groupBy("doc_id").agg(
        F.count("*").alias("wc"), F.countDistinct("term").alias("udc")
    )


ORACLE_DOC_STATS = TOK_CTE + """
SELECT doc_id, count(*) AS wc, count(DISTINCT term) AS udc FROM tok GROUP BY doc_id
"""


_AND_TERMS = ("data", "table", "join")


def q_and_search(spark, sf_dir):
    """Conjunctive term intersection (Q4) relationally."""
    t = tokens(spark, sf_dir)
    return (
        t.where(F.col("term").isin(*_AND_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .where(F.col("nt") == len(_AND_TERMS))
        .select("doc_id")
    )


ORACLE_AND_SEARCH = TOK_CTE + f"""
SELECT doc_id FROM tok WHERE term IN {_AND_TERMS!r}
GROUP BY doc_id HAVING count(DISTINCT term) = {len(_AND_TERMS)}
"""


def q_phrase_search(spark, sf_dir):
    """Adjacent phrase 'hash join' via positions (Q5) relationally."""
    t = tokens(spark, sf_dir)
    a = t.where(F.col("term") == "hash").alias("a")
    b = t.where(F.col("term") == "join").alias("b")
    return (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("b.pos") == F.col("a.pos") + 1))
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
    )


ORACLE_PHRASE_SEARCH = TOK_CTE + """
SELECT DISTINCT a.doc_id AS doc_id
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'hash' AND b.term = 'join'
"""


_SCORE_TERMS = ("data", "table")


def _tf_df(spark, sf_dir, terms):
    t = tokens(spark, sf_dir)
    tf = (
        t.where(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    return tf, df, n


def q_tfidf_search(spark, sf_dir):
    """AND query scored with the reference formula (1+ln tf)·ln(N/df) (Q6)."""
    tf, df, n = _tf_df(spark, sf_dir, _SCORE_TERMS)
    scored = (
        tf.join(F.broadcast(df), "term")
        .withColumn("s", (F.lit(1.0) + F.log("tf")) * F.log(F.lit(float(n)) / F.col("df")))
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("score"), F.countDistinct("term").alias("nt"))
        .where(F.col("nt") == len(_SCORE_TERMS))
        .select("doc_id", "score")
    )
    return scored


ORACLE_TFIDF_SEARCH = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN {_SCORE_TERMS!r} GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, round(sum((1.0 + ln(tf)) * ln(n.n / df.df)), 6) AS score
FROM tf JOIN df USING (term), n
GROUP BY doc_id HAVING count(DISTINCT term) = {len(_SCORE_TERMS)}
"""


_BM25_TERMS = ("filter", "scan")


def _bm25_scored(spark, sf_dir):
    """(doc_id, score): rounded BM25 AND-scores for _BM25_TERMS (no
    ordering/limit — shared by the top-k and hybrid-fusion gates)."""
    tf, df, n = _tf_df(spark, sf_dir, _BM25_TERMS)
    t = tokens(spark, sf_dir)
    wc = t.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = wc.agg(F.avg("dl")).collect()[0][0]
    return (
        tf.join(F.broadcast(df), "term")
        .join(wc, "doc_id")
        .withColumn(
            "idf", F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "s",
            F.col("idf") * (BM25_K1 + 1.0) * F.col("tf")
            / (F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / float(avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("score"), F.countDistinct("term").alias("nt"))
        .where(F.col("nt") == len(_BM25_TERMS))
        .select("doc_id", "score")
    )


def q_bm25_topk(spark, sf_dir):
    """AND query, BM25(k1=1.2,b=0.75), top-10 by rounded score (Q6/Q8)."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


ORACLE_BM25_TOPK = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN {_BM25_TERMS!r} GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), wc AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
), stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents)
SELECT doc_id,
       round(sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * ({BM25_K1} + 1.0) * tf
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl))), 6) AS score
FROM tf JOIN df USING (term) JOIN wc USING (doc_id), stats
GROUP BY doc_id HAVING count(DISTINCT term) = {len(_BM25_TERMS)}
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_tag_index(spark, sf_dir):
    """Tag posting sets (I8/Q12): source acts as the tag."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy(F.col("source").alias("tag")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


ORACLE_TAG_INDEX = """
SELECT source AS tag, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM documents GROUP BY source
"""


def q_exact_dedup(spark, sf_dir):
    """Exact content dedup via md5 groups."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.groupBy(F.md5(F.encode("text", "utf-8")).alias("text_hash")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper")
    )


ORACLE_EXACT_DEDUP = """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keeper
FROM documents GROUP BY md5(text)
"""


_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def q_token_count(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))).cast("long").alias("n_ws"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), F.lit(0))).cast("long").alias("n_bpe"),
    )


ORACLE_TOKEN_COUNT = f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_ws,
       len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS n_bpe
FROM documents
"""


def q_text_quality(spark, sf_dir):
    """Quality-scoring features: type-token ratio, mean token length,
    numeric-token ratio (training-data pipeline text analysis)."""
    t = tokens(spark, sf_dir)
    return t.groupBy("doc_id").agg(
        F.round(F.countDistinct("term") / F.count("*"), 4).alias("ttr"),
        F.round(F.avg(F.length("term")), 4).alias("mean_len"),
        F.round(F.avg(F.col("term").rlike("^[0-9]+$").cast("double")), 4).alias("num_ratio"),
    )


ORACLE_TEXT_QUALITY = TOK_CTE + """
SELECT doc_id,
       round(count(DISTINCT term) / count(*), 4) AS ttr,
       round(avg(length(term)), 4) AS mean_len,
       round(avg(CASE WHEN regexp_matches(term, '^[0-9]+$') THEN 1.0 ELSE 0.0 END), 4) AS num_ratio
FROM tok GROUP BY doc_id
"""


def q_lang_id(spark, sf_dir):
    """Heuristic language ID (n-gram/stopword based), deterministic rule."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lowered = F.lower("text")
    en_hits = F.size(F.regexp_extract_all(lowered, F.lit("\\b(the|and|of|in|to)\\b"), F.lit(0)))
    cjk = F.lower("text").rlike("[\\u4e00-\\u9fff]")
    return docs.select(
        "doc_id",
        F.when(cjk, "zh").when(en_hits > 0, "en").otherwise("und").alias("guessed_lang"),
    )


ORACLE_LANG_ID = r"""
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
            WHEN len(regexp_extract_all(lower(text), '\b(the|and|of|in|to)\b')) > 0 THEN 'en'
            ELSE 'und' END AS guessed_lang
FROM documents
"""


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality signal: self-trained MLE bigram model,
    per-doc perplexity (operators/quality.py).  The oracle recomputes
    the same statistic with SQL window functions + aggregates."""
    from watertower_spark.operators.quality import bigram_lm_perplexity

    return bigram_lm_perplexity(tokens(spark, sf_dir), round_to=4)


ORACLE_LM_PPL = TOK_CTE + """
, big AS (
  SELECT doc_id, term, lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM tok
), b2 AS (
  SELECT doc_id, term, nxt FROM big WHERE nxt IS NOT NULL
), p AS (
  SELECT term, nxt, CAST(count(*) AS DOUBLE)
         / sum(count(*)) OVER (PARTITION BY term) AS p
  FROM b2 GROUP BY term, nxt
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(exp(-avg(ln(p.p))), 4) AS ppl
FROM b2 JOIN p USING (term, nxt)
GROUP BY doc_id
"""


def q_ngram_repetition(spark, sf_dir):
    """Gopher's token-level repetition battery: per doc, the character
    fraction of the most frequent {2,3,4}-gram (operators/quality.py).
    The oracle recomputes it with SQL window functions; ties on count
    resolve to the larger char footprint in both engines, and the
    output depends only on (count, chars) so the tie rule is
    value-deterministic."""
    from watertower_spark.operators.quality import ngram_repetition_signals

    return ngram_repetition_signals(tokens(spark, sf_dir))


ORACLE_NGRAM_REPETITION = TOK_CTE + """
, dc AS (SELECT doc_id, sum(length(term)) AS doc_chars FROM tok GROUP BY doc_id)
, g2 AS (
  SELECT doc_id,
         term || chr(1) || lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS gram
  FROM tok
), c2 AS (
  SELECT doc_id, count(*) AS cnt, count(*) * (length(gram) - 1) AS occ
  FROM g2 WHERE gram IS NOT NULL GROUP BY doc_id, gram
), t2 AS (
  SELECT doc_id, occ FROM c2
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, occ DESC) = 1
), g3 AS (
  SELECT doc_id,
         term || chr(1) || lead(term, 1) OVER w || chr(1) || lead(term, 2) OVER w AS gram
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), c3 AS (
  SELECT doc_id, count(*) AS cnt, count(*) * (length(gram) - 2) AS occ
  FROM g3 WHERE gram IS NOT NULL GROUP BY doc_id, gram
), t3 AS (
  SELECT doc_id, occ FROM c3
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, occ DESC) = 1
), g4 AS (
  SELECT doc_id,
         term || chr(1) || lead(term, 1) OVER w || chr(1) || lead(term, 2) OVER w
              || chr(1) || lead(term, 3) OVER w AS gram
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), c4 AS (
  SELECT doc_id, count(*) AS cnt, count(*) * (length(gram) - 3) AS occ
  FROM g4 WHERE gram IS NOT NULL GROUP BY doc_id, gram
), t4 AS (
  SELECT doc_id, occ FROM c4
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, occ DESC) = 1
)
SELECT dc.doc_id,
       round(t2.occ / dc.doc_chars, 4) AS top_2gram_char_frac,
       round(t3.occ / dc.doc_chars, 4) AS top_3gram_char_frac,
       round(t4.occ / dc.doc_chars, 4) AS top_4gram_char_frac
FROM dc
LEFT JOIN t2 USING (doc_id)
LEFT JOIN t3 USING (doc_id)
LEFT JOIN t4 USING (doc_id)
"""


def q_dup_ngram_coverage(spark, sf_dir):
    """Gopher's duplicated-n-gram character coverage (the in-[0,1]
    half of the repetition battery), over a deterministically doctored
    corpus: the synthetic text has NO organic within-doc duplicate
    5-grams (verified — a 0==0 gate proves nothing), so docs with
    doc_id % 4 == 0 get their first 40 words re-appended, giving those
    docs real, per-doc-varying coverage while the rest pin the zero
    path.  Both engines derive the same doctored input."""
    from watertower_spark.operators.quality import dup_ngram_coverage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    doctored = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(F.col("text"), F.lit(" "), F.concat_ws(" ", F.slice(ws, 1, 40))),
    ).otherwise(F.col("text"))
    t = docs.select("doc_id", doctored.alias("text"))
    ws2 = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    toks = t.select(
        "doc_id", F.posexplode(ws2).alias("pos", "raw")
    ).select(
        "doc_id", "pos",
        F.lower(F.regexp_replace("raw", _TRIM_RE, "")).alias("term"),
    )
    return dup_ngram_coverage(toks, ns=(5, 10))


def _dup_cov_sql(n: int) -> str:
    gram = " || chr(1) || ".join(
        ["term"] + [f"lead(term, {i}) OVER w" for i in range(1, n)]
    )
    return f"""
, g{n} AS (
  SELECT doc_id, pos, {gram} AS gram
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), d{n} AS (
  SELECT doc_id, gram FROM g{n} WHERE gram IS NOT NULL
  GROUP BY doc_id, gram HAVING count(*) >= 2
), cov{n} AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT g.doc_id, unnest(generate_series(g.pos, g.pos + {n - 1})) AS pos
    FROM g{n} g JOIN d{n} USING (doc_id, gram)
  )
), cc{n} AS (
  SELECT c.doc_id, sum(length(t.term)) AS cov
  FROM cov{n} c JOIN tok t USING (doc_id, pos) GROUP BY c.doc_id
)"""


ORACLE_DUP_NGRAM = r"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN text || ' ' || array_to_string(list_slice(
                     list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''),
                     1, 40), ' ')
              ELSE text END AS text
  FROM documents
), __ws AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
  FROM base
), tok AS (
  SELECT doc_id,
         p - 1 AS pos,
         lower(regexp_replace(w, '[.,:"]+$', '')) AS term
  FROM (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS p FROM __ws)
), dc AS (SELECT doc_id, sum(length(term)) AS doc_chars FROM tok GROUP BY doc_id)
""" + _dup_cov_sql(5) + _dup_cov_sql(10) + """
SELECT dc.doc_id,
       round(coalesce(cc5.cov, 0) / dc.doc_chars, 4) AS dup_5gram_char_frac,
       round(coalesce(cc10.cov, 0) / dc.doc_chars, 4) AS dup_10gram_char_frac
FROM dc
LEFT JOIN cc5 USING (doc_id)
LEFT JOIN cc10 USING (doc_id)
"""


def q_gopher_quality(spark, sf_dir):
    """Gopher-rules surface-statistics battery (Rae et al. 2021 A1.1):
    word/line counts, mean word length, alpha-word fraction, symbol
    ratio, within-doc duplicate-line fraction, bullet/ellipsis line
    fractions, and the combined keep flag — computed as a zero-shuffle
    narrow map (operators/quality.py)."""
    from watertower_spark.operators.quality import gopher_quality_signals

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_quality_signals(docs)


ORACLE_GOPHER_QUALITY = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS words,
         list_filter(regexp_split_to_array(text, '\n'), x -> trim(x) <> '') AS lines,
         text
  FROM documents
)
SELECT doc_id,
  CAST(len(words) AS BIGINT) AS n_words,
  round(list_sum(list_transform(words, x -> length(x))) / len(words), 4) AS mean_word_len,
  round(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) / len(words), 4) AS frac_alpha_words,
  round((len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.'))) / len(words), 4) AS symbol_word_ratio,
  CAST(len(lines) AS BIGINT) AS n_lines,
  round((len(lines) - len(list_distinct(lines))) / len(lines), 4) AS dup_line_frac,
  round(len(list_filter(lines, x -> regexp_matches(trim(x), '^([-*•●▪]|[0-9]+[.)]) '))) / len(lines), 4) AS frac_bullet_lines,
  round(len(list_filter(lines, x -> regexp_matches(trim(x), '(\.\.\.|…)$'))) / len(lines), 4) AS frac_ellipsis_lines,
  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
   AND frac_alpha_words >= 0.8 AND symbol_word_ratio <= 0.1
   AND dup_line_frac <= 0.3 AND frac_bullet_lines <= 0.9
   AND frac_ellipsis_lines <= 0.3) AS gopher_flag
FROM w
WHERE len(words) > 0 AND len(lines) > 0
"""


def q_pii_redact(spark, sf_dir):
    """PII scrub (operators/pii.py) over a corpus with DERIVED ground
    truth: the synthetic text is digit- and '@'-free (verified at
    generation), so a per-doc PII suffix built from doc_id alone is
    the ONLY redactable content — the oracle constructs the expected
    clean_text and counts from first principles (string concatenation,
    never re-running the regexes), making a pass certify the actual
    match boundaries, not just regex-dialect agreement."""
    from watertower_spark.operators.pii import redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id").cast("string")
    pii_txt = F.concat(
        F.col("text"),
        F.lit(" Contact u"), did, F.lit("@example.com"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" cc admin"), did, F.lit("@mail.org"))
               ).otherwise(F.lit("")),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel +1 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" now."),
    )
    out = redact_pii(docs.select("doc_id", pii_txt.alias("text")))
    return out.select("doc_id", "n_emails", "n_ipv4", "n_phones", "clean_text")


ORACLE_PII_REDACT = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_emails,
       CAST(1 AS BIGINT) AS n_ipv4,
       CAST(1 AS BIGINT) AS n_phones,
       text || ' Contact <EMAIL>'
            || CASE WHEN doc_id % 3 = 0 THEN ' cc <EMAIL>' ELSE '' END
            || ' from <IP> tel <PHONE> now.' AS clean_text
FROM documents
"""


# ASCII → full-width forms (U+FF01-FF5E) + ideographic space (U+3000):
# the deterministic "widening" NFKC must exactly invert.
_NFKC_SRC = "abcdefghijklmnopqrstuvwxyz0123456789 "
_NFKC_DST = (
    "".join(chr(0xFF41 + i) for i in range(26))
    + "".join(chr(0xFF10 + i) for i in range(10))
    + "　"
)


def q_nfkc_fold(spark, sf_dir):
    """NFKC fold (operators/analyze.nfkc_fold) with DERIVED ground
    truth: the synthetic text is plain ASCII (NFKC-stable), so widening
    it to full-width forms + ideographic spaces via translate() and
    appending a ligature/numero suffix makes the expected fold exactly
    `text || ' file No9'` — constructed by the oracle from first
    principles, never by re-running a normalizer.  A pass certifies the
    fold maps full-width→ASCII, U+3000→space, ﬁ→fi, №→No and leaves
    ASCII untouched."""
    from watertower_spark.operators.analyze import nfkc_fold

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    widened = F.concat(
        F.translate(F.col("text"), _NFKC_SRC, _NFKC_DST),
        F.lit(" ﬁle №9"),  # ' ﬁle №9'
    )
    return docs.select("doc_id", nfkc_fold(widened).alias("folded"))


ORACLE_NFKC_FOLD = """
SELECT doc_id, text || ' file No9' AS folded FROM documents
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic hash-gated language-mixing sample
    (operators/training.stratified_sample): per-lang keep fractions,
    membership a pure function of (doc_id, salt) so the oracle can
    re-derive the gate with its own md5 — the pass certifies the
    threshold arithmetic AND the hash-prefix compare, not RNG luck."""
    from watertower_spark.operators.training import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(
        docs,
        {"en": 1.0, "zh": 0.5, "de": 0.0},
        strata_col="lang",
        key_col="doc_id",
        salt="r5",
        default_fraction=0.25,
    )
    return out.select("doc_id", "lang", "source")


# thresholds are the operator's own arithmetic, embedded as literals so
# DuckDB replays the identical lexicographic hex compare
from watertower_spark.operators.training import sample_threshold_hex as _thr  # noqa: E402

ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source FROM documents
WHERE CASE
  WHEN lang = 'en' THEN TRUE
  WHEN lang = 'zh' THEN substr(md5(CAST(doc_id AS VARCHAR) || ':r5'), 1, 8) < '{_thr(0.5)}'
  WHEN lang = 'de' THEN FALSE
  ELSE substr(md5(CAST(doc_id AS VARCHAR) || ':r5'), 1, 8) < '{_thr(0.25)}'
END
"""


def q_seq_pack(spark, sf_dir):
    """GPT-style concat-and-chunk packing layout
    (operators/training.pack_sequences): whitespace token counts,
    seq_len=64, doc_id order.  The Spark plan is the two-phase
    distributed prefix sum (range shuffle + per-partition windows +
    broadcast base offsets); the oracle is the naive single-node
    ``SUM() OVER (ORDER BY doc_id)`` — a hash match certifies the
    distributed decomposition reproduces the global cumsum exactly."""
    from watertower_spark.operators.training import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sized = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
        ).cast("long").alias("n_tokens"),
    )
    return pack_sequences(sized, seq_len=64, n_tokens_col="n_tokens",
                          order_col="doc_id", num_partitions=8)


ORACLE_SEQ_PACK = r"""
WITH sized AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM sized
)
SELECT doc_id, n_tokens, start_tok,
       CAST(start_tok // 64 AS BIGINT) AS first_seq,
       CAST((start_tok + greatest(n_tokens - 1, 0)) // 64 AS BIGINT) AS last_seq,
       CAST(start_tok % 64 AS BIGINT) AS seq_offset
FROM cum
"""


def q_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram-shingle Jaccard near-dup pairs among doc_id < 300.
    (Window/threshold chosen so the oracle compares NON-empty result
    sets at sf0.001 and sf0.01 — a 0==0 pass proves nothing.)"""
    from pyspark.sql import Window

    t = tokens(spark, sf_dir).where(F.col("doc_id") < 300)
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = (
        t.withColumn("t2", F.lead("term", 1).over(w))
        .withColumn("t3", F.lead("term", 2).over(w))
        .where(F.col("t3").isNotNull())
        .select("doc_id", F.concat_ws(" ", "term", "t2", "t3").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("sz", "sza"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("sz", "szb"), "db")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 4))
        .where(F.col("jaccard") >= 0.5)
        .select("da", "db", "jaccard")
    )


ORACLE_NGRAM_JACCARD = TOK_CTE + """
, sh AS (
  SELECT DISTINCT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
  FROM tok WHERE doc_id < 300
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), sh2 AS (SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT da, db, round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
FROM pairs JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
"""


def q_doc_fingerprint(spark, sf_dir):
    """MOSS-style winnowing document fingerprints (rolling 4-gram hash,
    window-min selection) over doc_id < 200 — bit-exact vs the SQL
    oracle thanks to the portable md5-prefix shingle hash."""
    from watertower_spark.operators.dedup import winnow_fingerprints

    t = tokens(spark, sf_dir).where(F.col("doc_id") < 200)
    return winnow_fingerprints(t, k=4, w=4)


ORACLE_DOC_FINGERPRINT = TOK_CTE + """
, g AS (
  SELECT doc_id, pos,
         term || ' ' || lead(term, 1) OVER pw || ' ' || lead(term, 2) OVER pw
              || ' ' || lead(term, 3) OVER pw AS g
  FROM tok WHERE doc_id < 200
  WINDOW pw AS (PARTITION BY doc_id ORDER BY pos)
), gh AS (
  SELECT doc_id, pos,
         CAST(CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT) AS BIGINT) AS h
  FROM g WHERE g IS NOT NULL
), wmins AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         lead(h, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS h_tail
  FROM gh
)
SELECT DISTINCT doc_id, fp FROM wmins WHERE h_tail IS NOT NULL
"""


def q_duplicate_spans(spark, sf_dir):
    """Exact duplicated-substring spans (Lee et al. 2022 "ExactSubstr"
    relationally): maximal token ranges whose every 5-token window
    occurs earlier in the corpus — the keeper (globally first)
    occurrence survives, every other occurrence is reported as a
    removable span.  Bit-exact vs the SQL oracle via the portable
    md5-prefix window hash."""
    from watertower_spark.operators.dedup import duplicate_spans

    t = tokens(spark, sf_dir).where(F.col("doc_id") < 300)
    return duplicate_spans(t, L=5)


# Shared CTE chain computing the removable spans (used by the span
# report AND the cleaned-corpus query — one definition, no drift).
_SPAN_CTES = """
, win AS (
  SELECT doc_id, pos,
         concat_ws(' ', term, lead(term, 1) OVER w, lead(term, 2) OVER w,
                        lead(term, 3) OVER w, lead(term, 4) OVER w) AS wstr,
         lead(term, 4) OVER w AS lastt
  FROM tok WHERE doc_id < 300
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), wh AS (
  SELECT doc_id, pos, substr(md5(wstr), 1, 16) AS h
  FROM win WHERE lastt IS NOT NULL
), rk AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY h) AS cnt
  FROM wh
), rem AS (SELECT doc_id, pos FROM rk WHERE cnt >= 2 AND rn >= 2),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
              THEN 0 ELSE 1 END AS b
  FROM rem
), isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM brk
), spans AS (
  SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + 4 AS BIGINT) AS span_end,
         count(*) AS n_windows
  FROM isl GROUP BY doc_id, g
)
"""

ORACLE_DUPLICATE_SPANS = TOK_CTE + _SPAN_CTES + """
SELECT doc_id, span_start, span_end, n_windows FROM spans
"""


def q_dedup_clean(spark, sf_dir):
    """End-to-end ExactSubstr application: drop every token covered by
    a removable span and reconstruct each doc's cleaned text — the
    actual training-corpus output of the dedup pass.  Docs without
    duplicated substrings pass through whole; fully-duplicated docs
    surface as kept_tokens=0 rows (the oracle's left join mirrors the
    operator's doc-set restore)."""
    from watertower_spark.operators.dedup import duplicate_spans, strip_duplicate_spans

    t = tokens(spark, sf_dir).where(F.col("doc_id") < 300)
    return strip_duplicate_spans(t, duplicate_spans(t, L=5))


ORACLE_DEDUP_CLEAN = TOK_CTE + _SPAN_CTES + """
, kept AS (
  SELECT t.doc_id, t.pos, t.term
  FROM tok t
  WHERE t.doc_id < 300 AND NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = t.doc_id AND t.pos BETWEEN s.span_start AND s.span_end)
), rebuilt AS (
  SELECT doc_id, count(*) AS kept_tokens,
         string_agg(term, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.kept_tokens, 0) AS kept_tokens,
       coalesce(r.clean_text, '') AS clean_text
FROM (SELECT DISTINCT doc_id FROM tok WHERE doc_id < 300) d
LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
"""


def q_url_canon(spark, sf_dir):
    """CC-pipeline URL canonicalization: a deterministic messy URL is
    synthesized per doc_id (mixed case, default ports, tracking params,
    unsorted query, fragment) and normalized by
    ``weburl.canonicalize_urls``.  The oracle derives the EXPECTED
    canonical form from first principles (not by re-running the same
    parsing), so it independently checks every rule: scheme/host
    lowercase, :80/:443 strip, utm_*/fbclid removal, param sort,
    fragment drop, empty-path → '/'."""
    from watertower_spark.operators.weburl import canonicalize_urls

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.col("doc_id") < 500)
    messy = docs.select(
        "doc_id",
        F.expr(
            "concat('HTTP', CASE WHEN doc_id % 2 = 0 THEN 'S' ELSE '' END,"
            " '://WWW.Example', CAST(doc_id % 7 AS STRING), '.COM',"
            " CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END,"
            " CASE WHEN doc_id % 3 = 0 THEN '' ELSE concat('/Path/', CAST(doc_id AS STRING)) END,"
            " '?utm_source=feed&b=2&a=1',"
            " CASE WHEN doc_id % 5 = 0 THEN '&fbclid=XYZ' ELSE '' END,"
            " '#Frag')"
        ).alias("url"),
    )
    return canonicalize_urls(messy).select("doc_id", "canon_url", "host")


ORACLE_URL_CANON = """
SELECT doc_id,
       (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
       || '://www.example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
       || (CASE WHEN doc_id % 3 = 0 THEN '/'
                ELSE '/Path/' || CAST(doc_id AS VARCHAR) END)
       || '?a=1&b=2' AS canon_url,
       'www.example' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS host
FROM documents WHERE doc_id < 500
"""


def _doc_html(docs):
    """Deterministic raw-HTML page per doc: comment, script (containing
    a fake close tag and a bare '<'), style, entities, uppercase block
    tags, and two links — every extraction rule is exercised."""
    did = F.col("doc_id").cast("string")
    return docs.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit('<!DOCTYPE html><html><head><title>Doc '), did,
                F.lit(' &amp; Friends</title><style>p { color: red; }</style>'
                      '<script type="text/javascript">if (1 < 2) { alert("</div>"); }</script>'
                      '</head><body><!-- hidden --><h1>Doc '), did,
                F.lit('</h1><p>'), F.col("text"),
                F.lit('</p><P>Tail &lt;b&gt; &quot;quoted&quot;&nbsp;end</P>'
                      '<a href="https://example.com/'), did,
                F.lit('?x=1">link</a> <a href=\'http://foo.org/a\'>two</a></body></html>'),
            ),
            "UTF-8",
        ).alias("html"),
    )


def q_html_extract(spark, sf_dir):
    """HTML -> text extraction (the input_hint's html->text step):
    deterministic raw HTML is synthesized per doc around the corpus
    text, then ``webhtml`` extracts title/body/links from the BINARY
    payload.  The oracle DERIVES the expected outputs from first
    principles (it never parses the HTML), so comment/script/style
    removal, block-break newlines, tag stripping, entity decoding,
    whitespace normalization, and href extraction are each
    independently checked."""
    from watertower_spark.operators.webhtml import (
        html_links_expr, html_text_expr, html_title_expr,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.col("doc_id") < 500)
    pages = _doc_html(docs)
    links = html_links_expr(F.col("html"))
    return pages.select(
        "doc_id",
        html_title_expr(F.col("html")).alias("title"),
        html_text_expr(F.col("html")).alias("body"),
        F.size(links).cast("long").alias("n_links"),
        F.element_at(links, 1).alias("first_link"),
    )


ORACLE_HTML_EXTRACT = """
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' & Friends' AS title,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' & Friends' || chr(10)
       || 'Doc ' || CAST(doc_id AS VARCHAR) || chr(10)
       || text || chr(10)
       || 'Tail <b> "quoted" end' || chr(10)
       || 'link two' AS body,
       CAST(2 AS BIGINT) AS n_links,
       'https://example.com/' || CAST(doc_id AS VARCHAR) || '?x=1' AS first_link
FROM documents WHERE doc_id < 500
"""


def q_line_dedup(spark, sf_dir):
    """C4/CCNet boilerplate-line removal: each doc is synthesized as 4
    lines — a universal cookie banner (500 docs), a unique content line,
    a per-host copyright footer (100 docs), and a 2-doc group badge.
    At min_docs=50 exactly the banner and the footer must go.  The
    oracle derives the expected cleaned text, kept and removed counts
    from first principles (it never counts lines itself)."""
    from watertower_spark.operators.dedup import remove_frequent_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.col("doc_id") < 500)
    did = F.col("doc_id").cast("string")
    syn = docs.select(
        "doc_id",
        F.concat(
            F.lit("COOKIE NOTICE please accept our cookies\nDOC "), did,
            F.lit(" "), F.col("text"),
            F.lit("\ncopyright host "), (F.col("doc_id") % 5).cast("string"),
            F.lit("\ngroup badge "), (F.col("doc_id") % 250).cast("string"),
        ).alias("text"),
    )
    return remove_frequent_lines(syn, min_docs=50)


ORACLE_LINE_DEDUP = """
SELECT doc_id,
       'DOC ' || CAST(doc_id AS VARCHAR) || ' ' || text || chr(10)
       || 'group badge ' || CAST(doc_id % 250 AS VARCHAR) AS clean_text,
       CAST(2 AS BIGINT) AS kept_lines,
       CAST(2 AS BIGINT) AS removed_lines
FROM documents WHERE doc_id < 500
"""


def q_host_links(spark, sf_dir):
    """Host-level link graph over synthesized pages: each doc lives on
    host h<doc_id%5>.com and links to example.com, foo.org, and a
    relative path (which resolves to its own host).  The oracle derives
    the 15 expected edges and their exact counts from first
    principles."""
    from watertower_spark.operators.webhtml import host_link_edges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(F.col("doc_id") < 500)
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://h"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".com/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(
            F.concat(
                F.lit('<html><body><a href="https://example.com/'),
                F.col("doc_id").cast("string"),
                F.lit('">a</a><a href="http://foo.org/b?z=1">b</a>'
                      '<a href="/local/c">c</a></body></html>'),
            ),
            "UTF-8",
        ).alias("html"),
    )
    return host_link_edges(pages).orderBy("src_host", "dst_host")


ORACLE_HOST_LINKS = """
WITH hosts AS (
  SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.com' AS src_host, count(*) AS n
  FROM documents WHERE doc_id < 500 GROUP BY 1
)
SELECT src_host, dst_host, n AS n_links FROM hosts
CROSS JOIN (VALUES ('example.com'), ('foo.org')) AS d(dst_host)
UNION ALL
SELECT src_host, src_host AS dst_host, n AS n_links FROM hosts
"""


def _cosine_scored(spark, sf_dir):
    """(vec_id, cos): rounded cosine vs vec_id=0 (no ordering/limit —
    shared by the kNN and hybrid-fusion gates)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pe = emb.select("vec_id", F.posexplode("embedding").alias("i", "x"))
    q = pe.where(F.col("vec_id") == 0).select("i", F.col("x").cast("double").alias("y"))
    return (
        pe.where(F.col("vec_id") != 0)
        .join(F.broadcast(q), "i")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(F.col("x").cast("double") * F.col("y"))
                / (F.sqrt(F.sum(F.col("x").cast("double") * F.col("x"))) * F.sqrt(F.sum(F.col("y") * F.col("y")))),
                4,
            ).alias("cos")
        )
    )


def q_embedding_knn(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of vec_id=0 (similarity search
    baseline), computed in double precision on both sides."""
    return (
        _cosine_scored(spark, sf_dir)
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid lexical+dense retrieval: BM25 top-50 and cosine top-50
    fused by reciprocal-rank fusion (1/(60+rank), ranks from rounded
    scores with doc_id tie-breaks so both sides rank identically).
    The modern RAG-retrieval pattern as one oracled relational query."""
    from pyspark.sql import Window

    from watertower_spark.operators.similarity import rrf_fuse

    lex = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(50)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())),
        )
    )
    dense = (
        _cosine_scored(spark, sf_dir)
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(50)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())),
        )
        .withColumnRenamed("vec_id", "doc_id")
    )
    return rrf_fuse([lex, dense], k=60, topk=10)


ORACLE_HYBRID_RRF = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN {_BM25_TERMS!r} GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), wc AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
), stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents),
bm AS (
  SELECT doc_id,
         round(sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * ({BM25_K1} + 1.0) * tf
               / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl))), 6) AS score
  FROM tf JOIN df USING (term) JOIN wc USING (doc_id), stats
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(_BM25_TERMS)}
  ORDER BY score DESC, doc_id ASC LIMIT 50
), bmr AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r FROM bm
), q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
  FROM embeddings e, q WHERE e.vec_id <> 0
), cs AS (
  SELECT vec_id, round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 4) AS cos
  FROM pairs GROUP BY vec_id
  ORDER BY cos DESC, vec_id ASC LIMIT 50
), csr AS (
  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS r FROM cs
), u AS (
  SELECT doc_id, 1.0 / (60 + r) AS c FROM bmr
  UNION ALL
  SELECT doc_id, 1.0 / (60 + r) AS c FROM csr
)
SELECT doc_id, round(sum(c), 6) AS rrf
FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id ASC LIMIT 10
"""


ORACLE_EMBEDDING_KNN = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
pairs AS (
  SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
  FROM embeddings e, q WHERE e.vec_id <> 0
)
SELECT vec_id,
       round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 4) AS cos
FROM pairs GROUP BY vec_id
ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


# ----------------------------------------------------------- engine-driven

_GATE_INDEX_CACHE: dict = {}


def _gate_index(spark, sf_dir: str) -> str:
    """Build (once per sf_dir) a real index over the adapted driver docs
    with the SQL-expressible analyzer, so engine results are oracle-checkable."""
    key = os.path.abspath(sf_dir)
    if key in _GATE_INDEX_CACHE:
        return _GATE_INDEX_CACHE[key]
    from watertower_spark.operators.index_build import (
        FORMAT_VERSION,
        build_index,
        load_manifest,
    )
    from watertower_spark.sources.corpus import adapt_driver_documents

    idx = os.path.join(
        tempfile.gettempdir(), "wt_gate_idx_" + key.strip("/").replace("/", "_")
    )
    try:
        m = load_manifest(idx)  # reuse across processes: build is deterministic
        if m.get("format_version") != FORMAT_VERSION:
            raise FileNotFoundError  # stale on-disk layout → rebuild
    except FileNotFoundError:
        docs, tags = adapt_driver_documents(spark, sf_dir)
        build_index(docs, tags, idx, analyzer_lang="simple", docs_per_shard=256)
    _GATE_INDEX_CACHE[key] = idx
    return idx


def _engine(spark, sf_dir):
    from watertower_spark.operators.search import SearchEngine

    return SearchEngine(spark, _gate_index(spark, sf_dir))


def _url_to_doc_id(col):
    return F.substring(col, 7, 12).cast("long").alias("doc_id")


def q_engine_tfidf(spark, sf_dir):
    """FULL engine (build + per-shard kernel) parity search, vs SQL TF-IDF.

    Query 'data table' — AND + phrase filter is involved ('data table'
    must ALSO appear adjacent per reference semantics, search.go:97-99),
    so the oracle includes the adjacency constraint.
    """
    eng = _engine(spark, sf_dir)
    res = eng.search("data table", None, mode="parity")
    return res.select(_url_to_doc_id(F.col("url")), F.round("score", 6).alias("score"))


ORACLE_ENGINE_TFIDF = TOK_CTE + """
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('data', 'table') GROUP BY doc_id, term
), df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
adjacent AS (
  SELECT DISTINCT a.doc_id FROM tok a JOIN tok b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'data' AND b.term = 'table'
)
SELECT doc_id, round(sum((1.0 + ln(tf)) * ln(n.n / df.df)), 6) AS score
FROM tf JOIN df USING (term), n
WHERE doc_id IN (SELECT doc_id FROM adjacent)
GROUP BY doc_id HAVING count(DISTINCT term) = 2
"""


def q_engine_bm25(spark, sf_dir):
    """Engine BM25 over a single-term query (no phrase constraint), top-10
    by rounded score, vs the closed-form SQL BM25."""
    eng = _engine(spark, sf_dir)
    res = eng.search("merge", None, mode="bm25")
    return (
        res.select(_url_to_doc_id(F.col("url")), F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


ORACLE_ENGINE_BM25 = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok WHERE term = 'merge' GROUP BY doc_id, term
), df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents)
SELECT doc_id,
       round(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * ({BM25_K1} + 1.0) * tf
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl)), 6) AS score
FROM tf JOIN df USING (term) JOIN wc USING (doc_id), stats
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_engine_bm25_or(spark, sf_dir):
    """Disjunctive BM25 top-10 (maxscore kernel) vs closed-form SQL."""
    eng = _engine(spark, sf_dir)
    res = eng.search("scan vector", None, mode="bm25", operator="or", k=200)
    return (
        res.select(_url_to_doc_id(F.col("url")), F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


ORACLE_ENGINE_BM25_OR = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('scan', 'vector') GROUP BY doc_id, term
), df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents)
SELECT doc_id,
       round(sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * ({BM25_K1} + 1.0) * tf
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl))), 6) AS score
FROM tf JOIN df USING (term) JOIN wc USING (doc_id), stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_engine_bm25_or_tag(spark, sf_dir):
    """Disjunctive BM25 with a conjunctive tag filter (ES bool-filter
    shape, handlers.go:149-155): OR over the scored terms, docs must
    carry the tag."""
    eng = _engine(spark, sf_dir)
    res = eng.search("scan vector", ["src3"], mode="bm25", operator="or", k=200)
    return (
        res.select(_url_to_doc_id(F.col("url")), F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


ORACLE_ENGINE_BM25_OR_TAG = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('scan', 'vector') GROUP BY doc_id, term
), df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents)
SELECT doc_id,
       round(sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * ({BM25_K1} + 1.0) * tf
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl))), 6) AS score
FROM tf JOIN df USING (term) JOIN wc USING (doc_id), stats
WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src3')
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_engine_bm25_not(spark, sf_dir):
    """Engine BM25 with ES bool.must_not term exclusion (flagged
    extension; kernel-side exclusion before scoring/top-k): docs
    matching 'merge' but NOT containing 'filter', top-10."""
    eng = _engine(spark, sf_dir)
    res = eng.search("merge", None, mode="bm25", exclude_words="filter")
    return (
        res.select(_url_to_doc_id(F.col("url")), F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


ORACLE_ENGINE_BM25_NOT = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok WHERE term = 'merge' GROUP BY doc_id, term
), df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents)
SELECT doc_id,
       round(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * ({BM25_K1} + 1.0) * tf
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl)), 6) AS score
FROM tf JOIN df USING (term) JOIN wc USING (doc_id), stats
WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM tok WHERE term = 'filter')
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_engine_or_not_tag(spark, sf_dir):
    """Disjunctive BM25 with must_not TAG exclusion: OR over the scored
    terms, docs carrying tag 'src3' excluded at posting-decode time
    (so the maxscore θ bootstrap stays exact over the excluded
    corpus)."""
    eng = _engine(spark, sf_dir)
    res = eng.search("scan vector", None, mode="bm25", operator="or",
                     k=200, exclude_tags=["src3"])
    return (
        res.select(_url_to_doc_id(F.col("url")), F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


ORACLE_ENGINE_OR_NOT_TAG = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('scan', 'vector') GROUP BY doc_id, term
), df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents)
SELECT doc_id,
       round(sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * ({BM25_K1} + 1.0) * tf
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl))), 6) AS score
FROM tf JOIN df USING (term) JOIN wc USING (doc_id), stats
WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src3')
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_engine_msearch(spark, sf_dir):
    """ES _msearch batch path: three heterogeneous queries (BM25 AND,
    parity TF-IDF with phrase, disjunctive BM25 with tag exclusion) in
    ONE Spark DAG — results must equal each query run alone, which the
    oracle reconstructs per line and unions with the qid."""
    eng = _engine(spark, sf_dir)
    res = eng.msearch([
        {"word": "merge", "mode": "bm25", "k": 10},
        {"word": "data table", "mode": "parity"},
        {"word": "scan vector", "mode": "bm25", "operator": "or",
         "k": 10, "exclude_tags": ["src3"]},
    ])
    return res.select(
        "qid", _url_to_doc_id(F.col("url")), F.round("score", 6).alias("score")
    )


ORACLE_ENGINE_MSEARCH = TOK_CTE + f"""
, wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents),
tf0 AS (
  SELECT doc_id, term, count(*) AS tf FROM tok WHERE term = 'merge' GROUP BY doc_id, term
), df0 AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf0 GROUP BY term),
q0 AS (
  SELECT 0 AS qid, doc_id,
         round(ln(1.0 + (stats.n - df0.df + 0.5) / (df0.df + 0.5))
               * ({BM25_K1} + 1.0) * tf
               / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl)), 6) AS score
  FROM tf0 JOIN df0 USING (term) JOIN wc USING (doc_id), stats
  ORDER BY score DESC, doc_id ASC LIMIT 10
),
tf1 AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('data', 'table') GROUP BY doc_id, term
), df1 AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf1 GROUP BY term),
adjacent1 AS (
  SELECT DISTINCT a.doc_id FROM tok a JOIN tok b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'data' AND b.term = 'table'
),
q1 AS (
  SELECT 1 AS qid, doc_id,
         round(sum((1.0 + ln(tf)) * ln(stats.n / df1.df)), 6) AS score
  FROM tf1 JOIN df1 USING (term), stats
  WHERE doc_id IN (SELECT doc_id FROM adjacent1)
  GROUP BY doc_id, stats.n HAVING count(DISTINCT term) = 2
),
tf2 AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('scan', 'vector') GROUP BY doc_id, term
), df2 AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf2 GROUP BY term),
q2 AS (
  SELECT 2 AS qid, doc_id,
         round(sum(ln(1.0 + (stats.n - df2.df + 0.5) / (df2.df + 0.5))
               * ({BM25_K1} + 1.0) * tf
               / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl))), 6) AS score
  FROM tf2 JOIN df2 USING (term) JOIN wc USING (doc_id), stats
  WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src3')
  GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT * FROM q0 UNION ALL SELECT * FROM q1 UNION ALL SELECT * FROM q2
"""


def q_engine_phrase(spark, sf_dir):
    """Engine phrase verification kernel vs SQL adjacency."""
    eng = _engine(spark, sf_dir)
    res = eng.search("hash join", None, mode="parity")
    return res.select(_url_to_doc_id(F.col("url"))).distinct()


ORACLE_ENGINE_PHRASE = TOK_CTE + """
SELECT DISTINCT a.doc_id AS doc_id
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'hash' AND b.term = 'join'
"""


def q_engine_find_by_key(spark, sf_dir):
    """Exact unique-key lookup (Q10; handlers.go:100-145 `q=unique_key:…`)
    vs a SQL point select — the KV-get path every deployment hits."""
    eng = _engine(spark, sf_dir)
    res = eng.search("unique_key:doc://000000000042")
    return res.select(_url_to_doc_id(F.col("url")), "text")


ORACLE_ENGINE_FIND_BY_KEY = """
SELECT doc_id, text FROM documents WHERE doc_id = 42
"""


def q_engine_mget(spark, sf_dir):
    """ES ``_mget`` (flagged extension): four present ids plus one miss
    fetched in ONE shard-pruned doc_store scan (SearchEngine.get_docs)
    vs a SQL IN-list point select.  Internal ids are the reference's
    counter allocation (oracle doc_id + 1 — pinned independently by the
    doc_id_map gate), so the lookup addresses them directly; the missing
    id contributes no row, matching the oracle's 4."""
    eng = _engine(spark, sf_dir)
    res = eng.get_docs([4, 58, 212, 500, 10 ** 9])
    return res.select(_url_to_doc_id(F.col("url")), "text", "lang")


ORACLE_ENGINE_MGET = """
SELECT doc_id, text, lang FROM documents WHERE doc_id IN (3, 57, 211, 499)
"""


def q_engine_range(spark, sf_dir):
    """ES ``range`` filter through the FULL conjunctive kernel (flagged
    extension): parity TF-IDF for 'table' restricted to warc_ts in
    [epoch+100s, epoch+300s).  The corpus's warc_ts is epoch + driver
    doc_id seconds (sources/corpus.adapt_driver_documents), so the
    oracle states the same restriction as a doc_id interval.  A pass
    certifies the predicate-pushed doc_store scan, the synthetic tag-row
    encoding AND the kernel's conjunctive intersection in one gate."""
    import datetime as _dt

    eng = _engine(spark, sf_dir)
    utc = _dt.timezone.utc
    res = eng.search("table", None, mode="parity", ranges={
        "warc_ts": {"gte": _dt.datetime(2020, 1, 1, 0, 1, 40, tzinfo=utc),
                    "lt": _dt.datetime(2020, 1, 1, 0, 5, 0, tzinfo=utc)},
    })
    return res.select(_url_to_doc_id(F.col("url")),
                      F.round("score", 6).alias("score"))


ORACLE_ENGINE_RANGE = TOK_CTE + """
, tf AS (
  SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'table'
  GROUP BY doc_id
), df AS (SELECT count(*) AS df FROM tf),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, round((1.0 + ln(tf)) * ln(n.n * 1.0 / df.df), 6) AS score
FROM tf, df, n
WHERE doc_id >= 100 AND doc_id < 300
"""


def q_engine_sorted(spark, sf_dir):
    """ES sort-by-field composed with a range filter (both flagged
    extensions): the 15 most recent 'table' matches with warc_ts <
    epoch+400s, ordered warc_ts DESC.  warc_ts increases with doc_id,
    so the oracle is the same page as a doc_id window — certifying the
    match set, the range restriction and the top-k page in one gate."""
    import datetime as _dt

    eng = _engine(spark, sf_dir)
    utc = _dt.timezone.utc
    res = eng.search_sorted(
        "table", field="warc_ts", ascending=False, k=15,
        ranges={"warc_ts": {"lt": _dt.datetime(2020, 1, 1, 0, 6, 40,
                                               tzinfo=utc)}})
    return res.select(_url_to_doc_id(F.col("url")), "lang")


ORACLE_ENGINE_SORTED = TOK_CTE + """
, hits AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
SELECT doc_id, lang FROM documents JOIN hits USING (doc_id)
WHERE doc_id < 400
ORDER BY doc_id DESC LIMIT 15
"""


def q_engine_prefix(spark, sf_dir):
    """Prefix (wildcard ``s*``) BM25 top-10 vs a full SQL reconstruction:
    the oracle expands the term dictionary on LIKE 's%' with the SAME cap
    rule (top-50 by df DESC, term ASC — here the synthetic vocabulary has
    six s-terms, so expansion is exact), then scores the expanded set
    disjunctively with the BM25 form.  A pass certifies dictionary
    expansion, per-expanded-term global df, and disjunctive scoring in
    one result."""
    eng = _engine(spark, sf_dir)
    res = eng.search_prefix("s", k=200)
    return (
        res.select(_url_to_doc_id(F.col("url")), F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


ORACLE_ENGINE_PREFIX = TOK_CTE + f"""
, pterms AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok WHERE term LIKE 's%'
  GROUP BY term ORDER BY df DESC, term ASC LIMIT 50
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM pterms) GROUP BY doc_id, term
), wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents)
SELECT doc_id,
       round(sum(ln(1.0 + (stats.n - pterms.df + 0.5) / (pterms.df + 0.5))
             * ({BM25_K1} + 1.0) * tf
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl))), 6) AS score
FROM tf JOIN pterms USING (term) JOIN wc USING (doc_id), stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_engine_fuzzy(spark, sf_dir):
    """Fuzzy (edit-distance ≤ 1) BM25 top-10 for the misspelling
    'scann' vs a full SQL reconstruction: the oracle expands the
    dictionary with levenshtein(term, 'scann') <= 1 under the SAME cap
    rule (distance ASC, df DESC, term ASC, top-50), then scores the
    expansion disjunctively.  A pass certifies dictionary-scan fuzzy
    matching, the deterministic expansion order, and the scoring."""
    eng = _engine(spark, sf_dir)
    res = eng.search_fuzzy("scann", max_edits=1, k=200)
    return (
        res.select(_url_to_doc_id(F.col("url")), F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


ORACLE_ENGINE_FUZZY = TOK_CTE + f"""
, pterms AS (
  SELECT term, count(DISTINCT doc_id) AS df, levenshtein(term, 'scann') AS dist
  FROM tok GROUP BY term
  HAVING levenshtein(term, 'scann') <= 1
  ORDER BY dist ASC, df DESC, term ASC LIMIT 50
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM pterms) GROUP BY doc_id, term
), wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents)
SELECT doc_id,
       round(sum(ln(1.0 + (stats.n - pterms.df + 0.5) / (pterms.df + 0.5))
             * ({BM25_K1} + 1.0) * tf
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl))), 6) AS score
FROM tf JOIN pterms USING (term) JOIN wc USING (doc_id), stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_engine_paging(spark, sf_dir):
    """ES from/size paging: the SECOND page of 10 for the single-term
    BM25 query 'table' (offset=10, k=10) vs SQL OFFSET/LIMIT under the
    same (score DESC, doc_id ASC) total order.  A pass certifies that
    per-shard kernels keep offset+k candidates and the global slice is
    exact — page 2 equals rows 11-20 of the full ranking."""
    eng = _engine(spark, sf_dir)
    res = eng.search("table", None, mode="bm25", k=10, offset=10)
    return res.select(_url_to_doc_id(F.col("url")), F.round("score", 6).alias("score"))


ORACLE_ENGINE_PAGING = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'table' GROUP BY doc_id
), df AS (SELECT count(*) AS df FROM tf),
wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents)
SELECT doc_id,
       round(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * ({BM25_K1} + 1.0) * tf
             / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl)), 6) AS score
FROM tf JOIN wc USING (doc_id), df, stats
ORDER BY ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
         * ({BM25_K1} + 1.0) * tf
         / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl)) DESC,
         doc_id ASC
LIMIT 10 OFFSET 10
"""


def q_engine_search_after(spark, sf_dir):
    """ES search_after deep paging: page 2 of 10 for the single-term
    BM25 query 'table' fetched via the CURSOR path — the cursor is page
    1's last (score, internal doc_id) — vs the same SQL OFFSET/LIMIT
    oracle the from/size gate uses.  A pass certifies the cursor filter
    is applied under every kernel's top-k (per-shard state stays
    k-bounded at any depth, unlike offset's offset+k) and that the
    cursor path tiles the (score DESC, doc_id ASC) total order exactly
    like offset paging does."""
    eng = _engine(spark, sf_dir)
    p1 = eng.search("table", None, mode="bm25", k=10,
                    materialize=False).collect()
    last = p1[-1]
    res = eng.search("table", None, mode="bm25", k=10,
                     search_after=(last["score"], last["doc_id"]))
    return res.select(_url_to_doc_id(F.col("url")),
                      F.round("score", 6).alias("score"))


# page 2 of the same total order — identical expected rows to the
# offset gate, reached through an entirely different engine path
ORACLE_ENGINE_SEARCH_AFTER = ORACLE_ENGINE_PAGING


def q_engine_count(spark, sf_dir):
    """ES _count: match count of the AND+phrase query 'data table'
    without materialization, vs the SQL adjacency count."""
    eng = _engine(spark, sf_dir)
    n = eng.count("data table")
    return spark.createDataFrame([(n,)], "cnt long")


ORACLE_ENGINE_COUNT = TOK_CTE + """
SELECT count(DISTINCT a.doc_id) AS cnt
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'data' AND b.term = 'table'
"""


def q_engine_highlight(spark, sf_dir):
    """ES-style highlighting: the top-10 BM25 hits for 'table' with a
    5-token window snippet around the first match, matched tokens
    wrapped in <em>.  The oracle reconstructs the ranking AND the
    snippet relationally (list_position / list_slice / list_transform
    over the whitespace token array with the gate analyzer's
    normalization), so a pass certifies both the hit set and the exact
    snippet string contract."""
    eng = _engine(spark, sf_dir)
    res = eng.highlight("table", k=10, window=5)
    return res.select(_url_to_doc_id(F.col("url")), "snippet")


ORACLE_ENGINE_HIGHLIGHT = TOK_CTE + f"""
, tf AS (
  SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'table' GROUP BY doc_id
), df AS (SELECT count(*) AS df FROM tf),
wc AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n, (SELECT avg(dl) FROM wc) AS avgdl FROM documents),
top10 AS (
  SELECT doc_id
  FROM tf JOIN wc USING (doc_id), df, stats
  ORDER BY ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * ({BM25_K1} + 1.0) * tf
           / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * wc.dl / stats.avgdl)) DESC,
           doc_id ASC
  LIMIT 10
),
ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
  FROM documents JOIN top10 USING (doc_id)
),
pos AS (
  SELECT doc_id, w,
         list_position(list_transform(w, x -> lower(regexp_replace(x, '[.,:"]+$', ''))), 'table') AS p,
         len(w) AS n
  FROM ws
)
SELECT doc_id,
       array_to_string(
         list_transform(
           list_slice(w, greatest(1, p - 5), least(n, p + 5)),
           x -> CASE WHEN lower(regexp_replace(x, '[.,:"]+$', '')) = 'table'
                     THEN '<em>' || x || '</em>' ELSE x END
         ), ' ') AS snippet
FROM pos
"""


def q_facet_tags(spark, sf_dir):
    """ES terms-aggregation facet: per-tag doc counts over the docs
    matching the parity query 'table' (SearchEngine.facet_tags).  The
    oracle recomputes match set + per-source counts relationally; a pass
    certifies the tag-blob decode, the match join, and the count/order/
    limit contract."""
    eng = _engine(spark, sf_dir)
    return eng.facet_tags("table", size=10)


ORACLE_FACET_TAGS = TOK_CTE + """
, hits AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
SELECT source AS tag, count(*) AS doc_count
FROM documents JOIN hits USING (doc_id)
GROUP BY source
ORDER BY doc_count DESC, tag ASC LIMIT 10
"""


def q_facet_lang(spark, sf_dir):
    """ES terms aggregation over a document COLUMN (lang) for the full
    parity match set of 'table' — the column-valued facet sibling
    (SearchEngine.facet_field) vs the relational count."""
    eng = _engine(spark, sf_dir)
    return eng.facet_field("table", field="lang", size=10)


ORACLE_FACET_LANG = TOK_CTE + """
, hits AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table')
SELECT lang AS key, count(*) AS doc_count
FROM documents JOIN hits USING (doc_id)
GROUP BY lang
ORDER BY doc_count DESC, key ASC LIMIT 10
"""


def q_wc_histogram(spark, sf_dir):
    """ES histogram aggregation over indexed document length (wc — the
    same quantity BM25's dl uses) for the parity match set of 'table',
    interval 8, vs the SQL floor-bucket count.  A pass certifies the
    match set, the doc_stats wc values AND the bucketing in one gate."""
    eng = _engine(spark, sf_dir)
    return eng.histogram_wc("table", interval=8)


ORACLE_WC_HISTOGRAM = TOK_CTE + """
, hits AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'table'),
wc AS (SELECT doc_id, count(*) AS wc FROM tok GROUP BY doc_id)
SELECT CAST(floor(wc.wc / 8) * 8 AS BIGINT) AS key, count(*) AS doc_count
FROM wc JOIN hits USING (doc_id)
GROUP BY 1 ORDER BY key ASC
"""


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs among vec_id < 150, verified by
    exact cosine.  LSH affects recall, so membership can't be oracled
    exactly — but an exhaustive variant can: this query bypasses LSH and
    computes exact pairwise cosine (bounded subset), matching the SQL."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") < 150)
    pe = emb.select("vec_id", F.posexplode("embedding").alias("i", "x")) \
        .withColumn("x", F.col("x").cast("double"))
    a = pe.select(F.col("vec_id").alias("va"), "i", F.col("x").alias("xa"))
    b = pe.select(F.col("vec_id").alias("vb"), "i", F.col("x").alias("xb"))
    pairs = (
        a.join(b, "i")
        .where(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.round(
                F.sum(F.col("xa") * F.col("xb"))
                / (F.sqrt(F.sum(F.col("xa") * F.col("xa"))) * F.sqrt(F.sum(F.col("xb") * F.col("xb")))),
                4,
            ).alias("cos")
        )
        .where(F.col("cos") >= 0.2)
    )
    return pairs


ORACLE_EMBEDDING_NEAR_DUP = """
WITH pe AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS x,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings WHERE vec_id < 150
)
SELECT a.vec_id AS va, b.vec_id AS vb,
       round(sum(a.x * b.x) / (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))), 4) AS cos
FROM pe a JOIN pe b ON a.i = b.i AND a.vec_id < b.vec_id
GROUP BY a.vec_id, b.vec_id
HAVING round(sum(a.x * b.x) / (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x))), 4) >= 0.2
"""


def _recall_gated_exact_topk(spark, sf_dir, approx_df, min_hits: int = 8):
    """Recall-bearing ANN gate output (round-3 verdict #6): emit the
    EXACT cosine top-10 (vec_id, cos — DuckDB-checkable values) iff the
    approximate top-10 contains at least ``min_hits`` of its members
    (membership checked Spark-side against the exact set).  A recall
    regression empties the result and fails the rows/hash gate loudly,
    so the oracle match certifies ≥min_hits/10 recall — real oracled
    rows instead of the former rows-only `no_oracle` entries."""
    approx_ids = {r["vec_id"] for r in approx_df.collect()}
    exact = q_embedding_knn(spark, sf_dir)
    hits = sum(1 for r in exact.collect() if r["vec_id"] in approx_ids)
    if hits < min_hits:
        return spark.createDataFrame([], exact.schema)
    return exact


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k, recall-gated against the exact
    scorer (≥8/10 membership → exact top-10 emitted; else empty ⇒ red
    gate).  n_planes derives from the corpus cardinality (+ Hamming-1
    multiprobe), so the bucket probe is real at any sf — round 2's
    fixed 12 planes returned 0 rows here.  Measured 10/10 at sf0.01,
    9/10 at sf0.1 (test_lsh_knn_recall_gate_corpus)."""
    from watertower_spark.operators.similarity import lsh_bucketed_knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id = 0").collect()[0]["embedding"]
    approx = lsh_bucketed_knn(emb.where("vec_id <> 0"), list(q), k=10)
    return _recall_gated_exact_topk(spark, sf_dir, approx)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF (k-means inverted lists) approximate top-k, recall-gated
    against the exact scorer (≥8/10 membership → exact top-10 emitted;
    else empty ⇒ red gate).  The quantizer is seed-fixed, so the gate
    is deterministic."""
    from watertower_spark.operators.similarity import (
        auto_n_probe,
        ivf_index,
        ivf_knn,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id = 0").collect()[0]["embedding"]
    rest = emb.where("vec_id <> 0")
    assigned, centers = ivf_index(rest, n_lists=8)
    approx = ivf_knn(assigned, centers, list(q), k=10,
                     n_probe=auto_n_probe(rest.count(), 8))
    return _recall_gated_exact_topk(spark, sf_dir, approx)


def q_decontam(spark, sf_dir):
    """Benchmark decontamination (operators/decontam): 8-gram overlap
    report against a benchmark set DERIVED from the corpus itself —
    the first 12 tokens of every doc_id % 25 == 0 doc form one
    benchmark item, so every such doc (with >= 8 tokens) is
    contaminated by construction and any other doc sharing one of
    those 8-grams is too.  The Spark plan broadcasts the benchmark
    grams (the operator's scale contract); the oracle recomputes both
    gram streams with SQL lead windows."""
    from watertower_spark.operators.decontam import contamination_report

    tok = tokens(spark, sf_dir)
    bench = tok.where((F.col("doc_id") % 25 == 0) & (F.col("pos") < 12)).select(
        F.col("doc_id").alias("bench_id"), "pos", "term"
    )
    return contamination_report(tok, bench, n=8)


ORACLE_DECONTAM = TOK_CTE + """
, cg AS (
  SELECT doc_id,
         concat_ws(chr(1), term,
           lead(term, 1) OVER w, lead(term, 2) OVER w, lead(term, 3) OVER w,
           lead(term, 4) OVER w, lead(term, 5) OVER w, lead(term, 6) OVER w,
           lead(term, 7) OVER w) AS gram,
         (lead(term, 7) OVER w) IS NOT NULL AS complete
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), bt AS (
  SELECT doc_id AS bench_id, pos, term FROM tok
  WHERE doc_id % 25 = 0 AND pos < 12
), bg AS (
  SELECT bench_id,
         concat_ws(chr(1), term,
           lead(term, 1) OVER v, lead(term, 2) OVER v, lead(term, 3) OVER v,
           lead(term, 4) OVER v, lead(term, 5) OVER v, lead(term, 6) OVER v,
           lead(term, 7) OVER v) AS gram,
         (lead(term, 7) OVER v) IS NOT NULL AS complete
  FROM bt WINDOW v AS (PARTITION BY bench_id ORDER BY pos)
)
SELECT c.doc_id,
       CAST(count(DISTINCT c.gram) AS BIGINT) AS n_hit_grams,
       CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_ids
FROM (SELECT doc_id, gram FROM cg WHERE complete) c
JOIN (SELECT DISTINCT bench_id, gram FROM bg WHERE complete) b USING (gram)
GROUP BY c.doc_id
"""


# --------------------------------------------------- non-SQL-expressible

def q_dup_clusters(spark, sf_dir):
    """Near-duplicate clustering: exact 3-gram-Jaccard pairs → connected
    components (``dedup.connected_components``, alternating large/small
    star) → (doc_id, component=min reachable doc_id).  The pair source
    is the SQL-expressible exact-Jaccard join (the same shape as
    ``ngram_jaccard``) rather than MinHash so the ENTIRE gate — pair
    generation AND the iterative clustering — is oracled: DuckDB
    recomputes the components with a recursive CTE.  Threshold 0.35
    (vs ngram_jaccard's 0.5) admits chain-forming pairs so the gate
    exercises transitivity, not just cliques."""
    from pyspark.sql import Window

    from watertower_spark.operators.dedup import connected_components

    t = tokens(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = (
        t.withColumn("t2", F.lead("term", 1).over(w))
        .withColumn("t3", F.lead("term", 2).over(w))
        .where(F.col("t3").isNotNull())
        .select("doc_id", F.concat_ws(" ", "term", "t2", "t3").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("inter"))
        .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("sz", "sza"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("sz", "szb"), "db")
        .where(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")) >= 0.35)
        .select("da", "db")
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )


ORACLE_DUP_CLUSTERS = TOK_CTE.replace("WITH __ws", "WITH RECURSIVE __ws", 1) + """
, sh AS (
  SELECT DISTINCT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), sh2 AS (SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id),
prs AS (
  SELECT da, db FROM (
    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
    FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  ) p
  JOIN sizes sa ON sa.doc_id = p.da
  JOIN sizes sb ON sb.doc_id = p.db
  WHERE inter / (sa.sz + sb.sz - inter) >= 0.35
),
edges AS (SELECT da AS u, db AS v FROM prs UNION SELECT db, da FROM prs),
walk(node, lbl) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.lbl FROM walk w JOIN edges e ON e.u = w.node
)
SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS component
FROM walk GROUP BY node
"""


def q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH near-dup candidate pairs (verified by exact Jaccard).
    Uses xxhash64 — not SQL-portable, so rows-only check."""
    from watertower_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(tokens(spark, sf_dir), n_hashes=32, bands=8, threshold=0.05)


def q_simhash_codes(spark, sf_dir):
    """64-bit SimHash fingerprints per doc (rows-only check)."""
    from watertower_spark.operators.dedup import simhash

    return simhash(tokens(spark, sf_dir))


QUERIES: dict = {
    "doc_id_map": (q_doc_id_map, ORACLE_DOC_ID_MAP),
    "term_stats": (q_term_stats, ORACLE_TERM_STATS),
    "doc_stats": (q_doc_stats, ORACLE_DOC_STATS),
    "and_search": (q_and_search, ORACLE_AND_SEARCH),
    "phrase_search": (q_phrase_search, ORACLE_PHRASE_SEARCH),
    "tfidf_search": (q_tfidf_search, ORACLE_TFIDF_SEARCH),
    "bm25_topk": (q_bm25_topk, ORACLE_BM25_TOPK),
    "tag_index": (q_tag_index, ORACLE_TAG_INDEX),
    "exact_dedup": (q_exact_dedup, ORACLE_EXACT_DEDUP),
    "token_count": (q_token_count, ORACLE_TOKEN_COUNT),
    "text_quality": (q_text_quality, ORACLE_TEXT_QUALITY),
    "lang_id": (q_lang_id, ORACLE_LANG_ID),
    "ngram_jaccard": (q_ngram_jaccard, ORACLE_NGRAM_JACCARD),
    "doc_fingerprint": (q_doc_fingerprint, ORACLE_DOC_FINGERPRINT),
    "duplicate_spans": (q_duplicate_spans, ORACLE_DUPLICATE_SPANS),
    "dedup_clean": (q_dedup_clean, ORACLE_DEDUP_CLEAN),
    "url_canon": (q_url_canon, ORACLE_URL_CANON),
    "html_extract": (q_html_extract, ORACLE_HTML_EXTRACT),
    "host_links": (q_host_links, ORACLE_HOST_LINKS),
    "line_dedup": (q_line_dedup, ORACLE_LINE_DEDUP),
    "lm_perplexity": (q_lm_perplexity, ORACLE_LM_PPL),
    "gopher_quality": (q_gopher_quality, ORACLE_GOPHER_QUALITY),
    "ngram_repetition": (q_ngram_repetition, ORACLE_NGRAM_REPETITION),
    "dup_ngram_coverage": (q_dup_ngram_coverage, ORACLE_DUP_NGRAM),
    "pii_redact": (q_pii_redact, ORACLE_PII_REDACT),
    "nfkc_fold": (q_nfkc_fold, ORACLE_NFKC_FOLD),
    "stratified_sample": (q_stratified_sample, ORACLE_STRATIFIED_SAMPLE),
    "seq_pack": (q_seq_pack, ORACLE_SEQ_PACK),
    "decontam": (q_decontam, ORACLE_DECONTAM),
    "dup_clusters": (q_dup_clusters, ORACLE_DUP_CLUSTERS),
    "hybrid_rrf": (q_hybrid_rrf, ORACLE_HYBRID_RRF),
    "embedding_knn": (q_embedding_knn, ORACLE_EMBEDDING_KNN),
    "engine_tfidf": (q_engine_tfidf, ORACLE_ENGINE_TFIDF),
    "engine_bm25": (q_engine_bm25, ORACLE_ENGINE_BM25),
    "engine_bm25_or": (q_engine_bm25_or, ORACLE_ENGINE_BM25_OR),
    "engine_bm25_or_tag": (q_engine_bm25_or_tag, ORACLE_ENGINE_BM25_OR_TAG),
    "engine_bm25_not": (q_engine_bm25_not, ORACLE_ENGINE_BM25_NOT),
    "engine_or_not_tag": (q_engine_or_not_tag, ORACLE_ENGINE_OR_NOT_TAG),
    "engine_msearch": (q_engine_msearch, ORACLE_ENGINE_MSEARCH),
    "engine_phrase": (q_engine_phrase, ORACLE_ENGINE_PHRASE),
    "engine_find_by_key": (q_engine_find_by_key, ORACLE_ENGINE_FIND_BY_KEY),
    "engine_mget": (q_engine_mget, ORACLE_ENGINE_MGET),
    "engine_range": (q_engine_range, ORACLE_ENGINE_RANGE),
    "engine_sorted": (q_engine_sorted, ORACLE_ENGINE_SORTED),
    "engine_prefix": (q_engine_prefix, ORACLE_ENGINE_PREFIX),
    "engine_fuzzy": (q_engine_fuzzy, ORACLE_ENGINE_FUZZY),
    "engine_paging": (q_engine_paging, ORACLE_ENGINE_PAGING),
    "engine_search_after": (q_engine_search_after, ORACLE_ENGINE_SEARCH_AFTER),
    "engine_count": (q_engine_count, ORACLE_ENGINE_COUNT),
    "engine_highlight": (q_engine_highlight, ORACLE_ENGINE_HIGHLIGHT),
    "facet_tags": (q_facet_tags, ORACLE_FACET_TAGS),
    "facet_lang": (q_facet_lang, ORACLE_FACET_LANG),
    "wc_histogram": (q_wc_histogram, ORACLE_WC_HISTOGRAM),
    "embedding_near_dup": (q_embedding_near_dup, ORACLE_EMBEDDING_NEAR_DUP),
    "ann_lsh_topk": (q_ann_lsh_topk, ORACLE_EMBEDDING_KNN),
    "ann_ivf_topk": (q_ann_ivf_topk, ORACLE_EMBEDDING_KNN),
    "minhash_pairs": (q_minhash_pairs, None),
    "simhash_codes": (q_simhash_codes, None),
}
