"""Index maintenance: incremental append, removal, upsert, resume.

The reference mutates per-term KV records with 50× optimistic retries
(PostDocument/RemoveDocument, database.go:23-156, 290-463).  In the
batch engine those collapse to shard-grained operations — the shard is
the checkpoint/lineage unit (north_rule):

- append_documents — new docs get ids from the next empty shard range;
  every table gains NEW shard partitions only (no rewrite of existing
  data, the cheap path for crawl-append workloads).
- remove_documents / upsert_documents — only AFFECTED shards are rebuilt
  from doc_store (dynamic partition overwrite); all other shards'
  files are untouched.  This is the I4/I5 diff + I6-I10 posting/tag
  update semantics expressed as partition-local recompute instead of
  read-modify-write.
- resume_build — re-issues a build skipping shards the manifest records
  as committed (per-partition lineage): an interrupted 10^12-doc build
  restarts where it stopped.

Note on scoring: pruning upper bounds are computed at QUERY time from
the per-block (max_tf, min_dl) sidecars and the current avgdl — BM25
weight is increasing in tf and decreasing in dl, so the bound stays
sound no matter how appends/removals drift avgdl.  (The pack-time
block_max_w column is diagnostic only; an earlier design pruned on it,
which is unsound when avgdl rises.)

CONCURRENCY: mutations are SINGLE-WRITER per index.  Each mutation
takes an advisory lease (``_meta/_mutation_lock``, created exclusively;
re-entrant within one process so upsert may call append) and suffixes
its staging dirs with the mutation build_id — a second concurrent
mutation fails fast with ``IndexLockedError`` instead of silently
corrupting the first one's snapshots.  The lease is atomic on POSIX
and HDFS; on S3-like stores exclusive-create is best-effort, so a
scheduler-level single-writer guarantee is still recommended there.
Readers (SearchEngine) never take the lease — they resolve versioned
table pointers from the manifest they loaded, which stays readable
throughout any mutation.
"""

from __future__ import annotations

import contextlib
import functools
import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .analyze import analyze_to_terms
from .index_build import (
    DOC_LEN_SCHEMA,
    POSTING_SCHEMA,
    TAG_SCHEMA,
    _pack_postings_kernel,
    _pack_tags_kernel,
    assign_doc_ids,
    load_manifest,
)


class IndexLockedError(RuntimeError):
    """Another mutation holds this index's mutation lease."""


_HELD_LEASES: set = set()  # index dirs leased by THIS process (re-entrancy)


@contextlib.contextmanager
def _mutation_lock(index_dir: str):
    """Advisory single-writer lease for one mutation (see module
    docstring).  Re-entrant within the process: upsert_documents calls
    append_documents for its fresh-url tail under the same lease."""
    from watertower_spark.functions import fsio

    if index_dir in _HELD_LEASES:
        yield
        return
    lock = f"{index_dir}/_meta/_mutation_lock"
    if not fsio.create_exclusive(lock, f"pid={os.getpid()}"):
        raise IndexLockedError(
            f"index at {index_dir} is being mutated by another writer "
            f"(lease file {lock} exists); mutations are single-writer — "
            f"retry after it finishes, or remove a stale lease left by a "
            f"crashed mutation"
        )
    _HELD_LEASES.add(index_dir)
    try:
        yield
    finally:
        _HELD_LEASES.discard(index_dir)
        fsio.delete_file(lock)


def _restores_overwrite_mode(fn):
    """Mutation paths flip spark.sql.sources.partitionOverwriteMode to
    'dynamic' mid-flight; restore the session's previous value on exit
    so the setting doesn't leak into subsequent user writes (ADVICE r3).
    Also pins the index parquet codec (index_build.PARQUET_CODEC) for
    the mutation's duration so rewritten shards/tables keep the build's
    codec, restoring the session value on exit the same way.
    Wrapped functions must take the SparkSession as their first arg."""

    @functools.wraps(fn)
    def wrapper(spark, *args, **kwargs):
        from .index_build import PARQUET_CODEC

        key = "spark.sql.sources.partitionOverwriteMode"
        ckey = "spark.sql.parquet.compression.codec"
        try:
            prev = spark.conf.get(key)
        except Exception:
            prev = None
        codec_prev = spark.conf.get(ckey, "snappy")
        spark.conf.set(ckey, PARQUET_CODEC)
        try:
            return fn(spark, *args, **kwargs)
        finally:
            spark.conf.set(ckey, codec_prev)
            if prev is None:
                with contextlib.suppress(Exception):
                    spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    return wrapper


def _pack_doc_len_kernel(dps: int):
    """(doc_id, shard, wc) rows of one shard → its dense dl-array row
    (see index_build.DOC_LEN_SCHEMA)."""

    def pack(key, pdf):
        import numpy as np
        import pandas as pd

        shard = int(key[0])
        offs = (pdf["doc_id"].to_numpy() - shard * dps - 1).astype("int64")
        ws = pdf["wc"].to_numpy().astype("int32")
        arr = np.zeros(int(offs.max()) + 1, dtype=np.int32)
        arr[offs] = ws
        return pd.DataFrame(
            {"shard": [shard], "n": [arr.size], "dl_blob": [arr.tobytes()]}
        )

    return pack


def _write_doc_len(doc_stats, index_dir: str, dps: int, write_mode: str) -> None:
    (
        doc_stats.select("doc_id", "shard", "wc")
        .groupBy("shard")
        .applyInPandas(_pack_doc_len_kernel(dps), schema=DOC_LEN_SCHEMA)
        .write.mode(write_mode).partitionBy("shard")
        .parquet(f"{index_dir}/doc_len")
    )


def _save_manifest(index_dir: str, manifest: dict, op: str = "update") -> None:
    from watertower_spark.functions import fsio

    from .index_build import append_snapshot

    fsio.write_json(f"{index_dir}/_meta/manifest.json", manifest)
    append_snapshot(index_dir, manifest, op)


def _publish_table(index_dir: str, manifest: dict, name: str, write_fn) -> str:
    """Replace a whole table OBJECT-STORE-SAFELY: write the new contents
    into a fresh versioned directory, flip the manifest pointer (readers
    resolve via ``table_path``), and return the superseded directory for
    the caller to garbage-collect AFTER the manifest commit.  No rename
    anywhere — rename is copy+delete and non-atomic on S3/GCS."""
    tables = manifest.setdefault("tables", {})
    cur = tables.get(name, name)
    ver = int(cur.rsplit("_v", 1)[1]) + 1 if "_v" in cur else 1
    new = f"{name}_v{ver}"
    write_fn(f"{index_dir}/{new}")
    tables[name] = new
    return f"{index_dir}/{cur}"


def _manifest_sum_wc(m: dict) -> float:
    """Running Σwc (kept in the manifest since r3 so mutations never
    re-scan doc_stats for avgdl); derived for pre-r3 manifests."""
    v = m.get("sum_wc")
    if v is not None:
        return float(v)
    return float(m.get("avgdl", 0.0)) * float(m.get("doc_count", 0))


def _shard_col(docs_per_shard: int):
    return ((F.col("doc_id") - 1) / docs_per_shard).cast("int").alias("shard")


def _build_shard_tables(spark, docs_w: DataFrame, tags: DataFrame | None,
                        manifest: dict, index_dir: str, mode: str,
                        replace_shards: list | None = None) -> None:
    """Analyze docs_w (doc_id, text, lang [+url]) and write postings/tags/
    doc_stats rows for their shards. mode='append' adds new shard
    partitions; mode='overwrite_partitions' replaces only touched shards."""
    dps = manifest["docs_per_shard"]
    avgdl = manifest["avgdl"]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    write_mode = "append" if mode == "append" else "overwrite"

    terms = analyze_to_terms(docs_w, manifest.get("default_lang") or "",
                             manifest.get("analyzer_lang"))
    terms = terms.withColumn("shard", ((F.col("doc_id") - 1) / dps).cast("int"))
    terms.persist()

    doc_stats = (
        docs_w.select("doc_id").withColumn("shard", _shard_col(dps))
        .join(terms.select("doc_id", "wc", "twc").distinct(), "doc_id", "left")
        .fillna({"wc": 0, "twc": 0})
    )

    postings = (
        terms.withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(64)))
        .groupBy("shard", "tb")
        .applyInPandas(_pack_postings_kernel(avgdl), schema=POSTING_SCHEMA)
    )
    (
        postings.repartitionByRange("shard").sortWithinPartitions("term")
        .write.mode(write_mode).partitionBy("shard").parquet(f"{index_dir}/postings")
    )
    # NOTE: doc_stats (returned, lazy) depends on the cached `terms`;
    # callers must write it BEFORE calling the returned unpersist thunk,
    # else the append re-analyzes every document a second time.
    if tags is not None and manifest.get("has_tags"):
        tag_rows = (
            tags.select(F.explode("tags").alias("tag"), "doc_id")
            .withColumn("shard", _shard_col(dps))
        )
        (
            tag_rows.groupBy("shard").applyInPandas(_pack_tags_kernel, schema=TAG_SCHEMA)
            .write.mode(write_mode).partitionBy("shard").parquet(f"{index_dir}/tags")
        )
    return doc_stats, terms.unpersist


@_restores_overwrite_mode
def append_documents(spark: SparkSession, index_dir: str,
                     new_docs: DataFrame, new_tags: DataFrame | None = None) -> dict:
    """Incrementally add documents.  New ids start at the next shard
    boundary so existing shard files are never touched."""
    with _mutation_lock(index_dir):
        return _append_documents(spark, index_dir, new_docs, new_tags)


def _append_documents(spark, index_dir, new_docs, new_tags=None):
    from .index_build import table_path

    m = load_manifest(index_dir)
    dps = m["docs_per_shard"]
    base = m["n_shards"] * dps  # ids base (0-based) → first id = base+1

    doc_map_dir = table_path(index_dir, m, "doc_map")
    existing = spark.read.parquet(doc_map_dir).select("url")
    fresh = new_docs.join(existing, "url", "left_anti")

    ids = assign_doc_ids(fresh, num_ranges=16).withColumn(
        "doc_id", F.col("doc_id") + F.lit(base)
    )
    docs_w = fresh.join(ids, "url")
    n_new = docs_w.count()
    if n_new == 0:
        return m

    tags_w = new_tags.join(ids, "url") if new_tags is not None else None
    doc_stats, release_terms = _build_shard_tables(spark, docs_w, tags_w, m, index_dir, "append")
    doc_stats.write.mode("append").partitionBy("shard").parquet(f"{index_dir}/doc_stats")
    _write_doc_len(doc_stats, index_dir, dps, "append")
    # Σwc of the appended batch only — from the cached analysis, not a
    # doc_stats table scan (incremental-avgdl invariant)
    delta_wc = float(doc_stats.agg(F.sum("wc")).collect()[0][0] or 0.0)
    release_terms()
    ids.write.mode("append").parquet(doc_map_dir)
    # raw html is NOT copied into the index (matches build_index's
    # doc_store schema — appended shard files must not reintroduce the
    # crawl's heaviest column, nor make schema inference file-dependent)
    docs_w.drop("html").withColumn("shard", _shard_col(dps)) \
        .write.mode("append").partitionBy("shard").parquet(f"{index_dir}/doc_store")

    total = m["doc_count"] + n_new
    new_n_shards = max(m["n_shards"], math.ceil((base + n_new) / dps))
    new_shards = list(range(m["n_shards"], new_n_shards))
    sum_wc = _manifest_sum_wc(m) + delta_wc
    m.update(
        doc_count=total,
        sum_wc=sum_wc,
        avgdl=sum_wc / total if total else 0.0,
        n_shards=new_n_shards,
        build_id=m["build_id"] + "+a",
    )
    # appended shards are brand new (ids start at the next shard
    # boundary) → nothing to subtract; only their stats fold in
    gc = _apply_stats_delta(spark, index_dir, m, new_shards,
                            old_term_contrib=None)
    _save_manifest(index_dir, m, "append")
    _gc_dirs(gc)
    return m


@_restores_overwrite_mode
def remove_documents(spark: SparkSession, index_dir: str, urls: DataFrame) -> dict:
    """Remove documents by url: rewrite doc_map/doc_stats/doc_store minus
    the victims, rebuild ONLY the affected shard partitions (I10)."""
    with _mutation_lock(index_dir):
        return _remove_documents(spark, index_dir, urls)


def _remove_documents(spark, index_dir, urls):
    from watertower_spark.functions import fsio

    from .index_build import table_path

    m = load_manifest(index_dir)
    dps = m["docs_per_shard"]
    doc_map = spark.read.parquet(table_path(index_dir, m, "doc_map"))
    # materialize the victim set to break lineage: later rewrites replace
    # the very files doc_map reads from (lazy plans must not re-scan them).
    # Staging dirs are suffixed per-mutation (plus the advisory lease) so
    # a concurrent writer can never clobber this snapshot.
    tmp_victims = f"{index_dir}/_tmp_victims_{_staging_suffix()}"
    doc_map.join(urls.select("url"), "url").write.mode("overwrite").parquet(tmp_victims)
    victims = spark.read.parquet(tmp_victims)
    shards = [r["shard"] for r in victims.select(_shard_col(dps)).distinct().collect()]
    if not shards:
        fsio.delete_dir(tmp_victims)
        return m
    n_removed = victims.count()

    # BEFORE the rewrite: materialize the affected shards' OLD stats
    # contribution (path-scoped — only these shards' files are read)
    old_contrib, old_contrib_dir = _snapshot_old_contrib(spark, index_dir, shards)
    old_wc = _wc_sum(spark, index_dir, shards)

    store = spark.read.parquet(f"{index_dir}/doc_store")
    # kept rows of the affected shards, ALL columns, materialized — the
    # doc_store overwrite below replaces the very files this plan reads,
    # so every write must come from the cache, never a lazy parquet scan
    kept_small = (
        store.join(victims.select("doc_id"), "doc_id", "left_anti")
        .where(F.col("shard").isin(shards))
        .persist()
    )
    kept_small.count()

    tag_src = None
    if m.get("has_tags"):
        # reconstruct tag rows of the affected shards from the tags table
        tag_src = _tags_as_rows(spark, index_dir, shards, kept_small)

    # rebuilds postings + doc_stats (+tags) of the affected shards from
    # the kept docs' re-analysis
    _rewrite_shards(spark, index_dir, m,
                    kept_small.select("doc_id", "url", "text", "lang"),
                    tag_src, shards)

    # publish the replacement doc_map into a fresh versioned dir (no
    # rename/rmtree of the live table — object-store safe)
    gc = [_publish_table(
        index_dir, m, "doc_map",
        lambda path: doc_map.join(victims.select("doc_id"), "doc_id", "left_anti")
        .write.mode("overwrite").parquet(path),
    )]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    kept_small.write.mode("overwrite").partitionBy("shard") \
        .parquet(f"{index_dir}/doc_store")
    # dynamic partition overwrite only touches partitions PRESENT in the
    # written data: a shard whose docs were ALL removed produces zero
    # rows, leaving its old files alive — delete those partitions
    # explicitly or removed docs stay searchable
    surviving = {
        r["shard"] for r in kept_small.select(_shard_col(dps)).distinct().collect()
    }
    for s in shards:
        if s not in surviving:
            for table in ("postings", "doc_store", "tags", "doc_stats", "doc_len"):
                fsio.delete_dir(f"{index_dir}/{table}/shard={s}")
    kept_small.unpersist()

    m.update(doc_count=m["doc_count"] - n_removed, build_id=m["build_id"] + "+r")
    # AFTER the rewrite: the affected shards' NEW Σwc (fully-removed
    # shard dirs are gone and skipped) — avgdl updates from the delta,
    # never a full doc_stats scan
    new_wc = _wc_sum(spark, index_dir, shards)
    sum_wc = _manifest_sum_wc(m) - old_wc + new_wc
    m["sum_wc"] = sum_wc
    m["avgdl"] = sum_wc / m["doc_count"] if m["doc_count"] else 0.0
    gc += _apply_stats_delta(spark, index_dir, m, shards,
                             old_term_contrib=old_contrib)
    _save_manifest(index_dir, m, "remove")
    gc += [tmp_victims, old_contrib_dir]
    _gc_dirs(gc)
    return m


@_restores_overwrite_mode
def upsert_documents(spark: SparkSession, index_dir: str,
                     docs: DataFrame, tags: DataFrame | None = None) -> dict:
    """PostDocument semantics (I1): existing urls keep their doc_id and get
    re-analyzed in place (affected shards rebuilt); new urls append."""
    with _mutation_lock(index_dir):
        return _upsert_documents(spark, index_dir, docs, tags)


def _upsert_documents(spark, index_dir, docs, tags=None):
    from .index_build import table_path

    m = load_manifest(index_dir)
    dps = m["docs_per_shard"]
    doc_map = spark.read.parquet(table_path(index_dir, m, "doc_map"))
    updated = docs.join(doc_map, "url")  # (url, ..., doc_id) — keeps old id
    n_upd = updated.count()
    if n_upd:
        shards = [r["shard"] for r in updated.select(_shard_col(dps)).distinct().collect()]
        # pre-rewrite stats contribution of the affected shards only
        old_contrib, old_contrib_dir = _snapshot_old_contrib(spark, index_dir, shards)
        old_wc = _wc_sum(spark, index_dir, shards)
        store = spark.read.parquet(f"{index_dir}/doc_store")
        untouched = (
            store.where(F.col("shard").isin(shards))
            .join(updated.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", "url", "text", "lang")
        )
        merged = untouched.unionByName(updated.select("doc_id", "url", "text", "lang"))
        merged = merged.persist()
        merged.count()
        tag_src = None
        if m.get("has_tags"):
            old_tag_rows = _tags_as_rows(spark, index_dir, shards, untouched)
            if tags is not None:
                new_tag_rows = tags.join(updated.select("url", "doc_id"), "url") \
                    .select("doc_id", "tags")
                old_tag_rows = old_tag_rows.join(
                    new_tag_rows.select("doc_id"), "doc_id", "left_anti"
                ).unionByName(new_tag_rows)
            tag_src = old_tag_rows
        # rebuilds postings + doc_stats (+tags) of the affected shards
        # from the merged (updated ∪ untouched) re-analysis — doc_stats
        # must track the new bodies or BM25 scores with stale lengths
        _rewrite_shards(spark, index_dir, m, merged, tag_src, shards)
        # refresh doc_store rows for these shards.  Materialize the new
        # rows BEFORE the overwrite: the plan joins columns read from the
        # same doc_store files the write replaces.
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        carried = [c for c in store.columns
                   if c not in ("doc_id", "url", "text", "lang", "shard")]
        new_store = (
            merged.withColumn("shard", _shard_col(dps))
            .join(store.select("doc_id", *carried), "doc_id", "left")
            .select(*store.columns)
            .persist()
        )
        new_store.count()
        new_store.write.mode("overwrite").partitionBy("shard") \
            .parquet(f"{index_dir}/doc_store")
        new_store.unpersist()
        m["build_id"] = m["build_id"] + "+u"
        # re-analysis changed document lengths → avgdl must follow,
        # via the affected shards' Σwc delta (no full doc_stats scan)
        new_wc = _wc_sum(spark, index_dir, shards)
        sum_wc = _manifest_sum_wc(m) - old_wc + new_wc
        m["sum_wc"] = sum_wc
        m["avgdl"] = sum_wc / m["doc_count"] if m["doc_count"] else 0.0
        gc = _apply_stats_delta(spark, index_dir, m, shards,
                                old_term_contrib=old_contrib)
        _save_manifest(index_dir, m, "upsert")
        gc.append(old_contrib_dir)
        _gc_dirs(gc)

    fresh = docs.join(doc_map, "url", "left_anti")
    if fresh.limit(1).count():
        m = append_documents(spark, index_dir, fresh,
                             tags.join(fresh.select("url"), "url") if tags is not None else None)
    return m


# ------------------------------------------------------------------ util

def _tags_as_rows(spark, index_dir, shards, docs_small):
    """Decode the tags table of given shards back to (doc_id, tags[]) rows."""
    import pandas as pd

    def unpack(pdf: pd.DataFrame) -> pd.DataFrame:
        from watertower_spark.functions import codec

        out_doc, out_tag = [], []
        for tag, blob in zip(pdf["tag"], pdf["doc_blob"]):
            for d in codec.decode_sorted(blob):
                out_doc.append(int(d))
                out_tag.append(tag)
        return pd.DataFrame({"doc_id": out_doc, "tag": out_tag})

    t = spark.read.parquet(f"{index_dir}/tags").where(F.col("shard").isin(shards))
    rows = t.groupBy("shard").applyInPandas(unpack, "doc_id long, tag string")
    rows = rows.join(docs_small.select("doc_id"), "doc_id")  # drop removed ids
    return rows.groupBy("doc_id").agg(F.collect_list("tag").alias("tags"))


def _rewrite_shards(spark, index_dir, manifest, docs_small, tag_rows, shards):
    """Rebuild postings + doc_stats (+tags) partitions for the given
    shards only.  doc_stats is derived from the SAME analysis pass as the
    postings so BM25 document lengths always track the bodies actually
    indexed (an earlier version left stale wc rows behind on upsert —
    the flagship scorer then used wrong lengths; ADVICE r1)."""
    dps = manifest["docs_per_shard"]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    terms = analyze_to_terms(docs_small, manifest.get("default_lang") or "",
                             manifest.get("analyzer_lang"))
    terms = terms.withColumn("shard", ((F.col("doc_id") - 1) / dps).cast("int"))
    terms.persist()
    postings = (
        terms.withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(64)))
        .groupBy("shard", "tb")
        .applyInPandas(_pack_postings_kernel(manifest["avgdl"]), schema=POSTING_SCHEMA)
    )
    (
        postings.repartitionByRange("shard").sortWithinPartitions("term")
        .write.mode("overwrite").partitionBy("shard").parquet(f"{index_dir}/postings")
    )
    doc_stats = (
        docs_small.select("doc_id").withColumn("shard", _shard_col(dps))
        .join(terms.select("doc_id", "wc", "twc").distinct(), "doc_id", "left")
        .fillna({"wc": 0, "twc": 0})
    )
    doc_stats.write.mode("overwrite").partitionBy("shard").parquet(
        f"{index_dir}/doc_stats"
    )
    _write_doc_len(doc_stats, index_dir, dps, "overwrite")
    if tag_rows is not None and manifest.get("has_tags"):
        # tag_rows may be decoded from the very tags files this write
        # replaces (_tags_as_rows) — materialize before overwriting
        rows = tag_rows.select(F.explode("tags").alias("tag"), "doc_id") \
            .withColumn("shard", _shard_col(dps)).persist()
        rows.count()
        (
            rows.groupBy("shard").applyInPandas(_pack_tags_kernel, schema=TAG_SCHEMA)
            .write.mode("overwrite").partitionBy("shard").parquet(f"{index_dir}/tags")
        )
        rows.unpersist()
    terms.unpersist()


def resume_build(spark: SparkSession, docs: DataFrame, tags: DataFrame | None,
                 index_dir: str, **build_kwargs) -> dict:
    """Resume an interrupted build from its last durable phase.

    - no manifest on disk → fresh full build;
    - phase 'docs_done' (doc_map/doc_stats/doc_store committed, postings
      phase interrupted) → rebuild ONLY shards whose postings partition
      directory is absent/incomplete, from doc_store — the per-partition
      lineage makes the 10^12-doc restart cost proportional to what is
      actually missing;
    - phase 'committed' → no-op.
    """
    from watertower_spark.functions import fsio

    from .index_build import build_index, table_path

    try:
        m = load_manifest(index_dir)
    except FileNotFoundError:
        return build_index(docs, tags, index_dir, **build_kwargs)
    if m.get("phase") == "committed":
        return m
    with _mutation_lock(index_dir):
        return _resume_build(spark, docs, tags, index_dir, m)


@_restores_overwrite_mode
def _resume_build(spark, docs, tags, index_dir, m):
    from watertower_spark.functions import fsio

    from .index_build import table_path

    present = set(fsio.list_shard_dirs(f"{index_dir}/postings"))
    missing = sorted(set(range(m["n_shards"])) - present)
    if missing:
        dps = m["docs_per_shard"]
        store = spark.read.parquet(f"{index_dir}/doc_store")
        todo = store.where(F.col("shard").isin(missing)).select(
            "doc_id", "url", "text", "lang"
        )
        tag_rows = None
        if tags is not None and m.get("has_tags"):
            doc_map = spark.read.parquet(table_path(index_dir, m, "doc_map"))
            tag_rows = tags.join(doc_map, "url").select("doc_id", "tags").join(
                todo.select("doc_id"), "doc_id"
            )
        _rewrite_shards(spark, index_dir, m, todo, tag_rows, missing)
    # doc_len is a wave-2 table: a crash after the postings wave finished
    # but before w_doc_len leaves all postings shards present (missing =
    # []) with doc_len absent/partial — the BM25 kernels would then fall
    # back to dl=avgdl and score WRONG with phase=committed.  Regenerate
    # any still-missing doc_len shards from the durable doc_stats table.
    have_len = set(fsio.list_shard_dirs(f"{index_dir}/doc_len"))
    need_len = sorted(set(range(m["n_shards"])) - have_len)
    if need_len:
        stats = spark.read.parquet(f"{index_dir}/doc_stats") \
            .where(F.col("shard").isin(need_len))
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        _write_doc_len(stats, index_dir, m["docs_per_shard"], "overwrite")
    m["phase"] = "committed"
    m["build_id"] = m["build_id"] + "+res"
    gc = _refresh_shard_metrics(spark, index_dir, m)
    _save_manifest(index_dir, m, "resume")
    _gc_dirs(gc)
    return m


def _staging_suffix() -> str:
    """Unique per-mutation staging-dir suffix: the advisory lease already
    excludes concurrent writers; the suffix makes clobbering structurally
    impossible (and leftover dirs attributable) even if a lease is
    force-removed."""
    import uuid

    return f"{os.getpid()}_{uuid.uuid4().hex[:8]}"


def _gc_dirs(paths: list) -> None:
    """Best-effort removal of superseded versioned table dirs — AFTER the
    manifest commit, so a crash mid-mutation leaves the old version
    readable via the old manifest."""
    from watertower_spark.functions import fsio

    for p in paths:
        fsio.delete_dir(p)


# every table directory the engine ever writes at the index root; vacuum
# only ever deletes names derived from this set (or _tmp_* staging dirs),
# so a user file accidentally dropped into the index dir is never touched
_KNOWN_TABLES = frozenset({
    "postings", "tags", "doc_stats", "doc_len", "doc_map", "doc_store",
    "term_stats", "shard_metrics",
})


def vacuum_index(index_dir: str, remove_stale_lease: bool = False) -> dict:
    """Garbage-collect crash leftovers from an index directory.

    The mutation paths GC their own superseded table versions and
    staging dirs after each manifest commit (``_gc_dirs``), so a healthy
    index never accumulates garbage.  A mutation killed mid-flight,
    however, strands up to three kinds of debris that are invisible to
    readers (the manifest never references them) but cost real money on
    an object store at web scale:

    - ``_tmp_*`` staging dirs (victim snapshots, old-contribution
      snapshots, term_stats delta stages);
    - versioned table dirs (``term_stats_vN``/``doc_map_vN``/… and the
      superseded unversioned original) that lost the manifest-pointer
      flip race when the writer died between publish and commit;
    - the advisory mutation lease itself.

    Deletion is allow-listed: only ``_tmp_*`` names and dirs whose base
    name is one of the engine's own tables are candidates, and of those
    only the ones the committed manifest does NOT reference.  Vacuum
    takes the single-writer lease (it deletes directories a concurrent
    mutation may be staging into); pass ``remove_stale_lease=True`` to
    break a dead writer's lease first — only safe when the operator
    knows that writer is gone (the reference's equivalent is restarting
    the single daemon process, database.go:23-45).

    Returns {"removed": [names], "lease_removed": bool}.
    """
    import re

    from watertower_spark.functions import fsio

    from .index_build import load_manifest

    lease = f"{index_dir}/_meta/_mutation_lock"
    lease_removed = False
    if remove_stale_lease and fsio.exists(lease):
        fsio.delete_file(lease)
        lease_removed = True
    with _mutation_lock(index_dir):
        m = load_manifest(index_dir)
        tables = m.get("tables", {})
        live = {tables.get(name, name) for name in _KNOWN_TABLES}
        removed = []
        for entry in fsio.list_dir(index_dir):
            if entry == "_meta":
                continue
            if entry.startswith("_tmp_"):
                fsio.delete_dir(f"{index_dir}/{entry}")
                removed.append(entry)
                continue
            vm = re.match(r"^(.+)_v\d+$", entry)
            base = vm.group(1) if vm else entry
            if base in _KNOWN_TABLES and entry not in live:
                fsio.delete_dir(f"{index_dir}/{entry}")
                removed.append(entry)
    return {"removed": removed, "lease_removed": lease_removed}


def compact_index(spark: SparkSession, index_dir: str,
                  min_fill: float = 0.5,
                  max_shards_per_pass: int = 256) -> dict:
    """Merge underfilled shards by re-appending their docs densely.

    ``append_documents`` starts every batch at a fresh shard boundary so
    existing files are never rewritten — the right call per mutation,
    but a streaming ingest (foreachBatch → append) accumulates one
    underfilled shard per micro-batch forever: more partitions to
    prune, more small files, wider AND-shard fan-out per query.

    Compaction composes the two proven mutations: snapshot the sparse
    shards' docs (and tags) out of doc_store, ``remove`` them, then
    ``append`` them back as ONE dense batch.  Statistics, avgdl and the
    term_stats buckets all flow through the same incremental delta
    paths, so correctness is inherited rather than re-implemented, and
    the cost is O(docs moved) — untouched shards are never read (the
    planning pass scans only doc_stats' shard column, which parquet
    answers from footers/metadata).  Doc ids are reassigned; url is the
    stable external key (reference semantics: ids are an internal
    counter, database.go:120-156).

    A shard is sparse when it holds fewer than ``min_fill *
    docs_per_shard`` docs; compaction runs only when at least two
    qualify (re-appending a single shard would just renumber it).
    Each invocation moves at most the ``max_shards_per_pass``
    SPARSEST shards — the shard-count aggregation stays distributed
    and only the bounded winner set is collected, so neither the
    driver result nor the isin() pruning literal grows with the
    repo's stated 10^5-10^8 shard ceiling (ADVICE r4); callers drain
    a long backlog by looping until compacted_shards comes back
    empty.  Returns {"compacted_shards": [...], "docs_moved": N,
    "n_shards": manifest value} — a no-op returns
    compacted_shards=[].
    """
    from watertower_spark.functions import fsio

    with _mutation_lock(index_dir):
        m = load_manifest(index_dir)
        dps = m["docs_per_shard"]
        counts = (
            spark.read.parquet(f"{index_dir}/doc_stats")
            .groupBy("shard").count()
            .where(F.col("count") < min_fill * dps)
            .orderBy(F.col("count").asc(), F.col("shard").asc())
            .limit(max_shards_per_pass)
            .collect()
        )
        sparse = sorted(int(r["shard"]) for r in counts)
        if len(sparse) < 2:
            return {"compacted_shards": [], "docs_moved": 0,
                    "n_shards": m["n_shards"]}

        # snapshot the moved docs (and their tags) to a staging dir
        # BEFORE remove rewrites/deletes the very files they live in
        tmp = f"{index_dir}/_tmp_compact_{_staging_suffix()}"
        store = spark.read.parquet(f"{index_dir}/doc_store") \
            .where(F.col("shard").isin(sparse))
        store.drop("shard").write.mode("overwrite").parquet(f"{tmp}/docs")
        moved = spark.read.parquet(f"{tmp}/docs")
        n_moved = moved.count()
        tags_df = None
        if m.get("has_tags"):
            _tags_as_rows(spark, index_dir, sparse, moved) \
                .join(moved.select("doc_id", "url"), "doc_id") \
                .select("url", "tags") \
                .write.mode("overwrite").parquet(f"{tmp}/tags")
            tags_df = spark.read.parquet(f"{tmp}/tags")

        _remove_documents(spark, index_dir, moved.select("url"))
        m2 = _append_documents(spark, index_dir,
                               moved.drop("doc_id"), tags_df)
        fsio.delete_dir(tmp)
    return {"compacted_shards": sparse, "docs_moved": n_moved,
            "n_shards": m2["n_shards"]}


def _read_shard_table(spark, index_dir: str, table: str, shards) -> "DataFrame | None":
    """Read ONLY the given shards' partitions of a shard-partitioned
    table, path-scoped (with basePath so the shard column survives).

    By CONSTRUCTION no other shard's files can be listed or opened —
    the property the incremental-stats test pins via ``inputFiles()``.
    (Partition pruning via ``.where(shard.isin(...))`` would usually
    achieve the same IO, but path-scoping makes it a structural
    guarantee instead of an optimizer outcome — at 10^5+ shards even
    the file LISTING of a full table is a cost.)  Missing shard dirs
    (e.g. a shard whose docs were all removed) are skipped; returns
    None when none of the requested shards exist."""
    from watertower_spark.functions import fsio

    base = f"{index_dir}/{table}"
    paths = [f"{base}/shard={int(s)}" for s in shards]
    existing = [p for p in paths if fsio.exists(p)]
    if not existing:
        return None
    return spark.read.option("basePath", base).parquet(*existing)


def _term_contrib(postings) -> "DataFrame":
    """Per-term (df, cf, shards) contribution of a postings subset."""
    return postings.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.sort_array(F.collect_set("shard")).alias("shards"),
    )


def _shard_contrib_rows(postings) -> list:
    """Per-shard metric rows of a postings subset (tiny collect)."""
    return (
        postings.groupBy("shard")
        .agg(F.count("*").alias("n_terms"), F.sum("df").alias("n_postings"),
             F.sum("bytes").alias("bytes"))
        .collect()
    )


def _snapshot_old_contrib(spark, index_dir: str, shards):
    """Materialize the affected shards' pre-rewrite per-term stats
    contribution to a _tmp dir and read it back.  A ``persist()`` is NOT
    enough: the shard rewrite's overwrite triggers Spark's
    ``refreshByPath`` cache invalidation on the postings path, after
    which the 'cached' plan would recompute from files the rewrite just
    deleted (the same lineage break _tmp_victims exists for).  Returns
    ``(df_or_None, tmp_dir)``; the caller GCs the dir after the
    manifest commit."""
    old_postings = _read_shard_table(spark, index_dir, "postings", shards)
    tmp = f"{index_dir}/_tmp_old_contrib_{_staging_suffix()}"
    if old_postings is None:
        return None, tmp
    _term_contrib(old_postings).write.mode("overwrite").parquet(tmp)
    return spark.read.parquet(tmp), tmp


def _wc_sum(spark, index_dir: str, shards) -> float:
    """Σwc over the given shards' doc_stats partitions (path-scoped)."""
    ds = _read_shard_table(spark, index_dir, "doc_stats", shards)
    if ds is None:
        return 0.0
    return float(ds.agg(F.sum("wc")).collect()[0][0] or 0.0)


def _tb_col():
    from .index_build import TS_BUCKETS

    return F.pmod(F.xxhash64("term"), F.lit(TS_BUCKETS)).cast("int").alias("tb")


def _read_ts_buckets(spark, ts_dir: str, buckets) -> "DataFrame | None":
    """Read ONLY the given tb buckets of the bucketed term_stats table,
    path-scoped (same structural guarantee as _read_shard_table: no
    other bucket's files can be listed or opened)."""
    from watertower_spark.functions import fsio

    paths = [f"{ts_dir}/tb={int(b)}" for b in buckets]
    existing = [p for p in paths if fsio.exists(p)]
    if not existing:
        return None
    return spark.read.option("basePath", ts_dir).parquet(*existing)


def _apply_stats_delta(spark, index_dir: str, manifest: dict,
                       affected_shards: list,
                       old_term_contrib=None) -> list:
    """Incrementally fold the affected shards' statistics into
    term_stats + shard metrics — reading ONLY those shards' postings
    partitions, never the full postings table (round-2 verdict), and
    since r4 rewriting ONLY the term_stats buckets containing changed
    terms (round-3 verdict #3: the whole-vocabulary read+write per
    mutation is a heavyweight job at a 10^9-term web vocabulary; now a
    one-shard append touches at most |changed terms| of the TS_BUCKETS
    hash buckets and leaves every other bucket's files byte-identical).

    ``old_term_contrib`` is the affected shards' per-term contribution
    MATERIALIZED BEFORE the rewrite (None for pure appends, whose
    shards are brand new).  The merge is:

        df' = df  - df_old + df_new     (term dropped when df' <= 0)
        shards' = (shards \\ affected) ∪ shards_new

    Returns superseded/staging dirs for the caller to GC after the
    manifest commit."""
    from .index_build import SHARD_METRICS_INLINE_MAX, table_path

    new_postings = _read_shard_table(spark, index_dir, "postings", affected_shards)
    ts_dir = table_path(index_dir, manifest, "term_stats")

    empty_i = F.array().cast("array<int>")
    affected_arr = (
        F.array(*[F.lit(int(s)) for s in affected_shards]).cast("array<int>")
        if affected_shards else empty_i
    )
    old_c = (
        old_term_contrib.select(
            "term", F.col("df").alias("df_old"), F.col("cf").alias("cf_old")
        )
        if old_term_contrib is not None
        else None
    )
    new_c = (
        _term_contrib(new_postings).select(
            "term", F.col("df").alias("df_new"), F.col("cf").alias("cf_new"),
            F.col("shards").alias("shards_new"),
        )
        if new_postings is not None
        else None
    )
    gc: list = []
    if old_c is not None or new_c is not None:
        # buckets containing ANY changed term — a tiny collect (≤ TS_BUCKETS
        # distinct values); only these buckets are read or written below
        delta_terms = None
        for c in (old_c, new_c):
            if c is not None:
                t = c.select("term")
                delta_terms = t if delta_terms is None else delta_terms.union(t)
        buckets = sorted(
            r["tb"] for r in delta_terms.select(_tb_col()).distinct().collect()
        )
        ts = _read_ts_buckets(spark, ts_dir, buckets)
        if ts is None:
            ts = spark.createDataFrame(
                [], "term string, df long, cf long, shards array<int>"
            )
        else:
            ts = ts.drop("tb")
        merged = ts
        if old_c is not None:
            merged = merged.join(old_c, "term", "full_outer")
        else:
            merged = merged.withColumn("df_old", F.lit(None).cast("long")) \
                           .withColumn("cf_old", F.lit(None).cast("long"))
        if new_c is not None:
            merged = merged.join(new_c, "term", "full_outer")
        else:
            merged = merged.withColumn("df_new", F.lit(None).cast("long")) \
                           .withColumn("cf_new", F.lit(None).cast("long")) \
                           .withColumn("shards_new", F.lit(None).cast("array<int>"))
        z = lambda c: F.coalesce(F.col(c).cast("long"), F.lit(0))
        merged = (
            merged.select(
                "term",
                (z("df") - z("df_old") + z("df_new")).alias("df"),
                (z("cf") - z("cf_old") + z("cf_new")).alias("cf"),
                F.sort_array(
                    F.array_distinct(
                        F.concat(
                            F.array_except(
                                F.coalesce(F.col("shards"), empty_i), affected_arr
                            ),
                            F.coalesce(F.col("shards_new"), empty_i),
                        )
                    )
                ).alias("shards"),
            )
            .where(F.col("df") > 0)
            .select("term", "df", "cf", "shards", _tb_col())
        )
        # the merge plan reads the very bucket files the dynamic
        # overwrite replaces — stage the result first (persist() does
        # not survive the overwrite's cache invalidation; same lineage
        # break _snapshot_old_contrib documents)
        stage = f"{index_dir}/_tmp_ts_delta_{_staging_suffix()}"
        merged.repartition(max(1, len(buckets)), "tb") \
            .sortWithinPartitions("tb", "term") \
            .write.mode("overwrite").parquet(stage)
        gc.append(stage)
        staged = spark.read.parquet(stage)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # keep each published bucket file term-sorted (row-group min/max
        # pruning for prefix/fuzzy dictionary scans, round-5 verdict #5)
        staged.sortWithinPartitions("tb", "term") \
            .write.mode("overwrite").partitionBy("tb").parquet(ts_dir)
        # a touched bucket whose every term was dropped produces zero
        # rows — dynamic overwrite leaves its old files alive; delete
        # those bucket dirs explicitly (same pattern as fully-removed
        # shards in remove_documents)
        still = {r["tb"] for r in staged.select("tb").distinct().collect()}
        from watertower_spark.functions import fsio

        for b in buckets:
            if b not in still:
                fsio.delete_dir(f"{ts_dir}/tb={int(b)}")

    # ---- shard metrics: patch ONLY affected entries ----
    new_rows = _shard_contrib_rows(new_postings) if new_postings is not None else []
    if manifest.get("shards") != "external" and \
            manifest.get("n_shards", 0) <= SHARD_METRICS_INLINE_MAX:
        shards_map = manifest.get("shards") or {}
        if not isinstance(shards_map, dict):
            shards_map = {}
        for s in affected_shards:
            shards_map.pop(str(int(s)), None)
        for r in new_rows:
            shards_map[str(int(r["shard"]))] = {
                "n_terms": int(r["n_terms"]), "n_postings": int(r["n_postings"]),
                "bytes": int(r["bytes"]), "build_id": manifest["build_id"],
                "status": "committed",
            }
        manifest["shards"] = shards_map
        manifest.pop("shard_totals", None)
    else:
        # external metrics table: old rows minus affected, plus fresh
        # rows — reads the (one-row-per-shard) metrics table, never
        # the postings
        mt_schema = ("shard int, n_terms long, n_postings long, bytes long, "
                     "build_id string, status string")
        if isinstance(manifest.get("shards"), dict):
            # inline → external transition (append grew past the
            # threshold): seed the table from the inline entries
            old_mt = spark.createDataFrame(
                [(int(s), int(v["n_terms"]), int(v["n_postings"]),
                  int(v["bytes"]), v.get("build_id", ""), v.get("status", "committed"))
                 for s, v in manifest["shards"].items()],
                mt_schema,
            )
        else:
            mt_path = table_path(index_dir, manifest, "shard_metrics")
            old_mt = spark.read.parquet(mt_path)
        keep = old_mt.where(~F.col("shard").isin([int(s) for s in affected_shards]))
        add = spark.createDataFrame(
            [(int(r["shard"]), int(r["n_terms"]), int(r["n_postings"]),
              int(r["bytes"]), manifest["build_id"], "committed")
             for r in new_rows],
            mt_schema,
        )
        mt_new = keep.unionByName(add).persist()
        mt_new.count()  # materialize before the old files are superseded
        gc.append(_publish_table(
            index_dir, manifest, "shard_metrics",
            lambda path: mt_new.write.mode("overwrite").parquet(path),
        ))
        t_ = mt_new.agg(F.sum("n_postings").alias("p"), F.sum("bytes").alias("b")).collect()[0]
        mt_new.unpersist()
        manifest["shards"] = "external"
        manifest["shard_totals"] = {"n_postings": int(t_["p"] or 0),
                                    "bytes": int(t_["b"] or 0)}
    return gc


def _refresh_shard_metrics(spark, index_dir, manifest) -> list:
    # refresh the global term statistics alongside the shard metrics;
    # both aggregates touch only NARROW columns (term/shard/df/cf/bytes)
    # — parquet column pruning means the posting blobs are never read.
    # Returns superseded table dirs for the caller to delete AFTER the
    # manifest commit.
    from .index_build import TS_BUCKETS

    postings = spark.read.parquet(f"{index_dir}/postings")
    old = _publish_table(
        index_dir, manifest, "term_stats",
        lambda path: (
            postings.groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.sort_array(F.collect_set("shard")).alias("shards"),
            )
            .select("term", "df", "cf", "shards", _tb_col())
            .repartition(TS_BUCKETS, "tb")
            .sortWithinPartitions("tb", "term")
            .write.mode("overwrite").partitionBy("tb").parquet(path)
        ),
    )
    from .index_build import SHARD_METRICS_INLINE_MAX

    mdf = postings.groupBy("shard").agg(
        F.count("*").alias("n_terms"),
        F.sum("df").alias("n_postings"),
        F.sum("bytes").alias("bytes"),
    )
    if manifest.get("n_shards", 0) <= SHARD_METRICS_INLINE_MAX:
        manifest["shards"] = {
            str(int(r["shard"])): {
                "n_terms": int(r["n_terms"]), "n_postings": int(r["n_postings"]),
                "bytes": int(r["bytes"]), "build_id": manifest["build_id"],
                "status": "committed",
            }
            for r in mdf.collect()
        }
        manifest.pop("shard_totals", None)
    else:
        # huge shard counts: refresh the external metrics table (its own
        # versioned publish) and keep only totals inline
        from .index_build import table_path

        old_metrics = _publish_table(
            index_dir, manifest, "shard_metrics",
            lambda path: (
                mdf.withColumn("build_id", F.lit(manifest["build_id"]))
                .withColumn("status", F.lit("committed"))
                .write.mode("overwrite").parquet(path)
            ),
        )
        t_ = (
            spark.read.parquet(table_path(index_dir, manifest, "shard_metrics"))
            .agg(F.sum("n_postings").alias("p"), F.sum("bytes").alias("b"))
            .collect()[0]
        )
        manifest["shards"] = "external"
        manifest["shard_totals"] = {"n_postings": int(t_["p"] or 0),
                                    "bytes": int(t_["b"] or 0)}
        return [old, old_metrics]
    return [old]
