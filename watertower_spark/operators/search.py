"""Query engine over the sharded index.

Re-expresses the reference's read path (search.go:16-111; SURVEY.md §3.1)
as one DataFrame DAG:

    query string ── analyze (driver-side, tiny) ─┐
    postings (term ∈ query terms)                ├─ ONE unified grouped
    tags     (tag ∈ filter tags)    ── unioned ──┤  exchange → per-shard
    doc_len  (per-shard dl arrays) ──────────────┘  applyInPandas kernel
        → (doc_id, score) → global sort [+ limit k] → doc_store join

    Doc ids are dense per shard, so the shard's document lengths pack
    into ONE int32 array row (doc_len table): BM25 dl lookup is array
    indexing inside the kernel, and the query plan has a single input
    exchange — no doc_stats cogroup, scan, or sort at query time.

Semantics preserved from the reference:
- conjunctive AND across every query term AND every tag (int.go:7-49,
  search.go:86-95); a term with no postings anywhere ⇒ empty result
  (database.go:516-521 Found=false ⇒ empty group ⇒ empty intersection);
- phrase filter via relative-position algebra whenever the query has
  tokens (search.go:114-168), including the uint32-wraparound behavior
  of ``position - firstPos`` (positions below the first query position
  wrap, never match);
- parity scoring: TF-IDF ``(1+ln tf)·ln(N/df)`` summed over query terms,
  sorted ASCENDING (the reference's observable contract,
  search.go:105-111,170-189) with doc_id tie-break for determinism;
- BM25 mode (the flagship scorer): ``idf·(k1+1)·tf/(tf+k1·(1-b+b·dl/avgdl))``
  with idf = ln(1+(N-df+0.5)/(df+0.5)), score DESCENDING, doc_id
  tie-break, per-shard top-k inside the kernel then global top-k.

Scale notes: postings are read with a pushed-down term filter (files are
sorted by term within shard partitions → row-group pruning); the kernel
fans out per shard with no postings shuffle; the final materialization
broadcasts the (small) result set against the shard-partitioned
doc_store.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .index_build import BM25_B, BM25_K1, load_manifest

_WRAP = 1 << 32  # uint32 arithmetic in the reference's phrase algebra


def _null_blob_cols4() -> list:
    """The 4-column null tail of the OR-kernel's non-posting rows."""
    return [
        F.lit(None).cast("binary").alias(c)
        for c in ("tf_blob", "block_off", "block_max_tf", "block_min_dl")
    ]


def _null_blob_cols() -> list:
    """The 8 null binary sidecar columns non-posting rows carry through
    the unified kernel exchange (built once per engine via _const_cols)."""
    return [
        F.lit(None).cast("binary").alias(c)
        for c in ("tf_blob", "pos_blob", "block_off", "block_last",
                  "block_tf_off", "block_pos_off", "block_max_tf",
                  "block_min_dl")
    ]

RESULT_SCHEMA = "doc_id long, shard int, score double"


def _phrase_relative_positions(doc_positions: np.ndarray, query_positions: list) -> np.ndarray:
    """search.go:141-160 re-expressed vectorized: relative start offsets of
    the query-word pattern inside one doc's position set."""
    qp0 = query_positions[0]
    ok = np.ones(doc_positions.shape, dtype=bool)
    for qi in query_positions[1:]:
        want = (doc_positions - qp0 + qi) % _WRAP
        ok &= np.isin(want, doc_positions, assume_unique=True)
    return (doc_positions[ok] - qp0) % _WRAP


# packs (candidate index, relative position) into one int64 key for the
# batched phrase filter: rel < 2^32 < 2^33, so the key space is exact up
# to 2^30 candidates per shard (docs_per_shard is far below that)
_PHRASE_KEY = np.int64(1) << np.int64(33)


def _phrase_rel_keys(pos_lists: list, query_positions: list) -> np.ndarray:
    """Batched ``_phrase_relative_positions`` over EVERY candidate at
    once: returns int64 keys ``cand_idx * 2^33 + rel`` for each valid
    relative start offset of the query-word pattern, across all docs.

    The r5 kernel looped per candidate doc (one tiny numpy op chain per
    doc — measured as the dominant cost of phrase queries at sf1.0:
    3.3-3.9 s/exec for q_parity_phrase, ~85% kernel).  Here the per-doc
    position arrays are flattened once; the same-doc membership test is
    one searchsorted over the (doc, position) key stream per extra query
    position (guide §4.2: hand whole batches to vectorized numpy, never
    loop per row).  Identical algebra, including the uint32 wraparound
    (positions below the first query position wrap and never match)."""
    n = len(pos_lists)
    lens = np.fromiter((p.size for p in pos_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    flat = np.concatenate(pos_lists).astype(np.int64, copy=False)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    qp0 = query_positions[0]
    rest = query_positions[1:]
    if not rest:
        return doc_idx * _PHRASE_KEY + (flat - qp0) % _WRAP
    base_keys = doc_idx * _PHRASE_KEY + flat  # sorted: doc asc, pos asc
    ok = np.ones(total, dtype=bool)
    for qi in rest:
        want = doc_idx * _PHRASE_KEY + (flat - qp0 + qi) % _WRAP
        j = np.minimum(np.searchsorted(base_keys, want), total - 1)
        ok &= base_keys[j] == want
    return doc_idx[ok] * _PHRASE_KEY + (flat[ok] - qp0) % _WRAP


def _make_kernel(query_tokens: dict, df_global: dict, doc_count: int,
                 avgdl: float, mode: str, k: int | None, n_tags: int = 0,
                 docs_per_shard: int = 0, has_excl: bool = False,
                 after: tuple | None = None):
    """Per-shard candidate generation + scoring kernel.

    ``after=(score, doc_id)`` is an ES ``search_after`` cursor: only
    docs strictly after the cursor in the (score DESC, doc_id ASC)
    total order survive.  The filter is applied to every scored batch
    BEFORE it can enter the per-shard top-k, so the kth-score pruning
    threshold is always derived from surviving docs only — block-max
    skipping stays sound, and per-shard state stays k-bounded no matter
    how deep the page (unlike offset paging's offset+k).

    SINGLE grouped input: postings + tag + doc-length rows for this
    shard ride the same exchange (kind column discriminates).  BM25 doc
    lengths come from the shard's dense dl array ('len' row) — doc ids
    are dense per shard, so dl lookup is array indexing and the query
    plan needs no second cogroup input at all."""

    def kernel(key, groups_pdf: pd.DataFrame) -> pd.DataFrame:
        from watertower_spark.functions import codec

        BS = codec.BLOCK_SIZE
        shard = int(key[0])
        base = shard * docs_per_shard
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "shard": pd.Series(dtype="int32"),
                              "score": pd.Series(dtype="float64")})
        if groups_pdf.empty:
            return empty

        def after_keep(ids: np.ndarray, sc: np.ndarray) -> np.ndarray:
            # strictly after the cursor in (score DESC, doc_id ASC):
            # score equality is exact — the same doc reproduces the same
            # float64 under the same arithmetic, which is how the cursor
            # was produced
            a_s, a_d = after
            return (sc < a_s) | ((sc == a_s) & (ids > a_d))

        term_rows: dict = {}
        tag_blobs: list = []
        not_rows: list = []
        nottag_blobs: list = []
        dl_arr = None
        for row in groups_pdf.itertuples(index=False):
            if row.kind == "term":
                term_rows[row.name] = row
            elif row.kind == "len":
                dl_arr = np.frombuffer(row.doc_blob, dtype=np.int32)
            elif row.kind == "not":
                not_rows.append(row)
            elif row.kind == "nottag":
                nottag_blobs.append(row.doc_blob)
            else:
                tag_blobs.append(row.doc_blob)

        def dl_of(ids: np.ndarray) -> np.ndarray:
            if dl_arr is None:
                # postings without a doc_len row = an index integrity gap
                # (interrupted wave-2 write) — score degraded but LOUDLY
                import warnings

                warnings.warn(
                    "shard has postings but no doc_len row; BM25 falls "
                    "back to dl=avgdl (run resume_build to repair)"
                )
                return np.full(ids.size, avgdl, dtype="float64")
            return dl_arr[ids - base - 1].astype("float64")

        # AND semantics: every query term and every filter tag must have a
        # group row in this shard; anything absent here vetoes the shard.
        if len(term_rows) < len(query_tokens) or len(tag_blobs) < n_tags:
            return empty

        # Block-max top-k fast path: single-term BM25 with no tag filter
        # and no phrase constraint — process blocks in descending
        # upper-bound order and stop when no block can beat the kth score.
        if (
            mode == "bm25" and k is not None and not tag_blobs
            and not has_excl
            and len(query_tokens) == 1
            and len(next(iter(query_tokens.values()))) == 1
        ):
            term = next(iter(query_tokens))
            row = term_rows[term]
            df = df_global[term]
            idf = math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))
            # sound per-block upper bound under the CURRENT avgdl: BM25
            # weight is increasing in tf and decreasing in dl, so
            # (block max_tf, block min_dl) bound every posting even after
            # appends/removals drifted avgdl since pack time
            bmt = np.frombuffer(row.block_max_tf, dtype=np.int32).astype("float64")
            bmd = np.frombuffer(row.block_min_dl, dtype=np.int32).astype("float64")
            w_ub = bmt / (bmt + BM25_K1 * (1.0 - BM25_B + BM25_B * bmd / max(avgdl, 1e-9)))
            ub = idf * (BM25_K1 + 1.0) * w_ub
            order_b = np.argsort(-ub, kind="stable")
            block_off = np.frombuffer(row.block_off, dtype=np.int64)
            tf_off = np.frombuffer(row.block_tf_off, dtype=np.int64)
            top_ids = np.empty(0, dtype=np.int64)
            top_sc = np.empty(0, dtype="float64")
            kth = -np.inf
            for b in order_b:
                # strict <: a block with ub == kth can hold a TYING doc
                # with a smaller doc_id, which the deterministic
                # tie-break contract must surface
                if top_ids.size >= k and ub[b] < kth:
                    break
                ids, _ = codec.decode_doc_blocks(
                    row.doc_blob, block_off, int(row.df), np.array([b]), BS
                )
                tf = codec.decode_tf_blocks(row.tf_blob, tf_off, np.array([b]))[int(b)].astype("float64")
                dl = dl_of(ids)
                denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / max(avgdl, 1e-9))
                sc = idf * (BM25_K1 + 1.0) * tf / denom
                if after is not None:
                    m = after_keep(ids, sc)
                    ids, sc = ids[m], sc[m]
                top_ids = np.concatenate((top_ids, ids))
                top_sc = np.concatenate((top_sc, sc))
                if top_ids.size > k:
                    sel = np.lexsort((top_ids, -top_sc))[:k]
                    top_ids, top_sc = top_ids[sel], top_sc[sel]
                if top_ids.size >= k:
                    kth = top_sc.min()
            return pd.DataFrame({
                "doc_id": top_ids,
                "shard": np.full(top_ids.size, shard, dtype="int32"),
                "score": top_sc,
            })

        # Multi-term conjunctive block-max top-k (round-3 verdict #7):
        # BM25 AND with no tag filter.  Classic block-max WAND driven by
        # the SMALLEST list: its blocks are visited in descending
        # optimistic-bound order (own block ub + Σ other terms' global
        # max ub), each refined against the other terms' overlapping
        # blocks' (block_max_tf, block_min_dl) bounds, and skipped with
        # NO doc/tf/position decode once no remaining block can beat
        # the kth score.  The phrase filter only removes candidates, so
        # pruning by score upper bound before it is sound for top-k;
        # bounds derive from the same sidecars as the single-term path
        # and stay sound under avgdl drift.
        if (
            mode == "bm25" and k is not None and not tag_blobs
            and not has_excl
            and len(query_tokens) >= 2
        ):
            terms_by_df = sorted(term_rows, key=lambda t: int(term_rows[t].df))
            drv, others = terms_by_df[0], terms_by_df[1:]
            meta: dict = {}
            for t in terms_by_df:
                r = term_rows[t]
                dfg = df_global[t]
                idf = math.log(1.0 + (doc_count - dfg + 0.5) / (dfg + 0.5))
                bmt = np.frombuffer(r.block_max_tf, dtype=np.int32).astype("float64")
                bmd = np.frombuffer(r.block_min_dl, dtype=np.int32).astype("float64")
                ub = idf * (BM25_K1 + 1.0) * bmt / (
                    bmt + BM25_K1 * (1.0 - BM25_B + BM25_B * bmd / max(avgdl, 1e-9))
                )
                poff = np.frombuffer(r.block_pos_off, dtype=np.int64)
                meta[t] = dict(
                    row=r, idf=idf, ub=ub, df=int(r.df),
                    bl=np.frombuffer(r.block_last, dtype=np.int64),
                    boff=np.frombuffer(r.block_off, dtype=np.int64),
                    toff=np.frombuffer(r.block_tf_off, dtype=np.int64),
                    poff=poff,
                    pend=np.concatenate((poff[1:], [len(r.pos_blob)])).astype(np.int64),
                    ids={}, tfs={}, pos={},
                )

            def _ids(t, b):
                m = meta[t]
                got = m["ids"].get(b)
                if got is None:
                    got, _ = codec.decode_doc_blocks(
                        m["row"].doc_blob, m["boff"], m["df"], np.array([b]), BS
                    )
                    m["ids"][b] = got
                return got

            def _tf(t, b):
                m = meta[t]
                got = m["tfs"].get(b)
                if got is None:
                    got = codec.decode_tf_blocks(
                        m["row"].tf_blob, m["toff"], np.array([b])
                    )[b]
                    m["tfs"][b] = got
                return got

            def _pos(t, b):
                m = meta[t]
                got = m["pos"].get(b)
                if got is None:
                    got = codec.decode_position_block(
                        m["row"].pos_blob, int(m["poff"][b]), int(m["pend"][b]),
                        min(BS, m["df"] - b * BS),
                    )
                    m["pos"][b] = got
                return got

            dm = meta[drv]
            loose = dm["ub"] + sum(float(meta[t]["ub"].max()) for t in others)
            order_b = np.argsort(-loose, kind="stable")
            top_ids = np.empty(0, dtype=np.int64)
            top_sc = np.empty(0, dtype="float64")
            kth = -np.inf
            for b in order_b:
                b = int(b)
                # strict <: a tying block can hold a smaller-doc_id tie
                # the deterministic tie-break contract must surface
                if top_ids.size >= k and loose[b] < kth:
                    break
                lo_id = int(dm["bl"][b - 1]) + 1 if b else 0
                hi_id = int(dm["bl"][b])
                bound = float(dm["ub"][b])
                feasible = True
                spans = []
                for t in others:
                    blt = meta[t]["bl"]
                    j0 = int(np.searchsorted(blt, lo_id))
                    if j0 >= blt.size:
                        feasible = False  # no overlap ⇒ empty intersection
                        break
                    j1 = min(int(np.searchsorted(blt, hi_id)), blt.size - 1)
                    spans.append((t, j0, j1))
                    bound += float(meta[t]["ub"][j0:j1 + 1].max())
                if not feasible:
                    continue
                if top_ids.size >= k and bound < kth:
                    continue  # refined bound prunes; looser blocks may follow
                cand = _ids(drv, b)
                for t, _j0, _j1 in spans:
                    if cand.size == 0:
                        break
                    blt = meta[t]["bl"]
                    needed = np.unique(np.searchsorted(blt, cand))
                    needed = needed[needed < blt.size]
                    ids_t = (
                        np.concatenate([_ids(t, int(j)) for j in needed])
                        if needed.size else np.empty(0, dtype=np.int64)
                    )
                    cand = cand[np.isin(cand, ids_t, assume_unique=True)]
                if cand.size == 0:
                    continue
                # phrase filter on the survivors (search.go:97-99 applies
                # whenever the query has tokens) — batched per unique
                # block (see _phrase_rel_keys; the per-doc loop was the
                # dominant phrase cost)
                keys = None
                for t in terms_by_df:
                    qp = query_tokens[t]
                    m = meta[t]
                    blocks_t = np.searchsorted(m["bl"], cand)
                    pos_lists = [None] * cand.size
                    for bt in np.unique(blocks_t).tolist():
                        sel = np.nonzero(blocks_t == bt)[0]
                        offs_b = np.searchsorted(_ids(t, bt), cand[sel])
                        lists_b = _pos(t, bt)
                        for s_, o_ in zip(sel.tolist(), offs_b.tolist()):
                            pos_lists[s_] = lists_b[o_]
                    tk = _phrase_rel_keys(pos_lists, qp)
                    keys = tk if keys is None else keys[np.isin(keys, tk)]
                    if keys.size == 0:
                        break
                if keys is None or keys.size == 0:
                    continue
                cand = cand[np.unique(keys // _PHRASE_KEY)]
                dl = dl_of(cand)
                sc = np.zeros(cand.size, dtype="float64")
                for t in terms_by_df:
                    m = meta[t]
                    blocks_t = np.searchsorted(m["bl"], cand)
                    tf = np.empty(cand.size, dtype="float64")
                    for bt in np.unique(blocks_t).tolist():
                        sel = blocks_t == bt
                        tf[sel] = _tf(t, bt)[
                            np.searchsorted(_ids(t, bt), cand[sel])
                        ]
                    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / max(avgdl, 1e-9))
                    sc += m["idf"] * (BM25_K1 + 1.0) * tf / denom
                if after is not None:
                    keep_a = after_keep(cand, sc)
                    cand, sc = cand[keep_a], sc[keep_a]
                    if cand.size == 0:
                        continue
                top_ids = np.concatenate((top_ids, cand))
                top_sc = np.concatenate((top_sc, sc))
                if top_ids.size > k:
                    sel = np.lexsort((top_ids, -top_sc))[:k]
                    top_ids, top_sc = top_ids[sel], top_sc[sel]
                if top_ids.size >= k:
                    kth = top_sc.min()
            return pd.DataFrame({
                "doc_id": top_ids,
                "shard": np.full(top_ids.size, shard, dtype="int32"),
                "score": top_sc,
            })

        # Seed candidates from the smallest AND-group (int.go:8-10's
        # smallest-first strategy), then block-skip through the others:
        # only blocks whose [first, block_last] range can contain a
        # remaining candidate are decoded at all.
        term_decoded: dict = {}  # term -> (ids, posting_idx)
        order = sorted(
            [("term", t, int(r.df)) for t, r in term_rows.items()]
            + [("tag", i, 0) for i in range(len(tag_blobs))],
            key=lambda x: x[2] if x[0] == "term" else len(tag_blobs[x[1]]),
        )
        cand = None
        for kind_, name, _df in order:
            if cand is not None and cand.size == 0:
                return empty
            if kind_ == "tag":
                ids = codec.decode_sorted(tag_blobs[name])
                cand = ids if cand is None else cand[np.isin(cand, ids, assume_unique=True)]
                continue
            row = term_rows[name]
            block_off = np.frombuffer(row.block_off, dtype=np.int64)
            if cand is None:
                ids, pidx = codec.decode_doc_blocks(
                    row.doc_blob, block_off, int(row.df),
                    np.arange(block_off.size), BS,
                )
                cand = ids
            else:
                block_last = np.frombuffer(row.block_last, dtype=np.int64)
                needed = np.unique(np.searchsorted(block_last, cand, side="left"))
                needed = needed[needed < block_last.size]
                ids, pidx = codec.decode_doc_blocks(
                    row.doc_blob, block_off, int(row.df), needed, BS
                )
                cand = cand[np.isin(cand, ids, assume_unique=True)]
            term_decoded[name] = (ids, pidx)
        if cand is None or cand.size == 0:
            return empty

        # must_not exclusion (ES bool semantics, flagged extension —
        # the reference DSL is conjunctive-only): docs carrying ANY
        # excluded term/tag leave the candidate set before the phrase
        # filter, scoring and top-k, so exclusion can never be undone
        # by a later stage.  Excluded-term postings decode ONLY the
        # blocks whose id range overlaps a surviving candidate (same
        # block-skip as the AND intersection); an excluded term/tag
        # absent from this shard excludes nothing here.
        if not_rows or nottag_blobs:
            excl_parts = [codec.decode_sorted(b) for b in nottag_blobs]
            for r in not_rows:
                boff = np.frombuffer(r.block_off, dtype=np.int64)
                blast = np.frombuffer(r.block_last, dtype=np.int64)
                needed = np.unique(np.searchsorted(blast, cand, side="left"))
                needed = needed[needed < blast.size]
                if needed.size == 0:
                    continue
                ids, _ = codec.decode_doc_blocks(
                    r.doc_blob, boff, int(r.df), needed, BS
                )
                excl_parts.append(ids)
            if excl_parts:
                ex = np.unique(np.concatenate(excl_parts))
                cand = cand[~np.isin(cand, ex, assume_unique=True)]
                if cand.size == 0:
                    return empty

        def posting_locs(term, c):
            """candidates → (block, offset-within-block) posting coords."""
            ids, pidx = term_decoded[term]
            gp = pidx[np.searchsorted(ids, c)]
            return gp // BS, gp % BS

        # Phrase filter (search.go:97-99: applied whenever the query has
        # tokens): decode ONLY the position blocks holding candidates.
        # A single-term query whose term occurs once in the query string
        # cannot reject any candidate (relative positions are non-empty
        # iff the doc contains the term, which intersection guarantees) —
        # skip the position decode entirely.
        phrase_needed = query_tokens and not (
            len(query_tokens) == 1
            and len(next(iter(query_tokens.values()))) == 1
        )
        if phrase_needed:
            # batched phrase algebra: per term, decode only the blocks
            # holding candidates, gather each candidate's position array
            # (list indexing only — no per-doc numpy calls), then
            # intersect the per-term relative-start key streams in one
            # vectorized pass (_phrase_rel_keys)
            keys = None
            for term, qp in query_tokens.items():
                row = term_rows[term]
                blocks, offs = posting_locs(term, cand)
                pos_off = np.frombuffer(row.block_pos_off, dtype=np.int64)
                pos_end = np.concatenate((pos_off[1:], [len(row.pos_blob)])).astype(np.int64)
                df_t = int(row.df)
                cache = {
                    int(b): codec.decode_position_block(
                        row.pos_blob, int(pos_off[int(b)]), int(pos_end[int(b)]),
                        min(BS, df_t - int(b) * BS),
                    )
                    for b in np.unique(blocks)
                }
                pos_lists = [
                    cache[b][o] for b, o in zip(blocks.tolist(), offs.tolist())
                ]
                tk = _phrase_rel_keys(pos_lists, qp)
                keys = tk if keys is None else keys[np.isin(keys, tk)]
                if keys.size == 0:
                    return empty
            cand = cand[np.unique(keys // _PHRASE_KEY)]

        # Scoring — tf decoded per needed block only
        scores = np.zeros(cand.size, dtype="float64")
        if query_tokens:
            dl = dl_of(cand) if mode == "bm25" else None
            for term in query_tokens:
                row = term_rows[term]
                blocks, offs = posting_locs(term, cand)
                tf_off = np.frombuffer(row.block_tf_off, dtype=np.int64)
                uniq, inv = np.unique(blocks, return_inverse=True)
                tf_blocks = codec.decode_tf_blocks(row.tf_blob, tf_off, uniq)
                # gather per unique block, not per candidate: the old
                # per-doc genexpr was O(cand) Python iterations for a
                # head-term query (tens of thousands per shard)
                tf = np.empty(cand.size, dtype="float64")
                for i, b in enumerate(uniq.tolist()):
                    sel = inv == i
                    tf[sel] = tf_blocks[b][offs[sel]]
                df = df_global[term]
                if mode == "bm25":
                    idf = math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))
                    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / max(avgdl, 1e-9))
                    scores += idf * (BM25_K1 + 1.0) * tf / denom
                else:
                    # tfIdfScore (search.go:182-188); tf>0 always here
                    scores += (1.0 + np.log(tf)) * math.log(doc_count / df)

        if after is not None and mode == "bm25":
            keep_a = after_keep(cand.astype("int64"), scores)
            cand, scores = cand[keep_a], scores[keep_a]
        out = pd.DataFrame({"doc_id": cand.astype("int64"),
                            "shard": np.full(cand.size, shard, dtype="int32"),
                            "score": scores})
        if k is not None and mode == "bm25" and len(out) > k:
            out = out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        return out

    return kernel


class SearchEngine:
    """Loads a built index and answers searches as DataFrames.

    Instances snapshot the manifest and memoize term statistics at load;
    after mutating the index (append/remove/upsert), create a fresh
    SearchEngine rather than reusing one built against the old snapshot.
    """

    def __init__(self, spark: SparkSession, index_dir: str):
        from watertower_spark.session import ensure_executors_can_import

        ensure_executors_can_import(spark)
        self.spark = spark
        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir)
        from .index_build import FORMAT_VERSION

        got = self.manifest.get("format_version")
        if got != FORMAT_VERSION:
            raise ValueError(
                f"index at {index_dir} has format_version={got}, "
                f"engine expects {FORMAT_VERSION} — rebuild the index"
            )
        from watertower_spark.functions import fsio

        from .index_build import table_path

        from .index_build import DOC_LEN_SCHEMA, POSTING_SCHEMA, TAG_SCHEMA

        def _read_tbl(path: str, schema: str):
            """Read an index table; a dir that EXISTS but holds zero
            parquet files (a zero-doc index: created empty, or a
            delete_by_query that removed every doc) falls back to an
            empty frame with the table's canonical schema so the engine
            loads and serves empty results.  A MISSING dir still raises
            — that's a broken index, not an empty one."""
            from pyspark.errors import AnalysisException

            try:
                return spark.read.parquet(path)
            except AnalysisException:
                if not fsio.exists(path):
                    raise
                return spark.createDataFrame([], schema)

        self.postings = _read_tbl(f"{index_dir}/postings", POSTING_SCHEMA)
        self.doc_stats = _read_tbl(f"{index_dir}/doc_stats",
                                   "doc_id long, wc int, twc int, shard int")
        self.doc_len = _read_tbl(f"{index_dir}/doc_len", DOC_LEN_SCHEMA)
        self.doc_store = _read_tbl(
            f"{index_dir}/doc_store",
            "url string, warc_ts timestamp, text string, lang string, "
            "doc_id long, shard int",
        )
        self.tags = (
            _read_tbl(f"{index_dir}/tags", TAG_SCHEMA)
            if self.manifest.get("has_tags") else None
        )
        # replaced tables resolve through the manifest's versioned
        # pointers (object-store-safe publish; see maintenance)
        ts_path = table_path(index_dir, self.manifest, "term_stats")
        self.term_stats = (
            _read_tbl(ts_path, "term string, df long, cf long, "
                               "shards array<int>, tb int")
            if fsio.exists(ts_path) else None
        )
        self._doc_map_path = table_path(index_dir, self.manifest, "doc_map")
        self._stats_cache: dict = {}
        # LOUD integrity check at load, DRIVER-side (round-3 verdict #4 /
        # ADVICE: the executor-kernel warning lands in Python-worker
        # stderr a user never reads while results silently mis-score).
        # A shard with postings but no doc_len row means an interrupted
        # wave-2 write: BM25 would fall back to dl=avgdl there.  Expose
        # the shard list; raising is left to the caller so a service can
        # choose to serve degraded while resume_build repairs.
        have_p = set(fsio.list_shard_dirs(f"{index_dir}/postings"))
        have_l = set(fsio.list_shard_dirs(f"{index_dir}/doc_len"))
        self.degraded_shards = sorted(have_p - have_l)
        if self.degraded_shards:
            import warnings

            warnings.warn(
                f"index at {index_dir} is DEGRADED: shards "
                f"{self.degraded_shards} have postings but no doc_len — "
                f"BM25 scores there fall back to dl=avgdl; run "
                f"resume_build to repair",
                stacklevel=2,
            )

    @staticmethod
    def _shard_in(shards) -> "F.Column":
        """``shard IN (…)`` as ONE SQL expression.  ``Column.isin``
        issues a py4j round trip per literal — a 65-shard candidate set
        cost ~100 ms of driver socket chatter per query (profiled r06:
        ~1,230 py4j commands per search() call, isin the largest
        single contributor).  Values are ints, so string embedding is
        injection-safe and yields the identical In(shard, …) predicate.
        Every call site guards against an empty set; belt-and-braces,
        an empty set compiles to FALSE rather than invalid SQL."""
        if not shards:
            return F.lit(False)
        return F.expr("shard IN (" + ",".join(str(int(s)) for s in shards) + ")")

    def _const_cols(self, key: str, builder) -> list:
        """Memoized constant Column lists (the kind/name/null-blob
        projections are identical for every query this engine answers;
        Columns are immutable, so building them once removes ~30 py4j
        round trips per part per query)."""
        cache = self.__dict__.setdefault("_cc", {})
        cols = cache.get(key)
        if cols is None:
            cols = cache[key] = builder()
        return cols

    def _empty_result(self) -> DataFrame:
        """Memoized empty (doc_id, shard, score) frame — ``search()``
        built a fresh one on EVERY call (a py4j/schema round trip paid
        even by queries that return rows); DataFrames are immutable, so
        one instance serves every query this engine answers."""
        e = self.__dict__.get("_empty_df")
        if e is None:
            e = self._empty_df = self.spark.createDataFrame([], RESULT_SCHEMA)
        return e

    def _kernel_partitions(self, cand_shards=None) -> int:
        """Explicit partition count for the grouped kernel exchange.

        AQE's byte-based partition coalescing sees only the few MB of
        posting/tag blobs a query touches and collapses the kernel's
        exchange to ONE partition, serializing every shard group
        through a single Python worker (measured r06: the sf1.0 kernel
        stage ran as one ~380 ms task instead of 32 parallel ones; the
        same trap CLAUDE.md pins for the build's Python-CPU stages).  A
        user-specified repartition N is exempt from coalescing, so the
        kernel exchange is pinned to the candidate fan-out capped by
        the LIVE parallelism — scale-adaptive, never a constant."""
        n_groups = (len(cand_shards) if cand_shards
                    else int(self.manifest.get("n_shards") or 1))
        return max(1, min(int(n_groups),
                          self.spark.sparkContext.defaultParallelism))

    def _resolve_terms(self, terms: list) -> dict:
        """term → (df, shard list) from the global term_stats table,
        memoized driver-side (absent terms cached as None).  Falls back
        to a per-query aggregation for pre-term_stats indexes."""
        missing = [t for t in terms if t not in self._stats_cache]
        if missing:
            if self.term_stats is not None:
                rows = self.term_stats.where(F.col("term").isin(missing)).collect()
            else:
                rows = (
                    self.postings.where(F.col("term").isin(missing))
                    .groupBy("term")
                    .agg(F.sum("df").alias("df"), F.collect_set("shard").alias("shards"))
                    .collect()
                )
            found = {r["term"]: (int(r["df"]), list(r["shards"])) for r in rows}
            for t in missing:
                self._stats_cache[t] = found.get(t)
        return {t: self._stats_cache[t] for t in terms}

    # ------------------------------------------------------------- search

    def search(
        self,
        search_word: str,
        tags: list | None = None,
        lang: str = "",
        mode: str = "parity",
        k: int | None = None,
        materialize: bool = True,
        operator: str = "and",
        offset: int = 0,
        exclude_words: str = "",
        exclude_tags: list | None = None,
        search_after: tuple | None = None,
        ranges: dict | None = None,
    ) -> DataFrame:
        """Reference Search() semantics (mode='parity') or BM25 top-k
        (mode='bm25').  ``operator='or'`` (bm25 only, no tags/phrase)
        switches to disjunctive top-k with vectorized maxscore pruning.
        Returns a DataFrame ordered by the mode's contract.

        ``offset`` pages BM25 results ES-style (``from``/``size``):
        page n of size k is ``k=k, offset=n*k``.  The per-shard kernels
        keep offset+k candidates (deep paging costs what it costs —
        the standard ES trade) and the global offset/limit slices the
        merged order; determinism comes from the (score DESC, doc_id
        ASC) total order.  Parity mode is unbounded by contract and
        ignores offset.

        ``search_word`` starting with ``unique_key:`` switches to the
        reference's exact-key lookup path (webapi/restapi/handlers.go:
        100-145): the remainder is the unique key (our url), matched
        exactly, bypassing analysis and scoring entirely.

        ``exclude_words`` / ``exclude_tags`` are ES ``bool.must_not``
        semantics (flagged extension — the reference DSL is conjunctive-
        only): a doc carrying ANY excluded analyzed term or ANY excluded
        tag is removed from the match set before phrase filtering,
        scoring and top-k.  A term that is both required and excluded
        yields the empty result (nothing can satisfy both); excluded
        terms/tags absent from the index exclude nothing.

        ``search_after=(score, doc_id)`` is the ES deep-paging cursor
        (flagged extension): return the next ``k`` docs STRICTLY after
        the cursor in the (score DESC, doc_id ASC) total order.  Unlike
        ``offset`` (whose per-shard kernels must keep offset+k
        candidates), the cursor keeps per-shard state k-bounded at any
        depth — page 10^6 costs the same as page 1 — which is why ES
        itself deprecates deep from/size in favor of search_after.  The
        cursor values are exactly the previous page's last (score,
        internal doc_id); bm25 mode with k only, mutually exclusive
        with ``offset``.

        ``ranges`` is the ES ``range`` filter clause (flagged
        extension): ``{field: {gte|gt|lte|lt: value}}`` over doc_store
        columns (``warc_ts``, ``url``, ``lang``, passthrough extras).
        Non-scoring ES filter semantics: a doc outside EVERY range
        leaves the match set before phrase filtering, scoring and
        top-k.  Physically the in-range doc set rides the SAME grouped
        exchange as a synthetic per-shard tag row (the kernel's
        conjunctive tag intersection applies unchanged), so the filter
        costs one predicate-pushed doc_store column scan restricted to
        candidate shards — never a second cogroup or a driver
        round-trip.
        """
        if search_after is not None:
            if mode != "bm25" or k is None:
                raise ValueError("search_after requires mode='bm25' and k")
            if offset:
                raise ValueError("search_after and offset (from) are "
                                 "mutually exclusive")
            search_after = (float(search_after[0]), int(search_after[1]))
        if search_word and search_word.startswith("unique_key:"):
            return self.find_by_key(search_word[len("unique_key:"):])
        if ranges:
            self._compile_ranges(ranges)  # validate loudly up front
        if operator == "or":
            if mode != "bm25":
                raise ValueError("operator='or' supports mode='bm25' only")
            return self._search_or(search_word, list(tags or []), lang,
                                   k or 10, materialize, offset=offset,
                                   exclude_words=exclude_words,
                                   exclude_tags=exclude_tags,
                                   search_after=search_after,
                                   ranges=ranges)
        from watertower_spark.analyzers import analyze_query

        spark = self.spark
        default_lang = self.manifest.get("default_lang") or ""
        analyzer_lang = self.manifest.get("analyzer_lang")
        query_tokens = analyze_query(
            search_word, analyzer_lang or lang, default_lang
        ) if search_word else {}
        tags = list(tags or [])
        exclude_tags = list(exclude_tags or [])
        excl_tokens = analyze_query(
            exclude_words, analyzer_lang or lang, default_lang
        ) if exclude_words else {}

        empty = self._empty_result()
        if not query_tokens and not tags and not ranges:
            return self._materialize(empty, mode, bounded=True) if materialize else empty
        if set(excl_tokens) & set(query_tokens) or (set(exclude_tags) & set(tags)):
            # a required term/tag is also excluded ⇒ nothing can match
            return self._materialize(empty, mode, bounded=True) if materialize else empty

        terms = sorted(query_tokens)

        # global df per term + candidate shard set from the memoized
        # term_stats lookup (zero jobs for warm terms)
        df_global: dict = {}
        cand_shards: set = set()
        sel = None
        if terms:
            resolved = self._resolve_terms(terms)
            if any(resolved[t] is None for t in terms):
                # some term matches nothing anywhere → AND result is empty
                return self._materialize(empty, mode, bounded=True) if materialize else empty
            for t in terms:
                df_global[t] = resolved[t][0]
                cand_shards.update(resolved[t][1])
            # AND candidates live only in shards where EVERY term appears
            and_shards = set(resolved[terms[0]][1])
            for t in terms[1:]:
                and_shards &= set(resolved[t][1])
            if not and_shards:
                # no shard contains every query term ⇒ no doc can either
                return self._materialize(empty, mode, bounded=True) if materialize else empty
            cand_shards = and_shards
            sel = self.postings.where(
                F.col("term").isin(terms)
                & self._shard_in(and_shards)
            )

        parts = []
        if sel is not None:
            parts.append(
                sel.select(*self._const_cols("p_term", lambda: [
                    F.lit("term").alias("kind"), F.col("term").alias("name"),
                    F.col("shard"), F.col("df"), F.col("doc_blob"),
                    F.col("tf_blob"), F.col("pos_blob"), F.col("block_off"),
                    F.col("block_last"), F.col("block_tf_off"),
                    F.col("block_pos_off"), F.col("block_max_tf"),
                    F.col("block_min_dl")]))
            )
        if tags:
            if self.tags is None:
                return self._materialize(empty, mode, bounded=True) if materialize else empty
            # no global existence check needed: a tag absent from a shard
            # vetoes that shard in the kernel, so a tag absent everywhere
            # yields the empty result without an extra driver job
            tag_sel = self.tags.where(F.col("tag").isin(tags))
            parts.append(
                tag_sel.select(*self._const_cols("p_tag", lambda: [
                    F.lit("tag").alias("kind"), F.col("tag").alias("name"),
                    F.col("shard"), F.col("n").alias("df"), F.col("doc_blob")]
                    + self._const_cols("p_nulls", _null_blob_cols)))
            )
        if ranges:
            # the in-range doc set rides the exchange as ONE synthetic
            # tag row per shard — the kernel's conjunctive tag
            # intersection (and shard veto for shards with no in-range
            # docs) applies unchanged
            rng = self._range_rows(ranges,
                                   cand_shards if terms else None)
            parts.append(
                rng.select(*self._const_cols("p_range", lambda: [
                    F.lit("tag").alias("kind"),
                    F.lit("\x00range").alias("name"),
                    F.col("shard"), F.col("n").alias("df"), F.col("doc_blob")]
                    + self._const_cols("p_nulls", _null_blob_cols)))
            )
        # must_not inputs ride the SAME exchange: excluded-term postings
        # as kind='not' rows (shard-restricted to the AND candidate set —
        # exclusion only matters where candidates can live) and excluded
        # tags as kind='nottag' rows.  Terms/tags absent from the index
        # resolve to nothing and exclude nothing.
        has_excl = False
        excl_terms = sorted(excl_tokens)
        if excl_terms:
            eres = self._resolve_terms(excl_terms)
            present = [t for t in excl_terms if eres[t] is not None]
            if terms:  # restrict to shards where candidates exist
                present = [
                    t for t in present
                    if set(eres[t][1]) & cand_shards
                ]
            if present:
                has_excl = True
                not_sel = self.postings.where(F.col("term").isin(present))
                if terms:
                    not_sel = not_sel.where(
                        self._shard_in(cand_shards)
                    )
                parts.append(
                    not_sel.select(*self._const_cols("p_not", lambda: [
                        F.lit("not").alias("kind"), F.col("term").alias("name"),
                        F.col("shard"), F.col("df"), F.col("doc_blob"),
                        F.col("tf_blob"), F.col("pos_blob"), F.col("block_off"),
                        F.col("block_last"), F.col("block_tf_off"),
                        F.col("block_pos_off"), F.col("block_max_tf"),
                        F.col("block_min_dl")]))
                )
        if exclude_tags and self.tags is not None:
            has_excl = True
            nottag_sel = self.tags.where(F.col("tag").isin(exclude_tags))
            parts.append(
                nottag_sel.select(*self._const_cols("p_nottag", lambda: [
                    F.lit("nottag").alias("kind"), F.col("tag").alias("name"),
                    F.col("shard"), F.col("n").alias("df"), F.col("doc_blob")]
                    + self._const_cols("p_nulls", _null_blob_cols)))
            )
        # BM25 needs per-doc lengths: the shard's dense dl array rides the
        # SAME exchange as the postings (kind='len' row, partition-pruned
        # to candidate shards) — no second cogroup input, no doc_stats
        # scan at query time.
        if mode == "bm25" and terms and cand_shards:
            len_sel = self.doc_len.where(
                self._shard_in(cand_shards)
            )
            parts.append(
                len_sel.select(*self._const_cols("p_len", lambda: [
                    F.lit("len").alias("kind"), F.lit("").alias("name"),
                    F.col("shard"), F.col("n").alias("df"),
                    F.col("dl_blob").alias("doc_blob")]
                    + self._const_cols("p_nulls", _null_blob_cols)))
            )
        groups_df = parts[0]
        for p in parts[1:]:
            groups_df = groups_df.unionByName(p)

        # per-tag global presence already checked; per-shard AND happens in
        # the kernel.  Tags present globally but absent in a shard must veto
        # that shard: pass expected tag count via closure.
        k_eff = (k + offset) if (k is not None and mode == "bm25") else k
        kernel = _make_kernel(
            query_tokens, df_global, int(self.manifest["doc_count"]),
            float(self.manifest["avgdl"]), mode, k_eff,
            n_tags=len(set(tags)) + (1 if ranges else 0),
            docs_per_shard=int(self.manifest["docs_per_shard"]),
            has_excl=has_excl,
            after=search_after if mode == "bm25" else None,
        )
        results = groups_df.repartition(
            self._kernel_partitions(cand_shards), "shard"
        ).groupBy("shard").applyInPandas(
            kernel, schema=RESULT_SCHEMA
        )

        if mode == "bm25":
            results = results.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            if offset:
                results = results.offset(offset)
            if k is not None:
                results = results.limit(k)
        else:
            results = results.orderBy(F.col("score").asc(), F.col("doc_id").asc())
        return self._materialize(results, mode, bounded=k is not None) if materialize else results

    def find_by_key(self, url: str) -> DataFrame:
        """Exact unique-key lookup (Q10; FindDocumentByKey,
        database.go:561-583): url → the one document, or empty.

        KV-get shape, not a join: resolve doc_id from doc_map (driver-side
        point filter — parquet min/max row-group pruning applies since
        doc_map files are written in url-ranged groups), then read ONE
        doc_store shard partition pruned by both shard and doc_id.
        Returns the materialized result schema with score 0.0 (the
        reference path carries no score)."""
        spark = self.spark
        dps = int(self.manifest["docs_per_shard"])
        hit = (
            spark.read.parquet(self._doc_map_path)
            .where(F.col("url") == url).limit(1).collect()
        )
        if not hit:
            return self.doc_store.where(F.lit(False)).select(
                "doc_id", "url", F.lit(0.0).alias("score"), "text", "lang",
                *self._extra_doc_cols()
            )
        doc_id = int(hit[0]["doc_id"])
        shard = (doc_id - 1) // dps
        return (
            self.doc_store
            .where((F.col("shard") == shard) & (F.col("doc_id") == doc_id))
            .select("doc_id", "url", F.lit(0.0).alias("score"), "text", "lang",
                    *self._extra_doc_cols())
        )

    def get_doc(self, doc_id: int | str) -> DataFrame:
        """Fetch one document by docID — the reference's
        GET /indexes/{index}/_doc/{id} (webapi/restapi/handlers.go:24-56),
        where ids are rendered `d` + lowercase hex (entity.go:26-33);
        both the int and the `d<hex>` string form are accepted.  One
        shard-pruned doc_store read, no analysis, score 0."""
        if isinstance(doc_id, str):
            if not doc_id.startswith("d"):
                raise ValueError(f"document id {doc_id!r} must be 'd' + hex")
            doc_id = int(doc_id[1:], 16)
        doc_id = int(doc_id)
        dps = int(self.manifest["docs_per_shard"])
        shard = (doc_id - 1) // dps
        return (
            self.doc_store
            .where((F.col("shard") == shard) & (F.col("doc_id") == doc_id))
            .select("doc_id", "url", F.lit(0.0).alias("score"), "text", "lang",
                    *self._extra_doc_cols())
        )

    def get_docs(self, doc_ids: list) -> DataFrame:
        """Batch fetch by docID — ES ``_mget`` (flagged extension; the
        reference serves one GET ``_doc/{id}`` per request,
        handlers.go:16-56).  N ids resolve in ONE shard-pruned doc_store
        read: ids map to shards arithmetically (dense per-shard
        allocation), so the scan prunes to exactly the touched shard
        partitions and the isin filter pushes into parquet — never one
        job per id.  Accepts int or ``d<hex>`` forms; missing ids simply
        produce no row (the HTTP layer restores request order and emits
        found=false)."""
        ids = []
        for d in doc_ids:
            if isinstance(d, str):
                if not d.startswith("d"):
                    raise ValueError(f"document id {d!r} must be 'd' + hex")
                d = int(d[1:], 16)
            ids.append(int(d))
        if not ids:
            return self.doc_store.where(F.lit(False)).select(
                "doc_id", "url", F.lit(0.0).alias("score"), "text", "lang",
                *self._extra_doc_cols())
        dps = int(self.manifest["docs_per_shard"])
        shards = sorted({(i - 1) // dps for i in ids})
        return (
            self.doc_store
            .where(F.col("shard").isin(shards) & F.col("doc_id").isin(ids))
            .select("doc_id", "url", F.lit(0.0).alias("score"), "text", "lang",
                    *self._extra_doc_cols())
        )

    def delete_by_query(self, search_word: str, tags: list | None = None,
                        lang: str = "", exclude_words: str = "",
                        exclude_tags: list | None = None,
                        ranges: dict | None = None) -> int:
        """ES ``_delete_by_query`` (flagged extension; the reference
        deletes one id per DELETE, handlers.go:240-258).  The parity
        match set — unbounded conjunctive AND + phrase filter, optional
        must_not exclusion — becomes the victim relation of ONE
        ``remove_documents`` mutation: (doc_id, shard) results join
        doc_map for urls and flow straight into the mutation's victim
        snapshot write, so the match set NEVER materializes on the
        driver (a head-term delete over a 10^12-doc corpus stays a
        distributed plan end to end).  Returns the number of documents
        removed; an empty query (no words, no tags) matches nothing and
        deletes nothing.  Takes the index's single-writer lease like
        every mutation (IndexLockedError when held elsewhere)."""
        from .maintenance import remove_documents

        res = self.search(search_word, tags, lang=lang, mode="parity",
                          materialize=False, exclude_words=exclude_words,
                          exclude_tags=exclude_tags, ranges=ranges)
        doc_map = self.spark.read.parquet(self._doc_map_path)
        urls = doc_map.join(res.select("doc_id"), "doc_id").select("url")
        before = int(self.manifest["doc_count"])
        m2 = remove_documents(self.spark, self.index_dir, urls)
        return before - int(m2["doc_count"])

    def _search_or(self, search_word: str, tags: list, lang: str, k: int,
                   materialize: bool, offset: int = 0,
                   exclude_words: str = "",
                   exclude_tags: list | None = None,
                   search_after: tuple | None = None,
                   ranges: dict | None = None) -> DataFrame:
        """Disjunctive BM25 top-k (operators/wand.py kernel); filter tags
        stay conjunctive (ES bool-filter semantics); ``exclude_words``/
        ``exclude_tags`` apply ES ``bool.must_not`` exclusion at posting-
        decode time (before the maxscore θ bootstrap, so pruning stays
        exact over the excluded corpus)."""
        from watertower_spark.analyzers import analyze_query

        spark = self.spark
        default_lang = self.manifest.get("default_lang") or ""
        analyzer_lang = self.manifest.get("analyzer_lang")
        query_tokens = analyze_query(
            search_word, analyzer_lang or lang, default_lang
        ) if search_word else {}
        excl_tokens = analyze_query(
            exclude_words, analyzer_lang or lang, default_lang
        ) if exclude_words else {}
        exclude_tags = list(exclude_tags or [])
        # an excluded term knocks itself out of the scored disjunction:
        # any doc containing it is excluded, so it can never contribute
        query_tokens = {t: p for t, p in query_tokens.items()
                        if t not in excl_tokens}
        empty = self._empty_result()
        if not query_tokens or (tags and self.tags is None) \
                or (set(exclude_tags) & set(tags)):
            return self._materialize(empty, "bm25", bounded=True) if materialize else empty

        terms = sorted(query_tokens)
        resolved = self._resolve_terms(terms)
        df_global = {t: v[0] for t, v in resolved.items() if v is not None}
        cand_shards: set = set()
        for v in resolved.values():
            if v is not None:
                cand_shards.update(v[1])
        if not df_global:  # no query term exists anywhere (OR → empty)
            return self._materialize(empty, "bm25", bounded=True) if materialize else empty
        excl_terms = None
        if excl_tokens:
            eres = self._resolve_terms(sorted(excl_tokens))
            excl_terms = [
                t for t, v in eres.items()
                if v is not None and set(v[1]) & cand_shards
            ] or None
        return self._run_or(query_tokens, df_global, cand_shards, tags, k,
                            materialize, offset=offset,
                            excl_terms=excl_terms,
                            excl_tags=exclude_tags or None,
                            search_after=search_after,
                            ranges=ranges)

    def search_prefix(self, prefix: str, tags: list | None = None,
                      k: int = 10, max_expansions: int = 50,
                      materialize: bool = True, offset: int = 0) -> DataFrame:
        """Prefix (``term*``) BM25 top-k — the Lucene/ES prefix query
        re-expressed for the sharded index; the reference engine has no
        wildcard path (int.go is exact-term conjunctive only), so this is
        a flagged extension using the same posting machinery.

        Expansion happens against the TERM DICTIONARY, never the corpus:
        term_stats holds one row per distinct term (tiny vs postings), so
        the prefix scan is a narrow filter over it, capped at
        ``max_expansions`` terms by (df DESC, term ASC) — deterministic,
        preferring the terms that match the most documents, like ES's
        ``top_terms_N`` rewrite.  The expanded set then runs through the
        disjunctive maxscore kernel exactly as ``operator='or'`` (each
        matched doc scored by BM25 over the expanded terms it contains;
        filter tags stay conjunctive).

        Following the Lucene convention, the prefix is lowercased but NOT
        stemmed/analyzed (a stemmed prefix would miss surface forms the
        index never stemmed — multi-term queries skip analysis).  The cap
        trades recall on pathological prefixes (single letters over a web
        vocabulary) for a bounded driver expansion list and a bounded
        kernel fan-in; at 100 TB the dictionary scan stays a metadata-
        sized job and no step depends on corpus row count.
        """
        spark = self.spark
        empty = self._empty_result()
        prefix = (prefix or "").strip().lower().rstrip("*")
        tags = list(tags or [])
        if not prefix or (tags and self.tags is None):
            return self._materialize(empty, "bm25", bounded=True) if materialize else empty
        if self.term_stats is not None:
            dic = self.term_stats
        else:  # pre-term_stats index: derive the dictionary per query
            dic = (
                self.postings.groupBy("term")
                .agg(F.sum("df").alias("df"), F.collect_set("shard").alias("shards"))
            )
        rows = (
            dic.where(F.col("term").startswith(prefix))
            .orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(max_expansions)
            .collect()
        )
        if not rows:
            return self._materialize(empty, "bm25", bounded=True) if materialize else empty
        query_tokens = {r["term"]: [0] for r in rows}
        df_global = {r["term"]: int(r["df"]) for r in rows}
        cand_shards: set = set()
        for r in rows:
            cand_shards.update(r["shards"])
        for r in rows:  # expansion rows double as warm term-stat cache
            self._stats_cache.setdefault(r["term"], (int(r["df"]), list(r["shards"])))
        return self._run_or(query_tokens, df_global, cand_shards, tags, k,
                            materialize, offset=offset)

    def search_fuzzy(self, word: str, tags: list | None = None,
                     max_edits: int = 1, k: int = 10,
                     max_expansions: int = 50,
                     materialize: bool = True, offset: int = 0) -> DataFrame:
        """Fuzzy single-word BM25 top-k — the Lucene/ES fuzzy query
        re-expressed for the sharded index (the reference has no fuzzy
        path; flagged extension).

        Expansion is a TERM-DICTIONARY scan, never a corpus scan:
        term_stats (one row per distinct term) is filtered by a cheap
        codegen'd length guard (|len(term) − len(word)| ≤ max_edits —
        an edit can change length by at most one) and then the built-in
        ``levenshtein(term, word) ≤ max_edits`` predicate, both
        JVM-side.  Matches are capped at ``max_expansions`` by
        (distance ASC, df DESC, term ASC) — closest first, then most
        frequent, deterministic — and the expanded set runs through the
        disjunctive maxscore kernel like ``operator='or'`` (plain BM25
        per matched term, undiscounted by distance, so a SQL oracle can
        reproduce scores bit-exactly; filter tags stay conjunctive).

        Following the Lucene convention for multi-term queries the word
        is lowercased but NOT stemmed.  At 100 TB the dictionary scan is
        metadata-sized and the fan-in stays bounded by the cap.
        """
        spark = self.spark
        empty = self._empty_result()
        word = (word or "").strip().lower()
        tags = list(tags or [])
        if not word or (tags and self.tags is None):
            return self._materialize(empty, "bm25", bounded=True) if materialize else empty
        if self.term_stats is not None:
            dic = self.term_stats
        else:  # pre-term_stats index: derive the dictionary per query
            dic = (
                self.postings.groupBy("term")
                .agg(F.sum("df").alias("df"), F.collect_set("shard").alias("shards"))
            )
        lit = F.lit(word)
        rows = (
            dic.where(
                (F.abs(F.length("term") - F.length(lit)) <= max_edits)
                & (F.levenshtein("term", lit) <= max_edits)
            )
            .withColumn("dist", F.levenshtein("term", lit))
            .orderBy(F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
            .limit(max_expansions)
            .collect()
        )
        if not rows:
            return self._materialize(empty, "bm25", bounded=True) if materialize else empty
        query_tokens = {r["term"]: [0] for r in rows}
        df_global = {r["term"]: int(r["df"]) for r in rows}
        cand_shards: set = set()
        for r in rows:
            cand_shards.update(r["shards"])
            self._stats_cache.setdefault(r["term"], (int(r["df"]), list(r["shards"])))
        return self._run_or(query_tokens, df_global, cand_shards, tags, k,
                            materialize, offset=offset)

    def count(self, search_word: str, tags: list | None = None,
              lang: str = "", exclude_words: str = "",
              exclude_tags: list | None = None,
              ranges: dict | None = None) -> int:
        """Number of documents matching the conjunctive(+phrase) query —
        the ES ``_count`` API.  Runs the parity kernel WITHOUT
        materialization or ordering (no doc_store join, no sort), so the
        cost is candidate generation alone; the count aggregate is
        map-side-combinable per shard.  ``exclude_words``/``exclude_tags``
        apply ES ``bool.must_not`` exclusion, ``ranges`` the ES range
        filter, before counting."""
        res = self.search(search_word, tags, lang, mode="parity",
                          materialize=False, exclude_words=exclude_words,
                          exclude_tags=exclude_tags, ranges=ranges)
        return res.count()

    _RANGE_OPS = ("gte", "gt", "lte", "lt")

    def _compile_ranges(self, ranges: dict):
        """Validate ES ``range`` clauses against doc_store columns and
        compile them to ONE conjunctive Column predicate.  Literals are
        cast to the column's type (ISO strings compare correctly against
        timestamp columns); unknown fields/operators raise ValueError —
        the HTTP layer surfaces them as 400s."""
        pred = None
        checks: list = []  # (field, op, val, lit) for eager validation
        for field, spec in ranges.items():
            if field not in self.doc_store.columns or field in ("doc_id",
                                                                "shard"):
                raise ValueError(f"no such document field: {field!r}")
            if not isinstance(spec, dict) or not spec:
                raise ValueError(
                    f"range {field!r}: expected {{gte|gt|lte|lt: value}}")
            dtype = self.doc_store.schema[field].dataType
            col = F.col(field)
            for op, val in spec.items():
                if op not in self._RANGE_OPS:
                    raise ValueError(
                        f"range {field!r}: unsupported operator {op!r} "
                        f"(use gte/gt/lte/lt)")
                if val is None:
                    raise ValueError(f"range {field!r}: {op} value is null")
                lit = F.lit(val).cast(dtype)
                checks.append((field, op, val, lit))
                p = {"gte": col >= lit, "gt": col > lit,
                     "lte": col <= lit, "lt": col < lit}[op]
                pred = p if pred is None else (pred & p)
        # eager driver-side cast validation (ADVICE r5): an uncastable
        # literal (e.g. a malformed date string against a timestamp
        # column) silently becomes NULL, the predicate evaluates NULL
        # and the whole match set empties with a 200 — ES 400s instead.
        # One local one-row evaluation covers every literal at once.
        if checks:
            row = self.spark.range(1).select(
                *[c[3].alias(f"_c{i}") for i, c in enumerate(checks)]
            ).first()
            for i, (field, op, val, _lit) in enumerate(checks):
                if row[i] is None:
                    raise ValueError(
                        f"range {field!r}: value {val!r} is not valid for "
                        f"the column's type")
        return pred

    def _range_rows(self, ranges: dict, cand_shards: set | None) -> DataFrame:
        """The in-range doc set as synthetic per-shard tag rows
        (shard, n, doc_blob) in the tag sidecar's exact encoding
        (codec.encode_sorted), ready to ride the kernels' grouped
        exchange.  The doc_store scan is predicate-pushed (column
        min/max row-group pruning applies — warc_ts correlates with
        doc_id, which shards are ranged by) and partition-pruned to the
        candidate shards when the query's terms bound them."""
        pred = self._compile_ranges(ranges)
        src = self.doc_store
        if cand_shards is not None:
            src = src.where(self._shard_in(cand_shards))
        sel = src.where(pred).select("shard", "doc_id")

        def pack(pdf: pd.DataFrame) -> pd.DataFrame:
            from watertower_spark.functions import codec

            ids = np.sort(pdf["doc_id"].to_numpy(dtype=np.int64))
            return pd.DataFrame({
                "shard": pd.Series([int(pdf["shard"].iloc[0])], dtype="int32"),
                "n": pd.Series([int(ids.size)], dtype="int32"),
                "doc_blob": pd.Series([codec.encode_sorted(ids)],
                                      dtype="object"),
            })

        return sel.repartition(
            self._kernel_partitions(cand_shards), "shard"
        ).groupBy("shard").applyInPandas(
            pack, "shard int, n int, doc_blob binary")

    def search_sorted(self, search_word: str, tags: list | None = None,
                      lang: str = "", field: str = "warc_ts",
                      ascending: bool = True, k: int = 10,
                      exclude_words: str = "",
                      exclude_tags: list | None = None,
                      ranges: dict | None = None) -> DataFrame:
        """ES sort-by-field (flagged extension; the reference orders by
        score only): the top ``k`` matching documents by a doc_store
        COLUMN — ``{"sort": [{"warc_ts": "desc"}]}`` — with scoring
        skipped, exactly ES's behavior when a sort replaces _score.
        Ties break by doc_id ASC so pages are deterministic.

        Plan: the UNBOUNDED parity match set (conjunctive + phrase +
        optional must_not/range) co-key-joins the doc_store projection;
        the (field, doc_id) top-k compiles to TakeOrderedAndProject —
        per-partition heaps and a k-bounded driver merge, never a
        global sort."""
        if field not in self.doc_store.columns or field in ("doc_id",
                                                            "shard"):
            raise ValueError(f"no such document field: {field!r}")
        res = self.search(search_word, tags, lang, mode="parity",
                          materialize=False, exclude_words=exclude_words,
                          exclude_tags=exclude_tags, ranges=ranges)
        key = F.col(field).asc() if ascending else F.col(field).desc()
        cols = ["doc_id", "url", "text", "lang", *self._extra_doc_cols()]
        if field not in cols:
            cols.insert(2, field)
        return (
            self.doc_store.join(res.select("doc_id", "shard"),
                                ["doc_id", "shard"])
            .select(*cols)
            .orderBy(key, F.col("doc_id").asc())
            .limit(k)
        )

    def facet_tags(self, search_word: str, tags: list | None = None,
                   lang: str = "", size: int = 10,
                   ranges: dict | None = None) -> DataFrame:
        """ES-style ``terms`` aggregation over the tag sidecar: for every
        tag, how many documents MATCHING the query carry it — the facet
        row a search UI renders next to results.  Returns (tag,
        doc_count) ordered doc_count DESC, tag ASC, limited to ``size``.
        The reference has no aggregation surface (FindTags lists a doc's
        tags, database.go; nothing counts over a result set) — flagged
        extension.

        Physical plan: the match set comes from the parity search
        (conjunctive + phrase, UNBOUNDED — facets must count every match,
        so no top-k); tag blobs decode per shard (narrow, one Arrow batch
        per shard) into (doc_id, shard, tag) rows; one co-keyed join
        against the match set and a map-side-combinable count per tag.
        Nothing collects to the driver but the ``size``-bounded result.
        """
        spark = self.spark
        if self.tags is None:
            return spark.createDataFrame([], "tag string, doc_count long")
        res = self.search(search_word, tags, lang, mode="parity",
                          materialize=False, ranges=ranges)
        tag_rows = self._tag_rows()
        return (
            tag_rows.join(res.select("doc_id", "shard"), ["doc_id", "shard"])
            .groupBy("tag").agg(F.count("*").alias("doc_count"))
            .orderBy(F.col("doc_count").desc(), F.col("tag").asc())
            .limit(size)
        )

    def facet_field(self, search_word: str, tags: list | None = None,
                    lang: str = "", field: str = "lang",
                    size: int = 10, ranges: dict | None = None) -> DataFrame:
        """ES ``terms`` aggregation over a doc_store COLUMN (``lang``,
        or any scalar passthrough column) for the full parity match set
        — the column-valued sibling of ``facet_tags`` (flagged
        extension; the reference has no aggregations).  Returns (key,
        doc_count) ordered doc_count DESC, key ASC, limited to ``size``.

        Plan: unbounded match set (facets count every match) co-key-
        joined to a two-column doc_store projection, then one map-side-
        combinable count per key; only the size-bounded result reaches
        the driver."""
        if field not in self.doc_store.columns:
            raise ValueError(f"no such document field: {field!r}")
        res = self.search(search_word, tags, lang, mode="parity",
                          materialize=False, ranges=ranges)
        return (
            self.doc_store.select("doc_id", "shard", F.col(field).alias("key"))
            .join(res.select("doc_id", "shard"), ["doc_id", "shard"])
            .groupBy("key").agg(F.count("*").alias("doc_count"))
            .orderBy(F.col("doc_count").desc(), F.col("key").asc())
            .limit(size)
        )

    def histogram_wc(self, search_word: str, tags: list | None = None,
                     lang: str = "", interval: int = 10,
                     ranges: dict | None = None) -> DataFrame:
        """ES ``histogram`` aggregation over document length (the
        indexed word count, doc_stats.wc — the same quantity BM25's dl
        uses) for the full parity match set (flagged extension).
        Buckets are ``floor(wc / interval) * interval`` with doc
        counts, ordered key ASC — ES's histogram contract.  Plan: match
        set co-key-joined to the (doc_id, wc) projection of doc_stats,
        one partial-agg count per bucket; result size is bounded by the
        wc range / interval, never by the corpus."""
        if interval <= 0:
            raise ValueError("histogram interval must be positive")
        res = self.search(search_word, tags, lang, mode="parity",
                          materialize=False, ranges=ranges)
        return (
            self.doc_stats.select("doc_id", "shard", "wc")
            .join(res.select("doc_id", "shard"), ["doc_id", "shard"])
            .withColumn("key", (F.floor(F.col("wc") / interval)
                                * interval).cast("long"))
            .groupBy("key").agg(F.count("*").alias("doc_count"))
            .orderBy(F.col("key").asc())
        )

    def facet_cardinality(self, search_word: str, tags: list | None = None,
                          lang: str = "", field: str = "lang",
                          ranges: dict | None = None) -> int:
        """ES ``cardinality`` aggregation (EXACT here, not HLL — at this
        engine's result shapes the distinct key set is small; flagged
        extension): number of distinct values of ``field`` (``tags``
        for the tag sidecar, else a doc_store column) across the parity
        match set.  One countDistinct over the co-keyed join; a single
        scalar reaches the driver."""
        res = self.search(search_word, tags, lang, mode="parity",
                          materialize=False, ranges=ranges)
        if field == "tags":
            if self.tags is None:
                return 0
            tag_rows = self._tag_rows()
            joined = tag_rows.join(res.select("doc_id", "shard"),
                                   ["doc_id", "shard"])
            row = joined.agg(F.countDistinct("tag").alias("n")).collect()[0]
            return int(row["n"])
        if field not in self.doc_store.columns:
            raise ValueError(f"no such document field: {field!r}")
        joined = self.doc_store.select("doc_id", "shard", field).join(
            res.select("doc_id", "shard"), ["doc_id", "shard"])
        row = joined.agg(F.countDistinct(field).alias("n")).collect()[0]
        return int(row["n"])

    def _tag_rows(self) -> DataFrame:
        """Decode the tag sidecar into (doc_id, shard, tag) rows —
        narrow per-shard Arrow batches, shared by facet_tags and the
        tag cardinality path."""

        def unpack(pdf: pd.DataFrame) -> pd.DataFrame:
            from watertower_spark.functions import codec

            out_doc: list = []
            out_sh: list = []
            out_tag: list = []
            for tag, sh, blob in zip(pdf["tag"], pdf["shard"], pdf["doc_blob"]):
                ids = codec.decode_sorted(blob)
                out_doc.extend(int(d) for d in ids)
                out_sh.extend([int(sh)] * ids.size)
                out_tag.extend([tag] * ids.size)
            return pd.DataFrame({"doc_id": pd.Series(out_doc, dtype="int64"),
                                 "shard": pd.Series(out_sh, dtype="int32"),
                                 "tag": pd.Series(out_tag, dtype="object")})

        return self.tags.repartition(
            self._kernel_partitions(), "shard"
        ).groupBy("shard").applyInPandas(
            unpack, "doc_id long, shard int, tag string"
        )

    def highlight(self, search_word: str, tags: list | None = None,
                  lang: str = "", k: int = 10, window: int = 5,
                  mode: str = "bm25") -> DataFrame:
        """Top-k search with an ES-style highlighted snippet per hit
        (flagged extension; the reference returns whole documents only).

        Contract (deterministic, SQL-oracle-reproducible): the stored
        text is whitespace-split; a token MATCHES when the index
        analyzer's normalization of it (trailing ``.,:"`` strip +
        lowercase, + stem for stemming analyzers) is one of the analyzed
        query tokens.  The snippet is the ``window``-token neighborhood
        each side of the FIRST matching token, with every matching token
        inside it wrapped in ``<em>…</em>`` (original surface form
        preserved); a doc with no whitespace-level match (possible only
        for non-word analyzers) falls back to its first 2·window+1
        tokens unmarked.  Snippeting runs as an Arrow batch over the
        k-bounded materialized hits — never over the corpus.
        """
        from watertower_spark.analyzers import analyze_query, find_analyzer

        default_lang = self.manifest.get("default_lang") or ""
        analyzer_lang = self.manifest.get("analyzer_lang")
        eff_lang = analyzer_lang or lang or default_lang
        qtokens = set(analyze_query(search_word, eff_lang, default_lang))
        res = self.search(search_word, tags, lang, mode=mode, k=k)
        if not qtokens:
            return res.withColumn("snippet", F.col("text"))

        def norm_fn(lang_of_doc: str):
            try:
                return find_analyzer(analyzer_lang or lang_of_doc
                                     or default_lang or "simple")
            except KeyError:
                # unregistered languages degrade to 'simple', mirroring
                # the analysis pipeline's fallback
                return find_analyzer("simple")

        @F.pandas_udf("string")
        def snip(text: pd.Series, doc_lang: pd.Series) -> pd.Series:
            out = []
            for t, dl in zip(text, doc_lang):
                words = (t or "").split()
                a = norm_fn(dl)
                normed = [(a.splitter(w) or [""])[0] for w in words]
                if a.stemmer is not None:
                    normed = [a.stemmer(w) for w in normed]
                hit = [i for i, nw in enumerate(normed) if nw in qtokens]
                if hit:
                    i0 = hit[0]
                    lo, hi = max(0, i0 - window), min(len(words), i0 + window + 1)
                else:
                    lo, hi = 0, min(len(words), 2 * window + 1)
                frag = [
                    f"<em>{w}</em>" if normed[lo + j] in qtokens else w
                    for j, w in enumerate(words[lo:hi])
                ]
                out.append(" ".join(frag))
            return pd.Series(out, dtype="object")

        return res.withColumn("snippet", snip(F.col("text"), F.col("lang")))

    def stats(self) -> dict:
        """Index statistics in an ES ``_stats``-ish shape: manifest
        scalars (doc_count, n_shards, docs_per_shard, avgdl, versions)
        plus per-table on-disk bytes.  Metadata-only — the manifest is
        already loaded and byte totals are one LIST per table
        (fsio.dir_size); no Spark job, no row scan."""
        from watertower_spark.functions import fsio

        from .index_build import table_path

        m = self.manifest
        tables: dict = {}
        for t in ("postings", "doc_store", "doc_stats", "doc_len", "tags",
                  "doc_map", "term_stats"):
            p = (table_path(self.index_dir, m, t)
                 if t in ("term_stats", "doc_map") else f"{self.index_dir}/{t}")
            b = fsio.dir_size(p)
            if b:
                tables[t] = b
        return {
            "doc_count": int(m["doc_count"]),
            "n_shards": int(m["n_shards"]),
            "docs_per_shard": int(m["docs_per_shard"]),
            "avgdl": float(m["avgdl"]),
            "format_version": m.get("format_version"),
            "size_in_bytes": sum(tables.values()),
            "tables": tables,
            "degraded_shards": list(self.degraded_shards),
        }

    def _run_or(self, query_tokens: dict, df_global: dict, cand_shards: set,
                tags: list, k: int, materialize: bool,
                offset: int = 0, excl_terms: list | None = None,
                excl_tags: list | None = None,
                search_after: tuple | None = None,
                ranges: dict | None = None) -> DataFrame:
        """Shared disjunctive execution: one grouped exchange (postings ∪
        tags ∪ dense dl arrays) → per-shard maxscore kernel → global
        top-k.  Callers supply resolved per-term global df (term_stats)
        and the candidate shard set.  ``excl_terms``/``excl_tags`` ride
        the same exchange as kind='not'/'nottag' rows (shard-restricted
        to the candidate set) for must_not exclusion inside the kernel."""
        from .wand import make_or_kernel

        terms = sorted(query_tokens)
        sel = self.postings.where(F.col("term").isin(terms))
        groups_df = sel.select(*self._const_cols("o_term", lambda: [
            F.lit("term").alias("kind"), F.col("term").alias("name"),
            F.col("shard"), F.col("df"), F.col("doc_blob"), F.col("tf_blob"),
            F.col("block_off"), F.col("block_max_tf"), F.col("block_min_dl")]))
        if excl_terms:
            not_sel = self.postings.where(
                F.col("term").isin(list(excl_terms))
                & self._shard_in(cand_shards)
            )
            groups_df = groups_df.unionByName(
                not_sel.select(*self._const_cols("o_not", lambda: [
                    F.lit("not").alias("kind"), F.col("term").alias("name"),
                    F.col("shard"), F.col("df"), F.col("doc_blob"),
                    F.col("tf_blob"), F.col("block_off"),
                    F.col("block_max_tf"), F.col("block_min_dl")]))
            )
        if excl_tags and self.tags is not None:
            nottag_sel = self.tags.where(F.col("tag").isin(list(excl_tags)))
            groups_df = groups_df.unionByName(
                nottag_sel.select(*self._const_cols("o_nottag", lambda: [
                    F.lit("nottag").alias("kind"), F.col("tag").alias("name"),
                    F.col("shard"), F.col("n").alias("df"), F.col("doc_blob")]
                    + self._const_cols("o_nulls", _null_blob_cols4)))
            )
        if tags:
            tag_sel = self.tags.where(F.col("tag").isin(tags))
            groups_df = groups_df.unionByName(
                tag_sel.select(*self._const_cols("o_tag", lambda: [
                    F.lit("tag").alias("kind"), F.col("tag").alias("name"),
                    F.col("shard"), F.col("n").alias("df"), F.col("doc_blob")]
                    + self._const_cols("o_nulls", _null_blob_cols4)))
            )
        if ranges:
            rng = self._range_rows(ranges, cand_shards)
            groups_df = groups_df.unionByName(
                rng.select(*self._const_cols("o_range", lambda: [
                    F.lit("tag").alias("kind"),
                    F.lit("\x00range").alias("name"),
                    F.col("shard"), F.col("n").alias("df"), F.col("doc_blob")]
                    + self._const_cols("o_nulls", _null_blob_cols4)))
            )
        len_sel = self.doc_len.where(
            self._shard_in(cand_shards)
        )
        groups_df = groups_df.unionByName(
            len_sel.select(*self._const_cols("o_len", lambda: [
                F.lit("len").alias("kind"), F.lit("").alias("name"),
                F.col("shard"), F.col("n").alias("df"),
                F.col("dl_blob").alias("doc_blob")]
                + self._const_cols("o_nulls", _null_blob_cols4)))
        )
        kernel = make_or_kernel(
            query_tokens, df_global, int(self.manifest["doc_count"]),
            float(self.manifest["avgdl"]), k + offset,
            n_tags=len(set(tags)) + (1 if ranges else 0),
            docs_per_shard=int(self.manifest["docs_per_shard"]),
            after=search_after,
        )
        results = groups_df.repartition(
            self._kernel_partitions(cand_shards), "shard"
        ).groupBy("shard").applyInPandas(
            kernel, schema=RESULT_SCHEMA
        ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
        if offset:
            results = results.offset(offset)
        results = results.limit(k)
        return self._materialize(results, "bm25", bounded=True) if materialize else results

    # ------------------------------------------------------------ msearch

    def msearch(self, queries: list, materialize: bool = True) -> DataFrame:
        """N independent queries in ONE Spark DAG — the ES ``_msearch``
        batch API re-expressed Spark-first (flagged extension; the
        reference serves one query per request, handlers.go:100-176).

        Each entry is a dict: ``{"word": str, "tags": list|None,
        "lang": str, "mode": "parity"|"bm25", "k": int|None,
        "operator": "and"|"or", "exclude_words": str,
        "exclude_tags": list|None}`` (only ``word`` required).

        Physical plan: every conjunctive query's inputs (postings ∪
        tags ∪ dl arrays ∪ must_not rows) ride ONE grouped exchange
        keyed by (qid, shard), dispatching to the same per-query kernel
        ``search()`` builds; disjunctive queries share a second
        exchange into the maxscore kernel.  Both outputs union into a
        single plan; per-query top-k is one window over the already
        per-shard-bounded candidates, and ONE doc_store join
        materializes every query's hits.  Scheduling and exchange
        overhead is therefore paid once per BATCH instead of once per
        query — at any corpus size, query throughput comes from
        batching, not from threading one driver process.

        Returns rows with a leading ``qid`` column (position in
        ``queries``), ordered (qid ASC, the query's score order,
        doc_id ASC).  Queries matching nothing contribute no rows.
        """
        from watertower_spark.analyzers import analyze_query

        from .wand import make_or_kernel

        spark = self.spark
        default_lang = self.manifest.get("default_lang") or ""
        analyzer_lang = self.manifest.get("analyzer_lang")
        doc_count = int(self.manifest["doc_count"])
        avgdl = float(self.manifest["avgdl"])
        dps = int(self.manifest["docs_per_shard"])

        def _an(word, lang):
            return analyze_query(
                word or "", analyzer_lang or lang, default_lang
            ) if word else {}

        # -- per-query analysis + ONE combined term_stats resolution
        qspecs = []
        all_terms: set = set()
        for qid, q in enumerate(queries):
            tokens = _an(q.get("word"), q.get("lang") or "")
            excl = _an(q.get("exclude_words"), q.get("lang") or "")
            spec = dict(
                qid=qid, tokens=tokens, excl=excl,
                tags=list(q.get("tags") or []),
                excl_tags=list(q.get("exclude_tags") or []),
                mode=q.get("mode") or "bm25",
                op=q.get("operator") or "and",
                k=q.get("k", 10 if (q.get("mode") or "bm25") == "bm25" else None),
            )
            if spec["op"] == "or":
                if spec["mode"] != "bm25":
                    raise ValueError("operator='or' supports mode='bm25' only")
                # an excluded term leaves the scored disjunction
                spec["tokens"] = {t: p for t, p in spec["tokens"].items()
                                  if t not in spec["excl"]}
                spec["k"] = spec["k"] or 10
            qspecs.append(spec)
            all_terms.update(spec["tokens"])
            all_terms.update(spec["excl"])
        resolved = self._resolve_terms(sorted(all_terms)) if all_terms else {}

        # Per-family accumulators.  The plan is assembled from BROADCAST
        # maps instead of per-query selects: one postings scan joined to
        # a tiny (term → qid, kind) relation duplicates each posting row
        # into every query's (qid, shard) group — so the plan size (and
        # the driver's py4j construction cost) is CONSTANT in the batch
        # width, and postings/tags/doc_len are each scanned once per
        # kernel family regardless of how many lines share them.
        fam: dict = {
            f: {"terms": [], "tags": [], "len_pairs": [], "shards": set(),
                "unrestricted": False, "kernels": {}}
            for f in ("and", "or")
        }
        parity_qids: list = []
        kmap_items: list = []

        for spec in qspecs:
            qid, tokens, tags = spec["qid"], spec["tokens"], spec["tags"]
            mode, op, k = spec["mode"], spec["op"], spec["k"]
            if mode == "parity":
                parity_qids.append(qid)
            if not tokens and not tags:
                continue
            if set(spec["excl"]) & set(tokens) or \
                    (set(spec["excl_tags"]) & set(tags)):
                continue  # required ∧ excluded ⇒ empty
            if tags and self.tags is None:
                continue
            terms = sorted(tokens)
            if op == "or":
                f = fam["or"]
                df_global = {t: resolved[t][0] for t in terms
                             if resolved.get(t) is not None}
                if not df_global:
                    continue
                cand = set()
                for t in df_global:
                    cand.update(resolved[t][1])
                f["terms"] += [(t, qid, "term") for t in sorted(df_global)]
                f["tags"] += [(t, qid, "tag") for t in tags]
                f["terms"] += [
                    (t, qid, "not") for t in sorted(spec["excl"])
                    if resolved.get(t) is not None
                    and set(resolved[t][1]) & cand
                ]
                if self.tags is not None:
                    f["tags"] += [(t, qid, "nottag")
                                  for t in spec["excl_tags"]]
                f["len_pairs"] += [(qid, int(s)) for s in sorted(cand)]
                f["shards"].update(cand)
                f["kernels"][qid] = make_or_kernel(
                    tokens, df_global, doc_count, avgdl, k,
                    n_tags=len(set(tags)), docs_per_shard=dps)
                kmap_items.append((qid, int(k)))
                continue
            # conjunctive (AND) query — mirrors search()'s plan per qid
            f = fam["and"]
            df_global = {}
            and_shards: set | None = None
            dead = False
            for t in terms:
                if resolved.get(t) is None:
                    dead = True
                    break
                df_global[t] = resolved[t][0]
                s = set(resolved[t][1])
                and_shards = s if and_shards is None else (and_shards & s)
            if dead or (terms and not and_shards):
                continue
            f["terms"] += [(t, qid, "term") for t in terms]
            f["tags"] += [(t, qid, "tag") for t in tags]
            if and_shards is None:
                f["unrestricted"] = True  # tags-only query: all shards
            else:
                f["shards"].update(and_shards)
            has_excl = False
            excl_present = [
                t for t in sorted(spec["excl"])
                if resolved.get(t) is not None
                and (and_shards is None or set(resolved[t][1]) & and_shards)
            ]
            if excl_present:
                has_excl = True
                f["terms"] += [(t, qid, "not") for t in excl_present]
            if spec["excl_tags"] and self.tags is not None:
                has_excl = True
                f["tags"] += [(t, qid, "nottag") for t in spec["excl_tags"]]
            if mode == "bm25" and terms:
                f["len_pairs"] += [(qid, int(s)) for s in sorted(and_shards)]
            f["kernels"][qid] = _make_kernel(
                tokens, df_global, doc_count, avgdl, mode,
                k if mode == "bm25" else None, n_tags=len(set(tags)),
                docs_per_shard=dps, has_excl=has_excl)
            if mode == "bm25" and k is not None:
                kmap_items.append((qid, int(k)))

        _AND_BLOBS = ("tf_blob", "pos_blob", "block_off", "block_last",
                      "block_tf_off", "block_pos_off", "block_max_tf",
                      "block_min_dl")
        _OR_BLOBS = ("tf_blob", "block_off", "block_max_tf", "block_min_dl")

        def _family_df(f: dict, blobs):
            nulls = [F.lit(None).cast("binary").alias(c) for c in blobs]
            shards = None if f["unrestricted"] else sorted(
                int(s) for s in f["shards"])
            parts = []
            if f["terms"]:
                tm = spark.createDataFrame(
                    f["terms"], "name string, tqid int, kind string")
                sel = self.postings.where(
                    F.col("term").isin(sorted({r[0] for r in f["terms"]})))
                if shards is not None:
                    sel = sel.where(F.col("shard").isin(shards))
                parts.append(
                    sel.join(F.broadcast(tm), sel["term"] == tm["name"])
                    .select(F.col("tqid").alias("qid"), "kind", "name",
                            "shard", "df", "doc_blob", *blobs))
            if f["tags"]:
                tg = spark.createDataFrame(
                    f["tags"], "name string, tqid int, kind string")
                tsel = self.tags.where(
                    F.col("tag").isin(sorted({r[0] for r in f["tags"]})))
                parts.append(
                    tsel.join(F.broadcast(tg), tsel["tag"] == tg["name"])
                    .select(F.col("tqid").alias("qid"), "kind", "name",
                            "shard", F.col("n").alias("df"), "doc_blob",
                            *nulls))
            if f["len_pairs"]:
                lp = spark.createDataFrame(
                    f["len_pairs"], "lqid int, shard int")
                parts.append(
                    self.doc_len.join(F.broadcast(lp), "shard")
                    .select(F.col("lqid").alias("qid"),
                            F.lit("len").alias("kind"),
                            F.lit("").alias("name"), "shard",
                            F.col("n").alias("df"),
                            F.col("dl_blob").alias("doc_blob"), *nulls))
            if not parts:
                return None
            g = parts[0]
            for p in parts[1:]:
                g = g.unionByName(p)
            return g

        out_schema = "qid int, " + RESULT_SCHEMA

        def _dispatch(kernels):
            def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
                qid = int(key[0])
                out = kernels[qid]((key[1],), pdf)
                out.insert(0, "qid", np.full(len(out), qid, dtype="int32"))
                return out
            return kernel

        outs = []
        for fname, blobs in (("and", _AND_BLOBS), ("or", _OR_BLOBS)):
            f = fam[fname]
            g = _family_df(f, blobs)
            if g is None:
                continue
            outs.append(g.repartition(
                self._kernel_partitions(), "qid", "shard"
            ).groupBy("qid", "shard").applyInPandas(
                _dispatch(f["kernels"]), schema=out_schema))
        if not outs:
            res = spark.createDataFrame([], out_schema)
        else:
            res = outs[0]
            for o in outs[1:]:
                res = res.unionByName(o)

        # per-query top-k: one window over the per-shard-bounded rows
        if kmap_items:
            from pyspark.sql import Window

            kmap = F.create_map(
                *[F.lit(v) for pair in kmap_items for v in pair])
            w = Window.partitionBy("qid").orderBy(
                F.col("score").desc(), F.col("doc_id").asc())
            res = (
                res.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= F.coalesce(
                    F.element_at(kmap, F.col("qid")), F.lit(1 << 30)))
                .drop("rn")
            )
        if not materialize:
            return res

        # one materialization join for the whole batch; broadcast only
        # when every query is k-bounded (a parity query is unbounded)
        bounded = not parity_qids
        right = F.broadcast(res) if bounded else res
        sortk = (
            F.when(F.col("qid").isin(parity_qids), F.col("score"))
            .otherwise(-F.col("score")) if parity_qids else -F.col("score")
        )
        return (
            self.doc_store.join(right, ["doc_id", "shard"])
            .select("qid", "doc_id", "url", "score", "text", "lang",
                    *self._extra_doc_cols())
            .orderBy(F.col("qid").asc(), sortk.asc(), F.col("doc_id").asc())
        )

    def _materialize(self, results: DataFrame, mode: str,
                     bounded: bool = False) -> DataFrame:
        """Join the result set to doc_store — Q9/materialization
        (database.go:540-558).  When the result set is bounded (top-k),
        broadcasting it keeps the big table shuffle-free and the shard
        column prunes doc_store partitions; parity mode has NO limit
        (reference Q8 returns all matches), so a head-term query over a
        big corpus must shuffle-join instead of broadcasting an unbounded
        set through the driver."""
        order = (
            [F.col("score").desc(), F.col("doc_id").asc()]
            if mode == "bm25"
            else [F.col("score").asc(), F.col("doc_id").asc()]
        )
        right = F.broadcast(results) if bounded else results
        return (
            self.doc_store.join(right, ["doc_id", "shard"])
            .select("doc_id", "url", "score", "text", "lang",
                    *self._extra_doc_cols())
            .orderBy(*order)
        )

    def _extra_doc_cols(self) -> list:
        """Document passthrough columns beyond the core shape — the
        reference Document carries metadata map<string,string> and an
        updated_at timestamp (entity.go:9-24, document-schema.json);
        any such columns present in doc_store ride along in materialized
        results."""
        return [c for c in ("metadata", "updated_at")
                if c in self.doc_store.columns]
