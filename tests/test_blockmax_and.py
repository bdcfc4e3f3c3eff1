"""Multi-term conjunctive block-max top-k (round-3 verdict #7).

The kernel is a plain Python function of (key, pandas.DataFrame), so it
is driven directly here — no Spark session — with a synthetic two-
head-term shard: decoded-block count must DROP versus exhaustive
decoding (the bound from the (block_max_tf, block_min_dl) sidecars
prunes whole driving-list blocks), while the top-k stays exactly equal
to the unpruned general path and to a numpy brute force.
"""

import math

import numpy as np
import pandas as pd

from watertower_spark.functions import codec
from watertower_spark.operators import search as S
from watertower_spark.operators.index_build import BM25_B, BM25_K1

N_DOCS = 40_000
DL = 100
HOT = 1280  # docs <= HOT carry tf=10, the rest tf=1


def _term_row(term, doc_ids, tfs, positions, dls):
    packed = codec.pack_postings(
        np.asarray(doc_ids), np.asarray(tfs), dls=np.asarray(dls)
    )
    pos_parts = [codec.encode_position_list(p) for p in positions]
    lens = np.fromiter((len(p) for p in pos_parts), dtype=np.int64)
    cum = np.concatenate(([0], np.cumsum(lens)))
    bpo = cum[:: codec.BLOCK_SIZE][
        : (len(pos_parts) + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    ]
    return dict(
        kind="term", name=term, shard=0, df=packed["df"],
        doc_blob=packed["doc_blob"], tf_blob=packed["tf_blob"],
        pos_blob=b"".join(pos_parts),
        block_off=packed["block_off"], block_last=packed["block_last"],
        block_tf_off=packed["block_tf_off"], block_pos_off=bpo.tobytes(),
        block_max_tf=packed["block_max_tf"],
        block_min_dl=packed["block_min_dl"],
    )


def _shard_pdf():
    a_ids = np.arange(2, N_DOCS + 1, 2, dtype=np.int64)  # every even doc
    b_ids = np.arange(3, N_DOCS + 1, 3, dtype=np.int64)  # every third doc
    a_tfs = np.where(a_ids <= HOT, 10, 1)
    b_tfs = np.where(b_ids <= HOT, 10, 1)
    # "aa" always at position 0, "bb" at 1 → the phrase "aa bb" passes
    rows = [
        _term_row("aa", a_ids, a_tfs, [[0]] * a_ids.size,
                  np.full(a_ids.size, DL)),
        _term_row("bb", b_ids, b_tfs, [[1]] * b_ids.size,
                  np.full(b_ids.size, DL)),
        dict(kind="len", name="", shard=0, df=N_DOCS,
             doc_blob=np.full(N_DOCS, DL, dtype=np.int32).tobytes(),
             tf_blob=None, pos_blob=None, block_off=None, block_last=None,
             block_tf_off=None, block_pos_off=None, block_max_tf=None,
             block_min_dl=None),
    ]
    df_global = {"aa": int(a_ids.size), "bb": int(b_ids.size)}
    return pd.DataFrame(rows), df_global


def _brute_force_topk(df_global, k=10):
    inter = [d for d in range(6, N_DOCS + 1, 6)]  # multiples of lcm(2,3)
    scores = []
    for d in inter:
        s = 0.0
        for term in ("aa", "bb"):
            tf = 10.0 if d <= HOT else 1.0
            dfg = df_global[term]
            idf = math.log(1.0 + (N_DOCS - dfg + 0.5) / (dfg + 0.5))
            denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * DL / DL)
            s += idf * (BM25_K1 + 1.0) * tf / denom
        scores.append((d, s))
    scores.sort(key=lambda x: (-x[1], x[0]))
    return scores[:k]


def _run(kernel, pdf):
    out = kernel((0,), pdf.copy())
    return sorted(
        zip(out["doc_id"].astype(int), out["score"].astype(float)),
        key=lambda x: (-x[1], x[0]),
    )


def test_blockmax_and_matches_brute_force_and_prunes(monkeypatch):
    pdf, df_global = _shard_pdf()
    query_tokens = {"aa": [0], "bb": [1]}

    decoded_blocks = []
    real = codec.decode_doc_blocks

    def spy(doc_blob, block_off, df, blocks, *a, **kw):
        decoded_blocks.append(len(blocks))
        return real(doc_blob, block_off, df, blocks, *a, **kw)

    monkeypatch.setattr(codec, "decode_doc_blocks", spy)

    kernel = S._make_kernel(query_tokens, df_global, N_DOCS, float(DL),
                            "bm25", 10, n_tags=0, docs_per_shard=N_DOCS)
    got = _run(kernel, pdf)
    want = [(d, round(s, 12)) for d, s in _brute_force_topk(df_global)]
    assert [(d, round(s, 12)) for d, s in got] == want

    # pruning evidence: the two lists hold ~262 blocks total; the hot
    # region plus a handful of bound-check survivors must be all that
    # is ever DECODED
    total_blocks = sum(
        -(-df_global[t] // codec.BLOCK_SIZE) for t in df_global
    )
    assert total_blocks > 250
    assert sum(decoded_blocks) < 60, (sum(decoded_blocks), total_blocks)


def test_blockmax_and_equals_general_path():
    """The pruned fast path must be result-identical to the general
    (k=None ⇒ exhaustive scoring) path's top-10."""
    pdf, df_global = _shard_pdf()
    query_tokens = {"aa": [0], "bb": [1]}
    fast = S._make_kernel(query_tokens, df_global, N_DOCS, float(DL),
                          "bm25", 10, n_tags=0, docs_per_shard=N_DOCS)
    general = S._make_kernel(query_tokens, df_global, N_DOCS, float(DL),
                             "bm25", None, n_tags=0, docs_per_shard=N_DOCS)
    got_fast = _run(fast, pdf)
    got_general = _run(general, pdf)[:10]
    assert [(d, round(s, 12)) for d, s in got_fast] == \
        [(d, round(s, 12)) for d, s in got_general]
