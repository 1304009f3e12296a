"""Training-data export: corpus → token-id sequences.

The endpoint a 100 TB training pipeline feeds a trainer from:

1. ``build_vocab``: top-V terms by collection frequency from the
   engine's term_dict (already a global aggregate — no extra pass),
   with reserved ids 0=<pad> 1=<unk>.
2. ``encode_sequences``: map_batches stage turning each doc into a
   fixed-length int32 id sequence (truncate/pad), vectorized via
   np.searchsorted over the sorted vocab (the vocab is broadcast via
   ray.put once, not per batch).
3. ``export_training_data``: writes partitioned parquet of
   (doc_id, input_ids, n_tokens) — resumable, shardable trainer input.

Order preserved from the document (token stream order, not tf order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from ..text import tokenize_array

PAD_ID = 0
UNK_ID = 1
RESERVED = 2


def build_vocab(term_dict_dir: str, vocab_size: int = 30_000) -> pa.Table:
    """(term, token_id) for the top-``vocab_size`` terms by cf; ids start
    at RESERVED, assigned in (cf desc, term asc) order — deterministic."""
    t = pq.read_table(term_dict_dir, columns=["term", "cf"])
    df = t.to_pandas().sort_values(["cf", "term"],
                                   ascending=[False, True]).head(vocab_size)
    df = df.reset_index(drop=True)
    df["token_id"] = np.arange(RESERVED, RESERVED + len(df), dtype=np.int32)
    return pa.Table.from_pandas(df[["term", "token_id"]], preserve_index=False)


def encode_sequences(ds: Dataset, vocab: pa.Table, seq_len: int = 128,
                     text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Fixed-length token-id sequences per doc (truncate / right-pad)."""
    vdf = vocab.to_pandas().sort_values("term")
    terms_sorted = vdf["term"].to_numpy(dtype=object)
    ids_sorted = vdf["token_id"].to_numpy().astype(np.int32)
    ref = ray.put((terms_sorted, ids_sorted))

    def encode(batch: pa.Table) -> pa.Table:
        terms_s, ids_s = ray.get(ref)
        content = batch[text_col].combine_chunks()
        flat, doc_idx, doc_lens = tokenize_array(content)
        n = len(content)
        out = np.full((n, seq_len), PAD_ID, dtype=np.int32)
        if len(flat):
            toks = np.asarray(flat.to_pylist(), dtype=object)
            pos = np.searchsorted(terms_s, toks)
            pos = np.clip(pos, 0, len(terms_s) - 1)
            hit = terms_s[pos] == toks
            tok_ids = np.where(hit, ids_s[pos], UNK_ID).astype(np.int32)
            starts = np.concatenate(([0], np.cumsum(doc_lens)))
            # in-doc position of every token; keep the first seq_len
            in_pos = np.arange(len(toks)) - starts[doc_idx]
            keep = in_pos < seq_len
            out[doc_idx[keep], in_pos[keep]] = tok_ids[keep]
        return pa.table({
            "doc_id": batch[id_col].combine_chunks(),
            "input_ids": pa.FixedSizeListArray.from_arrays(
                pa.array(out.reshape(-1)), seq_len),
            "n_tokens": np.minimum(doc_lens, seq_len).astype(np.int32),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def export_training_data(ds: Dataset, term_dict_dir: str, out_dir: str,
                         vocab_size: int = 30_000, seq_len: int = 128,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Full export: vocab + sequences written as partitioned parquet.
    Returns the vocab table (also persisted alongside)."""
    import os

    vocab = build_vocab(term_dict_dir, vocab_size)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(vocab, os.path.join(out_dir, "vocab.parquet"))
    encode_sequences(ds, vocab, seq_len, text_col, id_col).write_parquet(
        os.path.join(out_dir, "sequences"))
    return vocab


def chunk_dataset(ds: Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id", width: int = 16,
                  stride: int = 8) -> Dataset:
    """Sliding-window chunking as a reusable dataset op (the RAG /
    pretraining context-window splitter): chunk c of a doc with n kept
    tokens covers positions [c·stride, c·stride + width); the last
    chunk may be short, zero-token docs emit nothing. n_chunks = 1 +
    max(0, ⌈(n−width)/stride⌉) by floor arithmetic. Entirely map-side
    and vectorized: one tokenize pass, one flat range-gather +
    list-join per batch — no shuffle, no per-chunk Python."""
    if not 0 < stride <= width:
        raise ValueError("need 0 < stride <= width")
    from ..codec import gather_ranges

    def chunk(batch: pa.Table) -> pa.Table:
        flat, _, doc_lens = tokenize_array(batch[text_col])
        n = doc_lens.astype(np.int64)
        doc_starts = np.concatenate(([0], np.cumsum(n)))[:-1]
        nch = np.where(
            n > 0, 1 + np.maximum(0, (n - width + stride - 1) // stride),
            0).astype(np.int64)
        doc_rep = np.repeat(np.arange(len(n), dtype=np.int64), nch)
        cid = (np.arange(int(nch.sum()), dtype=np.int64)
               - np.repeat(np.cumsum(nch) - nch, nch))
        cstart = cid * stride
        clen = np.minimum(width, n[doc_rep] - cstart)
        b0 = doc_starts[doc_rep] + cstart
        idx = gather_ranges(b0, b0 + clen)
        vals = flat.take(pa.array(idx, pa.int64()))
        offs = np.concatenate(([0], np.cumsum(clen))).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), vals)
        did = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        import pyarrow.compute as pc

        return pa.table({
            id_col: pa.array(did[doc_rep], pa.int64()),
            "chunk_id": pa.array(cid, pa.int64()),
            "chunk_start": pa.array(cstart, pa.int64()),
            "n_tokens": pa.array(clen, pa.int64()),
            "chunk_text": pc.binary_join(lists, " "),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")


def fim_dataset(ds: Dataset, *, text_col: str = "text",
                id_col: str = "doc_id", salt: str = "fim") -> Dataset:
    """Fill-in-the-middle splits as a reusable dataset op: two
    hash-derived cut points (md5-low64 of '{salt}:{a|b}:{id}' mod n+1,
    a = min, b = max — deterministic across engines and runs; empty
    parts allowed) emit prefix/middle/suffix columns for PSM/SPM
    re-assembly downstream. Map-side only: one tokenize pass + three
    flat range-gathers per batch."""
    from ..codec import gather_ranges
    from .dedup import md5_low64

    def fim(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, _, doc_lens = tokenize_array(batch[text_col])
        all_n = doc_lens.astype(np.int64)
        all_starts = np.concatenate(([0], np.cumsum(all_n)))[:-1]
        keep = all_n > 0
        did = np.asarray(batch[id_col].combine_chunks()
                         ).astype(np.int64)[keep]
        n, s0 = all_n[keep], all_starts[keep]
        ha = md5_low64(np.array([f"{salt}:a:{d}" for d in did],
                                dtype=object))
        hb = md5_low64(np.array([f"{salt}:b:{d}" for d in did],
                                dtype=object))
        u = (ha % (n + 1).astype(np.uint64)).astype(np.int64)
        v = (hb % (n + 1).astype(np.uint64)).astype(np.int64)
        a, b = np.minimum(u, v), np.maximum(u, v)

        def join_spans(begin, end):
            idx = gather_ranges(begin, end)
            vals = flat.take(pa.array(idx, pa.int64()))
            offs = np.concatenate(
                ([0], np.cumsum(end - begin))).astype(np.int32)
            lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                             vals)
            return pc.binary_join(lists, " ")

        return pa.table({
            id_col: pa.array(did, pa.int64()),
            "cut_a": pa.array(a, pa.int64()),
            "cut_b": pa.array(b, pa.int64()),
            "prefix_text": join_spans(s0, s0 + a),
            "middle_text": join_spans(s0 + a, s0 + b),
            "suffix_text": join_spans(s0 + b, s0 + n),
        })

    return ds.map_batches(fim, batch_format="pyarrow")
