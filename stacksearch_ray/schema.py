"""Arrow schemas and doc-id / hashing helpers (SURVEY.md §1.2).

Tables:

- ``corpus``  — the input (BASELINE.json input_hint):
  ``repo,path,commit,lang,content`` all string.
- ``docs``    — derived doc-store (replaces the reference's ``titlesCache``,
  /root/reference/dataprocess/parser.py:8, and ``fetch_post_by_id`` scans,
  /root/reference/results.py:149-158).
- ``postings``— exploded (term, doc_id, tf) — the shuffle payload.
- ``segments``— the persisted index: one row per (term, shard), doc_id-sorted
  delta+varint-compressed postings with skip blocks + block-max metadata
  (replaces the pickle blobs of /root/reference/index/index.py:68-76).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content_sha256", pa.string()),
        ("doc_len", pa.int64()),
    ]
)

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("shard", pa.int32()),
    ]
)

SEGMENTS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("df", pa.int64()),          # docs containing term, within this shard
        ("cf", pa.int64()),          # total occurrences, within this shard
        ("doc_ids", pa.binary()),    # delta+varint-compressed sorted doc ids
        ("tfs", pa.binary()),        # varint-compressed tfs, aligned
        ("skip_first_doc", pa.list_(pa.int64())),   # first doc_id per block
        ("skip_doc_offset", pa.list_(pa.int32())),  # byte offset into doc_ids per block
        ("skip_tf_offset", pa.list_(pa.int32())),   # byte offset into tfs per block
        ("block_max_tf", pa.list_(pa.int64())),     # max tf per block
        ("block_max_score", pa.list_(pa.float64())),  # BM25 upper bound per block
    ]
)

TERM_DICT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),   # global document frequency
        ("cf", pa.int64()),   # global collection frequency
    ]
)

# Bump when the on-disk index layout changes (segments schema, codec,
# stats fields) — consumers embed it in cache paths so stale indexes from
# older code are never read.
INDEX_FORMAT_VERSION = 4  # v4: positions column stored under parquet
#     zstd (BENCH/positions_codec_r5.json: −41% position bytes, −8%
#     segment dirs, decode no slower than snappy). Readers are
#     codec-transparent (parquet column-chunk metadata carries the
#     codec) — the bump exists so conformance caches rebuild and every
#     write path provably shares one policy (segment_compression()).
#     Serving + phrase results off re-compressed segments pinned
#     bitwise-equal in the drill.
# v3: tombstone lifecycle sidecars
#     (tombstones-*/deleted-df-* files; stats.json keys tombstones_file,
#     deleted_df_file, n_tombstones, last_append_id; append.pending-*
#     journals). A v2 reader opening a tombstoned index would silently
#     serve deleted docs — the version gate makes that impossible.
# v2: optional positional sidecar (segments gain a ``positions`` binary
#     column when built with store_positions=True; stats.json records
#     the flag)

# 63-bit mask: doc ids stay positive int64.
_ID_MASK = (1 << 63) - 1


def sha256_hex(content: str | bytes) -> str:
    """Per-row invariant hash (BASELINE.json input_hint): sha256(content)."""
    if isinstance(content, str):
        content = content.encode("utf-8", errors="surrogatepass")
    return hashlib.sha256(content).hexdigest()


def doc_id_for(repo: str, path: str, commit: str) -> int:
    """Deterministic, execution-order-independent 63-bit doc id.

    ``doc_id = sha256(repo \\x00 path \\x00 commit)[:8] & (2^63-1)``.
    Order-free so the doc_id-sorted posting invariant (SURVEY.md §2.9)
    never depends on which partition tokenized the row first. Collisions
    are detected at build time (build.py) and would require a corpus of
    ~2^31 distinct keys to be likely.
    """
    h = hashlib.sha256(f"{repo}\x00{path}\x00{commit}".encode()).digest()
    return int.from_bytes(h[:8], "big") & _ID_MASK


def doc_ids_batch(repo: pa.Array, path: pa.Array, commit: pa.Array) -> np.ndarray:
    """Vectorized-ish batch doc-id assignment (hashlib per row; cheap vs tokenize)."""
    out = np.empty(len(repo), dtype=np.int64)
    r, p, c = repo.to_pylist(), path.to_pylist(), commit.to_pylist()
    for i in range(len(out)):
        out[i] = doc_id_for(r[i], p[i], c[i])
    return out


def sha256_batch(content: pa.Array) -> list[str]:
    return [sha256_hex(s) if s is not None else "" for s in content.to_pylist()]


def shard_of(doc_ids: np.ndarray, num_shards: int) -> np.ndarray:
    """Shard assignment for the term-partitioned index: hash-spread doc ids.

    Knuth multiplicative spread so sequential test doc_ids (e.g. the
    testdata ``documents.doc_id``) still distribute evenly.
    """
    spread = (doc_ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
    return (spread % np.uint64(num_shards)).astype(np.int32)


def segment_compression(schema: pa.Schema) -> dict[str, str] | None:
    """THE per-column parquet codec policy for index artifacts: the
    position-blob column (``positions`` in segments, ``pos`` in staged
    postings) writes under zstd — measured −41% of its bytes vs the
    snappy default with decode no slower (BENCH/positions_codec_r5.json)
    — everything else stays snappy (zstd-all cost +26% decode on the
    cold-scan path, rejected). Returns None when the schema has no
    position column so plain writers keep their default single-codec
    footer. EVERY segment writer (build, checkpoint shards, append
    staging, compact, purge rewrite, empty tables) must route through
    this one function: bitwise file-identity tests (compact == rebuild,
    merge == rebuild) compare artifact bytes, so a writer with a
    different codec is a test failure, not a silent drift."""
    names = set(schema.names)
    poscols = names & {"positions", "pos"}
    if not poscols:
        return None
    return {n: ("zstd" if n in poscols else "snappy")
            for n in schema.names}


def segment_write_kwargs(schema: pa.Schema) -> dict:
    """The policy above as ready-to-splat writer kwargs:
    ``pq.write_table(t, path, **segment_write_kwargs(t.schema))`` /
    ``ds.write_parquet(dir, **segment_write_kwargs(seg_schema))``.
    One helper instead of six hand-copied ``if comp`` blocks, so a new
    segment writer cannot silently omit the codec policy."""
    comp = segment_compression(schema)
    return {"compression": comp} if comp is not None else {}
