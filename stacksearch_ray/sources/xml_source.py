"""Streaming Posts.xml source (SURVEY.md §2.1 S1 — the ONE reference
capability previously out of scope).

The reference's XmlParser (/root/reference/dataprocess/parser.py:71-89)
streams StackExchange ``Posts.xml`` via ``etree.iterparse``: rows with
``PostTypeId == '2'`` accumulate as the pending answer list, any OTHER
row is a question that takes the pending answers (stream-adjacent
grouping), and min/max sample bounds skip / early-stop the question
stream — question ordinals [min, max], 1-based and INCLUSIVE at both
ends (reference parity: the break fires AFTER yielding #max), so
adjacent shards must use max_k = min_{k+1} − 1.

Ray-Data-first shape: XML has no row offsets, so a single file is one
streaming READ TASK (bounded memory — iterparse clears elements), and
parallelism comes from (a) many dump files → one task each, and (b)
every downstream stage (tokenize/build) fanning out over the emitted
batches. ``map_batches`` over the path list with a GENERATOR function
keeps the whole pipeline streaming — batches flow to consumers while
the parse is still running; nothing materializes the file.

Faithful semantics, two documented cleanups vs the reference:
- answers pending when a question is SKIPPED by ``min_samples`` are
  dropped with it (the reference leaks them into the first yielded
  post — a bug, not a behavior worth porting);
- the element tree is freed as we go: processed elements are cleared
  AND the document root drops its reference to them each row
  (``root.clear()`` — without it the root's child list still grows
  O(rows)); the reference omits both, which matters for multi-GB
  dumps.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as etree
from collections.abc import Iterator

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from ..text import clean_string


def iter_posts(path: str, min_samples: int = 0,
               max_samples: int | None = None,
               strip_html: bool = True) -> Iterator[dict]:
    """The reference's question iterator: yields one dict per question
    row with its stream-adjacent answers folded in. ``text`` is the
    searchable concatenation (title + body + answer bodies) the
    reference's Post.toWordsArray tokenizes. Yields question ordinals
    [min_samples, max_samples] 1-based INCLUSIVE (reference parity)."""
    pending: list[str] = []
    taken = 0
    context = etree.iterparse(path, events=("start", "end"))
    root = None
    for event, elem in context:
        if root is None:
            root = elem  # first start event = document root
        if event != "end" or elem.tag != "row":
            continue
        attrib = elem.attrib
        if attrib.get("PostTypeId") == "2":
            pending.append(attrib.get("Body", ""))
        else:
            taken += 1
            answers = pending
            pending = []
            if taken < min_samples:  # reference: yield from #min on
                elem.clear()
                continue  # skipped question drops its answers too
            title = attrib.get("Title", "")
            body = attrib.get("Body", "")
            if strip_html:
                title = clean_string(title, strip_html=True) or ""
                body = clean_string(body, strip_html=True) or ""
                answers = [clean_string(a, strip_html=True) or ""
                           for a in answers]
            yield {
                "doc_id": int(attrib.get("Id", "-1")),
                "title": title,
                "body": body,
                "answers": " ".join(answers),
                "text": " ".join(x for x in
                                 (title, body, *answers) if x),
                "n_answers": len(answers),
            }
            if max_samples is not None and taken >= max_samples:
                break
        elem.clear()
        root.clear()  # drop the root's reference to processed rows


def read_posts_xml(source: str | list[str], *, batch_size: int = 1024,
                   min_samples: int = 0, max_samples: int | None = None,
                   strip_html: bool = True) -> Dataset:
    """Posts.xml → streaming Dataset of (doc_id, title, body, answers,
    text, n_answers). One parse task per file; per-file question
    ranges via ``min_samples``/``max_samples`` — 1-based INCLUSIVE at
    both ends, the reference's parseRange semantics."""
    if isinstance(source, str):
        if os.path.isdir(source):
            paths = sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(source) for f in fs
                if f.endswith(".xml"))
        else:
            paths = [source]
    else:
        paths = sorted(source)
    if not paths:
        raise ValueError(f"no .xml files under {source!r}")

    def parse(batch: pa.Table) -> Iterator[pa.Table]:
        for path in batch["path"].to_pylist():
            rows: list[dict] = []
            for row in iter_posts(path, min_samples, max_samples,
                                  strip_html):
                rows.append(row)
                if len(rows) >= batch_size:
                    yield pa.Table.from_pylist(rows)
                    rows = []
            if rows:
                yield pa.Table.from_pylist(rows)

    return (rd.from_items([{"path": p} for p in paths])
            .map_batches(parse, batch_format="pyarrow", batch_size=1))
