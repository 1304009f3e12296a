"""ILM-style index rollover (the Elasticsearch rollover / ILM
capability the reference's single monolithic index lacks; capability
extension beyond /root/reference — no analog there).

An ingest stream is cut into bounded GENERATIONS — ``gen-000000``,
``gen-000001``, … — each an independent index built with the standard
pipeline (own lifecycle: append, delete, compact). A manifest
(``generations.json``, written atomically via tmp+rename after each
generation completes) is the commit record; ``open_rollover`` serves
every committed generation as ONE virtual index through
``FederatedQueryEngine`` — bitwise identical to a monolithic rebuild
over the union (the federated union-stats argument, query.py).

Resumability (the 100 TB property): generation g's input is the
deterministic row range [g·max_docs, (g+1)·max_docs) of the source in
file order (``read_corpus_range`` prunes non-overlapping files at the
parquet footer), so a crashed ingest re-run SKIPS every committed
generation and rebuilds only the missing ones — no work is repeated
and no partial generation is ever served (a generation is visible only
once both its stats.json and its manifest row exist).

At scale each generation is also the natural retention / tiering unit:
drop a generation = delete its directory + rewrite the manifest; no
tombstone pass over the other 99.9% of the corpus.
"""

from __future__ import annotations

import json
import os

from .build import IndexBuildConfig, build_index, load_stats
from .sources.corpus_source import _files_with_counts, read_corpus_range

MANIFEST = "generations.json"


def _gen_name(g: int) -> str:
    return f"gen-{g:06d}"


def _read_manifest(base_dir: str) -> dict:
    p = os.path.join(base_dir, MANIFEST)
    if not os.path.exists(p):
        return {"max_docs": None, "generations": []}
    with open(p) as f:
        return json.load(f)


def _write_manifest(base_dir: str, man: dict) -> None:
    tmp = os.path.join(base_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(base_dir, MANIFEST))


def _committed(base_dir: str, man: dict) -> set[str]:
    """A generation counts only if BOTH its manifest row and its index
    commit point (stats.json) exist — either alone is an aborted build."""
    out = set()
    for g in man["generations"]:
        if os.path.exists(os.path.join(base_dir, g["name"], "stats.json")):
            out.add(g["name"])
    return out


def rollover_ingest(source, base_dir: str, max_docs: int,
                    cfg: IndexBuildConfig | None = None,
                    content_col: str | None = None,
                    id_col: str | None = None,
                    **cfg_overrides) -> dict:
    """Cut ``source`` (parquet path/dir/list) into generations of at
    most ``max_docs`` rows in arrival (file/row) order and build one
    index per generation. Idempotent/resumable: committed generations
    are skipped on re-run. Returns the manifest dict."""
    if max_docs <= 0:
        raise ValueError("max_docs must be positive")
    os.makedirs(base_dir, exist_ok=True)
    man = _read_manifest(base_dir)
    if man["max_docs"] not in (None, max_docs):
        raise ValueError(
            f"rollover base {base_dir} was cut at max_docs="
            f"{man['max_docs']}, re-ingest asked for {max_docs}; "
            "generation row ranges would shift — use a fresh base_dir")
    man["max_docs"] = max_docs
    total = sum(n for _, n in _files_with_counts(source))
    done = _committed(base_dir, man)
    by_name = {g["name"]: g for g in man["generations"]}
    n_gens = (total + max_docs - 1) // max_docs
    for g in range(n_gens):
        name = _gen_name(g)
        start, stop = g * max_docs, min((g + 1) * max_docs, total)
        if name in done:
            prev = by_name[name]
            # rows may exceed the ingest range if the generation later
            # took appends (rollover_append) — still the same range
            if prev["start"] != start or prev["rows"] < stop - start:
                raise ValueError(
                    f"{name} committed over rows "
                    f"[{prev['start']}, {prev['start'] + prev['rows']}) "
                    f"but the source now maps it to [{start}, {stop}) — "
                    "the source changed under a resumed ingest")
            continue
        gen_dir = os.path.join(base_dir, name)
        if os.path.exists(gen_dir):  # uncommitted leftover from a crash
            import shutil

            shutil.rmtree(gen_dir)
        ds = read_corpus_range(source, start, stop)
        build_index(ds, gen_dir, cfg=cfg, content_col=content_col,
                    id_col=id_col, **cfg_overrides)
        by_name[name] = {"name": name, "start": start,
                         "rows": stop - start}
        # full sorted rewrite — a rebuilt EARLIER generation must not
        # drop later committed ones from the manifest
        man["generations"] = [by_name[n] for n in sorted(by_name)]
        _write_manifest(base_dir, man)  # commit point per generation
    return man


def rollover_append(new_source, base_dir: str,
                    content_col: str | None = None,
                    id_col: str | None = None,
                    **cfg_overrides) -> list[str]:
    """Route new documents through the rollover policy: fill the
    current write generation up to ``max_docs`` (a journaled
    ``append_to_index``), then seal it and start new generation(s) for
    the remainder. Returns the generation names touched. New doc ids
    must be disjoint from every existing generation (each append /
    build runs the standard collision audit within its generation;
    cross-generation disjointness is enforced at ``open_rollover``)."""
    from .append import append_to_index

    man = _read_manifest(base_dir)
    if not man["generations"]:
        raise ValueError(f"{base_dir} has no committed generations — "
                         "run rollover_ingest first")
    max_docs = int(man["max_docs"])
    total_new = sum(n for _, n in _files_with_counts(new_source))
    touched: list[str] = []
    pos = 0
    by_name = {g["name"]: g for g in man["generations"]}
    while pos < total_new:
        last = man["generations"][-1]
        cur_rows = int(load_stats(
            os.path.join(base_dir, last["name"]))["n_docs"])
        room = max_docs - cur_rows
        if room > 0:
            take = min(room, total_new - pos)
            ds = read_corpus_range(new_source, pos, pos + take)
            append_to_index(ds, os.path.join(base_dir, last["name"]),
                            content_col=content_col, id_col=id_col)
            last["rows"] = cur_rows + take
        else:
            take = min(max_docs, total_new - pos)
            g = len(man["generations"])
            name = _gen_name(g)
            ds = read_corpus_range(new_source, pos, pos + take)
            build_index(ds, os.path.join(base_dir, name),
                        content_col=content_col, id_col=id_col,
                        **cfg_overrides)
            row = {"name": name, "start": -1, "rows": take}
            man["generations"].append(row)
            by_name[name] = row
        touched.append(man["generations"][-1]["name"])
        _write_manifest(base_dir, man)
        pos += take
    return touched


def open_rollover(base_dir: str):
    """Open every committed generation as one virtual index. Returns a
    plain ``QueryEngine`` for a single generation, else a
    ``FederatedQueryEngine`` (union collection stats — bitwise equal to
    a monolithic rebuild; the federated engine also enforces
    cross-generation doc-id disjointness)."""
    from .query import FederatedQueryEngine, QueryEngine

    man = _read_manifest(base_dir)
    dirs = [os.path.join(base_dir, g["name"]) for g in man["generations"]
            if g["name"] in _committed(base_dir, man)]
    if not dirs:
        raise ValueError(f"{base_dir} has no committed generations")
    if len(dirs) == 1:
        return QueryEngine(dirs[0])
    return FederatedQueryEngine(dirs)


def rollover_status(base_dir: str) -> dict:
    """Manifest + per-generation live row counts (post delete/append)."""
    man = _read_manifest(base_dir)
    gens = []
    for g in man["generations"]:
        d = os.path.join(base_dir, g["name"])
        sealed = os.path.exists(os.path.join(d, "stats.json"))
        row = {"name": g["name"], "committed": sealed}
        if sealed:
            row["n_docs"] = int(load_stats(d)["n_docs"])
        gens.append(row)
    return {"max_docs": man["max_docs"], "generations": gens}
