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
    files = [[f, n] for f, n in _files_with_counts(source)]
    # a resumed ingest is only safe if the previously consumed source is
    # a PREFIX of the current one (same files, same per-file row counts,
    # same order) — anything else shifts every generation's row range
    prev_files = man.get("source_files")
    if prev_files is not None:
        if (len(files) < len(prev_files)
                or [list(p) for p in files[:len(prev_files)]]
                != [list(p) for p in prev_files]):
            raise ValueError(
                "the source changed under a resumed ingest (previously "
                "consumed files are not a prefix of the current file "
                "list) — generation row ranges would shift; use a "
                "fresh base_dir")
        if len(files) > len(prev_files) and man["generations"]:
            raise ValueError(
                "the source grew since the last ingest — route new "
                "rows through rollover_append (the committed tail "
                "generation's range cannot be extended in place)")
    total = sum(n for _, n in files)
    done = _committed(base_dir, man)
    by_name = {g["name"]: g for g in man["generations"]}
    n_gens = (total + max_docs - 1) // max_docs
    for g in range(n_gens):
        name = _gen_name(g)
        start, stop = g * max_docs, min((g + 1) * max_docs, total)
        if name in done:
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
        man["source_files"] = files
        _write_manifest(base_dir, man)  # commit point per generation
    man["source_files"] = files
    _write_manifest(base_dir, man)
    return man


PENDING = "append.pending"


def _next_gen_index(man: dict) -> int:
    """Max existing generation number + 1 — NEVER len(generations):
    after a retention drop (delete a gen dir + its manifest row) list
    length would re-issue a live generation's name and destroy it."""
    return 1 + max(int(g["name"].split("-")[1])
                   for g in man["generations"])


def _append_plan(man: dict, base_dir: str, files: list) -> list[dict]:
    """Deterministic step plan for routing ``files`` through the
    rollover policy: one optional fill-append into the write generation,
    then whole new generations. Computed ONCE and journaled, so a
    crashed append resumes the same plan instead of re-deriving it from
    mutated live state (which would double-ingest the applied prefix)."""
    max_docs = int(man["max_docs"])
    total = sum(n for _, n in files)
    last = man["generations"][-1]["name"]
    live = int(load_stats(os.path.join(base_dir, last))["n_docs"])
    steps, pos = [], 0
    room = max_docs - live
    if room > 0 and total > 0:
        take = min(room, total)
        steps.append({"kind": "append", "gen": last, "start": 0,
                      "take": take, "docs_before": live})
        pos = take
    g = _next_gen_index(man)
    while pos < total:
        take = min(max_docs, total - pos)
        steps.append({"kind": "build", "gen": _gen_name(g),
                      "start": pos, "take": take})
        g += 1
        pos += take
    return steps


def rollover_append(new_source, base_dir: str,
                    content_col: str | None = None,
                    id_col: str | None = None,
                    **cfg_overrides) -> list[str]:
    """Route new documents through the rollover policy: fill the
    current write generation up to ``max_docs`` (a journaled
    ``append_to_index``), then seal it and start new generation(s) for
    the remainder. Returns the generation names touched.

    Crash-safe: the step plan is journaled (``append.pending``) BEFORE
    any mutation, so a retry after a mid-call crash resumes the SAME
    plan — an already-applied fill append is detected by the write
    generation's doc count and skipped, never re-ingested into a fresh
    generation. A pending journal from a DIFFERENT source must be
    resolved first (re-run with that source) — refusing is what keeps
    two interleaved appends from ingesting overlapping row ranges.

    New doc ids must be disjoint from every existing generation (each
    append/build runs the standard collision audit within its
    generation; cross-generation disjointness is enforced at
    ``open_rollover``)."""
    from .append import append_to_index, recover_appends

    man = _read_manifest(base_dir)
    if not man["generations"]:
        raise ValueError(f"{base_dir} has no committed generations — "
                         "run rollover_ingest first")
    files = [[f, n] for f, n in _files_with_counts(new_source)]
    pend_path = os.path.join(base_dir, PENDING)
    if os.path.exists(pend_path):
        with open(pend_path) as f:
            pend = json.load(f)
        if pend["files"] != files:
            raise ValueError(
                f"{base_dir} has an unfinished rollover_append for a "
                "different source — re-run with that source to resume "
                f"it first (journal: {pend_path})")
    else:
        pend = {"files": files,
                "steps": _append_plan(man, base_dir, files)}
        tmp = pend_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(pend, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, pend_path)

    touched: list[str] = []
    by_name = {g["name"]: g for g in man["generations"]}
    for step in pend["steps"]:
        gen_dir = os.path.join(base_dir, step["gen"])
        ds = None
        if step["kind"] == "append":
            recover_appends(gen_dir)  # settle any half-committed append
            live = int(load_stats(gen_dir)["n_docs"])
            want = step["docs_before"] + step["take"]
            if live == want:
                pass  # applied before the crash — skip
            elif live == step["docs_before"]:
                ds = read_corpus_range(
                    new_source, step["start"],
                    step["start"] + step["take"])
                append_to_index(ds, gen_dir, content_col=content_col,
                                id_col=id_col)
            else:
                raise ValueError(
                    f"{step['gen']} holds {live} docs; the journaled "
                    f"fill step expected {step['docs_before']} or "
                    f"{want} — the generation was mutated outside the "
                    "pending append; resolve manually and delete "
                    f"{pend_path}")
        else:
            if not os.path.exists(os.path.join(gen_dir, "stats.json")):
                if os.path.exists(gen_dir):  # uncommitted leftover
                    import shutil

                    shutil.rmtree(gen_dir)
                ds = read_corpus_range(
                    new_source, step["start"],
                    step["start"] + step["take"])
                build_index(ds, gen_dir, content_col=content_col,
                            id_col=id_col, **cfg_overrides)
            if step["gen"] not in by_name:
                row = {"name": step["gen"], "start": -1,
                       "rows": step["take"]}
                man["generations"].append(row)
                by_name[step["gen"]] = row
        touched.append(step["gen"])
        _write_manifest(base_dir, man)
    os.remove(pend_path)
    return touched


def drop_generation(base_dir: str, name: str) -> None:
    """Retention drop: remove a generation from serving (manifest
    rewrite = the commit point), then delete its directory. Later
    appends keep numbering from the MAX surviving generation
    (_next_gen_index), so a dropped name is never re-issued over live
    data. The write generation (the last one) cannot be dropped while
    an append journal is pending."""
    import shutil

    man = _read_manifest(base_dir)
    names = [g["name"] for g in man["generations"]]
    if name not in names:
        raise ValueError(f"{name} is not a generation of {base_dir}")
    if (name == names[-1]
            and os.path.exists(os.path.join(base_dir, PENDING))):
        raise ValueError(
            f"{name} is the write generation of a pending append — "
            "finish the append (re-run rollover_append) first")
    man["generations"] = [g for g in man["generations"]
                          if g["name"] != name]
    _write_manifest(base_dir, man)  # invisible before the rm
    shutil.rmtree(os.path.join(base_dir, name), ignore_errors=True)


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
    return {"max_docs": man["max_docs"], "generations": gens,
            "pending_append": os.path.exists(
                os.path.join(base_dir, PENDING))}
