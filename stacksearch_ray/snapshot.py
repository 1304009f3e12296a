"""Point-in-time index snapshots (the Elasticsearch snapshot/restore
analog), built on the index's two structural guarantees:

1. **Data files are immutable** — every writer in this repo (build,
   append, compact, purge, merge) creates new files and publishes via
   tmp → ``os.replace``; no file is ever modified through its inode.
   A hardlink therefore IS a stable point-in-time copy, and repeated
   snapshots share segment storage automatically (ES's "incremental
   snapshot" falls out of the inode sharing for free).
2. **Crash-consistency is already a supported open state** — engine
   open runs recover_segments/appends/purges, so an image taken
   mid-append/mid-purge is exactly as healable as a crash image.
   Snapshots link ``stats.json`` (the commit point) FIRST, so the
   captured view is never newer than its commit record; any staged
   files captured alongside are rolled forward or ignored by the
   standard recovery on first open.

At 100 TB the same design maps to object storage: segment objects are
immutable and content-addressed, a "snapshot" is a manifest listing
object keys (no data copy), and restore is a manifest re-point. The
manifest written here records exactly that file list.

Reference capability analog: the persisted-index lifecycle
(``main.py`` saveIndex/loadIndex); snapshots extend it with
point-in-time isolation the reference never had.
"""

from __future__ import annotations

import json
import os
import shutil
import time

_MANIFEST = "snapshot_manifest.json"
# runtime state that must NOT travel with a snapshot: pending journals
# are healed on open (linked deliberately), but tmp staging files are
# partial writes with no recovery meaning
_SKIP_PREFIXES = ("tmp-", ".tmp")


def _link_or_copy(src: str, dst: str) -> str:
    try:
        os.link(src, dst)
        return "link"
    except OSError:
        shutil.copy2(src, dst)  # cross-device fallback
        return "copy"


def snapshot_index(index_dir: str, snap_dir: str,
                   parent: str | None = None) -> dict:
    """Capture a point-in-time image of ``index_dir`` into
    ``snap_dir`` (created; must not already contain a manifest).
    Returns the manifest dict. ``parent``: a previous snapshot dir —
    purely informational: the manifest then reports how many files are
    shared with it (they are hardlinks of the same inodes, so shared
    files occupy no extra storage either way).

    The snapshot is openable directly (``QueryEngine(snap_dir)``) —
    restore_snapshot exists for re-pointing a serving directory."""
    from .append import resolve_index_alias

    index_dir = resolve_index_alias(index_dir)  # alias dirs welcome
    if not os.path.isfile(os.path.join(index_dir, "stats.json")):
        raise FileNotFoundError(f"not an index (no stats.json): {index_dir}")
    os.makedirs(snap_dir, exist_ok=True)
    if os.path.exists(os.path.join(snap_dir, _MANIFEST)):
        raise FileExistsError(f"snapshot already exists: {snap_dir}")

    files: dict[str, dict] = {}

    def take(rel: str) -> None:
        src = os.path.join(index_dir, rel)
        dst = os.path.join(snap_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        how = _link_or_copy(src, dst)
        st = os.stat(dst)
        files[rel] = {"size": st.st_size, "inode": st.st_ino, "via": how}

    # commit point first: the captured stats.json can only be OLDER
    # than (or equal to) the rest of the image — mid-flight writers
    # leave at worst a crash-consistent state the recovery heals
    take("stats.json")
    for root, dirs, names in os.walk(index_dir):
        dirs[:] = [d for d in dirs if not d.startswith(_SKIP_PREFIXES)]
        for n in sorted(names):
            rel = os.path.relpath(os.path.join(root, n), index_dir)
            if rel == "stats.json" or rel in files:
                continue
            if n.startswith(_SKIP_PREFIXES):
                continue
            take(rel)

    shared = 0
    if parent is not None:
        try:
            with open(os.path.join(parent, _MANIFEST)) as f:
                pfiles = json.load(f)["files"]
            shared = sum(1 for rel, meta in files.items()
                         if rel in pfiles
                         and pfiles[rel]["inode"] == meta["inode"])
        except FileNotFoundError:
            raise FileNotFoundError(f"parent has no manifest: {parent}")

    manifest = {
        "source": os.path.abspath(index_dir),
        "taken_unix": time.time(),
        "n_files": len(files),
        "n_shared_with_parent": shared,
        "parent": os.path.abspath(parent) if parent else None,
        "files": files,
    }
    tmp = os.path.join(snap_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(snap_dir, _MANIFEST))  # snapshot commit
    return manifest


def restore_snapshot(snap_dir: str, dest_dir: str) -> dict:
    """Materialize a snapshot into ``dest_dir`` (hardlinks again — the
    restored index shares storage with the snapshot; immutability makes
    that safe). Refuses a dest that already looks like an index."""
    man_path = os.path.join(snap_dir, _MANIFEST)
    with open(man_path) as f:
        manifest = json.load(f)
    if os.path.isfile(os.path.join(dest_dir, "stats.json")):
        raise FileExistsError(f"dest already holds an index: {dest_dir}")
    os.makedirs(dest_dir, exist_ok=True)
    for rel in manifest["files"]:
        src = os.path.join(snap_dir, rel)
        dst = os.path.join(dest_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        _link_or_copy(src, dst)
    return manifest


def verify_snapshot(snap_dir: str) -> bool:
    """Structural check: every manifest file exists with its recorded
    size, and the image passes the index fsck."""
    with open(os.path.join(snap_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    for rel, meta in manifest["files"].items():
        p = os.path.join(snap_dir, rel)
        if not os.path.isfile(p) or os.path.getsize(p) != meta["size"]:
            return False
    from .fsck import fsck_index

    return fsck_index(snap_dir).ok
