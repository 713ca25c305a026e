"""Index snapshot / restore — the ES snapshot-repository surface.

A snapshot is a CONSISTENT copy of one index (base + delta segments +
tombstones + stats) with a manifest recording every file's size so a
restore — or a later audit — can detect truncation and drift without
re-hashing terabytes.  Design points for scale:

- **Atomic**: files copy into ``<dest>.tmp`` and the directory renames
  into place last, so a crashed snapshot is never mistaken for a whole
  one (the same tmp+rename discipline as every sink in this repo).
- **Consistent**: the copy refuses to run while the index has no
  ``_SUCCESS`` marker (mid-build), and re-verifies after copying that
  the source manifest didn't change underneath it (a concurrent append
  flips ``claims.json``/segment dirs) — detected, not silently mixed.
- **Restore is a snapshot in reverse** with the same manifest check,
  refusing to overwrite an existing index unless ``force=True``.

The reference delegates durability to Elasticsearch snapshots; here the
index IS parquet + json on a filesystem, so the snapshot is plain file
fan-out — one Ray task per file group would work, but snapshots are
I/O-bound on the store, not CPU-bound, so a thread pool is the right
engine (no object-store round-trip for bytes that never need to be in
memory).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor

MANIFEST = "snapshot-manifest.json"


def _index_files(index_dir: str) -> list[tuple[str, int]]:
    """Every file under the index, relative path + size, sorted."""
    out = []
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            p = os.path.join(root, f)
            out.append((os.path.relpath(p, index_dir), os.path.getsize(p)))
    out.sort()
    return out


def snapshot_index(
    index_dir: str, dest: str, threads: int = 8
) -> dict:
    """Copy ``index_dir`` to ``dest`` atomically with a size manifest."""
    if not os.path.exists(os.path.join(index_dir, "_SUCCESS")):
        raise RuntimeError(
            f"{index_dir} has no _SUCCESS marker — refusing to snapshot a "
            "mid-build index"
        )
    if os.path.exists(dest):
        raise RuntimeError(f"snapshot dest {dest} already exists")
    before = _index_files(index_dir)
    tmp = dest + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    def _copy(rel: str) -> None:
        src = os.path.join(index_dir, rel)
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)

    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(_copy, [rel for rel, _ in before]))
    after = _index_files(index_dir)
    if after != before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            "index changed during snapshot (concurrent append/compact?) — "
            "snapshot aborted, nothing written"
        )
    manifest = {
        "source": os.path.abspath(index_dir),
        "created_unix": time.time(),
        "n_files": len(before),
        "bytes": sum(sz for _, sz in before),
        "files": [{"path": rel, "bytes": sz} for rel, sz in before],
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, dest)
    return {
        "dest": dest, "n_files": len(before), "bytes": manifest["bytes"],
        "seconds": round(time.monotonic() - t0, 3),
    }


def verify_snapshot(snap_dir: str) -> dict:
    """Check every manifest entry exists with the recorded size."""
    with open(os.path.join(snap_dir, MANIFEST)) as f:
        manifest = json.load(f)
    missing, wrong = [], []
    for ent in manifest["files"]:
        p = os.path.join(snap_dir, ent["path"])
        if not os.path.exists(p):
            missing.append(ent["path"])
        elif os.path.getsize(p) != ent["bytes"]:
            wrong.append(ent["path"])
    return {
        "ok": not missing and not wrong,
        "n_files": manifest["n_files"],
        "missing": missing,
        "size_mismatch": wrong,
    }


def restore_index(
    snap_dir: str, dest: str, force: bool = False, threads: int = 8
) -> dict:
    """Restore a snapshot into ``dest`` (atomic tmp+rename). Verifies
    the snapshot manifest first; refuses an existing dest unless
    ``force``."""
    v = verify_snapshot(snap_dir)
    if not v["ok"]:
        raise RuntimeError(f"snapshot {snap_dir} fails verification: {v}")
    if os.path.exists(dest):
        if not force:
            raise RuntimeError(
                f"restore dest {dest} exists — pass force=True to replace"
            )
    tmp = dest + ".restore-tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    with open(os.path.join(snap_dir, MANIFEST)) as f:
        manifest = json.load(f)

    def _copy(rel: str) -> None:
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(os.path.join(snap_dir, rel), dst)

    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(_copy, [e["path"] for e in manifest["files"]]))
    if os.path.exists(dest):
        old = dest + ".pre-restore"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(dest, old)
        os.rename(tmp, dest)
        shutil.rmtree(old)
    else:
        os.rename(tmp, dest)
    return {
        "dest": dest, "n_files": manifest["n_files"],
        "bytes": manifest["bytes"],
        "seconds": round(time.monotonic() - t0, 3),
    }
