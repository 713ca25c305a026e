"""Index aliases: named pointers to one or more indexes, with optional
filters — the ES ``_aliases`` API analog.

The reference operates ES the classic way (one index per period, ingest
into the newest; /root/reference/es/indices.go defines the per-index
settings the ingest creates): readers query a stable alias while
``_reindex`` builds a replacement, then one ATOMIC ``_aliases`` call
swaps the pointer — zero-downtime reindexing. This module provides that
contract over index directories:

- the registry is one JSON file; every mutation rewrites it via
  tmp + ``os.replace`` (atomic on POSIX), so readers see either the old
  or the new mapping, never a partial one — and a multi-action body
  (remove old + add new) is a single swap, ES semantics;
- an alias maps to a LIST of index dirs (multi-index reads through
  :class:`~astrologer_ray.state.pool.MultiIndexSearchPool`) and an
  optional ES filter body composed into every query.

Registry shape::

    {"aliases": {"logs": {"indexes": ["/path/idx_2024"],
                          "filter": {"term": {"lang": "py"}}}}}
"""

from __future__ import annotations

import json
import os
import tempfile


def load_aliases(path: str) -> dict:
    """Read the registry (empty registry if the file does not exist)."""
    if not os.path.exists(path):
        return {"aliases": {}}
    with open(path) as f:
        reg = json.load(f)
    if "aliases" not in reg:
        raise ValueError(f"not an alias registry: {path}")
    return reg


def _save_atomic(path: str, reg: dict) -> None:
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".aliases-")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(reg, f, indent=1, sort_keys=True)
        os.replace(tmp, path)  # atomic publish: old or new, never partial
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def apply_actions(path: str, actions: list[dict]) -> dict:
    """ES ``POST /_aliases`` semantics: validate EVERY action against the
    in-memory copy first, then publish once — all actions take effect
    together or none do (the zero-downtime swap primitive).

    Concurrency: writers serialize on a sidecar ``.lock`` file
    (``flock``), so two concurrent action bodies apply in SOME order and
    neither is lost; readers never block (``os.replace`` keeps every
    read a consistent snapshot).

    Actions: ``{"add": {"index": dir, "alias": name[, "filter": body]}}``
    and ``{"remove": {"index": dir | "*", "alias": name}}``."""
    import fcntl

    lock_path = path + ".lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        return _apply_actions_locked(path, actions)


def _apply_actions_locked(path: str, actions: list[dict]) -> dict:
    reg = load_aliases(path)
    aliases = reg["aliases"]
    for act in actions:
        if len(act) != 1 or next(iter(act)) not in ("add", "remove"):
            raise ValueError(f"bad action {act!r}: need one of add/remove")
        kind, arg = next(iter(act.items()))
        name = arg["alias"]
        if kind == "add":
            idx = arg["index"]
            if not os.path.isdir(idx):
                raise ValueError(f"add {name!r}: no such index dir {idx!r}")
            e = aliases.setdefault(name, {"indexes": []})
            if idx not in e["indexes"]:
                e["indexes"].append(idx)
            if "filter" in arg:
                e["filter"] = arg["filter"]
        else:
            if name not in aliases:
                raise ValueError(f"remove: unknown alias {name!r}")
            idx = arg.get("index", "*")
            e = aliases[name]
            if idx == "*":
                e["indexes"] = []
            elif idx in e["indexes"]:
                e["indexes"].remove(idx)
            else:
                raise ValueError(
                    f"remove {name!r}: {idx!r} not in alias")
            if not e["indexes"]:
                del aliases[name]
    _save_atomic(path, reg)
    return reg


def resolve(path: str, name: str) -> tuple[list[str], dict | None]:
    """Alias name -> (index dirs, optional filter body). A name not in
    the registry resolves to itself (a literal index dir), like ES
    accepting either an index or an alias in the URL."""
    reg = load_aliases(path)
    e = reg["aliases"].get(name)
    if e is None:
        return [d for d in name.split(",") if d], None
    return list(e["indexes"]), e.get("filter")
