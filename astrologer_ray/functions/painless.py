"""Shared painless-arithmetic-subset translator.

The DSL surface accepts ES "painless" scripts in three places — runtime
fields (``emit(<expr>)``), ``function_score.script_score``, and the
bucket pipeline scripts (``bucket_script`` / ``bucket_selector``).  All
three support the same vectorizable subset: arithmetic over
``doc['x'].value`` references, ``params.*`` variables, and ``Math.*``
kernels (reference ES usage:
/root/reference/es.postman_collection.json).  This module is the single
translation + sandboxed-eval implementation behind all of them.
"""
from __future__ import annotations

import re

import numpy as np

_MATH_KERNELS = (
    ("Math.log10", "np.log10"),
    ("Math.log", "np.log"),
    ("Math.sqrt", "np.sqrt"),
    ("Math.abs", "np.abs"),
    ("Math.max", "np.maximum"),
    ("Math.min", "np.minimum"),
)

_DOC_REF = re.compile(r"doc\[['\"](\w+)['\"]\]\.value")


def translate(src: str, logical: bool = False) -> str:
    """Painless source -> python/numpy expression: ``doc['x'].value`` ->
    ``doc_x``, ``Math.*`` -> numpy kernels, ``params.*`` -> ``params_*``;
    ``logical=True`` additionally maps ``&&``/``||`` (the bucket-script
    connectives) to ``and``/``or``."""
    expr = _DOC_REF.sub(r"doc_\1", src)
    for pain, np_name in _MATH_KERNELS:
        expr = expr.replace(pain, np_name)
    expr = expr.replace("params.", "params_")
    if logical:
        expr = expr.replace("&&", " and ").replace("||", " or ")
    return expr


def doc_refs(expr: str) -> set[str]:
    """Attr names referenced as ``doc_<name>`` in a translated expr."""
    return set(re.findall(r"doc_(\w+)", expr))


def _split_top(s: str, op: str) -> list[str]:
    """Split on a connective at paren/bracket depth 0 only."""
    parts, cur, depth, i = [], [], 0, 0
    while i < len(s):
        ch = s[i]
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if depth == 0 and s.startswith(op, i):
            parts.append("".join(cur))
            cur = []
            i += len(op)
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def evaluate_predicate(src: str, *, params: dict | None = None,
                       docs: dict | None = None,
                       what: str = "script") -> np.ndarray:
    """Vectorized boolean evaluation of a painless predicate over
    ``doc_*`` ARRAYS. ``&&``/``||`` cannot become Python ``and``/``or``
    here (not elementwise), and a plain ``&``/``|`` substitution breaks
    on precedence (``a > 1 & b``), so the connectives are split at
    paren depth 0 — ``&&`` binding tighter than ``||``, like painless —
    and each atom evaluates independently, combined with ``&``/``|``."""
    result = None
    for or_part in _split_top(src, "||"):
        m = None
        for atom in _split_top(or_part, "&&"):
            v = evaluate(translate(atom), src, params=params, docs=docs,
                         what=what)
            v = np.asarray(v, dtype=bool)
            m = v if m is None else (m & v)
        result = m if result is None else (result | m)
    return result


def evaluate(expr: str, src: str, *, params: dict | None = None,
             docs: dict | None = None, what: str = "script"):
    """Sandboxed eval of a translated expr (no builtins; ``np``, the
    ``params_*`` scalars and ``doc_*`` arrays only).  Anything beyond
    the supported subset surfaces as ``NotImplementedError`` naming the
    original source."""
    env: dict = {"np": np}
    for k, v in (params or {}).items():
        env[f"params_{k}"] = v
    for k, v in (docs or {}).items():
        env[f"doc_{k}"] = v
    try:
        return eval(expr, {"__builtins__": {}}, env)  # noqa: S307
    except Exception as e:
        raise NotImplementedError(f"unsupported {what} {src!r}: {e}") from e
