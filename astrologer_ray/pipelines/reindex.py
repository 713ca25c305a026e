"""ES ``_reindex`` analog: stream a source corpus into a new corpus with
an optional filter-context query, a painless transform script, and a
field projection — then (optionally) build the index over the result.

The reference's ingest is itself a reindex-shaped job (Postgres rows ->
transformed ES docs, /root/reference/es/adapter.go); ES's own `_reindex`
API adds the query/script/projection knobs this module mirrors:

  reindex(src, dst,
          query={"bool": {"filter": [{"term": {"lang": "en"}},
                                     {"range": {"n_chars": {"gte": 200}}}],
                 "must": [{"match": {"text": "data"}}]}},
          script="ctx._source.kchars = doc['n_chars'].value / 1000.0",
          fields=["doc_id", "lang", "kchars"])

Scale shape:
- attribute predicates (term / terms / range, and must_not of those)
  compile to ONE pyarrow dataset filter expression pushed into the scan
  — non-qualifying row groups never leave storage;
- ``match`` on the text column becomes a residual vectorized batch
  predicate (one C regex pass per term: token bounded by non-alnum ==
  simple-mode token membership, the same kernel the registry's
  docs_containing_term uses) — it streams, never materializes;
- the script is the shared vectorized painless subset
  (functions/painless.py): one numpy expression per statement per
  batch, no Python row loop;
- output is partitioned parquet written by the streaming executor
  (resumable per-block files), and the destination index build is the
  normal ``pipelines.build.build_index`` over it.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from astrologer_ray.functions import painless

# token bounded by non-alnum or string edge == simple-mode membership
_TOKEN_RE = "(^|[^a-z0-9]){}([^a-z0-9]|$)"

_CTX_REF = re.compile(r"ctx\._source\.(\w+)")
_ASSIGN = re.compile(r"^\s*ctx\._source\.(\w+)\s*=\s*(.+?)\s*$")


def _scan_expr(clause: dict):
    """One filter-context clause -> pyarrow dataset expression, or None
    if it needs the residual batch path (match / exists)."""
    kind, arg = next(iter(clause.items()))
    if kind == "term":
        col, v = next(iter(arg.items()))
        if isinstance(v, dict):
            v = v["value"]
        return pc.field(col) == v
    if kind == "terms":
        col, vals = next(iter(arg.items()))
        return pc.field(col).isin(list(vals))
    if kind == "range":
        col, spec = next(iter(arg.items()))
        e = None
        for op, fn in (("gte", "__ge__"), ("gt", "__gt__"),
                       ("lte", "__le__"), ("lt", "__lt__")):
            if op in spec:
                part = getattr(pc.field(col), fn)(spec[op])
                e = part if e is None else e & part
        if e is None:
            raise ValueError(f"empty range spec for {col!r}")
        return e
    return None


def _residual_pred(clause: dict, text_col: str):
    """Residual batch predicate for clauses the scan can't express."""
    kind, arg = next(iter(clause.items()))
    if kind == "match":
        col, v = next(iter(arg.items()))
        if isinstance(v, dict):
            v = v.get("query", "")
        terms = [w for w in re.split(r"[^a-z0-9]+", str(v).lower()) if w]

        def pred(t: pa.Table):
            lower = pc.utf8_lower(pc.fill_null(t[col].combine_chunks(), ""))
            mask = None
            for w in terms:  # ES match = OR over analyzed terms
                m = pc.match_substring_regex(lower,
                                             _TOKEN_RE.format(re.escape(w)))
                mask = m if mask is None else pc.or_(mask, m)
            return mask

        return pred
    if kind == "exists":
        col = arg["field"]

        def pred(t: pa.Table):
            return pc.is_valid(t[col].combine_chunks())

        return pred
    raise NotImplementedError(f"reindex query clause {kind!r}")


def translate_query(query: dict | None, text_col: str = "text"):
    """ES filter-context query -> (scan expression | None,
    [residual predicates]). bool.filter/must AND their children;
    bool.must_not negates scan-expressible children."""
    if query is None:
        return None, []
    kind, arg = next(iter(query.items()))
    if kind == "bool":
        scan, residual = None, []
        for key in ("filter", "must"):
            clauses = arg.get(key, [])
            if isinstance(clauses, dict):
                clauses = [clauses]
            for c in clauses:
                s, r = translate_query(c, text_col)
                if s is not None:
                    scan = s if scan is None else scan & s
                residual += r
        nots = arg.get("must_not", [])
        if isinstance(nots, dict):
            nots = [nots]
        for c in nots:
            s = _scan_expr(c)
            if s is None:
                raise NotImplementedError(
                    "must_not supports attribute clauses only")
            scan = ~s if scan is None else scan & ~s
        return scan, residual
    if kind == "match_all":
        return None, []
    s = _scan_expr(query)
    if s is not None:
        return s, []
    return None, [_residual_pred(query, text_col)]


def compile_script(script: str | None):
    """``ctx._source.f = <painless arithmetic>;`` statements -> list of
    (out_field, translated numpy expr). RHS may reference fields as
    either ``ctx._source.x`` or ``doc['x'].value``."""
    if not script:
        return []
    stmts = []
    for raw in script.split(";"):
        if not raw.strip():
            continue
        m = _ASSIGN.match(raw)
        if not m:
            raise NotImplementedError(
                f"reindex script statement {raw.strip()!r} "
                "(supported: ctx._source.<field> = <arithmetic>)")
        out, rhs = m.group(1), m.group(2)
        rhs = _CTX_REF.sub(r"doc['\1'].value", rhs)
        stmts.append((out, painless.translate(rhs), rhs))
    return stmts


def reindex(
    src_path: str | list[str],
    dst_dir: str,
    *,
    query: dict | None = None,
    script: str | None = None,
    fields: list[str] | None = None,
    text_col: str = "text",
    parallelism: int | None = None,
) -> dict:
    """Run the reindex; returns ``{"n_docs": ..., "corpus_dir": ...}``.
    The destination corpus lands in ``dst_dir/corpus/`` as partitioned
    parquet; build the destination index with
    ``build_index(glob(dst_dir/corpus/*.parquet), dst_dir/index)``."""
    import ray.data as rd

    scan, residual = translate_query(query, text_col)
    stmts = compile_script(script)

    kw = {}
    if scan is not None:
        kw["filter"] = scan
    ds: Dataset = rd.read_parquet(src_path, **kw)
    if parallelism:
        ds = ds.repartition(parallelism)

    def transform(t: pa.Table) -> pa.Table:
        for pred in residual:
            t = t.filter(pred(t))
        if t.num_rows and stmts:
            docs = {name: t[name].to_numpy(zero_copy_only=False)
                    for name in t.column_names
                    if not pa.types.is_string(t.schema.field(name).type)}
            for out, expr, src in stmts:
                vals = painless.evaluate(expr, src, docs=docs,
                                         what="reindex script")
                col = pa.array(vals)
                if out in t.column_names:
                    t = t.set_column(t.column_names.index(out), out, col)
                else:
                    t = t.append_column(out, col)
        elif stmts:
            # keep the empty-batch schema identical to non-empty batches
            for out, expr, src in stmts:
                if out not in t.column_names:
                    t = t.append_column(out, pa.array([], pa.float64()))
        if fields:
            t = t.select(fields)
        return t

    import glob as _g
    import shutil

    out_dir = os.path.join(dst_dir, "corpus")
    if os.path.isdir(out_dir):  # stale blocks would double-count
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ds = ds.map_batches(transform, batch_format="pyarrow")
    ds.write_parquet(out_dir)
    import pyarrow.parquet as pq

    n = sum(pq.read_metadata(f).num_rows
            for f in _g.glob(os.path.join(out_dir, "*.parquet")))
    return {"n_docs": n, "corpus_dir": out_dir}
