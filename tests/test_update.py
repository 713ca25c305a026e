"""ES _update_by_query analog (pipelines/segments.update_by_query):
attr overlay generations, Searcher fold semantics, protected fields,
sharded-pool visibility, compaction survival, and the CLI."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

VOCAB = [f"w{i}" for i in range(40)] + ["mergeSort", "buildIndex"]


def _write_part(path: str, lo: int, hi: int, seed: int = 7) -> None:
    rng = np.random.default_rng(seed + lo)
    rows = []
    for i in range(lo, hi):
        n = int(rng.integers(3, 40))
        rows.append({
            "repo": f"r{i:06d}", "path": f"src/f{i}.py", "commit": "c0",
            "lang": ["py", "go", "rs"][i % 3],
            "content": " ".join(rng.choice(VOCAB, size=n)),
        })
    pq.write_table(pa.Table.from_pylist(rows), path, row_group_size=100)


@pytest.fixture()
def idx(ray_session, tmp_path):
    from astrologer_ray.pipelines.build import build_index

    part = str(tmp_path / "part-000.parquet")
    _write_part(part, 0, 300)
    d = str(tmp_path / "idx")
    build_index([part], d, mode="code", partition_rows=100)
    return d


def test_update_paints_matching_docs(idx):
    from astrologer_ray.pipelines.segments import update_by_query
    from astrologer_ray.state.searcher import Searcher

    out = update_by_query(idx, {"term": {"lang": "go"}},
                          "ctx._source.lang = 'zig'")
    assert out["updated"] == 100 and out["fields"] == ["lang"]
    s = Searcher(idx)
    langs = s.doc_attrs["lang"]
    assert (langs == "zig").sum() == 100 and (langs == "go").sum() == 0
    # the updated value serves through the normal filter path
    assert int(s.filter_mask({"term": {"lang": "zig"}}).sum()) == 100


def test_update_creates_numeric_attr_for_rank_feature(idx):
    from astrologer_ray.pipelines.segments import update_by_query
    from astrologer_ray.state.searcher import Searcher

    update_by_query(idx, {"term": {"lang": "py"}},
                    "ctx._source.prio = doc['dl'].value * 2.0")
    s = Searcher(idx)
    prio = s.doc_attrs["prio"]
    m = s.doc_lang == "py"
    assert np.allclose(prio[m], s.doc_attrs["dl"][m] * 2.0)
    assert np.isnan(prio[~m]).all()
    # NaN (never-set) contributes zero in rank_feature (ADVICE r4 fix)
    hits = s.search_rank_feature(["w1"], feature_attr="prio", pivot=10.0)
    assert hits and all(np.isfinite(h["score"]) for h in hits)


def test_later_generation_wins_and_statement_order(idx):
    from astrologer_ray.pipelines.segments import update_by_query
    from astrologer_ray.state.searcher import Searcher

    update_by_query(idx, {"term": {"lang": "go"}},
                    "ctx._source.tier = 1.0")
    update_by_query(idx, {"term": {"lang": "go"}},
                    "ctx._source.tier = 2.0; "
                    "ctx._source.tier2 = doc['tier'].value + 1.0")
    s = Searcher(idx)
    m = s.doc_lang == "go"
    assert (s.doc_attrs["tier"][m] == 2.0).all()
    assert (s.doc_attrs["tier2"][m] == 3.0).all()


def test_protected_fields_and_empty_script(idx):
    from astrologer_ray.pipelines.segments import update_by_query

    with pytest.raises(ValueError, match="immutable"):
        update_by_query(idx, {"term": {"lang": "go"}},
                        "ctx._source.dl = 1")
    with pytest.raises(ValueError, match="at least one"):
        update_by_query(idx, {"term": {"lang": "go"}}, "  ")


def test_update_skips_tombstoned_docs(idx):
    from astrologer_ray.pipelines.segments import (
        delete_by_query,
        update_by_query,
    )
    from astrologer_ray.state.searcher import Searcher

    deleted = delete_by_query(idx, {"term": {"lang": "go"}})["deleted"]
    out = update_by_query(idx, {"range": {"dl": {"gte": 0}}},
                          "ctx._source.tag = 'seen'")
    s = Searcher(idx)
    assert out["updated"] == s.N - deleted
    tags = s.doc_attrs["tag"]
    assert (np.asarray([t == "seen" for t in tags]).sum()
            == s.N - deleted)


def test_sharded_pool_sees_updates(idx):
    from astrologer_ray.pipelines.segments import update_by_query
    from astrologer_ray.state.searcher import Searcher

    update_by_query(idx, {"term": {"lang": "rs"}},
                    "ctx._source.lang = 'zig'")
    full = Searcher(idx)
    # doc-range shard load path prunes the overlay to its range too
    mid = (full.N // 2) >> int(full.meta.get("chunk_bits", 20)) or 1
    n_chunks = (full.N + (1 << int(full.meta.get("chunk_bits", 20))) - 1
                ) >> int(full.meta.get("chunk_bits", 20))
    lo_shard = Searcher(idx, chunk_range=(0, mid))
    hi_shard = Searcher(idx, chunk_range=(mid, n_chunks))
    got = ((lo_shard.doc_attrs["lang"] == "zig").sum()
           + (hi_shard.doc_attrs["lang"] == "zig").sum())
    assert got == (full.doc_attrs["lang"] == "zig").sum() > 0


def test_updates_survive_compaction(ray_session, tmp_path):
    from astrologer_ray.pipelines.build import build_index
    from astrologer_ray.pipelines.segments import (
        append_segment,
        compact_index,
        update_by_query,
    )
    from astrologer_ray.state.searcher import Searcher

    p0 = str(tmp_path / "part-000.parquet")
    p1 = str(tmp_path / "part-001.parquet")
    _write_part(p0, 0, 200)
    _write_part(p1, 200, 300)  # keys sort AFTER: monotone append
    d = str(tmp_path / "idx")
    build_index([p0], d, mode="code", partition_rows=100)
    update_by_query(d, {"term": {"lang": "go"}}, "ctx._source.lang = 'zig'")
    before = (Searcher(d).doc_attrs["lang"] == "zig").sum()
    append_segment([p1], d, partition_rows=100)
    compact_index([p0, p1], d, partition_rows=100)
    s = Searcher(d)
    assert s.N == 300
    assert (s.doc_attrs["lang"] == "zig").sum() == before > 0


def test_cli_update(idx, capsys):
    from astrologer_ray.cli import main

    rc = main(["update", idx, "--filter", json.dumps({"term": {"lang": "py"}}),
               "--script", "ctx._source.lang = 'moon'"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["updated"] == 100
    assert os.path.isdir(os.path.join(idx, "updates"))


def test_snapshot_restore_preserves_updates(idx, tmp_path):
    """snapshot walks the whole index dir, so updates/ overlays travel
    with it; the restored index serves the painted attrs."""
    from astrologer_ray.pipelines.segments import update_by_query
    from astrologer_ray.pipelines.snapshot import (
        restore_index,
        snapshot_index,
    )
    from astrologer_ray.state.searcher import Searcher

    update_by_query(idx, {"term": {"lang": "go"}}, "ctx._source.lang = 'zig'")
    snap = str(tmp_path / "snap")
    dest = str(tmp_path / "restored")
    snapshot_index(idx, snap)
    restore_index(snap, dest)
    s = Searcher(dest)
    assert (s.doc_attrs["lang"] == "zig").sum() == 100
