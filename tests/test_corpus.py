import glob
import hashlib

import pyarrow.parquet as pq

from astrologer_ray.sources.corpus import CORPUS_SCHEMA, generate_corpus


def test_corpus_deterministic(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    p1 = generate_corpus(d1, n_files=120, seed=42, rows_per_file=50)
    p2 = generate_corpus(d2, n_files=120, seed=42, rows_per_file=50)
    assert len(p1) == len(p2) > 1
    for a, b in zip(p1, p2):
        assert open(a, "rb").read() == open(b, "rb").read()


def test_corpus_schema_and_edges(tmp_path):
    d = str(tmp_path / "c")
    generate_corpus(d, n_files=100, seed=1, rows_per_file=1000)
    t = pq.read_table(sorted(glob.glob(d + "/*.parquet"))[0])
    assert t.schema.equals(CORPUS_SCHEMA)
    contents = t.column("content").to_pylist()
    assert "" in contents  # empty-content edge row
    assert any("\x00" in c for c in contents)  # NUL edge row
    keys = list(zip(t.column("repo").to_pylist(), t.column("path").to_pylist(),
                    t.column("commit").to_pylist()))
    assert len(keys) == len(set(keys))  # (repo,path,commit) unique


def test_corpus_has_duplicate_contents(tmp_path):
    d = str(tmp_path / "d")
    generate_corpus(d, n_files=500, seed=2, dup_rate=0.1, rows_per_file=1000)
    t = pq.read_table(glob.glob(d + "/*.parquet"))
    hashes = [hashlib.sha256(c.encode()).hexdigest() for c in t.column("content").to_pylist()]
    assert len(set(hashes)) < len(hashes)  # exact-dup contents exist for dedup tests
