import json
import os

from astrologer_ray.cli import main


def test_cli_full_flow(ray_session, small_corpus_dir, tmp_path, capsys):
    idx = str(tmp_path / "cliidx")

    assert main(["create-index", idx]) == 0
    assert os.path.isdir(idx + "/partials")

    assert main(["build", small_corpus_dir, idx, "--partition-rows", "64"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["n_docs"] > 0

    assert main(["stats", small_corpus_dir, idx, "--partition-rows", "64"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["missing"] == []
    assert stats["index_meta"]["n_docs"] == meta["n_docs"]

    assert main(["ingest", small_corpus_dir, idx, "--partition-rows", "64"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out.get("up_to_date") is True

    assert main(["search", idx, "mergeSort index", "-k", "3"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert 1 <= len(lines) <= 3
    hit = json.loads(lines[0])
    assert {"rank", "doc_id", "score", "repo"} <= set(hit)


def test_cli_ingest_rebuilds_missing(ray_session, small_corpus_dir, tmp_path, capsys):
    import glob

    idx = str(tmp_path / "cliidx2")
    assert main(["build", small_corpus_dir, idx, "--partition-rows", "64"]) == 0
    capsys.readouterr()
    for f in glob.glob(idx + "/partials/*-000001.*"):
        os.remove(f)
    assert main(["stats", small_corpus_dir, idx, "--partition-rows", "64"]) == 0
    assert json.loads(capsys.readouterr().out)["missing"] == [1]
    assert main(["ingest", small_corpus_dir, idx, "--partition-rows", "64"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rebuilt_partitions"] == [1]
