import numpy as np
import pytest

from astrologer_ray.functions.codec import (
    BLOCK,
    decode_block,
    decode_chunk,
    encode_chunk,
    varbyte_decode,
    varbyte_encode,
)


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0],
        [1],
        [127],
        [128],
        [16383],
        [16384],
        [2**62],
        [0, 1, 127, 128, 255, 300, 2**20, 2**40, 2**62],
    ],
)
def test_varbyte_roundtrip_fixed(vals):
    v = np.array(vals, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(v))) == vals


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n", [1, 2, 10, 1000, 100_000])
def test_varbyte_roundtrip_random(seed, n):
    rng = np.random.default_rng(seed)
    # mix of small and huge magnitudes (adversarial gaps, FIXTURES.md F3)
    exp = rng.integers(0, 62, size=n)
    v = rng.integers(0, 2**53, size=n).astype(np.uint64) >> (53 - exp // 2).astype(np.uint64)
    out = varbyte_decode(varbyte_encode(v), n)
    np.testing.assert_array_equal(out, v)


def _random_postings(rng, n, max_gap=1000):
    gaps = rng.integers(1, max_gap, size=n)
    ids = np.cumsum(gaps).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(1, 5000, size=n).astype(np.int64)
    return ids, tfs, dls


@pytest.mark.parametrize("n", [1, 2, BLOCK - 1, BLOCK, BLOCK + 1, 5 * BLOCK + 17, 10_000])
def test_chunk_roundtrip(n):
    rng = np.random.default_rng(n)
    ids, tfs, dls = _random_postings(rng, n)
    row = encode_chunk(ids, tfs, dls, avgdl=100.0)
    rid, rtf, rdl = decode_chunk(row)
    np.testing.assert_array_equal(rid, ids)
    np.testing.assert_array_equal(rtf, tfs)
    np.testing.assert_array_equal(rdl, dls)
    assert row["first_doc_id"] == ids[0]
    assert row["last_doc_id"] == ids[-1]


def test_block_decode_matches_full():
    rng = np.random.default_rng(3)
    n = 4 * BLOCK + 31
    ids, tfs, dls = _random_postings(rng, n)
    row = encode_chunk(ids, tfs, dls, avgdl=100.0)
    nblocks = (n + BLOCK - 1) // BLOCK
    assert len(row["block_last"]) == nblocks
    got_ids, got_tfs, got_dls = [], [], []
    for bi in range(nblocks):
        bids, btfs, bdls = decode_block(row, bi)
        got_ids.append(bids)
        got_tfs.append(btfs)
        got_dls.append(bdls)
        assert bids[-1] == row["block_last"][bi]
    np.testing.assert_array_equal(np.concatenate(got_ids), ids)
    np.testing.assert_array_equal(np.concatenate(got_tfs), tfs)
    np.testing.assert_array_equal(np.concatenate(got_dls), dls)


def test_block_max_tfn_exact():
    rng = np.random.default_rng(9)
    n = 3 * BLOCK + 5
    ids, tfs, dls = _random_postings(rng, n)
    k1, b, avgdl = 1.2, 0.75, 321.5
    row = encode_chunk(ids, tfs, dls, avgdl=avgdl, k1=k1, b=b)
    tfn = tfs / (tfs + k1 * (1 - b + b * dls / avgdl))
    for bi in range(len(row["block_max_tfn"])):
        s, e = bi * BLOCK, min((bi + 1) * BLOCK, n)
        assert row["block_max_tfn"][bi] == tfn[s:e].max()


def test_encode_rejects_unsorted():
    with pytest.raises(AssertionError):
        encode_chunk(
            np.array([5, 3]), np.array([1, 1]), np.array([1, 1]), avgdl=1.0
        )


def test_encode_chunks_batch_equals_per_run():
    from astrologer_ray.functions.codec import encode_chunks_batch

    rng = np.random.default_rng(11)
    runs = []
    vals_d, vals_t, vals_l = [], [], []
    pos = 0
    for n in [1, 2, BLOCK, BLOCK + 1, 700, 5, 3 * BLOCK + 9]:
        ids, tfs, dls = _random_postings(rng, n)
        vals_d.append(ids)
        vals_t.append(tfs)
        vals_l.append(dls)
        runs.append((pos, pos + n))
        pos += n
    vd, vt, vl = map(np.concatenate, (vals_d, vals_t, vals_l))
    starts = np.array([r[0] for r in runs])
    ends = np.array([r[1] for r in runs])
    batch = encode_chunks_batch(vd, vt, vl, starts, ends, avgdl=77.0)
    for i, (s, e) in enumerate(runs):
        want = encode_chunk(vd[s:e], vt[s:e], vl[s:e], avgdl=77.0)
        got = batch[i]
        assert got == want, f"run {i} differs: {set(got) ^ set(want)}"


def test_encode_chunks_table_equals_batch():
    """Columnar assembly == row-dict assembly, cell for cell."""
    import pyarrow as pa

    from astrologer_ray.functions.codec import (
        POSTINGS_SCHEMA,
        encode_chunks_batch,
        encode_chunks_table,
    )

    rng = np.random.default_rng(23)
    lens = [1, 2, BLOCK, BLOCK + 1, 700, 5, 3 * BLOCK + 9, 64]
    vals_d, vals_t, vals_l, runs = [], [], [], []
    pos = 0
    for n in lens:
        ids, tfs, dls = _random_postings(rng, n)
        vals_d.append(ids)
        vals_t.append(tfs)
        vals_l.append(dls)
        runs.append((pos, pos + n))
        pos += n
    vd, vt, vl = map(np.concatenate, (vals_d, vals_t, vals_l))
    starts = np.array([r[0] for r in runs])
    ends = np.array([r[1] for r in runs])
    rows = encode_chunks_batch(vd, vt, vl, starts, ends, avgdl=77.0)
    cids = rng.integers(0, 3, len(runs)).astype(np.int64)
    for i, r in enumerate(rows):
        r["term"] = f"term{i}"
        r["chunk_id"] = int(cids[i])
        r["shard"] = 5
    want = pa.Table.from_pylist(rows, schema=POSTINGS_SCHEMA)
    got = encode_chunks_table(
        vd, vt, vl, starts, ends, 77.0,
        terms=pa.array([f"term{i}" for i in range(len(runs))]),
        chunk_ids=cids, shard=5,
    )
    assert got.schema.equals(want.schema)
    assert got.equals(want)
    # decode round-trip through the columnar cells too
    for i, (s, e) in enumerate(runs):
        ids2, tfs2, dls2 = decode_chunk(got.slice(i, 1).to_pylist()[0])
        assert np.array_equal(ids2, vd[s:e])
        assert np.array_equal(tfs2, vt[s:e])
        assert np.array_equal(dls2, vl[s:e])


def test_encode_chunks_table_positions_roundtrip():
    """Positional encode: pos_bytes decodes back to each posting's ascending
    position run (lengths == tf) and every non-positional column is
    byte-identical to the plain encode."""
    import pyarrow as pa

    from astrologer_ray.functions.codec import (
        POSTINGS_SCHEMA_POS,
        decode_chunk_positions,
        encode_chunks_table,
    )

    rng = np.random.default_rng(41)
    lens = [1, 5, BLOCK, BLOCK + 1, 300, 2]
    vals_d, vals_t, vals_l, runs = [], [], [], []
    pos = 0
    for n in lens:
        ids, tfs, dls = _random_postings(rng, n)
        vals_d.append(ids)
        vals_t.append(tfs)
        vals_l.append(dls)
        runs.append((pos, pos + n))
        pos += n
    vd, vt, vl = map(np.concatenate, (vals_d, vals_t, vals_l))
    starts = np.array([r[0] for r in runs])
    ends = np.array([r[1] for r in runs])
    # per-posting ascending positions, run length == tf
    pos_vals = np.concatenate(
        [np.cumsum(rng.integers(1, 9, int(f))) for f in vt]
    ).astype(np.int64)
    terms = pa.array([f"t{i}" for i in range(len(runs))])
    cids = rng.integers(0, 3, len(runs)).astype(np.int64)
    plain = encode_chunks_table(vd, vt, vl, starts, ends, 55.0,
                                terms=terms, chunk_ids=cids, shard=1)
    got = encode_chunks_table(vd, vt, vl, starts, ends, 55.0,
                              terms=terms, chunk_ids=cids, shard=1,
                              pos_vals=pos_vals)
    assert got.schema.equals(POSTINGS_SCHEMA_POS)
    assert got.drop_columns(["pos_bytes"]).equals(plain)
    occ_bounds = np.concatenate(([0], np.cumsum(vt)))
    for i, (s, e) in enumerate(runs):
        row = got.slice(i, 1).to_pylist()[0]
        p, occ = decode_chunk_positions(row)
        lo, hi = occ_bounds[s], occ_bounds[e]
        assert np.array_equal(p, pos_vals[lo:hi]), f"run {i}"
        assert np.array_equal(np.diff(occ), vt[s:e])
