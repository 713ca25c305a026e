"""RRF fusion: formula, weights, validation."""
import pytest

from astrologer_ray.pipelines.hybrid import rrf_fuse


def test_rrf_formula_and_tiebreak():
    got = rrf_fuse([[1, 2, 3], [3, 2, 4]], k=10)
    want = {
        1: 1 / 61,
        2: 1 / 62 + 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 63,
    }
    assert dict(got) == pytest.approx(want)
    # 2 and 3 share a score bitwise (1/62+1/62 vs 1/63+1/61? not equal) —
    # order is by score desc then id asc
    assert [d for d, _ in got] == sorted(want, key=lambda d: (-want[d], d))
    # equal scores tie-break id-ascending
    tie = rrf_fuse([[5], [7]], k=2)
    assert [d for d, _ in tie] == [5, 7]


def test_rrf_weights_and_k():
    got = rrf_fuse([[1], [2]], k=1, weights=[2.0, 1.0])
    assert got == [(1, 2.0 / 61)]
    with pytest.raises(ValueError, match="one weight per ranking"):
        rrf_fuse([[1]], weights=[1.0, 2.0])


def test_rrf_rejects_duplicates_within_leg():
    with pytest.raises(ValueError, match="duplicate"):
        rrf_fuse([[1, 1]], k=2)
