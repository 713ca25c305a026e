from collections import Counter

import numpy as np
import pytest

from astrologer_ray.functions.tokenizer import (
    CodeTokenizer,
    scrub_text,
    split_token,
    token_counts,
    tokenize,
)


def test_scrub():
    assert scrub_text("a\x00b\x01c\td\ne") == "abc\td\ne"


def test_split_token_camel():
    assert split_token("parseHTTPResponse") == (
        "parsehttpresponse", "parse", "http", "response",
    )


def test_split_token_snake():
    assert split_token("snake_case_name") == ("snake_case_name", "snake", "case", "name")


def test_split_token_screaming():
    assert split_token("MAX_TERM_LEN") == ("max_term_len", "max", "term", "len")


def test_split_token_simple_word():
    assert split_token("hello") == ("hello",)
    assert split_token("Hello") == ("hello",)


def test_split_token_digits():
    assert split_token("v2beta") == ("v2beta", "v", "2", "beta")


def test_tokenize_code():
    terms = tokenize("def getFoo(): return foo_bar # 42")
    assert "getfoo" in terms and "get" in terms and "foo" in terms
    assert "foo_bar" in terms and "bar" in terms
    assert "42" in terms
    assert "def" in terms and "return" in terms


def test_tokenize_simple_mode():
    assert tokenize("Hello, World_2!", mode="simple") == ["hello", "world", "2"]


def test_simple_mode_matches_sql_split_semantics():
    # control chars are separators (SQL '[^a-z0-9]+' split), NOT scrubbed
    assert tokenize("a\x00b", mode="simple") == ["a", "b"]
    # no length cap: the SQL oracle keeps arbitrarily long tokens
    long = "x" * 70
    assert tokenize(long + " hi", mode="simple") == [long, "hi"]
    tok = CodeTokenizer(mode="simple")
    _, terms, _, dls = tok.batch_counts([long + " hi", "a\x00b"])
    assert sorted(terms) == ["a", "b", "hi", long]
    assert list(dls) == [2, 2]


def test_empty_and_edge():
    assert tokenize("") == []
    assert tokenize("\x00\x00") == []
    assert token_counts("a a a")["a"] == 3


@pytest.mark.parametrize("mode", ["code", "simple"])
def test_vectorized_matches_reference(mode):
    rng = np.random.default_rng(7)
    from astrologer_ray.sources.corpus import _make_vocab, _zipf_weights

    vocab = np.array(_make_vocab(rng, 200))
    probs = _zipf_weights(200)
    docs = []
    for i in range(50):
        n = int(rng.integers(0, 40))
        docs.append(" ".join(rng.choice(vocab, size=n, p=probs)))
    docs += ["", "x", "a\x00b", "CaseTwin casetwin", "__init__ __main__",
             "x" * 70 + " hello world",  # >MAX_TERM_LEN run: simple keeps it
             "a\x00b c\x01d\te"]  # control chars: separators in simple mode

    tok = CodeTokenizer(mode=mode)
    doc_idx, terms, tfs, dls = tok.batch_counts(docs)

    got = [Counter() for _ in docs]
    for d, t, f in zip(doc_idx, terms, tfs):
        got[d][t] = f
    for i, doc in enumerate(docs):
        want = token_counts(doc, mode=mode)
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"
        assert dls[i] == sum(want.values())


def test_vectorized_cache_stable_across_batches():
    tok = CodeTokenizer()
    d1 = tok.batch_counts(["fooBar baz"])
    d2 = tok.batch_counts(["fooBar baz"])
    c1 = Counter(dict(zip(d1[1], d1[2])))
    c2 = Counter(dict(zip(d2[1], d2[2])))
    assert c1 == c2 == token_counts("fooBar baz")


@pytest.mark.parametrize("mode", ["code", "simple"])
def test_arrow_input_matches_list_input(mode):
    import pyarrow as pa

    docs = [
        "parseHTTPResponse foo_bar 123abc 9a9b a123b _9abc 12_a ab9cd",
        "", None, "   ", "a\x00b ctrl\x01sep\ttab",
        "UPPER lower 0xFF 999 _lead __dunder__ trail_ 9",
        "mixed123Case456 99bottles end9", "é9abc über π≈3 café",
        "x" * 70 + " hello",
    ]
    t_list = CodeTokenizer(mode=mode)
    t_arrow = CodeTokenizer(mode=mode)
    li = t_list.batch_counts([d or "" for d in docs])
    ar = t_arrow.batch_counts(pa.chunked_array([docs[:4], docs[4:]], pa.string()))
    for i in range(4):
        np.testing.assert_array_equal(li[i], ar[i])
    # parity with the scalar reference too
    got = [Counter() for _ in docs]
    for d, t, f in zip(ar[0], ar[1], ar[2]):
        got[d][t] = f
    for i, doc in enumerate(docs):
        assert got[i] == token_counts(doc or "", mode=mode)


def test_fmt_key_arr_matches_python():
    import pyarrow as pa

    from astrologer_ray.stages.spimi import TokenizePartials

    st = TokenizePartials.__new__(TokenizePartials)
    ints = [0, 5, -5, 123456789012345, -123456789012345, None]
    got = st._fmt_key_arr(pa.array(ints, pa.int64())).to_pylist()
    want = [st._fmt_key_part(v) if v is not None else "None" for v in ints]
    assert got == want
    strs = ["a", "", None, "b"]
    assert st._fmt_key_arr(pa.array(strs, pa.string())).to_pylist() == [
        "a", "", "None", "b"
    ]


def test_batch_counts_positions_match_token_stream():
    """positions=True: per-posting position runs must equal the 0-based
    indices of that term in the doc's emitted token stream (`tokenize`
    order), ascending, with run lengths == tf."""
    import pyarrow as pa

    from astrologer_ray.functions.tokenizer import CodeTokenizer, tokenize

    docs = [
        "getIndex mergeSort getIndex",
        "a b a a c",
        "",
        "foo_bar baz9qux foo_bar FOO_BAR",
        "x",
    ]
    for mode in ("code", "simple"):
        for payload in (docs, pa.array(docs, pa.string())):
            tok = CodeTokenizer(mode=mode)
            doc_idx, codes, uniq, tfs, dls, pos_flat = tok.batch_counts_coded(
                payload, positions=True
            )
            assert len(pos_flat) == int(tfs.sum())
            cum = np.concatenate(([0], np.cumsum(tfs)))
            toks = [tokenize(d, mode=mode) for d in docs]
            seen = set()
            for i in range(len(doc_idx)):
                d, t = int(doc_idx[i]), uniq[codes[i]]
                got = list(pos_flat[cum[i]:cum[i + 1]])
                want = [j for j, tk in enumerate(toks[d]) if tk == t]
                assert got == want, f"mode={mode} doc={d} term={t!r}"
                seen.add((d, t))
            # every (doc, term) pair accounted for exactly once
            assert len(seen) == len(doc_idx)
