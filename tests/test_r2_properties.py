"""Property tests for round-2 pure functions (hypothesis)."""

from hypothesis import given, settings, strategies as st

from rs_trafilatura_spark.kernel.extract import _output_block_spans

words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=8), min_size=0,
    max_size=40,
)


@given(st.lists(st.text(alphabet="abc XYZ.,!", min_size=0, max_size=30),
                min_size=0, max_size=8))
@settings(max_examples=200, deadline=None)
def test_output_block_spans_reconstruct(blocks):
    text = "\n\n".join(blocks)
    spans = _output_block_spans(text, "merge")
    # every span slices back to a non-empty block, in order
    recon = [text[s:e] for s, e, _k in spans]
    assert recon == [b for b in text.split("\n\n") if b.strip()]
    for s, e, k in spans:
        assert 0 <= s < e <= len(text)
        assert k == "out:merge"


@given(words, words)
@settings(max_examples=150, deadline=None)
def test_shingle_hash_jaccard_equals_string_jaccard(w1, w2):
    from rs_trafilatura_spark.operators.dedup import (
        _shingle_hashes64,
        _shingle_strings,
    )

    t1, t2 = " ".join(w1), " ".join(w2)
    hs1, hs2 = set(_shingle_hashes64(t1)), set(_shingle_hashes64(t2))
    ss1, ss2 = set(_shingle_strings(t1)), set(_shingle_strings(t2))
    # no collisions on these tiny universes: hash-set Jaccard == string-set
    assert len(hs1) == len(ss1) and len(hs2) == len(ss2)
    assert len(hs1 & hs2) == len(ss1 & ss2)


@given(words)
@settings(max_examples=150, deadline=None)
def test_minhash_identical_iff_text_identical_shingles(w):
    from rs_trafilatura_spark.operators.dedup import _minhash_signature

    t = " ".join(w)
    assert _minhash_signature(t) == _minhash_signature(t)  # deterministic


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1),
       st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200)
def test_simhash_band_pigeonhole(a, b):
    """If hamming(a,b) <= 3 then at least one of the 4 16-bit bands is
    identical — the recall guarantee simhash_near_dups relies on."""
    am, bm = a & ((1 << 64) - 1), b & ((1 << 64) - 1)
    ham = bin(am ^ bm).count("1")
    bands_equal = any(
        (am >> (16 * i)) & 0xFFFF == (bm >> (16 * i)) & 0xFFFF
        for i in range(4)
    )
    if ham <= 3:
        assert bands_equal
