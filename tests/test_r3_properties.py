"""Round-3 property tests: markdown position-aware escaping and the
chunking grid, checked against executable specs over random inputs."""

from hypothesis import given, settings, strategies as st

from rs_trafilatura_spark.functions.markdown import (
    MARKDOWN_SPECIAL_CHARS,
    escape_markdown,
    post_process_markdown,
)

_TEXT = st.text(
    alphabet="ab *_[]\\<>`#\n-.",
    max_size=120,
)


@given(_TEXT)
@settings(max_examples=300, deadline=None)
def test_post_process_idempotent(s):
    """Escaping an already-escaped document must change nothing — the
    skip-already-escaped rule (markdown.rs:143-155)."""
    once = post_process_markdown(s)
    assert post_process_markdown(once) == once


@given(_TEXT)
@settings(max_examples=300, deadline=None)
def test_post_process_preserves_unescaped_content(s):
    """Stripping backslash-escapes from the output recovers a string
    whose non-backslash characters appear in the input order (the pass
    only inserts escapes, never reorders or deletes)."""
    out = post_process_markdown(s)
    restored = out.replace("\\", "")
    assert restored == s.replace("\\", "")


@given(st.text(alphabet="ab*_[]\\<>x ", max_size=80))
@settings(max_examples=300, deadline=None)
def test_escape_markdown_roundtrip(s):
    """Blanket escape: every special is preceded by a backslash, and
    removing single escapes restores the input (markdown.rs:44-59)."""
    out = escape_markdown(s, False)
    i = 0
    restored = []
    while i < len(out):
        if out[i] == "\\" and i + 1 < len(out) and out[i + 1] in MARKDOWN_SPECIAL_CHARS:
            restored.append(out[i + 1])
            i += 2
        else:
            assert out[i] not in MARKDOWN_SPECIAL_CHARS or out[i] == "\\"
            restored.append(out[i])
            i += 1
    assert "".join(restored) == s
    assert escape_markdown(s, True) == s


def _chunk_reference(words, size, overlap):
    stride = size - overlap
    out = []
    start = 0
    idx = 0
    while start < len(words) or idx == 0:
        out.append((idx, words[start:start + size]))
        idx += 1
        start = idx * stride
    return out


def test_chunk_documents_matches_reference(spark):
    """Spark chunk grid == the plain-Python spec across a deterministic
    parameter sweep (one Spark job for all cases): full coverage, correct
    overlap, last chunk may be short."""
    from rs_trafilatura_spark.operators.textstats import chunk_documents

    cases = [
        (n_words, size, overlap)
        for n_words in (1, 2, 5, 7, 19, 20, 21, 40, 41, 119)
        for size, overlap in ((2, 0), (2, 1), (5, 2), (7, 6), (20, 10))
    ]
    for i, (n_words, size, overlap) in enumerate(cases):
        cases[i] = (i, n_words, size, overlap)

    # group cases by (size, overlap) so each operator call covers many docs
    by_cfg: dict = {}
    for cid, n_words, size, overlap in cases:
        by_cfg.setdefault((size, overlap), []).append((cid, n_words))
    for (size, overlap), docs in by_cfg.items():
        rows = [(cid, " ".join(f"w{i}" for i in range(n))) for cid, n in docs]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got: dict = {}
        for r in chunk_documents(df, size, overlap).collect():
            got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = (
                r["n_tokens"], r["chunk_text"]
            )
        for cid, n in docs:
            words = [f"w{i}" for i in range(n)]
            expect = {
                idx: (len(ws), " ".join(ws))
                for idx, ws in _chunk_reference(words, size, overlap)
                if ws
            }
            assert got[cid] == expect, (cid, n, size, overlap)


@given(
    st.lists(
        st.tuples(st.text(alphabet="abc", min_size=1, max_size=2),
                  st.text(alphabet="abc", min_size=1, max_size=2)),
        max_size=6,
    ),
    st.text(alphabet="abc", min_size=1, max_size=12),
)
@settings(max_examples=300, deadline=None)
def test_encode_word_equals_training_order_application(merges, word):
    """_encode_word (the corpus encoder's inner loop) must equal applying
    each merge as its own non-overlapping left-to-right pass in training
    order — the exact semantics bpe_train's _apply_merge uses, so
    encode(corpus) always agrees with the trainer's final symbol table
    (min-rank-first encoders break this when a later merge creates a new
    adjacency of an earlier pair)."""
    from rs_trafilatura_spark.operators.tokenizer import _encode_word

    syms = list(word)
    for left, right in merges:
        res, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                res.append(left + right)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    assert _encode_word(word, merges, {}) == syms
