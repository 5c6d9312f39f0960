"""Property test: the regex fast path of normalize_text_output must be
byte-identical to the reference state machine on arbitrary input."""

from hypothesis import given, settings, strategies as st

from rs_trafilatura_spark.functions.textnorm import (
    normalize_text_output,
    normalize_text_output_reference,
)

_alphabet = st.sampled_from(
    list("ab .,;:!?\n\t\r") + ["é", "“", "x", "9", "-"]
)


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet=_alphabet, max_size=120))
def test_fast_path_matches_state_machine(s):
    assert normalize_text_output(s) == normalize_text_output_reference(s)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_fast_path_matches_on_unicode(s):
    assert normalize_text_output(s) == normalize_text_output_reference(s)
