"""Property-based tests (hypothesis) for the parser spec functions —
the reference's regex semantics (load_to_db.py:37-41,129-154,
table_diff.py:14,36-39) encode subtle rules that are easy to regress
(SURVEY §5)."""

import re

from hypothesis import given, settings, strategies as st

from pdf_extraction_spark import oracle
from pdf_extraction_spark.functions import text_pure

text_strategy = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0xFFFF
    ),
    max_size=120,
)
number_like = st.one_of(
    st.from_regex(r"[-+]?\d{1,3}(,\d{3}){0,3}(\.\d{1,4})?%?", fullmatch=True),
    text_strategy,
)


@settings(max_examples=300, deadline=None)
@given(number_like, st.sampled_from([None, "kg", "tCO2eq", "%"]))
def test_parse_cell_value_invariants(text, fallback):
    val, unit, ctype = text_pure.parse_cell_value(text, fallback)
    assert ctype in ("text", "number")
    if ctype == "text":
        assert val is None and unit is None
    else:
        assert isinstance(val, float)
        if unit is not None:
            assert len(unit) <= 50
        # reference: fallback applies only when the cell has no unit
        m = text_pure.NUMBER_PATTERN.match(text.strip())
        if m and not m.group(2).strip():
            assert unit == fallback


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_number_tokens_roundtrip(text):
    toks = text_pure.number_tokens(text)
    for t in toks:
        assert re.fullmatch(r"[-+]?\d+(,\d{3})*(\.\d+)?%?", t)
        norm = text_pure.normalize_number(t)
        assert "," not in norm
        assert norm.endswith("%") == t.endswith("%")


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_normalize_line_spec_equality(text):
    """Oracle's self-contained normalize == the shared spec function."""
    assert oracle.normalize_line(text) == text_pure.normalize_line(text)
    out = text_pure.normalize_line(text)
    assert out == out.strip().lower()
    assert not re.search(r"\d", out)
    assert "  " not in out


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=5000), st.integers(64, 600), st.integers(0, 60))
def test_chunk_spans_invariants(text, size, overlap):
    overlap = min(overlap, size - 1)
    spans = text_pure.chunk_spans(text, size, overlap)
    if not text:
        assert spans == []
        return
    assert spans[0][0] == 0 and spans[-1][1] == len(text)
    for s, e in spans:
        assert 0 < e - s <= size
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert s1 > s0 and e1 > e0   # monotone progress
        assert s1 <= e0              # no gaps


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=20), max_size=30), st.lists(st.text(max_size=20), max_size=30))
def test_number_set_diff_symmetry(a, b):
    d = text_pure.number_set_diff(a, b)
    rev = text_pure.number_set_diff(b, a)
    assert d["only_in_doc"] == rev["only_in_ocr"]
    assert d["only_in_ocr"] == rev["only_in_doc"]
    assert d["only_in_doc"] == sorted(set(d["only_in_doc"]))


@settings(max_examples=100, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=32), st.lists(st.floats(0, 1), max_size=8))
def test_minmax_normalize_range(x, xs):
    out = text_pure.minmax_normalize(xs + [float(x)])
    assert all(0.0 <= v <= 1.0 for v in out)
    if len(set(xs + [float(x)])) == 1:
        assert all(v == 0.5 for v in out)
