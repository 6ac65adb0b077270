"""The regex HTML fast path is an optimization gate, never a semantics
change: on every document it either produces exactly the stdlib
HTMLParser result or falls back to it."""

import pytest

from pdf_extraction_spark.functions import html_extract as H
from pdf_extraction_spark.sources.corpus import generate_corpus


def _std(text: str):
    p = H._Extractor()
    p.feed(text)
    p.close()
    p._flush()
    return p.lines, p.tables, p.figures


def _fast(text: str):
    p = H._Extractor()
    try:
        ok = H._fast_feed(p, text)
    except Exception:
        ok = False
    if not ok:
        return None
    p._flush()
    return p.lines, p.tables, p.figures


def test_fast_path_differential_on_corpus():
    n_fast = 0
    for row in generate_corpus(400):
        payload = row["html"]
        if not payload:
            continue
        s = payload.lstrip()
        if s[:1] != b"<" and b"<html" not in payload[:512].lower():
            continue
        text = payload.decode("utf-8", errors="replace")
        fast = _fast(text)
        if fast is None:
            continue  # fallback is always allowed
        n_fast += 1
        assert fast == _std(text)
    # the generated corpus is well-formed: the fast path must actually
    # engage (otherwise the optimization silently died)
    assert n_fast >= 100


@pytest.mark.parametrize(
    "payload",
    [
        "<html><body><p>entity &lt;tag&gt; inside a block of prose long enough</p></body></html>",
        "<html><head><script>var x = '<p>no</p>';</script></head><body><p>real content line long enough to keep</p></body></html>",
        "<html><body><!-- c --><p>after comment this stays long enough to keep around</p></body></html>",
        "<html><body><![CDATA[raw]]><p>after cdata this line is long enough to be kept</p></body></html>",
        "<html><body><img alt='q &amp; r'/><p>caption partner line long enough to be kept</p></body></html>",
        "<html><body><table><tr><td rowspan=2 colspan='3'>cell</td></tr></table></body></html>",
        "<HTML><BODY><P>uppercase tags should work the same way they do in stdlib parse</P></BODY></HTML>",
        "<?xml version='1.0'?><!DOCTYPE html><html><body><p>pi and doctype skipped fine here</p></body></html>",
    ],
)
def test_fast_path_matches_stdlib(payload):
    fast = _fast(payload)
    assert fast is not None, "expected the fast path to handle this"
    assert fast == _std(payload)


@pytest.mark.parametrize(
    "payload",
    [
        "<html><body><p>a < b bare less-than forces the stdlib parser</p></body></html>",
        "<html><body><script>unterminated...",
        "<html><body><p>broken <<< markup</p></body></html>",
    ],
)
def test_anomalies_fall_back(payload):
    assert _fast(payload) is None
    # and the public entry point still returns a result via stdlib
    out = H.extract_html(payload.encode())
    assert isinstance(out, dict) and "md_lines" in out
