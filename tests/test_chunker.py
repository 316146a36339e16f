"""Chunker invariants (SURVEY §5.2 item 3): property-based checks of
recursive_split / chunk_snippets against the reference's contract
(transcript.py:92-168) — size cap, coverage, monotone timestamps,
overlap continuity."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from kfai_pipeline_spark.operators.chunker import (
    chunk_snippets,
    recursive_split,
)

WORDS = st.text(alphabet="abcdefgh", min_size=1, max_size=12)
SNIPPET_TEXT = st.lists(WORDS, min_size=1, max_size=8).map(" ".join)


@st.composite
def snippet_lists(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    starts = sorted(
        draw(
            st.lists(
                st.floats(min_value=0, max_value=7200, allow_nan=False),
                min_size=n,
                max_size=n,
            )
        )
    )
    return [
        {"text": draw(SNIPPET_TEXT), "start": round(s, 2), "duration": 5.0}
        for s in starts
    ]


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abc \n", max_size=3000))
def test_recursive_split_size_cap(text):
    for chunk in recursive_split(text, chunk_size=100, chunk_overlap=20):
        assert len(chunk) <= 100
        assert chunk == chunk.strip() and chunk != ""


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcd efg\n", max_size=2000))
def test_recursive_split_coverage(text):
    """No content is lost: the non-whitespace character multiset of the
    chunks covers the input's (overlap may add, never remove)."""
    chunks = recursive_split(text, chunk_size=80, chunk_overlap=16)
    src = "".join(text.split())
    joined = "".join("".join(c.split()) for c in chunks)
    # every source char appears at least as often in the chunk stream
    for ch in set(src):
        assert joined.count(ch) >= src.count(ch)


@settings(max_examples=40, deadline=None)
@given(snippet_lists())
def test_chunk_snippets_invariants(snippets):
    chunks = chunk_snippets(snippets, chunk_size=120, chunk_overlap=30)
    starts = [c["start"] for c in chunks]
    # monotone non-decreasing timestamps (transcript.py search-pos walk)
    assert starts == sorted(starts)
    # every start is one of the snippet starts
    snippet_starts = {s["start"] for s in snippets}
    assert set(starts) <= snippet_starts
    for c in chunks:
        assert len(c["text"]) <= 120
        # whitespace normalized exactly like " ".join(split())
        assert c["text"] == " ".join(c["text"].split())


def test_chunk_snippets_empty_and_null():
    assert chunk_snippets([]) == []
    assert chunk_snippets(None) == []


def test_chunk_snippets_known_example():
    """Small deterministic example: one long snippet stream chunks with
    overlap; first chunk starts at the first snippet's timestamp."""
    snippets = [
        {"text": f"word{i:03d} " * 10, "start": float(i * 10), "duration": 10.0}
        for i in range(20)
    ]
    chunks = chunk_snippets(snippets, chunk_size=200, chunk_overlap=50)
    assert chunks[0]["start"] == 0.0
    assert len(chunks) > 5
    # overlap: consecutive chunks share a suffix/prefix word
    for a, b in zip(chunks, chunks[1:]):
        a_words, b_words = a["text"].split(), b["text"].split()
        assert set(a_words[-8:]) & set(b_words[:8]), (a_words[-8:], b_words[:8])


def test_long_unbroken_word_char_splits():
    text = "x" * 350
    chunks = recursive_split(text, chunk_size=100, chunk_overlap=10)
    assert all(len(c) <= 100 for c in chunks)
    assert sum(len(c) for c in chunks) >= 350
