"""Splitter invariants + synthetic corpus determinism."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from transner_ray import synth
from transner_ray.htmlops import extract_text, wrap_html
from transner_ray.splitting import split_sentences, window_words


# ------------------------------------------------------------ sentences

def test_split_sentences_offsets_identity():
    text = "Prima frase. Seconda frase!  Terza\nQuarta frase?"
    sents = split_sentences(text)
    assert [s for s, _, _ in sents] == [
        "Prima frase.",
        "Seconda frase!",
        "Terza",
        "Quarta frase?",
    ]
    for s, cs, ce in sents:
        assert text[cs:ce] == s


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.ascii_letters + " .!?\n", max_size=120))
def test_split_sentences_property(text):
    sents = split_sentences(text)
    for s, cs, ce in sents:
        assert text[cs:ce] == s
        assert s.strip() == s and s != ""
    # non-overlapping, increasing spans
    for (_, _, e1), (_, s2, _) in zip(sents, sents[1:]):
        assert s2 >= e1


# -------------------------------------------------------------- windows

def test_window_words_short_passthrough():
    assert window_words("a b c", max_words=5) == [("a b c", 0)]


def test_window_words_cover_and_offsets():
    words = [f"w{i}" for i in range(400)]
    sent = " ".join(words)
    wins = window_words(sent, max_words=150, overlap=32)
    assert len(wins) > 1
    for wtext, cs in wins:
        assert sent[cs : cs + len(wtext)] == wtext
        assert len(wtext.split()) <= 150
    # coverage: every word appears in at least one window
    covered = set()
    for wtext, _ in wins:
        covered.update(wtext.split())
    assert covered == set(words)
    # consecutive windows overlap by `overlap` words
    w0, w1 = wins[0][0].split(), wins[1][0].split()
    assert w0[-32:] == w1[:32]


# ----------------------------------------------------------------- html

def test_html_roundtrip_byte_identical():
    text = "Par one. More text.\nPar two with è and “quotes”."
    assert extract_text(wrap_html("t", text)) == text


# ---------------------------------------------------------------- synth

def test_synth_deterministic_and_shard_independent():
    t1 = synth.generate_pages_table(42, 10)
    t2 = synth.generate_pages_table(42, 10)
    assert t1.equals(t2)
    # per-doc independence: regenerating a suffix matches the full table
    tail = synth.generate_pages_table(42, 4, start=6)
    assert t1.slice(6, 4).to_pylist() == tail.to_pylist()


def test_synth_text_html_invariant():
    for row in synth.generate_pages_table(42, 8).to_pylist():
        assert extract_text(row["html"]) == row["text"]


def test_synth_has_long_sentences():
    # enough docs that the 6% long-run-on branch fires
    tbl = synth.generate_pages_table(42, 80)
    longest = 0
    for row in tbl.to_pylist():
        for s, _, _ in split_sentences(row["text"]):
            longest = max(longest, len(s.split()))
    assert longest > 150  # forces the sliding-window path
