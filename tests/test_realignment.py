"""Wordpiece→token realignment (north_star-named step), torch-free."""

from transner_ray import textops
from transner_ray.tagger import realign_wordpieces


def test_first_subtoken_wins():
    words = ["mario", "rossi", "va"]
    # fake tokenization: mario -> [mar, ##io], rossi -> [ros, ##si], va -> [va]
    word_ids = [None, 0, 0, 1, 1, 2, None]  # [CLS] ... [SEP]
    wp_labels = ["O", "B-PER", "I-PER", "I-PER", "O", "O", "O"]
    wp_scores = [0.1, 0.9, 0.2, 0.8, 0.3, 0.7, 0.1]
    wl, scores = realign_wordpieces(words, word_ids, wp_labels, wp_scores)
    # each word takes its FIRST sub-token's label and score
    assert wl == [("mario", "B-PER"), ("rossi", "I-PER"), ("va", "O")]
    assert scores == [0.9, 0.8, 0.7]


def test_truncated_words_dropped():
    words = ["a", "b", "c"]
    word_ids = [None, 0, 1, None]  # 'c' truncated by the seq cap
    wl, scores = realign_wordpieces(words, word_ids, ["O", "B-LOC", "O", "O"], [0, 0.9, 0.5, 0])
    assert wl == [("a", "B-LOC"), ("b", "O")]
    assert scores == [0.9, 0.5]


def test_realigned_stream_feeds_decode():
    """The realigned (word,label)+score stream is exactly what
    bio_decode consumes (ner.py contract)."""
    s = "mario rossi va"
    words = s.split()
    word_ids = [None, 0, 0, 1, 2, None]
    wp_labels = ["O", "B-PER", "X", "I-PER", "O", "O"]
    wp_scores = [0.0, 0.9, 0.0, 0.9, 0.9, 0.0]
    wl, scores = realign_wordpieces(words, word_ids, wp_labels, wp_scores)
    ents = textops.bio_decode(s, wl, scores)
    assert [(e["type"], e["value"]) for e in ents] == [("PERSON", "mario rossi")]


def test_bert_tagger_import_gate():
    """Without torch the constructor must raise NotImplementedError
    (the complete implementation sits BEHIND the import gate); with
    torch present the gate must not fire — construction proceeds to
    real weight loading (exercised only on torch nodes)."""
    import pytest

    from transner_ray.tagger import BIO_LABELS, BertTagger

    assert len(BIO_LABELS) == 13 and BIO_LABELS[0] == "O"  # ner.py:24-38
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="torch"):
            BertTagger("/nonexistent/model")
    else:  # pragma: no cover - torch nodes only
        with pytest.raises(Exception) as exc_info:
            BertTagger("/nonexistent/model")
        assert not isinstance(exc_info.value, NotImplementedError)
