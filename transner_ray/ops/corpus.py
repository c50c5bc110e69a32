"""Corpus-level operations over CoNLL-style datasets (tooling tier):
stats (A1), train/val/test splits (R4), lowercase augmentation (R5),
key-dedup (O20) and substring-subsumption dedup (O19).
"""

from __future__ import annotations

import re
import string

import pandas as pd
import pyarrow as pa

import ray.data as rd


def corpus_stats(sentences: rd.Dataset) -> dict:
    """A1 (stats/stats.py:79-99): entity counts per B-tag/O, unique
    non-punctuation words, sentence count, mean sentence word length.
    Computed with per-block partials merged on the driver (the merge
    state — a word set and 5 counters — is small)."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        words: set[str] = set()
        n_words = 0
        n_sents = batch.num_rows
        for sentence, tags in zip(
            batch.column("sentence").to_pylist(), batch.column("tags").to_pylist()
        ):
            sw = sentence.split()
            n_words += len(sw)
            for w in sw:
                if w not in string.punctuation:
                    words.add(w)
            for t in tags:
                if t.startswith("B") or t == "O":
                    counts[t] = counts.get(t, 0) + 1
        return pa.table(
            {
                "counts": pa.array([[f"{k}\x1f{v}" for k, v in counts.items()]]),
                "words": pa.array([sorted(words)]),
                "n_words": pa.array([n_words], pa.int64()),
                "n_sents": pa.array([n_sents], pa.int64()),
            }
        )

    parts = sentences.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    counts: dict[str, int] = {}
    uniq: set[str] = set()
    n_words = int(parts["n_words"].sum())
    n_sents = int(parts["n_sents"].sum())
    for lst in parts["counts"]:
        for packed in lst:
            k, v = packed.split("\x1f")
            counts[k] = counts.get(k, 0) + int(v)
    for lst in parts["words"]:
        uniq.update(lst)
    return {
        "unique_words": len(uniq),
        "entities_per_type": dict(sorted(counts.items())),
        "n_sentences": n_sents,
        "avg_sentence_len": round(n_words / n_sents, 2) if n_sents else 0.0,
    }


def split_proportions(
    sentences: rd.Dataset, train: float, val: float, test: float, seed: int | None = None
) -> tuple[rd.Dataset, rd.Dataset, rd.Dataset]:
    """R4 (wikiNER2CoNLL.py:103-122): sequential ranges by default
    (Subset semantics), seeded shuffle first when ``seed`` is given
    (random_split semantics)."""
    if seed is not None:
        sentences = sentences.random_shuffle(seed=seed)
    tr, va, te = sentences.split_proportionately([train, val])
    return tr, va, te


def augment_lowercase(sentences: rd.Dataset) -> rd.Dataset:
    """R5 (wikiNER2CoNLL.py:22-25): union with a lowercased copy."""

    def lower(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("sentence"),
            "sentence",
            pc.utf8_lower(batch.column("sentence")),
        )

    return sentences.union(sentences.map_batches(lower, batch_format="pyarrow"))


# ---------------------------------------------------- entity-table ops

def dedup_by_key_last_wins(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """O20 (parser.py:90-99): dict-insert dedup — for duplicate keys
    the LAST value wins (``dict.update`` semantics; the reference's own
    #FIXME mis-describes this as dropping duplicates), replicated
    exactly."""
    out: dict[str, str] = {}
    for k, v in pairs:
        out[k] = v
    return out


def subsumption_filter(entities: dict[str, str]) -> dict[str, str]:
    """O19 (parser.py:101-118): drop any key that occurs as a
    word-bounded substring of another key."""
    delete = []
    keys = list(entities.keys())
    for i, key in enumerate(keys):
        pat = re.compile(r"\b" + key + r"\b")
        for other in keys[i + 1 :]:
            if pat.search(other) is not None:
                delete.append(key)
                break
    for k in delete:
        entities.pop(k, None)
    return entities
