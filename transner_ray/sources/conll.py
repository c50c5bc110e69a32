"""CoNLL / WikiNER corpus formats (tooling tier — SURVEY.md §2.1
S6/S7/S10, §2.2 O14/O15/O16).

Pure parsing/formatting functions frozen from the reference tooling,
plus Ray Data readers built on ``read_binary_files`` — one corpus FILE
is the parallelism unit (sentence boundaries never straddle blocks;
the documented partitioning assumption for the tooling tier).

Reference quirks replicated on purpose:
* an article is flushed when the NEXT article starts; a file whose
  last line is blank silently DROPS the final article
  (dataset_wikiNER.py:60-83: the post-loop flush only runs when the
  last line is not '\\n');
* sentence assembly joins words with single spaces and appends '.'
  directly after the trailing space → ``"w1 w2 ."``; words after the
  last '.' of an article are dropped (dataset_wikiNER.py:86-116,
  duplicated at dataset_panacea.py:84-114);
* malformed CoNLL lines (token count != 2) are skipped, not errors
  (dataset_panacea.py:64-67).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

Article = tuple[list[str], list[str]]  # (words, tags)

# per-process block counter for unique writer filenames
import itertools as _itertools
import os

_WRITE_SEQ = _itertools.count()


# ------------------------------------------------------------- parsers

def parse_conll(text: str) -> list[Article]:
    """Blank-line-delimited ``word tag`` articles
    (dataset_panacea.py:36-79)."""
    data: list[Article] = []
    article_end = True
    just_started = True
    words: list[str] = []
    tags: list[str] = []
    line = "\n"
    for line in text.splitlines(keepends=True):
        if line == "\n":
            article_end = True
            continue
        if article_end:
            if not just_started:
                data.append((words, tags))
            just_started = False
            words, tags = [], []
        article_end = False
        parts = line.split()
        if len(parts) != 2:
            continue  # malformed lines skipped (dataset_panacea.py:64-67)
        words.append(parts[0])
        tags.append(parts[1])
    if line != "\n" and not just_started:
        data.append((words, tags))
    return data


def parse_wikiner(text: str) -> list[Article]:
    """``word|pos|tag`` triplet articles (dataset_wikiNER.py:39-83)."""
    data: list[Article] = []
    article_end = True
    just_started = True
    words: list[str] = []
    tags: list[str] = []
    line = "\n"
    for line in text.splitlines(keepends=True):
        if line == "\n":
            article_end = True
            continue
        if article_end:
            if not just_started:
                data.append((words, tags))
            just_started = False
            words, tags = [], []
        article_end = False
        for token in line.split():
            triplet = token.split("|")
            if len(triplet) != 3:
                raise ValueError("[ERROR] Unknown file format")
            words.append(triplet[0])
            tags.append(triplet[-1])
    if line != "\n" and not just_started:
        data.append((words, tags))
    return data


def article_to_sentences(words: list[str], tags: list[str]) -> list[tuple[str, list[str]]]:
    """Split a token stream into sentences at the ``'.'`` token
    (O14, dataset_wikiNER.py:86-116): the '.' joins the sentence, its
    tag joins the tag list; trailing words with no '.' are dropped."""
    out: list[tuple[str, list[str]]] = []
    sent = ""
    sent_tags: list[str] = []
    for word, tag in zip(words, tags):
        if word == ".":
            sent_tags.append(tag)
            out.append((sent + ".", sent_tags))
            sent = ""
            sent_tags = []
            continue
        sent += word + " "
        sent_tags.append(tag)
    return out


def iob_to_bio(tags: list[str]) -> list[str]:
    """O15 (dataset_wikiNER.py:140-156): rewrite ``I-X`` to ``B-X``
    when the previous ORIGINAL tag is O or of a different type."""
    out = list(tags)
    prev = "O"
    for i, curr in enumerate(tags):
        if curr != "O" and (prev == "O" or prev[1:] != curr[1:]):
            out[i] = "B" + curr[1:]
        prev = curr
    return out


def project_tag_iob(tag: str) -> str:
    """O16 (parser2IOB.py:1-25): bare ORG/PER/LOC → I-*; else O."""
    return {"ORG": "I-ORG", "PER": "I-PER", "LOC": "I-LOC"}.get(tag, "O")


# ----------------------------------------------------------- formatter

def format_conll(sentences: list[tuple[str, list[str]]], augment: bool = False) -> str:
    """S10 (wikiNER2CoNLL.py:12-25): ``word tag`` lines, blank line per
    sentence; ``augment`` appends a lowercased copy of each sentence."""
    lines: list[str] = []
    for sentence, tags in sentences:
        sw = sentence.split()
        if len(sw) != len(tags):
            raise ValueError("Sentence and target lengths do not match")
        for word, tag in zip(sw, tags):
            lines.append(f"{word} {tag}\n")
        lines.append("\n")
        if augment:
            for word, tag in zip(sentence.lower().split(), tags):
                lines.append(f"{word} {tag}\n")
            lines.append("\n")
    return "".join(lines)


def split_sizes(n: int, train: float, val: float, test: float) -> tuple[int, int, int]:
    """R4 (wikiNER2CoNLL.py:103-113): floor each ratio, give the
    remainder to train."""
    import math

    tr = int(math.floor(train * n))
    va = int(math.floor(val * n))
    te = int(math.floor(test * n))
    tr += n - (tr + va + te)
    return tr, va, te


# ------------------------------------------------------ Ray Data tier

SENTENCES_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("article_idx", pa.int32()),
        ("sent_idx", pa.int32()),
        ("sentence", pa.string()),
        ("tags", pa.list_(pa.string())),
    ]
)


def read_corpus(paths: str | list[str], fmt: str = "conll", to_bio: bool = False) -> rd.Dataset:
    """Distributed corpus reader: one file per task (read_binary_files
    keeps file contents atomic), parsed and sentence-split per batch."""
    parse = {"conll": parse_conll, "wikiner": parse_wikiner}[fmt]
    files = rd.read_binary_files(paths, include_paths=True)

    def parse_batch(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("path", "article_idx", "sent_idx", "sentence", "tags")}
        for path, blob in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            for a_idx, (words, tags) in enumerate(parse(blob.decode("utf-8"))):
                if to_bio:
                    tags = iob_to_bio(tags)
                for s_idx, (sentence, stags) in enumerate(article_to_sentences(words, tags)):
                    rows["path"].append(path)
                    rows["article_idx"].append(a_idx)
                    rows["sent_idx"].append(s_idx)
                    rows["sentence"].append(sentence)
                    rows["tags"].append(stags)
        return pa.table(
            {
                "path": pa.array(rows["path"], pa.string()),
                "article_idx": pa.array(rows["article_idx"], pa.int32()),
                "sent_idx": pa.array(rows["sent_idx"], pa.int32()),
                "sentence": pa.array(rows["sentence"], pa.string()),
                "tags": pa.array(rows["tags"], pa.list_(pa.string())),
            },
            schema=SENTENCES_SCHEMA,
        )

    return files.map_batches(parse_batch, batch_format="pyarrow")


def write_conll(ds: rd.Dataset, out_dir: str, augment: bool = False) -> None:
    """Distributed CoNLL writer: one output text file per block."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import itertools
        import zlib

        sentences = list(
            zip(batch.column("sentence").to_pylist(), batch.column("tags").to_pylist())
        )
        text = format_conll(sentences, augment=augment)
        # unique per (worker pid, block counter): two blocks with
        # IDENTICAL content must not collide on a content-hash name
        seq = next(_WRITE_SEQ)
        name = (
            f"part-{os.getpid():06d}-{seq:04d}-"
            f"{zlib.crc32(text.encode()) & 0xFFFFFFFF:08x}.conll"
        )
        tmp = os.path.join(out_dir, name + ".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"file": pa.array([name]), "n": pa.array([len(sentences)])})

    # consume: one manifest row per written file
    ds.map_batches(write_block, batch_format="pyarrow", batch_size=None).materialize()
