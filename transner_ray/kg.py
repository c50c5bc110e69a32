"""Knowledge-graph semantics: windowed mention detection, triple
extraction, entity linking — all PURE per-sentence/per-row functions
shared by the sequential oracle and the Ray stages (north_rule: triple
extraction, entity linking, canonicalization, graph materialize).

Mention detection composes the reference's request path
(ner_core.ner_sentence) with the sliding-window long-text splitter
that generalizes the reference's 150-word rejection (api.py:27,53-55):
windows are processed independently and their mentions merged with
max-confidence dedup on (type, offset, value) — SURVEY.md §2.6 R8.
"""

from __future__ import annotations

from . import textops
from .data import lexicon
from .gazetteers import Gazetteers
from .ner_core import SERVICE_THRESHOLD, ner_sentence
from .splitting import MAX_WINDOW_WORDS, WINDOW_OVERLAP, window_words
from .tagger import Tagger

# --------------------------------------------------------------------------
# mention detection with internal sliding window
# --------------------------------------------------------------------------


def detect_mentions(
    sentence: str,
    tagger: Tagger,
    gazetteers: Gazetteers,
    threshold: float = SERVICE_THRESHOLD,
    apply_regex: bool = True,
    apply_gazetteers: bool = True,
    max_words: int = MAX_WINDOW_WORDS,
    overlap: int = WINDOW_OVERLAP,
) -> list[dict]:
    """All mentions of one sentence, windows merged. Offsets are into
    the sentence. Single-window sentences preserve the reference's
    mention order exactly; multi-window order is first-seen window
    order with confidence maxed over duplicates."""
    windows = window_words(sentence, max_words=max_words, overlap=overlap)
    if len(windows) == 1:
        return ner_sentence(
            sentence, tagger, gazetteers, threshold, apply_regex, apply_gazetteers
        )
    merged: list[dict] = []
    seen: dict[tuple, int] = {}
    for wtext, wstart in windows:
        for m in ner_sentence(
            wtext, tagger, gazetteers, threshold, apply_regex, apply_gazetteers
        ):
            m["offset"] = m["offset"] + wstart
            key = (m["type"], m["offset"], m["value"])
            idx = seen.get(key)
            if idx is None:
                seen[key] = len(merged)
                merged.append(m)
            elif m["confidence"] > merged[idx]["confidence"]:
                merged[idx]["confidence"] = m["confidence"]
    return merged


# --------------------------------------------------------------------------
# triple extraction (stage T) — deterministic typed-mention patterns
# --------------------------------------------------------------------------

PII_PREDICATES = {
    "EMAIL_ADDRESS": "has_email",
    "EU_PHONE_NUMBER": "has_phone",
    "IT_FISCAL_CODE": "has_fiscal_code",
    "EU_IBAN": "has_iban",
    "NL_CITIZEN_SERVICE_NUMBER": "has_citizen_id",
    "UK_NATIONAL_ID_NUMBER": "has_national_id",
    "IPV4_ADDRESS": "accessed_from",
    "URI": "references",
}

_BORN_CUES = ("è nato a", "è nata a", "was born in", "geboren in")


def _first(mentions: list[dict], mtype: str, after: int = -1) -> dict | None:
    for m in mentions:
        if m["type"] == mtype and m["offset"] > after:
            return m
    return None


def _nearest(mentions: list[dict], mtype: str, offset: int) -> dict | None:
    best = None
    best_d = None
    for m in mentions:
        if m["type"] != mtype:
            continue
        d = abs(m["offset"] - offset)
        if best_d is None or d < best_d or (d == best_d and m["offset"] < best["offset"]):
            best, best_d = m, d
    return best


def extract_triples(sentence: str, mentions: list[dict]) -> list[dict]:
    """Frozen pattern rules over typed mentions of ONE sentence.
    Returns [{'subj','pred','obj','subj_type','obj_type','confidence'}].
    Deterministic: cue phrases on the lowercased sentence, first/nearest
    mention selection with fixed tie-breaks (earlier offset wins)."""
    low = sentence.lower()
    out: list[dict] = []
    by_offset = sorted(mentions, key=lambda m: (m["offset"], m["type"], m["value"]))

    def emit(s: dict, pred: str, o: dict | None = None, obj_value: str | None = None, obj_type: str | None = None):
        out.append(
            {
                "subj": s["value"],
                "pred": pred,
                "obj": o["value"] if o is not None else obj_value,
                "subj_type": s["type"],
                "obj_type": o["type"] if o is not None else obj_type,
                "confidence": min(
                    s["confidence"], o["confidence"] if o is not None else 1.0
                ),
            }
        )

    per0 = _first(by_offset, "PERSON")
    org0 = _first(by_offset, "ORGANIZATION")
    loc0 = _first(by_offset, "LOCATION")

    if per0 is not None and any(c in low for c in _BORN_CUES):
        loc_after = _first(by_offset, "LOCATION", after=per0["offset"])
        if loc_after is not None:
            emit(per0, "born_in", loc_after)
    if per0 is not None and org0 is not None and "lavora presso" in low:
        emit(per0, "works_for", org0)
        loc_after = _first(by_offset, "LOCATION", after=org0["offset"])
        if loc_after is not None:
            emit(org0, "located_in", loc_after)
    if per0 is not None and org0 is not None and "signed by" in low:
        emit(per0, "signed_documents_of", org0)
        if loc0 is not None:
            emit(org0, "located_in", loc0)
    if per0 is not None and org0 is not None and "betaling aan" in low:
        emit(per0, "made_payment_to", org0)

    for m in by_offset:
        if m["type"] == "RELIGION":
            p = _nearest(by_offset, "PERSON", m["offset"])
            if p is not None:
                emit(p, "practices", m)
        pred = PII_PREDICATES.get(m["type"])
        if pred is not None:
            p = _nearest(by_offset, "PERSON", m["offset"])
            if p is not None:
                emit(p, pred, m)
    # co-occurrence fallback: every ORG gets its nearest PERSON
    for m in by_offset:
        if m["type"] == "ORGANIZATION":
            p = _nearest(by_offset, "PERSON", m["offset"])
            if p is not None:
                emit(p, "associated_with", m)
    return out


# --------------------------------------------------------------------------
# entity linking (stage L) — alias-table normalization, broadcast small side
# --------------------------------------------------------------------------

_TYPE_NAMESPACE = {
    "PERSON": "per",
    "LOCATION": "loc",
    "ORGANIZATION": "org",
    "MISCELLANEOUS": "misc",
    "DOCUMENT": "doc",
    "PROCEDURE": "proc",
    "RELIGION": "rel",
}


def norm_surface(surface: str) -> str:
    """Normalized surface form: the reference's ``.lower()`` idiom
    (ner.py:118,244,258) plus punctuation separation (O1) and
    whitespace squeeze — one canonical key per surface variant."""
    proc, _ = textops.separate_punctuations(surface, do_lower_case=True)
    return " ".join(proc.split())


def build_alias_table() -> dict[str, str]:
    """norm surface -> canonical norm. Small (broadcast via ray.put)."""
    return {norm_surface(k): norm_surface(v) for k, v in lexicon.ALIASES.items()}


def link_entity(surface: str, mtype: str | None, aliases: dict[str, str]) -> str:
    """Resolve a mention/triple endpoint to a stable entity_id:
    ``namespace:canonical_norm``. Unknown types (regex PII values) use
    the lowercased type as namespace, keeping the raw value as key."""
    norm = norm_surface(surface)
    norm = aliases.get(norm, norm)
    ns = _TYPE_NAMESPACE.get(mtype or "", None)
    if ns is None:
        ns = (mtype or "val").lower()
    return f"{ns}:{norm}"
