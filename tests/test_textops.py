"""Golden + property tests for the frozen reference semantics
(textops). Goldens come from the reference's documented I/O
(README.md:10-70, api_doc:1-57, input_example.txt:28-44)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from transner_ray import textops
from transner_ray.gazetteers import default_gazetteers


# ---------------------------------------------------------------- O1

def test_separate_punctuations_apostrophe():
    proc, omap = textops.separate_punctuations("L'America", do_lower_case=True)
    assert proc == "l ' america"
    assert len(proc) == len(omap)
    # inserted chars marked -1, real chars map to original positions
    assert omap[0] == 0 and omap[2] == 1
    assert -1 in omap


def test_separate_punctuations_existing_spaces_kept():
    proc, omap = textops.separate_punctuations("a , b", do_lower_case=False)
    assert proc == "a , b"
    assert omap == [0, 1, 2, 3, 4]


def test_separate_punctuations_final_punct():
    proc, _ = textops.separate_punctuations("ciao.", do_lower_case=False)
    assert proc == "ciao ."  # no trailing space after string-final punct


def test_separate_punctuations_curly_quotes():
    proc, _ = textops.separate_punctuations("x“y”z", do_lower_case=False)
    assert proc == "x “ y ” z"


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet=string.printable + "è“”àéìòù", max_size=80))
def test_separate_punctuations_differential(s):
    """The span-based implementation must be bit-identical to the
    literal per-char mirror of the reference algorithm."""
    fast = textops.separate_punctuations(s, do_lower_case=True)
    ref = textops._separate_punctuations_percchar(s, do_lower_case=True)
    assert fast == ref
    assert textops.separate_punctuations(s, False) == textops._separate_punctuations_percchar(s, False)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.floats(min_value=0.0, max_value=1.0, allow_nan=False), min_size=1, max_size=7))
def test_trunc_conf_fast_path_matches_np_mean(scores):
    import numpy as np

    assert textops._trunc_conf(scores) == float(str(np.mean(scores))[:6])


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable + "è“”àéìòù", max_size=60))
def test_offset_map_roundtrip(s):
    """Every non-inserted processed char maps back to the identical
    original char (case-insensitively, since preprocess lowers)."""
    proc, omap = textops.separate_punctuations(s, do_lower_case=True)
    assert len(proc) == len(omap)
    for i, o in enumerate(omap):
        if o >= 0:
            assert proc[i].lower() == s[o].lower()


# ---------------------------------------------------------------- O5

def _mk(words_labels, score=0.9):
    wl = [(w, l) for w, l in words_labels]
    return wl, [score] * len(wl)


def test_bio_decode_basic_multiword():
    s = "mario rossi va a milano ."
    wl, sc = _mk(
        [("mario", "B-PER"), ("rossi", "I-PER"), ("va", "O"), ("a", "O"),
         ("milano", "B-LOC"), (".", "O")]
    )
    ents = textops.bio_decode(s, wl, sc)
    assert ents == [
        {"type": "PERSON", "value": "mario rossi", "confidence": 0.9, "offset": 0},
        {"type": "LOCATION", "value": "milano", "confidence": 0.9, "offset": 17},
    ]


def test_bio_decode_trailing_entity_dropped():
    """Snapshot fidelity: the end-of-string close (ner.py:452-459)
    requires ``curr_offset >= len(s)`` where curr_offset is the WORD
    START offset — never reached — so an entity still active at the end
    of the prediction stream is dropped. (The README.md:55-69 golden
    showing a sentence-final LOCATION predates the snapshot; the
    snapshot's behavior is authoritative and replicated.)"""
    s = "marco va a magenta"
    wl, sc = _mk([("marco", "B-PER"), ("va", "O"), ("a", "O"), ("magenta", "B-LOC")])
    ents = textops.bio_decode(s, wl, sc)
    assert [(e["type"], e["value"]) for e in ents] == [("PERSON", "marco")]


def test_bio_decode_orphan_i_opens():
    s = "milano è bella"
    wl, sc = _mk([("milano", "I-LOC"), ("è", "O"), ("bella", "O")])
    ents = textops.bio_decode(s, wl, sc)
    assert ents[0]["type"] == "LOCATION" and ents[0]["value"] == "milano"


def test_bio_decode_type_switch_closes():
    s = "mario milano va"
    wl, sc = _mk([("mario", "B-PER"), ("milano", "I-LOC"), ("va", "O")])
    ents = textops.bio_decode(s, wl, sc)
    # B-PER closed by the type-switch I-LOC (ner.py:426-436), then the
    # I-LOC entity closed by O
    assert [(e["type"], e["value"]) for e in ents] == [
        ("PERSON", "mario"),
        ("LOCATION", "milano"),
    ]


def test_bio_decode_e_strip_on_O_close():
    # ' è' stripped when closed by O (ner.py:442-444)
    s = "mario è qui"
    wl, sc = _mk([("mario", "B-PER"), ("è", "I-PER"), ("qui", "O")])
    ents = textops.bio_decode(s, wl, sc)
    assert ents[0]["value"] == "mario"
    # and when closed by a following B (ner.py:405-407)
    s2 = "mario è luca va"
    wl2, sc2 = _mk([("mario", "B-PER"), ("è", "I-PER"), ("luca", "B-PER"), ("va", "O")])
    ents2 = textops.bio_decode(s2, wl2, sc2)
    assert [e["value"] for e in ents2] == ["mario", "luca"]


def test_bio_decode_confidence_string_truncation():
    s = "mario rossi bianchi va"
    wl = [("mario", "B-PER"), ("rossi", "I-PER"), ("bianchi", "I-PER"), ("va", "O")]
    sc = [0.8, 0.9, 0.85, 0.9]
    ents = textops.bio_decode(s, wl, sc)
    # np.mean -> 0.8500000000000001, str()[:6] -> '0.8500'
    assert ents[0]["confidence"] == 0.85
    sc2 = [0.8, 0.8, 0.9, 0.9]  # mean = 0.8333333333333334 -> '0.8333'
    ents2 = textops.bio_decode(s, wl, sc2)
    assert ents2[0]["confidence"] == 0.8333


def test_bio_decode_threshold_filters():
    s = "mario va"
    wl, sc = _mk([("mario", "B-PER"), ("va", "O")], score=0.5)
    assert textops.bio_decode(s, wl, sc, threshold=0.75) == []
    assert len(textops.bio_decode(s, wl, sc, threshold=0.0)) == 1


def test_bio_decode_repeated_token_find_anchoring():
    # the find-based tracker (ner.py:397) anchors at the first
    # occurrence from the cursor — replicated exactly
    s = "la la milano va"
    wl, sc = _mk([("la", "O"), ("la", "O"), ("milano", "B-LOC"), ("va", "O")])
    ents = textops.bio_decode(s, wl, sc)
    assert ents[0]["offset"] == 6


# ---------------------------------------------------------------- O2

def test_adjust_entities_offset_case_restore():
    s = "Mario Rossi è nato a Busto Arsizio"
    proc, omap = textops.separate_punctuations(s, do_lower_case=True)
    ents = [{"type": "PERSON", "value": "mario rossi", "confidence": 0.9, "offset": 0}]
    textops.adjust_entities_offset(ents, s, omap)
    assert ents[0]["value"] == "Mario Rossi"
    assert ents[0]["offset"] == 0


def test_adjust_entities_offset_after_punctuation():
    s = "Sig. D'Alberto paga"
    proc, omap = textops.separate_punctuations(s, do_lower_case=True)
    # proc = "sig . d ' alberto paga"; entity "d ' alberto" at proc offset 6
    start = proc.index("d ' alberto")
    ents = [{"type": "PERSON", "value": "d ' alberto", "confidence": 0.9, "offset": start}]
    textops.adjust_entities_offset(ents, s, omap)
    assert ents[0]["offset"] == 5
    assert ents[0]["value"] == "D'Alberto"


# ---------------------------------------------------------------- O8

def test_regex_fiscal_code_and_phone_email():
    s = (
        "Il sig. Francesco Antonio Di Marco è nato a Milano, codice fiscale "
        "DMRFNC80E01F205B, numero di telefono +39 0865989886, email di lavoro "
        "francesco.dimarco@hotmail.com, DMRGZC54E90F205E"
    )
    found = textops.find_regex_entities(s)
    by_type = {}
    for e in found:
        by_type.setdefault(e["type"], []).append(e)
    assert [e["value"] for e in by_type["IT_FISCAL_CODE"]] == [
        "DMRFNC80E01F205B",
        "DMRGZC54E90F205E",
    ]
    assert by_type["EMAIL_ADDRESS"][0]["value"] == "francesco.dimarco@hotmail.com"
    assert any("0865989886" in e["value"] for e in by_type["EU_PHONE_NUMBER"])
    # offsets point into the original sentence
    for e in found:
        assert s[e["offset"] : e["offset"] + len(e["value"])] == e["value"]


def test_regex_iban():
    # NOTE (bug fidelity): the reference pattern's '[]?[0-9]{4}'
    # (ner.py:56) parses as the char class `]?[0-9` ×4, so an IBAN with
    # a check LETTER — including the reference's own example
    # 'IT20M030...' (input_example.txt:39) — does NOT match its own
    # regex. Replicated byte-for-byte: digit-only IBANs match.
    s = "IBAN IT2003000203280588799861 OK"
    found = textops.find_regex_entities(s)
    assert any(e["type"] == "EU_IBAN" and e["value"].startswith("IT20") for e in found)
    s2 = "IBAN IT20M030020328058879986168 IN PROCEDURA"
    assert not any(e["type"] == "EU_IBAN" for e in textops.find_regex_entities(s2))


def test_regex_uri_placeholder_and_ipv4():
    # Quirk fidelity (ner.py:61): every octet must be followed by '.'
    # or end-of-string, so an IPv4 only matches sentence-finally (where
    # it ALSO matches the phone pattern, whose [\.0-9]+ eats dots); a
    # mid-sentence IP is typed EU_PHONE_NUMBER only.
    s = "vedi [URL_12] da 192.168.0.1."
    found = textops.find_regex_entities(s)
    pairs = {(e["type"], e["value"]) for e in found}
    assert ("URI", "[URL_12]") in pairs
    assert ("IPV4_ADDRESS", "192.168.0.1") in pairs
    assert ("EU_PHONE_NUMBER", "192.168.0.1") in pairs
    mid = textops.find_regex_entities("da 192.168.0.1 ora")
    assert [e["type"] for e in mid] == ["EU_PHONE_NUMBER"]


def test_regex_boundary_guard_no_substring_match():
    # a 10-digit phone must not yield a 9-digit NL SSN submatch
    s = "tel 1234567890 fine"
    found = [e for e in textops.find_regex_entities(s) if e["type"] == "NL_CITIZEN_SERVICE_NUMBER"]
    assert found == []


# ------------------------------------------------------------- O9/O10

def test_religion_first_occurrence_offset():
    gz = default_gazetteers()
    s = "Islam qui e ancora islam là"
    found = textops.find_religion_entities(s, gz.religions)
    # two occurrences in the word list, BOTH with the offset of the
    # first occurrence (ner.py:247 bug, replicated)
    assert len(found) == 2
    assert found[0]["offset"] == 0 and found[1]["offset"] == 0
    assert found[0]["value"] == "Islam"


def test_nested_loc_in_misc():
    gz = default_gazetteers()
    ents = [
        {"type": "MISCELLANEOUS", "value": "Treaty Of Rome", "confidence": 0.9, "offset": 4}
    ]
    found = textops.find_nested_loc_entities(ents, gz.cities)
    assert any(
        e["type"] == "LOCATION" and e["value"] == "Rome" and e["offset"] == 4 + 10
        for e in found
    )
    # confidence 0.9, the §2.8 ruling for the reference's round() crash
    assert all(e["confidence"] == 0.9 for e in found)


# ---------------------------------------------------------------- O12

def test_spans_overlap_cases():
    ents = [{"type": "PERSON", "value": "abcde", "offset": 10}]  # [10,15)
    assert textops.spans_overlap(ents, 8, 12)      # partial left
    assert textops.spans_overlap(ents, 11, 14)     # contained
    assert textops.spans_overlap(ents, 12, 20)     # partial right
    assert textops.spans_overlap(ents, 10, 15)     # exact
    assert textops.spans_overlap(ents, 10, 11)     # shared start
    assert textops.spans_overlap(ents, 5, 10)      # cand_end == start
    assert textops.spans_overlap(ents, 15, 20)     # cand_start == end
    assert textops.spans_overlap(ents, 5, 20)      # containment outward
    assert not textops.spans_overlap(ents, 0, 5)
    assert not textops.spans_overlap(ents, 16, 20)


def test_opening_time_type():
    assert textops.opening_time_type([{"type": "ORGANIZATION"}]) == "T_OPENING"
    assert textops.opening_time_type([{"type": "LOCATION"}]) == "T_OPENING"
    assert textops.opening_time_type([{"type": "PERSON"}]) == "TIME"
    assert textops.opening_time_type([]) == "TIME"
