"""Deterministic synthetic `pages` corpus (FIXTURES.md F1).

Pure w.r.t. ``(seed, n_docs)``: per-doc ``numpy`` PCG64 generators are
seeded with ``[seed, doc_id]`` so any subset of docs can be regenerated
independently (this is also what makes partitions independently
recomputable for the resume tests). No wall clock, no global RNG.

The sentence grammar exercises every reference code path: model-entity
templates patterned on the documented golden examples (api_doc:4,
README.md:12, input_example.txt:3-24), regex-PII shapes
(input_example.txt:28-44, one per pattern in ner.py:55-63), gazetteer
sentences (religions + cities nested in MISC spans, ner.py:240-267),
punctuation stress (apostrophe compounds / curly quotes,
utils/preprocessing.py:35,42), repeated tokens (the find-based offset
tracker, ner.py:397), and >150-word run-ons that force the sliding
window splitter (api.py:27). Entity popularity is Zipfian (head entity
in ~20% of docs) to create real canonicalization skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .data import lexicon
from .htmlops import wrap_html
from .schemas import PAGES

EPOCH_BASE_US = 1_600_000_000_000_000  # fixed instant, microseconds

_LANGS = ("it", "en", "nl")

_PEOPLE = tuple(
    f"{f} {l}"
    for f, l in zip(
        lexicon.FIRST_NAMES * 3,
        (lexicon.SURNAMES * 3)[: len(lexicon.FIRST_NAMES) * 3],
    )
)
_CITIES = lexicon.CITIES
_ORGS = lexicon.ORGS
_RELIGIONS = lexicon.RELIGIONS
_MISCS = lexicon.MISC_PHRASES

_FILLER = (
    "report analisi totale cliente pratica ufficio documento richiesta "
    "sistema valore mercato servizio progetto risultato giornata lavoro "
    "update record table schema general summary notes review items "
    "verslag klant dienst project waarde resultaat overzicht"
).split()


def _zipf_probs(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


_P_PEOPLE = _zipf_probs(len(_PEOPLE))
_P_CITIES = _zipf_probs(len(_CITIES))
_P_ORGS = _zipf_probs(len(_ORGS))


def _title(phrase: str) -> str:
    return " ".join(w.capitalize() for w in phrase.split())


def _pick(rng: np.random.Generator, items: tuple, probs: np.ndarray | None = None) -> str:
    return items[int(rng.choice(len(items), p=probs))]


def _fiscal_code(rng) -> str:
    up = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    month = "ABCDEHLMPRST"
    return (
        "".join(up[i] for i in rng.integers(0, 26, 6))
        + f"{rng.integers(40, 99):02d}"
        + month[int(rng.integers(0, len(month)))]
        + f"{rng.integers(10, 31):02d}"
        + "".join(up[i] for i in rng.integers(0, 26, 1))
        + f"{rng.integers(100, 999):03d}"
        + up[int(rng.integers(0, 26))]
    )


def _sentence(rng: np.random.Generator, lang: str) -> str:
    kind = rng.random()
    per = _title(_pick(rng, _PEOPLE, _P_PEOPLE))
    loc = _title(_pick(rng, _CITIES, _P_CITIES))
    org = _title(_pick(rng, _ORGS, _P_ORGS))
    if kind < 0.30:  # model-entity templates
        if lang == "it":
            day = f"{rng.integers(1, 28):02d}/{rng.integers(1, 12):02d}/{rng.integers(1950, 2000)}"
            return f"{per} è nato a {loc} il {day}."
        if lang == "en":
            return f"The following documents were signed by {per} at {loc} headquarters of {org}."
        return f"Bevestiging van betaling aan {org} door dhr. {per}."
    if kind < 0.42:  # works-for template
        return f"Il sig. {per} lavora presso la sede centrale di {org} a {loc}."
    if kind < 0.55:  # regex-PII battery
        variant = int(rng.integers(0, 4))
        if variant == 0:
            cf = _fiscal_code(rng)
            phone = f"+39 0{rng.integers(100000000, 999999999)}"
            return f"Il cliente {per} ha codice fiscale {cf}, telefono {phone}."
        if variant == 1:
            who = per.split()[0].lower()
            email = f"{who}.{rng.integers(10, 99)}@example.com"
            # digit-only IBAN (2+20 digits): the reference's regex
            # (ner.py:56) cannot match check-letter IBANs — see textops
            iban = (
                f"IT{rng.integers(10, 99)}"
                f"{rng.integers(10**9, 10**10 - 1)}{rng.integers(10**9, 10**10 - 1)}"
            )
            return f"Contatto email {email} con IBAN {iban} per {org}."
        if variant == 2:
            # IP sentence-final: the reference IPV4 regex (ner.py:61)
            # only matches when every octet ends with '.' or EOS
            ip = ".".join(str(int(x)) for x in rng.integers(1, 250, 4))
            ssn = f"{rng.integers(100000000, 999999999)}"
            return f"Codice {ssn} registrato per {per} con accesso da {ip}."
        ni = f"AB{rng.integers(100000, 999999)}C"
        return f"Documento {ni} caricato su [URL_{rng.integers(1, 99)}] da {per}."
    if kind < 0.65:  # gazetteer sentences
        rel = _pick(rng, _RELIGIONS)
        misc = _title(_pick(rng, _MISCS))
        return f"{per} studia {rel.capitalize()} e il {misc} a {loc}."
    if kind < 0.75:  # punctuation stress + repeated tokens
        per2 = _title(_pick(rng, _PEOPLE, _P_PEOPLE))
        return (
            f"L'amico di {per} e {per2} e {per} ha visitato "
            f"l'ufficio “centrale” di {org}, a {loc}."
        )
    # filler word soup (no entities)
    k = int(rng.integers(6, 14))
    words = [_FILLER[int(i)] for i in rng.integers(0, len(_FILLER), k)]
    return " ".join(words) + "."


def _long_sentence(rng: np.random.Generator, lang: str) -> str:
    """A >150-word run-on (comma-joined clauses, single terminator) that
    forces the sliding-window splitter; entities scattered throughout."""
    clauses = []
    for _ in range(int(rng.integers(28, 40))):
        per = _title(_pick(rng, _PEOPLE, _P_PEOPLE))
        org = _title(_pick(rng, _ORGS, _P_ORGS))
        fill = " ".join(_FILLER[int(i)] for i in rng.integers(0, len(_FILLER), 4))
        clauses.append(f"{per} presso {org} {fill}")
    return ", ".join(clauses) + "."


def doc_record(seed: int, doc_id: int) -> dict:
    """One deterministic page row (independent of every other row)."""
    rng = np.random.default_rng([seed, doc_id])
    lang = _LANGS[doc_id % 3]
    n_sent = int(rng.integers(2, 14))
    sents = [_sentence(rng, lang) for _ in range(n_sent)]
    if rng.random() < 0.06:
        sents.append(_long_sentence(rng, lang))
    # paragraphs of ~5 sentences, newline-joined (wrap_html splits on \n)
    paras = [" ".join(sents[i : i + 5]) for i in range(0, len(sents), 5)]
    text = "\n".join(paras)
    url = f"https://synth.example/{doc_id % 256:03d}/{doc_id:06d}"
    return {
        "url": url,
        "warc_ts": EPOCH_BASE_US + doc_id * 1_000_000,
        "html": wrap_html(url, text),
        "text": text,
        "lang": lang,
    }


def generate_pages_table(seed: int, n_docs: int, start: int = 0) -> pa.Table:
    rows = [doc_record(seed, i) for i in range(start, start + n_docs)]
    return pa.Table.from_pylist(rows, schema=PAGES)


def write_pages(
    out_dir: str, seed: int, n_docs: int, num_shards: int = 8
) -> list[str]:
    """Write the corpus as ``num_shards`` parquet files (contiguous doc
    ranges — the resumable-input layout: any shard regenerates
    independently). Returns the file paths. Idempotent for a given
    (seed, n_docs, num_shards)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    bounds = np.linspace(0, n_docs, num_shards + 1).astype(int)
    for s in range(num_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        if hi <= lo:
            continue
        path = os.path.join(out_dir, f"pages-{s:04d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        tmp = path + ".tmp"
        pq.write_table(generate_pages_table(seed, hi - lo, start=lo), tmp)
        os.replace(tmp, path)
    return paths


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Driver-table variant: build a `pages` table from
    ``{sf_dir}/documents.parquet`` with ``text`` byte-identical to the
    documents text — this makes stage E's extraction invariant
    SQL-checkable against the pre-registered ``documents`` view."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    rows = [
        {
            "url": f"https://docs.example/{d:08d}",
            "warc_ts": EPOCH_BASE_US + d * 1_000_000,
            "html": wrap_html(f"https://docs.example/{d:08d}", t),
            "text": t,
            "lang": lg,
        }
        for d, t, lg in zip(doc_ids, texts, langs)
    ]
    return pa.Table.from_pylist(rows, schema=PAGES)


def pii_pages_from_documents(sf_dir: str) -> pa.Table:
    """Pages whose text is a deterministic single-sentence PII carrier
    derived from doc_id ALONE: ``Document number NNNNNNNNN filed``
    (9-digit zero-padded id → exactly one NL_CITIZEN_SERVICE_NUMBER
    regex-battery hit at offset 16, no sentence-splitting punctuation,
    no other pattern can fire). Makes the regex-PII detection stage
    SQL-checkable end-to-end through the REAL extract → split → detect
    path (reference patterns at ner.py:55-63)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rows = []
    for d in docs["doc_id"].to_pylist():
        url = f"https://docs.example/{d:08d}"
        text = f"Document number {d % 1_000_000_000:09d} filed"
        rows.append(
            {
                "url": url,
                "warc_ts": EPOCH_BASE_US + d * 1_000_000,
                "html": wrap_html(url, text),
                "text": text,
                "lang": "en",
            }
        )
    return pa.Table.from_pylist(rows, schema=PAGES)


# ------------------------------------------------ born-in triple carrier

# lowercase, alias-free, crc32%23 != 0 (never score-dropped, always
# above the 0.75 confidence threshold), absent from the regex battery's
# reach (no digits) — chosen so the spine's behavior over the carrier
# is exactly derivable from doc_id
BORN_PERSONS = ("alice", "bruno", "chiara", "davide", "elena")
BORN_CITIES = ("amsterdam", "bologna", "cusco", "dresden", "erfurt", "faro", "geneva")


def born_pages_from_documents(sf_dir: str) -> pa.Table:
    """Pages whose text is a deterministic born-in carrier sentence
    derived from doc_id ALONE: ``<person> who was born in <city> town``
    (person = BORN_PERSONS[d % 5], city = BORN_CITIES[(3d+1) % 7]).
    With a single-word PER/LOC phrase registry injected, the REAL
    extract → split → detect → triples → link → edges chain must emit
    exactly one ``born_in`` triple per page (kg.extract_triples born
    cue; the trailing 'town' keeps the LOC off sentence-final position,
    where the frozen decode drops it) — making the GRAPH side of the
    spine SQL-checkable end-to-end.

    The buffer word ``who`` between person and cue is load-bearing:
    the frozen decode's stale-score reset (textops.bio_decode O-branch,
    ner.py:437-450) leaves the score of the O-word that CLOSES the
    PERSON span in ``active_scores`` when the LOC opens, so
    LOC confidence = mean(score(buffer), score(city)). ``who`` scores
    0.9265, putting every person×city combo above the 0.75 threshold
    ('was' scores 0.60 — crc32%23 == 0 — and silently culls the four
    cities scored < 0.90)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rows = []
    for d in docs["doc_id"].to_pylist():
        url = f"https://docs.example/{d:08d}"
        text = (
            f"{BORN_PERSONS[d % len(BORN_PERSONS)]} who was born in "
            f"{BORN_CITIES[(3 * d + 1) % len(BORN_CITIES)]} town"
        )
        rows.append(
            {
                "url": url,
                "warc_ts": EPOCH_BASE_US + d * 1_000_000,
                "html": wrap_html(url, text),
                "text": text,
                "lang": "en",
            }
        )
    return pa.Table.from_pylist(rows, schema=PAGES)
