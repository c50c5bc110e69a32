"""Fixed public-knowledge lexicons for the deterministic corpus + taggers.

These play the role of the reference's gazetteer artifacts (a world-cities
CSV loaded at ner.py:117-119 and a religions list at ner.py:121-126) with
our own small lists — the *semantics* (lowercase set membership) are what
is replicated, not the data files. Everything downstream (synth corpus,
RuleTagger, entity linking alias table) draws from these, so oracle and
engine share one vocabulary.
"""

from __future__ import annotations

# ---- person name parts (synthetic-corpus vocabulary) ----------------------
FIRST_NAMES = (
    "mario", "giuseppe", "francesca", "matteo", "luca", "giulia", "marco",
    "elena", "andrea", "chiara", "john", "mary", "james", "patricia",
    "robert", "linda", "michael", "barbara", "william", "elizabeth",
    "rutger", "sanne", "daan", "emma", "bram", "sophie", "maria", "antonio",
    "david", "laura",
)

SURNAMES = (
    "rossi", "bianchi", "ferrari", "esposito", "romano", "colombo", "ricci",
    "marino", "greco", "bruno", "smith", "johnson", "williams", "brown",
    "jones", "miller", "davis", "wilson", "taylor", "moore", "de vries",
    "jansen", "bakker", "visser", "van dijk", "verhoeven", "santos",
    "di marco", "boccardi", "deschamps",
)

# ---- cities (gazetteer; includes multi-word and substring-of-another) -----
CITIES = (
    "rome", "roma", "milan", "milano", "naples", "napoli", "turin", "torino",
    "florence", "firenze", "venice", "venezia", "bologna", "genoa", "genova",
    "palermo", "magenta", "caserta", "busto arsizio", "ariccia", "berlin",
    "london", "paris", "madrid", "amsterdam", "rotterdam", "the hague",
    "utrecht", "eindhoven", "new york", "york", "los angeles", "chicago",
    "houston", "boston", "san francisco", "cardenas", "geneva", "zurich",
    "vienna", "prague", "lisbon", "dublin", "brussels", "antwerp",
    "barcelona", "seville", "munich", "hamburg", "frankfurt", "cologne",
)

# ---- organizations --------------------------------------------------------
ORGS = (
    "poste italiane", "enel", "unicredit", "intesa sanpaolo", "ferrovie dello stato",
    "deutsche bank", "abn amro", "rabobank", "ing group", "philips",
    "acme corporation", "globex", "initech", "umbrella corp", "stark industries",
    "wayne enterprises", "cyberdyne systems", "tyrell corporation",
    "autostrade", "banca di roma",
)

# ---- religions (reference religions.txt semantics: word-level match) ------
RELIGIONS = (
    "christianity", "islam", "buddhism", "hinduism", "judaism", "sikhism",
    "taoism", "shinto", "catholicism", "protestantism", "orthodoxy",
    "anglicanism", "lutheranism", "methodism", "baptist", "quaker",
    "cristianesimo", "islamismo", "buddismo", "ebraismo", "induismo",
    "cattolicesimo", "jainism", "zoroastrianism", "animism",
)

# ---- MISC phrases (exercise the nested-LOC-in-MISC path, ner.py:254-267) --
MISC_PHRASES = (
    "treaty of rome", "congress of vienna", "university of bologna",
    "marathon de paris", "tour of london", "statute of york",
    "renaissance art", "baroque music", "euro 2020", "expo milano",
    "festival di venezia", "summit of geneva",
)

# ---- predicates vocabulary for synthetic sentences ------------------------
IT_BORN = "è nato a"
IT_BORN_F = "è nata a"
EN_SIGNED = "the following documents were signed by"
NL_PAYMENT = "bevestiging van betaling aan"

# ---- alias table for entity linking (norm surface -> canonical norm) ------
# The linker resolves surface variants to one canonical normalized form
# before keying the canonicalization groupby (SURVEY.md §2.4 J-new).
ALIASES = {
    "roma": "rome",
    "milano": "milan",
    "napoli": "naples",
    "torino": "turin",
    "firenze": "florence",
    "venezia": "venice",
    "genova": "genoa",
    "unicredit spa": "unicredit",
    "banca unicredit spa": "unicredit",
    "autostrade per": "autostrade",
}

# ---- stopword sets for the language-ID heuristic (ops/textstats.py) -------
STOPWORDS = {
    "en": frozenset(
        "the of and to in a is that it was for on are as with his they at be this from or had by".split()
    ),
    "it": frozenset(
        "il di e che la in un a per è una sono con non le si della nel da lo".split()
    ),
    "nl": frozenset(
        "de van het een en in is dat op te zijn met voor niet aan er om door maar".split()
    ),
}
