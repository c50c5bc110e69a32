"""Broadcast-small-side lookup tables (SURVEY.md §2.4 J1).

The reference loads its gazetteers once per process into lowercase
Python sets (cities: ner.py:117-119; religions: ner.py:121-126) and does
set-membership lookups — never a distributed join. We keep that shape:
``Gazetteers`` is built once, ``ray.put`` once on the driver, and read
inside each actor/task (`ray.get` in ``__init__``), so the small side is
shipped once per node instead of once per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .data import lexicon


@dataclass(frozen=True)
class Gazetteers:
    """Immutable lookup state shared by the tagger + gazetteer stages."""

    cities: frozenset[str]
    religions: frozenset[str]
    # phrase registry for the deterministic RuleTagger:
    # tuple-of-words -> short BIO type (PER/LOC/ORG/MISC)
    phrases: dict[tuple[str, ...], str] = field(default_factory=dict)
    max_phrase_len: int = 1

    @staticmethod
    def default() -> "Gazetteers":
        cities = frozenset(lexicon.CITIES)
        religions = frozenset(lexicon.RELIGIONS)
        phrases: dict[tuple[str, ...], str] = {}
        # full names (first + last) and bare first names are PERSON
        for first in lexicon.FIRST_NAMES:
            phrases[(first,)] = "PER"
            for last in lexicon.SURNAMES:
                phrases[tuple((first + " " + last).split())] = "PER"
        for city in lexicon.CITIES:
            phrases[tuple(city.split())] = "LOC"
        for org in lexicon.ORGS:
            phrases[tuple(org.split())] = "ORG"
        for misc in lexicon.MISC_PHRASES:
            phrases[tuple(misc.split())] = "MISC"
        max_len = max(len(k) for k in phrases)
        return Gazetteers(
            cities=cities, religions=religions, phrases=phrases, max_phrase_len=max_len
        )


_DEFAULT: Gazetteers | None = None


def default_gazetteers() -> Gazetteers:
    """Process-cached default Gazetteers (cheap to build, built once)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = Gazetteers.default()
    return _DEFAULT
