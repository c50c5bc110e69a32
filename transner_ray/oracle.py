"""Sequential pure-Python oracle: the reference-semantics pipeline run
row-at-a-time on the driver, no Ray. The distributed engine must match
it (mention-set equality; triple P/R — target 1.0 since both share the
frozen per-row functions; what the oracle actually guards is the
PLUMBING: offsets across stages, window merging, linking keys,
canonicalization and edge aggregation done with shuffles).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterable

from .gazetteers import Gazetteers, default_gazetteers
from .htmlops import extract_text
from .kg import build_alias_table, detect_mentions, extract_triples, link_entity
from .ner_core import SERVICE_THRESHOLD
from .splitting import split_sentences
from .tagger import RuleTagger, Tagger


def run_oracle(
    pages: Iterable[dict],
    tagger: Tagger | None = None,
    gazetteers: Gazetteers | None = None,
    threshold: float = SERVICE_THRESHOLD,
    max_sources: int = 8,
    link_mode: str = "alias",
) -> dict:
    """pages rows ({'url','html','lang',...}) → dict of stage outputs:
    extracted, sentences, mentions, triples, entities, edges —
    lists of dicts in deterministic order."""
    tagger = tagger or RuleTagger()
    gz = gazetteers or default_gazetteers()
    aliases = build_alias_table()

    extracted, sentences, mentions, triples = [], [], [], []
    for page in pages:
        url = page["url"]
        text = extract_text(page["html"])
        extracted.append({"url": url, "text": text, "lang": page["lang"]})
        for sent_idx, (sent, cs, ce) in enumerate(split_sentences(text)):
            sentences.append(
                {
                    "url": url,
                    "sent_idx": sent_idx,
                    "sentence": sent,
                    "char_start": cs,
                    "char_end": ce,
                    "lang": page["lang"],
                }
            )
            ms = detect_mentions(sent, tagger, gz, threshold)
            for mention_idx, m in enumerate(ms):
                mentions.append(
                    {
                        "url": url,
                        "sent_idx": sent_idx,
                        "mention_idx": mention_idx,
                        "type": m["type"],
                        "value": m["value"],
                        "offset": m["offset"],
                        "doc_offset": cs + m["offset"],
                        "confidence": m["confidence"],
                        "detector": m["detector"],
                    }
                )
            for t in extract_triples(sent, ms):
                t["url"] = url
                t["sent_idx"] = sent_idx
                triples.append(t)

    # ---- linking: endpoints → entity ids -------------------------------
    if link_mode == "embedding":
        from .linking import EmbeddingLinker

        linker = EmbeddingLinker()
        for t in triples:
            t["subj_id"] = linker.link_one(t["subj"], t["subj_type"])
            t["obj_id"] = linker.link_one(t["obj"], t["obj_type"])
    else:
        for t in triples:
            t["subj_id"] = link_entity(t["subj"], t["subj_type"], aliases)
            t["obj_id"] = link_entity(t["obj"], t["obj_type"], aliases)

    # ---- canonicalization: groupby entity_id over both endpoints -------
    surface_counts: dict[str, Counter] = defaultdict(Counter)
    type_counts: dict[str, Counter] = defaultdict(Counter)
    for t in triples:
        surface_counts[t["subj_id"]][t["subj"]] += 1
        type_counts[t["subj_id"]][t["subj_type"]] += 1
        surface_counts[t["obj_id"]][t["obj"]] += 1
        type_counts[t["obj_id"]][t["obj_type"] or ""] += 1
    entities = []
    for eid in sorted(surface_counts):
        counts = surface_counts[eid]
        canonical = max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        tcounts = type_counts[eid]
        etype = max(tcounts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        entities.append(
            {
                "entity_id": eid,
                "canonical": canonical,
                "type": etype,
                "aliases": sorted(set(counts)),
                "support": int(sum(counts.values())),
            }
        )

    # ---- graph materialize: edge weights + provenance, sorted ----------
    edge_weight: Counter = Counter()
    edge_sources: dict[tuple, set] = defaultdict(set)
    for t in triples:
        k = (t["subj_id"], t["pred"], t["obj_id"])
        edge_weight[k] += 1
        edge_sources[k].add(t["url"])
    edges = [
        {
            "subj_id": s,
            "pred": p,
            "obj_id": o,
            "weight": int(w),
            "sources": sorted(edge_sources[(s, p, o)])[:max_sources],
        }
        for (s, p, o), w in sorted(edge_weight.items())
    ]

    return {
        "extracted": extracted,
        "sentences": sentences,
        "mentions": mentions,
        "triples": triples,
        "entities": entities,
        "edges": edges,
    }
