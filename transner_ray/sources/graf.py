"""S8 — GrAF standoff-XML corpus source (tooling tier).

Mirror of the reference's PANACEA chain (graf_merger.py:19-121 →
annotation.py:5-48): a document is 4 coordinated XML files —

* ``*-seg.xml``   regions: xml:id → "start end" char anchors
* ``*-sent.xml``  sentence annotations (label 's') → node → link →
                  region ⇒ sentence [start, end) spans
* ``*-pos.xml``   token annotations with word/sentOrd features,
                  assigned to a sentence by offset containment
* ``*-ner.xml``   labeled NER spans with a ``conf`` feature

``merge_graf`` reproduces the reference's intermediate ``output.txt``
line format byte-for-byte (``Token: {dict-repr}`` — key insertion
order matters and is replicated), and ``annotate_output`` reproduces
annotation.py including its quirks: conf ≥ 0.75 filter, NER spans
sorted by start, a token contained in MULTIPLE filtered spans is
written once per span (the reference's ``continue`` inside the span
loop), and the sentence-break blank line fires when a token's end
equals the MOST RECENT "Sentence offsets" end.
"""

from __future__ import annotations

import ast
import re
import xml.etree.ElementTree as ET

_NS = {
    "graph": "http://www.xces.org/ns/GrAF/1.0/",
    "xml": "http://www.w3.org/XML/1998/namespace",
}
_XML_ID = "{http://www.w3.org/XML/1998/namespace}id"


def _regions(seg_xml: str) -> dict[str, str]:
    root = ET.fromstring(seg_xml)
    return {
        el.attrib[_XML_ID]: el.attrib["anchors"]
        for el in root.findall("graph:region", _NS)
    }


def _node_targets(root, ref: str):
    node = root.find('.//graph:node[@xml:id="' + ref + '"]', _NS)
    return [] if node is None else [link.attrib["targets"] for link in node]


def merge_graf(seg_xml: str, sent_xml: str, pos_xml: str, ner_xml: str) -> str:
    """4 XML docs → the reference's ``output.txt`` text."""
    regions = _regions(seg_xml)
    lines: list[str] = []

    sents: dict[int, dict] = {}
    sent_root = ET.fromstring(sent_xml)
    for a in sent_root.findall("graph:a", _NS):
        if a.attrib["label"] != "s":
            continue
        sent: dict = {}
        for targets in _node_targets(sent_root, a.attrib["ref"]):
            anchor = regions[targets].split()
            sent["sent_start"] = int(anchor[0])
            sent["sent_end"] = int(anchor[1])
        sent["tokens"] = {}
        sents[sent["sent_start"]] = sent

    pos_root = ET.fromstring(pos_xml)
    for a in pos_root.findall("graph:a", _NS):
        ref = a.attrib["ref"]
        tok: dict = {"id": ref}
        tok_start = tok_end = None
        for targets in _node_targets(pos_root, ref):
            anchor = regions[targets].split()
            tok_start, tok_end = int(anchor[0]), int(anchor[1])
            tok["start"] = tok_start
            tok["end"] = tok_end
            tok["regions"] = targets
        for fs in a:
            for f in fs:
                tok[f.attrib["name"]] = f.attrib["value"]
        my_sent = None
        for sent_id in sents:
            if tok_start >= sents[sent_id]["sent_start"] and tok_end <= sents[sent_id]["sent_end"]:
                my_sent = sents[sent_id]
                break
        if my_sent is not None:
            my_sent["tokens"][tok["sentOrd"]] = tok

    for _, sent in sorted(sents.items(), key=lambda kv: int(kv[0])):
        lines.append(f"Sentence offsets: {sent['sent_start']}-{sent['sent_end']}\n")
        for _, token in sorted(sent["tokens"].items(), key=lambda kv: int(kv[0])):
            lines.append("Token: " + str(token) + "\n")

    ners: dict[str, dict] = {}
    ner_root = ET.fromstring(ner_xml)
    for a in ner_root.findall("graph:a", _NS):
        ref = a.attrib["ref"]
        for targets in _node_targets(ner_root, ref):
            anchor = regions[targets].split()
            ner: dict = {
                "id": ref,
                "start": int(anchor[0]),
                "end": int(anchor[1]),
                "regions": targets,
                "label": a.attrib["label"],
            }
            for fs in a:
                for f in fs:
                    ner[f.attrib["name"]] = f.attrib["value"]
            ners[ner["id"]] = ner
    for ner_id in ners:
        lines.append("Ner: " + str(ners[ner_id]) + "\n")
    return "".join(lines)


def annotate_output(output_text: str, conf_threshold: float = 0.75) -> str:
    """output.txt lines → tab-separated CoNLL (annotation.py:5-48)."""
    data = output_text.splitlines(keepends=True)
    ners = []
    for line in data:
        if line.startswith("Ner:"):
            ner = ast.literal_eval(line[5 : len(line) - 1])
            if float(ner["conf"]) >= conf_threshold:
                ners.append(ner)
    ners.sort(key=lambda x: x["start"])

    out: list[str] = []
    end_offset = -1
    for line in data:
        if line.startswith("Sentence"):
            end_offset = int(re.sub("Sentence offsets: ", "", line).split("-")[1])
        if line.startswith("Token:"):
            found = False
            tok = ast.literal_eval(line[7 : len(line) - 1])
            start, end = tok["start"], tok["end"]
            for ner in ners:
                if start >= ner["start"] and end <= ner["end"]:
                    out.append(tok["word"] + "\t" + ner["label"] + "\n")
                    found = True
                    if end == end_offset:
                        out.append("\n")
                    continue  # reference quirk: keeps scanning spans
            if not found:
                out.append(tok["word"] + "\tO\n")
                if end == end_offset:
                    out.append("\n")
    return "".join(out)


def graf_dir_to_conll(path: str, conf_threshold: float = 0.75) -> str:
    """One document directory (…-seg/sent/pos/ner.xml) → CoNLL text.
    The Ray tier maps this over a list of directories (one doc = one
    task, like the CoNLL readers)."""
    import os

    seg_files = sorted(f for f in os.listdir(path) if f.endswith("seg.xml"))
    chunks = []
    for seg in seg_files:
        base = os.path.join(path, seg[: -len("-seg.xml")])
        texts = {}
        for kind in ("seg", "sent", "pos", "ner"):
            with open(f"{base}-{kind}.xml", encoding="utf-8") as f:
                texts[kind] = f.read()
        chunks.append(
            annotate_output(
                merge_graf(texts["seg"], texts["sent"], texts["pos"], texts["ner"]),
                conf_threshold,
            )
        )
    return "".join(chunks)


def read_graf_dirs(dirs: list[str], conf_threshold: float = 0.75):
    """Ray tier: one directory per task → dataset of (path, conll)."""
    import ray.data as rd

    return rd.from_items([{"path": d} for d in dirs]).map(
        lambda row: {"path": row["path"], "conll": graf_dir_to_conll(row["path"], conf_threshold)}
    )
