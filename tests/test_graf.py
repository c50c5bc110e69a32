"""S8 GrAF standoff-XML source: merge + annotation quirks."""

from transner_ray.sources.graf import annotate_output, graf_dir_to_conll, merge_graf

NS = 'xmlns:graf="http://www.xces.org/ns/GrAF/1.0/" xmlns:xml="http://www.w3.org/XML/1998/namespace"'

# text: "Mario Rossi arrived ." offsets: Mario[0,5) Rossi[6,11) arrived[12,19) .[19,20)
SEG = f"""<graph {NS} xmlns="http://www.xces.org/ns/GrAF/1.0/">
  <region xml:id="r0" anchors="0 20"/>
  <region xml:id="r1" anchors="0 5"/>
  <region xml:id="r2" anchors="6 11"/>
  <region xml:id="r3" anchors="12 19"/>
  <region xml:id="r4" anchors="19 20"/>
  <region xml:id="r5" anchors="0 11"/>
</graph>"""

SENT = f"""<graph {NS} xmlns="http://www.xces.org/ns/GrAF/1.0/">
  <node xml:id="s0"><link targets="r0"/></node>
  <a label="s" ref="s0"/>
  <a label="notasentence" ref="s0"/>
</graph>"""

def _tok(nid, region, word, ord_):
    return (
        f'<node xml:id="{nid}"><link targets="{region}"/></node>'
        f'<a label="tok" ref="{nid}"><fs><f name="word" value="{word}"/>'
        f'<f name="sentOrd" value="{ord_}"/></fs></a>'
    )

POS = (
    f'<graph {NS} xmlns="http://www.xces.org/ns/GrAF/1.0/">'
    + _tok("t0", "r1", "Mario", 0)
    + _tok("t1", "r2", "Rossi", 1)
    + _tok("t2", "r3", "arrived", 2)
    + _tok("t3", "r4", ".", 3)
    + "</graph>"
)

NER = f"""<graph {NS} xmlns="http://www.xces.org/ns/GrAF/1.0/">
  <node xml:id="n0"><link targets="r5"/></node>
  <a label="PER" ref="n0"><fs><f name="conf" value="0.9"/></fs></a>
  <node xml:id="n1"><link targets="r3"/></node>
  <a label="ORG" ref="n1"><fs><f name="conf" value="0.5"/></fs></a>
</graph>"""


def test_merge_graf_output_format():
    out = merge_graf(SEG, SENT, POS, NER)
    lines = out.splitlines()
    assert lines[0] == "Sentence offsets: 0-20"
    assert lines[1].startswith("Token: {'id': 't0', 'start': 0, 'end': 5, 'regions': 'r1', 'word': 'Mario'")
    assert any(l.startswith("Ner: {'id': 'n0', 'start': 0, 'end': 11,") for l in lines)


def test_annotate_conf_filter_and_containment():
    conll = annotate_output(merge_graf(SEG, SENT, POS, NER))
    # PER span covers Mario+Rossi; ORG span (conf 0.5) filtered out
    assert conll == "Mario\tPER\nRossi\tPER\narrived\tO\n.\tO\n\n"


def test_annotate_blank_line_at_sentence_end():
    conll = annotate_output(merge_graf(SEG, SENT, POS, NER))
    assert conll.endswith(".\tO\n\n")  # '.' end==20==sentence end


def test_graf_dir_roundtrip(tmp_path):
    base = tmp_path / "doc1"
    base.mkdir()
    for kind, text in [("seg", SEG), ("sent", SENT), ("pos", POS), ("ner", NER)]:
        (base / f"d-{kind}.xml").write_text(text, encoding="utf-8")
    conll = graf_dir_to_conll(str(base))
    assert "Mario\tPER" in conll and "arrived\tO" in conll
