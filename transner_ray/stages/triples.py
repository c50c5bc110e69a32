"""Stage T — triple extraction over nested sentence-mention rows.

Stateless ``map_batches`` function: SENTENCE_MENTIONS → TRIPLES. The
per-sentence rule set is the frozen ``kg.extract_triples``; no shuffle
is needed because the mention list is still nested per sentence (the
explode-to-flat-mentions happens on a separate branch).
"""

from __future__ import annotations

import pyarrow as pa

from ..kg import extract_triples
from ..schemas import TRIPLES


def triples_batch(batch: pa.Table) -> pa.Table:
    subj, pred, obj = [], [], []
    subj_t, obj_t, conf = [], [], []
    urls, sent_idx = [], []
    for url, si, sentence, mentions in zip(
        batch.column("url").to_pylist(),
        batch.column("sent_idx").to_pylist(),
        batch.column("sentence").to_pylist(),
        batch.column("mentions").to_pylist(),
    ):
        for t in extract_triples(sentence, mentions):
            subj.append(t["subj"])
            pred.append(t["pred"])
            obj.append(t["obj"])
            subj_t.append(t["subj_type"])
            obj_t.append(t["obj_type"])
            conf.append(t["confidence"])
            urls.append(url)
            sent_idx.append(si)
    return pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "subj_type": pa.array(subj_t, pa.string()),
            "obj_type": pa.array(obj_t, pa.string()),
            "confidence": pa.array(conf, pa.float64()),
            "url": pa.array(urls, pa.string()),
            "sent_idx": pa.array(sent_idx, pa.int32()),
        },
        schema=TRIPLES,
    )
