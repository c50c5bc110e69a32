"""Stage E — deterministic text extraction (html → text).

Input: PAGES batches (pyarrow, zero-copy from the object store); the
``html`` binary column — the one wide column — is DROPPED here, so
nothing downstream ever shuffles it (SURVEY.md §4.3). Output text is
byte-identical per url to the sequential oracle extractor (the
north-star per-row invariant) because both call
``transner_ray.htmlops.extract_text``.
"""

from __future__ import annotations

import pyarrow as pa

from ..htmlops import extract_text
from ..schemas import EXTRACTED


def extract_text_batch(batch: pa.Table) -> pa.Table:
    # per-row byte parsing is the compute here; everything else stays Arrow
    texts = [extract_text(h) for h in batch.column("html").to_pylist()]
    return pa.table(
        {
            "url": batch.column("url"),
            "text": pa.array(texts, type=pa.string()),
            "lang": batch.column("lang"),
        },
        schema=EXTRACTED,
    )
