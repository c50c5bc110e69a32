"""Ray Data stages of the KG pipeline (SURVEY.md §3.4).

Each stage is a ``map_batches``-compatible callable with declared
input/output schemas; stateless stages are plain functions (Ray tasks),
the mention detector is a callable CLASS (actor pool: tagger + gazetteer
state built once per actor in ``__init__``).
"""

from .extract import extract_text_batch
from .split import split_sentences_batch
from .detect import MentionDetector, explode_mentions_batch
from .triples import triples_batch
from .graph import link_triples_batch

__all__ = [
    "extract_text_batch",
    "split_sentences_batch",
    "MentionDetector",
    "explode_mentions_batch",
    "triples_batch",
    "link_triples_batch",
]
