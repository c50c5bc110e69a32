"""Training-data curation ops beyond dedup: benchmark decontamination,
global vocabulary statistics, and deterministic stratified sampling —
the remaining stages a 100 TB pre-training pipeline runs between crawl
and tokenizer.

Scale design per op:

* ``decontaminate`` — the eval/benchmark side of a contamination check
  is SMALL by construction (benchmark suites are MBs, the train corpus
  is the 100 TB side), so this is the canonical broadcast-semi-join:
  the eval n-gram hash set is built once, ``ray.put`` once, and every
  train batch probes it with one vectorized ``np.isin`` — zero
  shuffle, the train side streams. An eval set too big to broadcast
  would swap the exact set for a Bloom filter (the
  ``relational.customers_without_big_orders`` pattern: Bloom prefilter
  + exact re-check of hits), same dataflow.
* ``vocab_topk`` — classic heavy-hitter aggregation: per-batch
  combiner (one pandas groupby per batch collapses the Zipf head
  before anything moves), bucketed hash-aggregate reduce
  (ops/agg.bucketed_group_reduce — fan-out scales with input), then
  per-bucket top-k so only ``buckets × k`` short rows ever reach the
  driver. Correct because a word lives in exactly one bucket, so the
  global top-k is a subset of the union of per-bucket top-ks.
* ``stratified_sample`` — deterministic per-source rate sampling for
  domain mixing: keep iff ``knuth32(doc_id) % 100 < rate[source]``.
  Pure map, no shuffle, reproducible across runs/processes by
  construction (no RNG state), and expressible in exact integer SQL —
  which is the point: the sample a run takes is auditable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from .dedup import _batch_word_hashes, _mix64, _docs_rows, _read_docs

# ------------------------------------------------- decontamination

DECON_NGRAM = 8  # words per overlap gram (the common 8-13 range's floor)
EVAL_MOD = 20  # doc_id % EVAL_MOD == 0 -> synthetic held-out eval slice
_FNV = np.uint64(0x100000001B3)


def _wordgram_hashes(H: np.ndarray, n: int) -> np.ndarray:
    """Word-hash array → sorted unique n-gram hashes (rolling
    polynomial over n lanes, splitmix finalizer — the char-n-gram
    recipe lifted to word lanes). Docs shorter than n words carry no
    gram (they cannot contain an n-gram overlap)."""
    if H.size < n:
        return np.zeros(0, dtype=np.uint64)
    m = H.size - n + 1
    acc = np.zeros(m, dtype=np.uint64)
    for lane in range(n):
        acc = acc * _FNV + H[lane : lane + m]
    return np.unique(_mix64(acc))


def _wordgrams_batch(texts: list[str], n: int) -> list[np.ndarray]:
    return [_wordgram_hashes(H, n) for H in _batch_word_hashes(texts)]


def _eval_gram_ref(docs: rd.Dataset, n: int, eval_mod: int):
    """Broadcast handle for the eval slice's unique gram hashes, built
    DISTRIBUTEDLY: each block filters its own eval rows and reduces
    them to one binary blob of block-unique 8-byte gram hashes — eval
    TEXT never leaves the workers and never reaches the driver. The
    driver's fold is ``np.unique`` over the concatenated blob arrays
    (the ``relational._bloom_from_key_batches`` shape with exact
    hashes instead of a bitset), then one ``ray.put``.

    Driver memory is 8 bytes × |unique eval grams| — the benchmark
    side of a contamination check (suites are MBs against a 100 TB
    train side). An eval set whose HASH union outgrew the driver would
    swap this exact array for a Bloom filter built by the same fold
    (``relational._bloom_from_key_batches``) plus the exact re-check
    backstop; same dataflow, same probe site."""
    import pyarrow as pa

    def gram_partial(t: pa.Table) -> pa.Table:
        # this pyarrow has no modulo kernel; numpy over the zero-copy
        # int64 column is equivalent and allocation-free for the mask
        mask = (t["doc_id"].to_numpy(zero_copy_only=False) % eval_mod) == 0
        if not mask.any():
            return pa.table({"grams": pa.array([], pa.binary())})
        texts = t.filter(pa.array(mask)).column("text").to_pylist()
        per_doc = _wordgrams_batch(texts, n)
        u = (
            np.unique(np.concatenate(per_doc))
            if per_doc
            else np.zeros(0, dtype=np.uint64)
        )
        return pa.table({"grams": pa.array([u.tobytes()], pa.binary())})

    # batch_size=None → one partial blob per BLOCK, not per 1k rows
    blobs = docs.map_batches(
        gram_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()["grams"]
    parts = [np.frombuffer(b, dtype=np.uint64) for b in blobs]
    eval_grams = (
        np.unique(np.concatenate(parts)) if parts else np.zeros(0, dtype=np.uint64)
    )
    return ray.put(eval_grams)


def decontaminate(sf_dir: str, n: int = DECON_NGRAM, eval_mod: int = EVAL_MOD) -> rd.Dataset:
    """(doc_id, contaminated) for every TRAIN document (doc_id %
    eval_mod != 0): contaminated iff the doc shares at least one
    n-word-gram with any EVAL document (doc_id % eval_mod == 0) — the
    train/test-overlap filter every published pre-training pipeline
    applies before the tokenizer.

    The gram membership test runs on 64-bit gram hashes while the SQL
    oracle compares gram STRINGS; a cross-side collision would flip a
    flag, at probability ~|eval grams|·|train grams| / 2^64 —
    negligible at any testable scale and still < 1e-4 at 10^12 grams.
    """
    import pyarrow as pa

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    grams_ref = _eval_gram_ref(docs, n, eval_mod)

    def flag_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["doc_id"] % eval_mod) != 0]
        ev = ray.get(grams_ref)
        grams = _wordgrams_batch(list(df["text"]), n)
        hit = [bool(np.isin(g, ev, assume_unique=True).any()) for g in grams]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "contaminated": pd.Series(hit, dtype="bool").to_numpy(),
            }
        )

    return docs.map_batches(flag_batch, batch_format="pandas").sort("doc_id")


DECONTAMINATE_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents
), grams AS (
  SELECT doc_id,
         list_aggregate(w[CAST(i AS INTEGER):CAST(i AS INTEGER) + {DECON_NGRAM - 1}],
                        'string_agg', ' ') AS g
  FROM words, LATERAL unnest(generate_series(1, len(w) - {DECON_NGRAM - 1})) AS t(i)
), eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0
)
SELECT d.doc_id,
       coalesce(max(CASE WHEN e.g IS NOT NULL THEN TRUE END), FALSE) AS contaminated
FROM documents d
LEFT JOIN grams t ON t.doc_id = d.doc_id
LEFT JOIN eval_grams e ON t.g = e.g
WHERE d.doc_id % {EVAL_MOD} != 0
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------- vocabulary top-k

VOCAB_TOPK = 100


def vocab_topk(sf_dir: str, k: int = VOCAB_TOPK) -> pd.DataFrame:
    """Global top-k corpus vocabulary: (word, cnt), cnt desc then word
    asc (deterministic ties). Words are the ``word_repetition``
    tokens ([a-z]+ runs of the lowercased text). Combiner partials per
    batch → bucketed hash-aggregate → per-bucket top-k → driver merges
    buckets × k short rows."""
    import re

    from .agg import bucketed_group_reduce, hash_str_col

    word_re = re.compile(r"[a-z]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words: list[str] = []
        for t in df["text"]:
            words.extend(word_re.findall(t.lower()))
        if not words:
            return pd.DataFrame({"word": pd.Series([], dtype="str"),
                                 "cnt": pd.Series([], dtype="int64")})
        s = pd.Series(words, dtype="object")
        g = s.groupby(s).size()
        return pd.DataFrame({"word": g.index.to_numpy(), "cnt": g.to_numpy().astype("int64")})

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("word", as_index=False)["cnt"].sum()
        # bucket-local top-k: the global top-k restricted to this
        # bucket's words is a subset of this (words never split
        # across buckets)
        return tot.sort_values(["cnt", "word"], ascending=[False, True]).head(k)

    partials = _read_docs(sf_dir, ["text"]).map_batches(partial, batch_format="pandas")
    per_bucket = bucketed_group_reduce(
        partials,
        lambda df: hash_str_col(df["word"]),
        reduce,
        input_rows=_docs_rows(sf_dir),
    ).to_pandas()  # buckets × k rows — driver-safe at any corpus size
    return (
        per_bucket.sort_values(["cnt", "word"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


VOCAB_TOPK_SQL = f"""
SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
)
GROUP BY w
ORDER BY cnt DESC, word ASC
LIMIT {VOCAB_TOPK}
"""


# ----------------------------------------------- stratified sampling

# per-source keep percentages for the driver-gate entry: deterministic,
# covers 0% (drop a source entirely), sub- and super-50% mixes
SAMPLE_RATES = {f"src{i}": (i * 7) % 100 for i in range(20)}
SAMPLE_DEFAULT_PCT = 50
_KNUTH32 = 2654435761  # Knuth multiplicative hash constant
_U32 = 1 << 32


def stratified_sample(
    sf_dir: str,
    rates: dict[str, int] | None = None,
    default_pct: int = SAMPLE_DEFAULT_PCT,
) -> rd.Dataset:
    """Deterministic domain-mixing sample of documents: keep a row iff
    ``(doc_id * KNUTH32 mod 2^32) mod 100 < rates[source]``. No RNG
    state — the selection is a pure function of (doc_id, source), so
    reruns, resumes and multi-cluster re-executions take the SAME
    sample, and the exact integer arithmetic makes the sample
    auditable in SQL. Pure map over the stream: no shuffle, no state.
    """
    rates = SAMPLE_RATES if rates is None else rates

    def keep_batch(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_id"].to_numpy().astype(np.uint64) % np.uint64(_U32)
        u = (a * np.uint64(_KNUTH32)) % np.uint64(_U32)  # mod-first: no wrap at any doc_id
        pct = df["source"].map(rates).fillna(default_pct).to_numpy(dtype=np.int64)
        kept = df[(u % np.uint64(100)).astype(np.int64) < pct]
        return pd.DataFrame(
            {
                "doc_id": kept["doc_id"].astype("int64").to_numpy(),
                "source": kept["source"].to_numpy(),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "source"])
        .map_batches(keep_batch, batch_format="pandas")
        .sort("doc_id")
    )


def stratified_sample_sql(
    rates: dict[str, int] | None = None, default_pct: int = SAMPLE_DEFAULT_PCT
) -> str:
    rates = SAMPLE_RATES if rates is None else rates
    cases = " ".join(f"WHEN '{s}' THEN {p}" for s, p in sorted(rates.items()))
    return f"""
SELECT doc_id, source
FROM documents
WHERE ((CAST(doc_id AS HUGEINT) * {_KNUTH32}) % {_U32}) % 100
      < (CASE source {cases} ELSE {default_pct} END)
ORDER BY doc_id
"""


# ----------------------------------- flagship composite: crawl → chunks

def prepare_training_data(
    sf_dir: str,
    n: int = DECON_NGRAM,
    eval_mod: int = EVAL_MOD,
    chunk_tokens: int | None = None,
) -> rd.Dataset:
    """The full curation chain as ONE pipeline — what a user actually
    runs between crawl and tokenizer:

        train split (eval slice held out) → quality filter
        (curate_corpus semantics) → exact-dedup keeper → benchmark
        decontamination → sequence packing

    Returns (doc_id, n_tokens, chunk_id, chunk_offset) for every
    surviving document. Entirely SQL-checkable: each stage reuses a
    gate-checked op's exact semantics and constants.

    Scale shape: all per-doc predicates (train membership, length,
    repetition, contamination probe against the broadcast eval-gram
    set) plus the md5 / token count are computed in ONE streaming pass
    over the corpus — the text never leaves that pass. The only wide
    steps are the short-row keeper reduce (bucketed hash-aggregate,
    input-scaled fan-out) and ``pack.pack_token_stream``'s O(buckets)
    driver scan. Stage commutation: exact duplicates share text
    byte-for-byte, so the quality verdict AND the contamination flag
    are constant within an md5 group — keeper-then-flag equals
    flag-then-keeper, and the reduce carries the group's common values
    (cf. curate_corpus's docstring for the same argument).
    """
    import hashlib
    from collections import Counter

    from .agg import bucketed_group_reduce, hash_str_col
    from .pack import CHUNK_TOKENS, _range_width, pack_token_stream
    from .textstats import CURATE_MAX_TOP_WORD_PCT, CURATE_MIN_CHARS, _WORD_RE

    if chunk_tokens is None:
        chunk_tokens = CHUNK_TOKENS
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_rows = _docs_rows(sf_dir)
    width = _range_width(n_rows)
    grams_ref = _eval_gram_ref(docs, n, eval_mod)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["doc_id"] % eval_mod) != 0]  # train split
        ev = ray.get(grams_ref)
        keep_idx: list[int] = []
        texts = list(df["text"])
        for i, t in enumerate(texts):
            if len(t) < CURATE_MIN_CHARS:
                continue
            words = _WORD_RE.findall(t.lower())
            if not words:
                continue
            c = Counter(words)
            if max(c.values()) * 100 > CURATE_MAX_TOP_WORD_PCT * len(words):
                continue
            keep_idx.append(i)
        kept_texts = [texts[i] for i in keep_idx]
        grams = _wordgrams_batch(kept_texts, n)
        g = pd.DataFrame(
            {
                "text_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in kept_texts
                ],
                "doc_id": df["doc_id"].iloc[keep_idx].astype("int64").to_numpy(),
                "n_tokens": pd.Series(
                    [len(t.split()) for t in kept_texts], dtype="int64"
                ),
                "contaminated": pd.Series(
                    [bool(np.isin(h, ev, assume_unique=True).any()) for h in grams],
                    dtype="bool",
                ),
            }
        )
        # combiner: one short row per distinct md5 per block (n_tokens
        # and contaminated are text-derived, hence constant per group —
        # min is the identity on them)
        return g.groupby("text_md5", as_index=False).min()

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("text_md5", as_index=False).min()
        g = g[~g["contaminated"]]
        out = g[["doc_id", "n_tokens"]].copy()
        out["bucket"] = (out["doc_id"] // width).astype("int64")
        return out

    survivors = bucketed_group_reduce(
        docs.map_batches(partial, batch_format="pandas"),
        lambda df: hash_str_col(df["text_md5"]),
        reduce,
        input_rows=n_rows,
    )
    return pack_token_stream(survivors, chunk_tokens)


def prepare_training_data_sql(
    n: int = DECON_NGRAM, eval_mod: int = EVAL_MOD, chunk_tokens: int | None = None
) -> str:
    from .pack import CHUNK_TOKENS
    from .textstats import CURATE_MAX_TOP_WORD_PCT, CURATE_MIN_CHARS

    if chunk_tokens is None:
        chunk_tokens = CHUNK_TOKENS
    return f"""
WITH train AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {eval_mod} != 0
), wstats AS (
  SELECT doc_id, sum(c) AS n_words, max(c) AS top_count FROM (
    SELECT doc_id, w, count(*) AS c FROM (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM train
    ) GROUP BY doc_id, w
  ) GROUP BY doc_id
), quality AS (
  SELECT t.doc_id, t.text
  FROM train t JOIN wstats s USING (doc_id)
  WHERE length(t.text) >= {CURATE_MIN_CHARS}
    AND s.top_count * 100 <= {CURATE_MAX_TOP_WORD_PCT} * s.n_words
), keepers AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY text
), words AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents
), grams AS (
  SELECT doc_id,
         list_aggregate(w[CAST(i AS INTEGER):CAST(i AS INTEGER) + {n - 1}],
                        'string_agg', ' ') AS g
  FROM words, LATERAL unnest(generate_series(1, len(w) - {n - 1})) AS t(i)
), eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {eval_mod} = 0
), clean AS (
  SELECT k.doc_id
  FROM keepers k
  WHERE NOT EXISTS (
    SELECT 1 FROM grams t JOIN eval_grams e ON t.g = e.g
    WHERE t.doc_id = k.doc_id
  )
), survivors AS (
  SELECT c.doc_id,
         length(regexp_extract_all(d.text, '\\S+')) AS n_tokens
  FROM clean c JOIN documents d USING (doc_id)
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_before // {chunk_tokens} AS BIGINT) AS chunk_id,
       CAST(cum_before % {chunk_tokens} AS BIGINT) AS chunk_offset
FROM (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM survivors
)
ORDER BY doc_id
"""


# ------------------------------------------- deterministic epoch shuffle

EPOCH_STRIDE = 2654435769  # 0x9E3779B9 — decorrelates epochs


def epoch_shuffle(sf_dir: str, epoch: int = 1) -> rd.Dataset:
    """(pos, doc_id): the deterministic global permutation of the
    corpus for one training epoch — reproducible across runs, resumes
    and cluster sizes by construction (no RNG state), different per
    epoch. Order key = ``((doc_id + epoch·STRIDE) · knuth32) mod 2³²``
    with doc_id as the tie-break (the stratified_sample hash family —
    exact in integer SQL; a >2³²-doc corpus would move to the 64-bit
    splitmix key, losing only the SQL oracle).

    Scale shape: rank WITHOUT a global sort. The key's TOP BITS form
    contiguous range buckets (hash keys are uniform, so buckets are
    balanced); per-block bucket counts flow to the driver (O(buckets)
    integers — the pack prefix-scan pattern), an exclusive scan gives
    each bucket's base rank, and one vectorized argsort per bucket
    assigns ``pos = base + local_rank``. One shuffle total, driver
    state O(buckets)."""
    from .agg import scaled_num_buckets

    n_rows = _docs_rows(sf_dir)
    n_buckets = scaled_num_buckets(n_rows, floor=16)
    bbits = max(1, (n_buckets - 1).bit_length())
    shift = np.uint64(32 - bbits)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy().astype(np.uint64)
        key = ((d + np.uint64(epoch) * np.uint64(EPOCH_STRIDE)) * np.uint64(_KNUTH32)) % np.uint64(_U32)
        return pd.DataFrame(
            {
                "doc_id": d.astype("int64"),
                "key": key.astype("int64"),
                "bucket": (key >> shift).astype("int64"),
            }
        )

    from .agg import driver_exclusive_scan

    ks = (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(keyed, batch_format="pandas")
        .materialize()
    )
    # per-block bucket counts → driver exclusive scan (O(2^bbits) ints)
    base_ref = driver_exclusive_scan(ks, "bucket")

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        buckets, offs = ray.get(base_ref)
        base = int(offs[np.searchsorted(buckets, int(g["bucket"].iloc[0]))])
        g = g.sort_values(["key", "doc_id"])  # doc_id breaks 32-bit key ties
        return pd.DataFrame(
            {
                "pos": base + np.arange(len(g), dtype=np.int64),
                "doc_id": g["doc_id"].to_numpy(),
            }
        )

    return ks.groupby("bucket").map_groups(rank_bucket, batch_format="pandas").sort("pos")


def epoch_shuffle_sql(epoch: int = 1) -> str:
    return f"""
SELECT CAST(row_number() OVER (ORDER BY key, doc_id) - 1 AS BIGINT) AS pos, doc_id
FROM (
  SELECT doc_id,
         ((CAST(doc_id AS HUGEINT) + {epoch} * {EPOCH_STRIDE}) * {_KNUTH32})
           % {_U32} AS key
  FROM documents
)
ORDER BY pos
"""


# ------------------------------------------- per-group cap sampling

CAP_PER_SOURCE = 20  # driver-gate cap


def cap_per_group(sf_dir: str, n: int = CAP_PER_SOURCE) -> rd.Dataset:
    """Domain capping: keep at most ``n`` documents per source, chosen
    by deterministic hash order (Knuth-multiplicative of doc_id, ties
    impossible — doc_id is unique) — the standard web-pipeline defense
    against a single domain dominating the training mix, and the
    fixed-size sibling of ``stratified_sample``'s fixed-RATE mix.

    One bucketed shuffle by source; each reduce task ranks its
    sources' rows vectorized and heads ``n``. A pathologically hot
    source costs its full row set in one task — rows here are (id,
    source) stubs, not text, so the task is bounded by ~16 bytes ×
    group size; capping before fetching text is the point."""
    from .agg import bucketed_group_reduce, hash_str_col

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        # mod-first keeps the product < 2^64 for ANY int64 doc_id
        # (a·K mod 2^32 == (a mod 2^32)·K mod 2^32); doc_id tiebreak
        # makes the order total even when two ids collide mod 2^32
        a = g["doc_id"].to_numpy().astype(np.uint64) % np.uint64(_U32)
        g["_h"] = (a * np.uint64(_KNUTH32)) % np.uint64(_U32)
        g = g.sort_values(["source", "_h", "doc_id"])
        out = g.groupby("source", sort=False).head(n)
        return out[["doc_id", "source"]].astype({"doc_id": "int64"})

    return bucketed_group_reduce(
        _read_docs(sf_dir, ["doc_id", "source"]),
        lambda df: hash_str_col(df["source"]),
        reduce,
        input_rows=_docs_rows(sf_dir),
    ).sort("doc_id")


def cap_per_group_sql(n: int = CAP_PER_SOURCE) -> str:
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (CAST(doc_id AS HUGEINT) * {_KNUTH32}) % {_U32}, doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= {n}
ORDER BY doc_id
"""


# ------------------------------------------------ exact-k uniform sample

SAMPLE_K = 200


def sample_exact_k(sf_dir: str, k: int = SAMPLE_K) -> pd.DataFrame:
    """Deterministic uniform sample of EXACTLY k docs (contrast
    ``stratified_sample``, which keeps a hash RATE and so returns a
    binomial-sized sample): the k docs with the smallest Knuth-hash
    order key, ties by doc_id. No RNG state, no shuffle — the
    distributed-top-k shape: every block emits its k smallest
    (key, doc_id) partials (``batch_size=None`` → one partial per
    block), the driver folds blocks × k SHORT rows and keeps the
    global k. At 10^9 docs the driver sees k rows per block of the
    scan, never data rows; a deeper tree (tournament of partial
    top-ks) drops in if blocks × k ever outgrows the driver."""
    import numpy as np

    from .dedup import _read_docs

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy().astype(np.uint64)
        key = (d * np.uint64(_KNUTH32)) % np.uint64(_U32)
        out = pd.DataFrame({"key": key.astype("int64"), "doc_id": d.astype("int64")})
        return out.sort_values(["key", "doc_id"], kind="stable").head(k)

    parts = _read_docs(sf_dir, ["doc_id"]).map_batches(
        partial, batch_format="pandas", batch_size=None
    )
    folded = []
    for t in parts.iter_batches(batch_format="pandas"):
        folded.append(t)
        if sum(len(f) for f in folded) > 64 * k:  # keep the driver fold flat
            folded = [
                pd.concat(folded).sort_values(["key", "doc_id"], kind="stable").head(k)
            ]
    top = (
        pd.concat(folded).sort_values(["key", "doc_id"], kind="stable").head(k)
        if folded
        else pd.DataFrame({"key": pd.Series([], dtype="int64"), "doc_id": pd.Series([], dtype="int64")})
    )
    return (
        top[["doc_id"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64"})
    )


def sample_exact_k_sql(k: int = SAMPLE_K) -> str:
    return f"""
SELECT doc_id FROM (
  SELECT doc_id FROM documents
  ORDER BY (CAST(doc_id AS HUGEINT) * {_KNUTH32}) % {_U32}, doc_id
  LIMIT {k}
)
ORDER BY doc_id
"""


# ------------------------------------------------ sliding-window chunking

CHUNK_SIZE = 64  # tokens per chunk
CHUNK_STRIDE = 48  # tokens between chunk starts (overlap = size - stride)

import re as _re

_WS_RE = _re.compile(r"\s+")


def chunk_documents(
    sf_dir: str, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> rd.Dataset:
    """Fixed-size sliding-window chunking with overlap — the
    RAG-ingest / pretraining-window shape (contrast ``pack_chunks``,
    which concatenates docs into budget-bounded sequences): each doc's
    whitespace tokens become chunks of ``size`` starting every
    ``stride`` tokens (final chunk may be short). Embarrassingly
    parallel flat-map inside ``map_batches`` — no shuffle, no state;
    rows (doc_id, chunk_idx, n_tokens, chunk_text)."""

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids: list[int] = []
        idxs: list[int] = []
        counts: list[int] = []
        texts: list[str] = []
        for d, t in zip(df["doc_id"], df["text"]):
            ws = _WS_RE.split(t.strip())
            n = len(ws)
            for i in range((n - 1) // stride + 1):
                s = i * stride
                piece = ws[s : s + size]
                doc_ids.append(int(d))
                idxs.append(i)
                counts.append(len(piece))
                texts.append(" ".join(piece))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "n_tokens": pd.Series(counts, dtype="int64"),
                "chunk_text": pd.Series(texts, dtype="object"),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(chunks, batch_format="pandas")
        .sort(["doc_id", "chunk_idx"])
    )


def chunk_documents_sql(size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(least(len(ws), CAST(i AS BIGINT) * {stride} + {size}) - CAST(i AS BIGINT) * {stride} AS BIGINT) AS n_tokens,
       array_to_string(
         ws[CAST(i AS INTEGER) * {stride} + 1 : CAST(i AS INTEGER) * {stride} + {size}], ' '
       ) AS chunk_text
FROM t, LATERAL unnest(generate_series(0, (len(ws) - 1) // {stride})) AS u(i)
ORDER BY doc_id, chunk_idx
"""
