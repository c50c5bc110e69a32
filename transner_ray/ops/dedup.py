"""Corpus deduplication operators: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Scale notes (the part that matters at 100 TB):
* exact dedup: content-hash added in a vectorized ``map_batches``, then
  ``groupby(hash)`` over (hash, min_id, count) PARTIALS — the shuffle
  carries one row per distinct hash per block, never the text.
* MinHash-LSH: signatures per batch (numpy, vectorized over shingle
  hashes) → explode to (band, band_key, doc_id) rows → banded groupby →
  candidate pairs → Jaccard verify. The verify step here broadcasts the
  (small) text column via ``ray.put``; at corpus scale you'd hash-join
  the pair list back to the shingle sets instead — documented
  partitioning assumption, same semantics.
* SimHash: 64-bit signatures; candidates blocked on 8×8-bit bands
  (pigeonhole: hamming ≤ 7 guaranteed found at ≥1 shared band —
  keep SIMHASH_BANDS and any ``max_hamming`` tuning consistent).
* embedding near-dup: sign-random-projection buckets (seeded), exact
  cosine verify within buckets.

All hashes are deterministic (memoized crc32 word hashes + splitmix64
mixing — never Python ``hash``, which is salted per process), so every
run and every parallelism level agrees.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

_MASK = (1 << 64) - 1

# per-worker cache: word -> 64-bit hash (vocabularies are Zipfian)
_WORD_HASH_CACHE: dict[str, int] = {}


def _word_hash(word: str) -> int:
    """Deterministic 64-bit word hash (crc32 of the word and of the
    reversed word combined — crc32 is a C implementation, ~100x faster
    than a per-byte Python FNV loop), memoized per worker."""
    import zlib

    h = _WORD_HASH_CACHE.get(word)
    if h is None:
        b = word.encode("utf-8")
        h = (zlib.crc32(b) << 32) | zlib.crc32(b[::-1] + b"\x01")
        if len(_WORD_HASH_CACHE) < 2_000_000:
            _WORD_HASH_CACHE[word] = h
    return h


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _read_docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# --------------------------------------------------------------- exact

def exact_dedup(sf_dir: str) -> rd.Dataset:
    """Keeper (min doc_id) + copy count per distinct text. The shuffle
    key is the md5, not the text."""
    import hashlib

    from ray.data.aggregate import Min, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]]
        g = pd.DataFrame({"text_md5": md5s, "doc_id": df["doc_id"]})
        return g.groupby("text_md5", as_index=False).agg(
            keeper_doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("text_md5")
        .aggregate(
            Min("keeper_doc_id", alias_name="keeper_doc_id"),
            Sum("n_copies", alias_name="n_copies"),
        )
        .sort("text_md5")
    )


EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_md5, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY text ORDER BY text_md5
"""


# ----------------------------------------------------------- shingling

def _word_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles: per-word cached crc hashes combined
    with a vectorized rolling mix (no per-shingle Python hashing)."""
    words = text.lower().split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    H = np.array([_word_hash(w) for w in words], dtype=np.uint64)
    if len(words) < k:
        combined = _mix64(np.array([np.bitwise_xor.reduce(H)], dtype=np.uint64))
        return combined
    sh = (
        H[: len(H) - k + 1] * np.uint64(0x9E3779B97F4A7C15)
        ^ H[1 : len(H) - k + 2] * np.uint64(0xC2B2AE3D27D4EB4F)
        ^ H[2 : len(H) - k + 3] * np.uint64(0x165667B19E3779F9)
    )
    return np.unique(_mix64(sh))


def _char_ngram_hashes(text: str, n: int = 4) -> np.ndarray:
    """Hashes of char n-grams: one numpy pass over the utf-8 bytes
    (rolling polynomial over 4 byte lanes, then splitmix)."""
    b = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    if b.size < n:
        pad = np.zeros(n, dtype=np.uint64)
        pad[: b.size] = b
        b = pad
    m = b.size - n + 1
    acc = np.zeros(m, dtype=np.uint64)
    for lane in range(n):
        acc = acc * np.uint64(0x100000001B3) + b[lane : lane + m]
    return np.unique(_mix64(acc))


# -------------------------------------------------------- MinHash + LSH

NUM_PERM = 64
NUM_BANDS = 16  # 16 bands x 4 rows


def _minhash_signature(hashes: np.ndarray) -> np.ndarray:
    """NUM_PERM minhash values via one splitmix per permutation seed
    (vectorized: (NUM_PERM, n) matrix min over axis 1)."""
    if hashes.size == 0:
        return np.full(NUM_PERM, _MASK, dtype=np.uint64)
    seeds = np.arange(1, NUM_PERM + 1, dtype=np.uint64)[:, None]
    return _mix64(hashes[None, :] ^ (seeds * np.uint64(0x9E3779B97F4A7C15))).min(axis=1)


def _band_rows(doc_ids, sigs) -> pd.DataFrame:
    """Vectorized banding: (n_docs, NUM_PERM) signatures → one row per
    (doc, band) with a mixed band key."""
    rows_per_band = NUM_PERM // NUM_BANDS
    S = np.stack(sigs) if sigs else np.zeros((0, NUM_PERM), dtype=np.uint64)
    n = S.shape[0]
    chunks = S.reshape(n, NUM_BANDS, rows_per_band)
    keys = np.bitwise_xor.reduce(chunks, axis=2) ^ np.arange(NUM_BANDS, dtype=np.uint64)[None, :]
    keys = _mix64(keys.ravel()).astype("int64")
    return pd.DataFrame(
        {
            "band": np.tile(np.arange(NUM_BANDS, dtype=np.int32), n),
            "band_key": keys,
            "doc_id": np.repeat(np.asarray(doc_ids), NUM_BANDS),
        }
    )


def _candidate_pairs_from_bands(bands: rd.Dataset) -> rd.Dataset:
    """(band, band_key) groups → unique candidate (doc_a < doc_b)."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = bands.groupby(["band", "band_key"]).map_groups(pairs, batch_format="pandas")
    # distinct pairs (a pair can collide in several bands)
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def minhash_dedup(sf_dir: str, jaccard_threshold: float = 0.5) -> rd.Dataset:
    """Near-dup pairs by word-3-shingle MinHash-LSH with exact Jaccard
    verification; returns (doc_a, doc_b, jaccard) sorted."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
        sigs = [_minhash_signature(_word_shingle_hashes(t)) for t in df["text"]]
        return _band_rows(list(df["doc_id"]), sigs)

    bands = docs.map_batches(sig_batch, batch_format="pandas")
    pairs = _candidate_pairs_from_bands(bands)

    # broadcast text for verification (small corpus; at scale: hash-join
    # the pair list back to shingle sets instead)
    texts_ref = ray.put(dict(zip(*[docs.to_pandas()[c] for c in ("doc_id", "text")])))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        texts = ray.get(texts_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(df["doc_a"], df["doc_b"]):
            ha = _word_shingle_hashes(texts[a])
            hb = _word_shingle_hashes(texts[b])
            inter = np.intersect1d(ha, hb).size
            union = ha.size + hb.size - inter
            j = inter / union if union else 0.0
            if j >= jaccard_threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 4))
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
                "jaccard": pd.Series(out_j, dtype="float64"),
            }
        )

    return pairs.map_batches(verify, batch_format="pandas").sort(["doc_a", "doc_b"])


# -------------------------------------------------------------- SimHash

def _simhash64(text: str) -> int:
    words = text.lower().split()
    if not words:
        return 0
    hashes = np.array([_word_hash(w) for w in words], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2)


SIMHASH_BANDS = 8  # 8 bands × 8 bits: hamming ≤ 7 ⇒ ≥1 identical band


def simhash_dedup(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by 64-bit SimHash, candidates blocked on 8×8-bit
    bands (pigeonhole: hamming ≤ 7 ⇒ at least one identical band, so
    any ``max_hamming`` ≤ 7 has full recall), verified by exact
    hamming distance. Returns (doc_a, doc_b, hamming)."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
        sigs = [_simhash64(t) for t in df["text"]]
        rows = {"doc_id": [], "band": [], "band_key": [], "sig": []}
        for doc_id, s in zip(df["doc_id"], sigs):
            for b in range(SIMHASH_BANDS):
                rows["doc_id"].append(doc_id)
                rows["band"].append(b)
                rows["band_key"].append((s >> (8 * b)) & 0xFF)
                rows["sig"].append(np.uint64(s).astype("int64"))
        return pd.DataFrame(rows)

    bands = docs.map_batches(sig_batch, batch_format="pandas")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        ids = list(g["doc_id"])
        sigs = [int(s) & _MASK for s in g["sig"]]
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(sigs[i] ^ sigs[j]).count("1")
                out["doc_a"].append(ids[i])
                out["doc_b"].append(ids[j])
                out["hamming"].append(d)
        return pd.DataFrame(out)

    cand = bands.groupby(["band", "band_key"]).map_groups(pairs, batch_format="pandas")

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["hamming"] <= max_hamming]

    dedup = cand.map_batches(keep, batch_format="pandas")
    return (
        dedup.groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
        .sort(["doc_a", "doc_b"])
    )


# ----------------------------------------------------- n-gram Jaccard

def ngram_jaccard_dedup(sf_dir: str, jaccard_threshold: float = 0.6) -> rd.Dataset:
    """Char-4-gram Jaccard near-dup: MinHash-LSH candidates over char
    n-grams, exact verification. Same shape as minhash_dedup but at the
    character level (robust to word-order edits)."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
        sigs = [_minhash_signature(_char_ngram_hashes(t)) for t in df["text"]]
        return _band_rows(list(df["doc_id"]), sigs)

    bands = docs.map_batches(sig_batch, batch_format="pandas")
    pairs = _candidate_pairs_from_bands(bands)
    texts_ref = ray.put(dict(zip(*[docs.to_pandas()[c] for c in ("doc_id", "text")])))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        texts = ray.get(texts_ref)
        rows = {"doc_a": [], "doc_b": [], "jaccard": []}
        for a, b in zip(df["doc_a"], df["doc_b"]):
            ha = _char_ngram_hashes(texts[a])
            hb = _char_ngram_hashes(texts[b])
            inter = np.intersect1d(ha, hb).size
            union = ha.size + hb.size - inter
            j = inter / union if union else 0.0
            if j >= jaccard_threshold:
                rows["doc_a"].append(a)
                rows["doc_b"].append(b)
                rows["jaccard"].append(round(j, 4))
        return pd.DataFrame(
            {
                "doc_a": pd.Series(rows["doc_a"], dtype="int64"),
                "doc_b": pd.Series(rows["doc_b"], dtype="int64"),
                "jaccard": pd.Series(rows["jaccard"], dtype="float64"),
            }
        )

    return pairs.map_batches(verify, batch_format="pandas").sort(["doc_a", "doc_b"])


# ------------------------------------------------- embedding near-dup

def embedding_neardup(sf_dir: str, cos_threshold: float = 0.9, n_planes: int = 8) -> rd.Dataset:
    """Embedding-cosine near-dup: sign-random-projection buckets
    (seeded hyperplanes → 2^n_planes buckets), exact cosine verify
    within each bucket. Single-probe: pairs straddling a hyperplane can
    be missed — the standard LSH recall tradeoff, documented."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def bucket_batch(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy())
        # hyperplanes regenerated per task from the FIXED seed — a pure
        # function of (seed, dim, n_planes), so every worker/batch uses
        # identical planes without any cross-worker state
        planes = np.random.default_rng(7).standard_normal((vecs.shape[1], n_planes))
        norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        signs = (norm @ planes) > 0
        bucket = signs @ (1 << np.arange(n_planes))
        return pd.DataFrame(
            {
                "bucket": bucket.astype("int64"),
                "vec_id": df["vec_id"],
                "embedding": list(norm),
            }
        )

    buckets = emb.map_batches(bucket_batch, batch_format="pandas")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        vecs = np.stack(g["embedding"].to_numpy())
        sims = vecs @ vecs.T
        out = {"vec_a": [], "vec_b": [], "cosine": []}
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= cos_threshold:
                    out["vec_a"].append(int(ids[i]))
                    out["vec_b"].append(int(ids[j]))
                    out["cosine"].append(round(float(sims[i, j]), 4))
        return pd.DataFrame(
            {
                "vec_a": pd.Series(out["vec_a"], dtype="int64"),
                "vec_b": pd.Series(out["vec_b"], dtype="int64"),
                "cosine": pd.Series(out["cosine"], dtype="float64"),
            }
        )

    return buckets.groupby("bucket").map_groups(pairs, batch_format="pandas").sort(
        ["vec_a", "vec_b"]
    )
