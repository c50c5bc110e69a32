"""BPE tokenizer training over the corpus (Sennrich et al. 2016).

The canonical production shape — and why it fits Ray Data cleanly:

1. **Distributed**: collapse the corpus to an exact ``(word, count)``
   table. 100 TB of text collapses to vocab-scale (≤ ~1e8 distinct
   words; the trainer conventionally keeps the top-V) via the same
   combiner-partial + bucketed hash-aggregate used by
   ``traindata.vocab_topk`` — the only pass that ever touches the
   corpus, one word-shaped shuffle.
2. **Driver**: the merge loop runs over the word-count table alone
   (this is how HF tokenizers / subword-nmt train too — the loop is
   inherently sequential in merge rank, and its input no longer
   depends on corpus size). Deterministic: pair score = summed word
   count; ties break on the lexicographically smallest (left, right).

Correctness: stage 1 reuses the SQL-gated ``vocab_topk``; the merge
loop is pinned by an exact-equality pytest oracle (pandas-counted
words through the same loop) and a hand-checked classic example.
"""

from __future__ import annotations

import pandas as pd

EOW = "</w>"  # end-of-word marker, standard BPE
BPE_TOP_WORDS = 2000
BPE_NUM_MERGES = 50


def _apply_merge(syms: list[str], left: str, right: str, token: str) -> list[str]:
    j = 0
    out: list[str] = []
    while j < len(syms):
        if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
            out.append(token)
            j += 2
        else:
            out.append(syms[j])
            j += 1
    return out


def merge_loop(word_counts: pd.DataFrame, num_merges: int = BPE_NUM_MERGES) -> pd.DataFrame:
    """Classic BPE merge loop over a ``(word, cnt)`` table → one row
    per learned merge: (rank, left, right, token). Pure function of
    its input (no RNG, no corpus access) so the distributed and
    sequential-oracle paths share it verbatim.

    Incremental pair-count maintenance (the subword-nmt trick): the
    full pair count is built ONCE; each merge re-scans only the words
    that contain the merged pair, so training cost is O(total symbols
    + merges × affected words), not O(merges × vocab). Bit-identical
    to the naive full-rescan loop (``_merge_loop_naive``, kept as the
    differential-test mirror)."""
    symbolized: list[list[str]] = [
        list(w) + [EOW] for w in word_counts["word"].tolist()
    ]
    counts = [int(c) for c in word_counts["cnt"].tolist()]

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, (syms, cnt) in enumerate(zip(symbolized, counts)):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            where.setdefault(p, set()).add(i)

    merges: list[tuple[int, str, str, str]] = []
    for rank in range(num_merges):
        live = [(p, c) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        best = min(live, key=lambda kv: (-kv[1], kv[0]))[0]
        left, right = best
        token = left + right
        merges.append((rank, left, right, token))
        # only words indexed under `best` can change (the index may
        # hold stale ids — their subtract/re-add nets to zero)
        for i in where.pop(best, ()):
            syms = symbolized[i]
            cnt = counts[i]
            for p in zip(syms, syms[1:]):
                # .get: a previously-popped pair can reappear when a
                # later merge re-creates its token string elsewhere
                pair_counts[p] = pair_counts.get(p, 0) - cnt
            syms = _apply_merge(syms, left, right, token)
            symbolized[i] = syms
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + cnt
                where.setdefault(p, set()).add(i)
        pair_counts.pop(best, None)
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "token"]
    ).astype({"rank": "int64"})


def _merge_loop_naive(
    word_counts: pd.DataFrame, num_merges: int = BPE_NUM_MERGES
) -> pd.DataFrame:
    """Full-rescan reference implementation (differential-test mirror
    of ``merge_loop`` — same selection rule, recomputes every pair
    count from scratch each rank)."""
    symbolized: list[list[str]] = [
        list(w) + [EOW] for w in word_counts["word"].tolist()
    ]
    counts = [int(c) for c in word_counts["cnt"].tolist()]
    merges: list[tuple[int, str, str, str]] = []
    for rank in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, cnt in zip(symbolized, counts):
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        left, right = best
        token = left + right
        merges.append((rank, left, right, token))
        symbolized = [_apply_merge(s, left, right, token) for s in symbolized]
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "token"]
    ).astype({"rank": "int64"})


def bpe_train(
    sf_dir: str,
    top_words: int = BPE_TOP_WORDS,
    num_merges: int = BPE_NUM_MERGES,
) -> pd.DataFrame:
    """Train BPE merges over the documents corpus: ONE distributed
    word-count pass (``vocab_topk`` — combiner partials, bucketed
    hash-aggregate, driver sees buckets × k short rows), then the
    driver merge loop over that vocab-scale table."""
    from .traindata import vocab_topk

    return merge_loop(vocab_topk(sf_dir, k=top_words), num_merges)


def encode_word(word: str, ranks: dict[str, int]) -> list[str]:
    """Apply trained merges to one word (greedy lowest-rank-first —
    the standard BPE apply order). ``ranks`` maps merged token →
    rank, from ``bpe_train`` output."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = ranks.get(a + b)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms
