"""Benchmark harness (driver contract).

Plain run: executes the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) under
``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "triples_per_sec": ...}

``--scaling``: runs the headline KG pipeline twice in FRESH processes
at num_cpus=8 and num_cpus=32 on the same input (the sandbox proxy for
the N-vs-4N cluster-size criterion) and prints throughputs + scaling
efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
KG_SCRATCH = "/tmp/transner_ray_bench"


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _kg_paths():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    override = os.environ.get("GRAFT_KG_DOCS")
    if override:
        from transner_ray import synth

        n = int(override)
        return synth.write_pages(
            f"/tmp/transner_ray_pages/scaling_seed42_{n}", seed=42, n_docs=n, num_shards=64
        )
    import __ray_entry__ as entrymod

    return entrymod._kg_pages_paths(SF_DIR)


def bench_kg() -> dict:
    """Headline: full KG pipeline (pages → mentions → triples →
    entities + edges written to parquet), timed in two phases."""
    import ray.data as rd

    from transner_ray.pipelines import kg

    paths = _kg_paths()
    # warm the page cache (untimed read)
    for p in paths:
        with open(p, "rb") as f:
            f.read()
    n_docs = rd.read_parquet(paths).count()

    shutil.rmtree(KG_SCRATCH, ignore_errors=True)
    t0 = time.perf_counter()
    spine = kg.sentences_dataset(kg.read_pages(paths), detect_batch_size=256)
    linked = kg.linked_triples_dataset(spine)
    # Write the fused chain's natural block count DIRECTLY. Both
    # coalescing alternatives measured worse here:
    # - write_parquet(min_rows_per_file=...) fuses the constraint
    #   upstream and collapses the narrow phase into a handful of
    #   giant tasks (observed: ONE task for the full corpus);
    # - .repartition(16) re-executes the whole fused map chain
    #   (round-5 ds.stats(): the map operator AND RepartitionSplit
    #   each report the full ~320 s of UDF time; dropping it cut the
    #   8-cpu 320k-doc narrow phase 110.6 s -> 43.8 s and the 2-cpu
    #   leg 338 s -> 183 s).
    # One ~1.75 MB file per detect task is fine for the wide re-read
    # (measured: wide over 256 files 11.7 s vs 12.7 s over 16), and
    # matches run_partitioned's production layout (no repartition).
    linked.write_parquet(f"{KG_SCRATCH}/triples")
    t_narrow = time.perf_counter() - t0

    t1 = time.perf_counter()
    # row count from parquet footers (no execution); read triples ONCE
    # and pin them (small: combiner output scale) for both consumers
    import glob

    import pyarrow.parquet as pq

    n_triples = sum(
        pq.read_metadata(f).num_rows for f in glob.glob(f"{KG_SCRATCH}/triples/*.parquet")
    )
    triples = rd.read_parquet(f"{KG_SCRATCH}/triples").materialize()
    kg.entities_dataset(triples, settle=True).write_parquet(f"{KG_SCRATCH}/entities")
    kg.edges_dataset(triples, settle=True).write_parquet(f"{KG_SCRATCH}/edges")
    t_wide = time.perf_counter() - t1

    total = t_narrow + t_wide
    return {
        "sec": total,
        "narrow_sec": t_narrow,
        "wide_sec": t_wide,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "docs_per_sec": n_docs / total,
        "triples_per_sec": n_triples / total,
    }


QUERY_REPS = int(os.environ.get("GRAFT_QUERY_REPS", "2"))
CC_REPLICAS = int(os.environ.get("GRAFT_CC_REPLICAS", "256"))


def _timed_once(fn, *args) -> float:
    t0 = time.perf_counter()
    res = fn(*args)
    # consume lazily-built datasets
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        for _ in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            pass
    return time.perf_counter() - t0


REP_CUTOFF_SEC = 10.0  # don't re-run queries this slow — bounds bench wall time


def _timed(fn, *args) -> float:
    """Best of QUERY_REPS runs: the host carries co-tenant load that
    only ever SLOWS a run (BASELINE.md noise protocol), and the first
    rep doubles as the warm-up for task/actor dispatch — so the min is
    the honest estimate of the uncontaminated machine. The second rep
    ALWAYS runs: a single cold rep over REP_CUTOFF_SEC would otherwise
    be recorded as-is, turning one co-tenant burst into a phantom
    regression (observed round 5: minhash_dedup cold 11.9 s vs warm
    2.7 s). The cutoff only suppresses reps BEYOND the second, where
    it bounds wall time for genuinely-slow queries."""
    best = _timed_once(fn, *args)
    for i in range(max(1, QUERY_REPS) - 1):
        if i > 0 and best > REP_CUTOFF_SEC:
            break
        best = min(best, _timed_once(fn, *args))
    return best


def bench_queries() -> dict:
    from transner_ray.ops import (
        cc,
        dedup,
        indexing,
        joins,
        multimodal,
        pack,
        quantiles,
        relational,
        similarity,
        sketches,
        textstats,
        traindata,
    )
    from transner_ray.ops import pagerank as pagerank_mod
    from transner_ray.ops import validate

    out = {}
    # flat mentions table over the synthetic-pages spine — times the
    # detect stage + the (now Arrow-vectorized) mention explode
    def _kg_mentions(_sf):
        from transner_ray.pipelines import kg

        return kg.mentions_dataset(
            kg.sentences_dataset(kg.read_pages(_kg_paths()), detect_batch_size=256)
        )

    out["kg_mentions"] = _timed(_kg_mentions, SF_DIR)
    out["lineitem_pricing"] = _timed(relational.lineitem_pricing, SF_DIR)
    out["segment_revenue"] = _timed(relational.segment_revenue, SF_DIR)
    out["events_hourly"] = _timed(relational.events_hourly, SF_DIR)
    out["user_sessions"] = _timed(relational.user_sessions, SF_DIR)
    out["token_counts"] = _timed(textstats.token_counts, SF_DIR)
    out["token_counts_bpe"] = _timed(textstats.token_counts_bpe, SF_DIR)
    out["curate_corpus"] = _timed(textstats.curate_corpus, SF_DIR)
    out["exact_dedup"] = _timed(dedup.exact_dedup, SF_DIR)
    # CC gate with the path graph tiled CC_REPLICAS× (same star-round
    # count, R× rows per round): per-round compute dominates the fixed
    # per-round dispatch, so this row measures the engine (VERDICT r3
    # #7; BASELINE.md "CC bench amortization"). Row renamed so it is
    # not compared 1:1 against the unreplicated r1-r3 rows.
    out["doc_chain_components_x%d" % CC_REPLICAS] = _timed(
        lambda sf: cc.doc_chain_components(sf, replicas=CC_REPLICAS), SF_DIR
    )
    out["minhash_dedup"] = _timed(dedup.minhash_dedup, SF_DIR)
    out["simhash_dedup"] = _timed(dedup.simhash_dedup, SF_DIR)
    out["ngram_jaccard_dedup"] = _timed(dedup.ngram_jaccard_dedup, SF_DIR)
    out["events_sliding"] = _timed(relational.events_sliding, SF_DIR)
    out["ann_brute_force"] = _timed(similarity.brute_force_topk, SF_DIR)
    out["ann_ivf_index"] = _timed(similarity.ann_ivf_index, SF_DIR)
    out["kmeans_embeddings"] = _timed(similarity.kmeans_embeddings, SF_DIR)
    out["entity_pagerank"] = _timed(pagerank_mod.entity_pagerank, SF_DIR)
    out["pack_chunks"] = _timed(pack.pack_chunks, SF_DIR)
    out["decontaminate"] = _timed(traindata.decontaminate, SF_DIR)
    out["vocab_topk"] = _timed(traindata.vocab_topk, SF_DIR)
    out["stratified_sample"] = _timed(traindata.stratified_sample, SF_DIR)
    out["prepare_training_data"] = _timed(traindata.prepare_training_data, SF_DIR)
    out["epoch_shuffle"] = _timed(traindata.epoch_shuffle, SF_DIR)
    out["approx_distinct_tokens"] = _timed(sketches.approx_distinct_tokens, SF_DIR)
    out["asof_last_order"] = _timed(joins.last_order_before_event, SF_DIR)
    out["range_join_windows"] = _timed(joins.range_join_windows, SF_DIR)
    out["inverted_index"] = _timed(indexing.inverted_index, SF_DIR)
    out["tfidf_top_terms"] = _timed(indexing.tfidf_top_terms, SF_DIR)
    out["bm25_topk"] = _timed(indexing.bm25_topk, SF_DIR)
    out["heavy_hitter_terms"] = _timed(sketches.heavy_hitter_terms, SF_DIR)
    out["bigram_topk"] = _timed(indexing.bigram_topk, SF_DIR)
    out["event_deltas"] = _timed(relational.event_deltas, SF_DIR)
    out["running_totals"] = _timed(relational.running_totals, SF_DIR)
    out["cap_per_group"] = _timed(traindata.cap_per_group, SF_DIR)
    out["token_count_quantiles"] = _timed(quantiles.token_count_quantiles, SF_DIR)
    out["event_value_quantiles"] = _timed(quantiles.event_value_quantiles, SF_DIR)
    out["events_pivot"] = _timed(relational.events_pivot, SF_DIR)
    out["quality_checks"] = _timed(validate.quality_checks, SF_DIR)
    out["minhash_neardup_pairs"] = _timed(dedup.minhash_neardup_pairs, SF_DIR)
    out["embedding_neardup_pairs"] = _timed(dedup.embedding_neardup_pairs, SF_DIR)
    out["media_features"] = _timed(multimodal.media_features, SF_DIR)
    out["frame_sample"] = _timed(multimodal.frame_sample, SF_DIR)
    out["sample_exact_k"] = _timed(traindata.sample_exact_k, SF_DIR)
    # first call builds the persisted index under /tmp (cold); the
    # best-of-reps then measures the warm anti-join, the steady-state
    # shape of the incremental-dedup loop
    out["dedup_incremental"] = _timed(dedup.dedup_incremental, SF_DIR)
    from transner_ray.ops import bpe as bpe_mod

    out["bpe_merges"] = _timed(bpe_mod.bpe_train, SF_DIR)
    return out


PLAIN_KG_REPS = int(os.environ.get("GRAFT_PLAIN_KG_REPS", "2"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _warmup_kg():
    """Untimed session warm-up: run the narrow phase over ONE page
    shard so the Ray worker pool is spawned and the engine modules are
    imported in the workers BEFORE the first timed rep. Without this,
    rep 1 measures session cold start (observed: 13.1 s cold vs 4.2 s
    warm for an identical pipeline), which contaminates the reported
    median. Disclosed via "warmup_kg": true in the output."""
    from transner_ray.pipelines import kg

    paths = _kg_paths()
    spine = kg.sentences_dataset(kg.read_pages(paths[:1]), detect_batch_size=256)
    kg.linked_triples_dataset(spine).count()


def run_plain() -> dict:
    _init_ray()
    # best-of-N headline: the host carries co-tenant load that only
    # ever SLOWS a run (the pipeline is fixed-overhead-dominated at
    # this sf). The MEDIAN is reported alongside so regression
    # tracking does not depend on the most favorable order statistic,
    # and every rep value is disclosed.
    _warmup_kg()
    runs = [bench_kg() for _ in range(PLAIN_KG_REPS)]
    kg_stats = min(runs, key=lambda r: r["sec"])
    queries = bench_queries()
    queries["kg_pipeline"] = kg_stats["sec"]
    result = {
        "metric": "kg_pipeline_e2e_sec",
        "value": round(kg_stats["sec"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": kg_stats["n_docs"],
        "n_triples": kg_stats["n_triples"],
        "docs_per_sec": round(kg_stats["docs_per_sec"], 2),
        "triples_per_sec": round(kg_stats["triples_per_sec"], 2),
        "narrow_sec": round(kg_stats["narrow_sec"], 3),
        "wide_sec": round(kg_stats["wide_sec"], 3),
        "kg_all_runs_sec": [round(r["sec"], 3) for r in runs],
        "kg_median_sec": round(_median([r["sec"] for r in runs]), 3),
        "warmup_kg": True,
    }
    import ray

    ray.shutdown()
    return result


# 320k docs ≈ 8-10 min total for both legs, but puts the job firmly in
# compute-dominated territory (fixed per-execution Ray overheads are
# 10-20 s per leg in this sandbox and would otherwise cap the ratio)
SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "320000"))
SCALING_N = int(os.environ.get("GRAFT_SCALING_N", "2"))  # measures N vs 4N


SCALING_REPS = int(os.environ.get("GRAFT_SCALING_REPS", "3"))


def run_scaling() -> dict:
    """Cluster-size proxy (BASELINE.md): the SAME job on the SAME input
    in fresh processes at num_cpus=N and num_cpus=4N.

    Default N=2 (so both levels sit under this sandbox's ~16 PHYSICAL
    cores — `nproc` advertises more vCPUs than the host can run, and a
    pure-CPU multiprocessing probe plateaus at ~16 burns/s, which would
    cap any 8→32 comparison at ~0.5 efficiency regardless of the
    engine). The corpus is larger than the plain bench's (SCALING_DOCS)
    so compute dominates fixed per-execution overheads, as it would on
    a real cluster.

    Noise protocol: this host carries co-tenant load and back-to-back
    Ray sessions contaminate each other, both of which only ever SLOW
    a leg (an A/B against the round-1 commit reproduced its leg-8 rate
    exactly on a fresh host, then both code versions degraded
    identically in sequence). Each leg therefore runs SCALING_REPS
    times, alternating 4N/N with a settle sleep, and the per-leg BEST
    rate estimates the uncontaminated machine; all reps are reported."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_KG_DOCS=str(SCALING_DOCS),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--kg-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        time.sleep(30)  # let the previous Ray session's teardown settle
        return json.loads(out.strip().splitlines()[-1])

    los, his = [], []
    for _ in range(SCALING_REPS):
        his.append(run(4 * SCALING_N))  # hi first: it needs the fresh host most
        los.append(run(SCALING_N))
    lo = max(los, key=lambda r: r["docs_per_sec"])
    hi = max(his, key=lambda r: r["docs_per_sec"])
    rate_lo = lo["docs_per_sec"]
    rate_hi = hi["docs_per_sec"]
    eff = (rate_hi / rate_lo) / 4
    return {
        "metric": f"scaling_efficiency_{SCALING_N}_to_{4 * SCALING_N}",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_docs": SCALING_DOCS,
        f"sec_{SCALING_N}": lo["value"],
        f"sec_{4 * SCALING_N}": hi["value"],
        f"docs_per_sec_{SCALING_N}": round(rate_lo, 2),
        f"docs_per_sec_{4 * SCALING_N}": round(rate_hi, 2),
        f"triples_per_sec_{SCALING_N}": round(lo["triples_per_sec"], 2),
        f"triples_per_sec_{4 * SCALING_N}": round(hi["triples_per_sec"], 2),
        f"all_docs_per_sec_{SCALING_N}": [round(r["docs_per_sec"], 2) for r in los],
        f"all_docs_per_sec_{4 * SCALING_N}": [round(r["docs_per_sec"], 2) for r in his],
        f"median_docs_per_sec_{SCALING_N}": round(_median([r["docs_per_sec"] for r in los]), 2),
        f"median_docs_per_sec_{4 * SCALING_N}": round(
            _median([r["docs_per_sec"] for r in his]), 2
        ),
        "median_efficiency": round(
            (_median([r["docs_per_sec"] for r in his])
             / _median([r["docs_per_sec"] for r in los])) / 4,
            3,
        ),
        "reps": SCALING_REPS,
        # adjacent (4N, N) legs share a noise regime; their per-pair
        # ratios show the spread the best-of-level headline sits in
        "pair_efficiencies": [
            round((h["docs_per_sec"] / l["docs_per_sec"]) / 4, 3)
            for h, l in zip(his, los)
        ],
        f"narrow_sec_{SCALING_N}": lo.get("narrow_sec"),
        f"narrow_sec_{4 * SCALING_N}": hi.get("narrow_sec"),
        f"wide_sec_{SCALING_N}": lo.get("wide_sec"),
        f"wide_sec_{4 * SCALING_N}": hi.get("wide_sec"),
        "sf": SF_DIR,
    }


def run_kg_only() -> dict:
    _init_ray()
    kg_stats = bench_kg()
    result = {
        "metric": "kg_pipeline_e2e_sec",
        "value": round(kg_stats["sec"], 3),
        "unit": "sec",
        "queries": {"kg_pipeline": round(kg_stats["sec"], 3)},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs_per_sec": round(kg_stats["docs_per_sec"], 2),
        "triples_per_sec": round(kg_stats["triples_per_sec"], 2),
        "narrow_sec": round(kg_stats["narrow_sec"], 3),
        "wide_sec": round(kg_stats["wide_sec"], 3),
    }
    import ray

    ray.shutdown()
    return result


def run_probe() -> dict:
    """Reference measurement-protocol parity (benchmarks.py:29-81):
    one fixed batch = 8 copies of the probe sentence, run 10 times
    through the full mention-detection path; report avg wall time and
    max/min/avg resident memory. No Ray session needed — this measures
    the per-worker detection kernel, like the reference measures its
    single process."""
    import resource

    from transner_ray.gazetteers import default_gazetteers
    from transner_ray.kg import detect_mentions
    from transner_ray.tagger import RuleTagger

    probe = (
        "Il sig. Francesco Antonio Di Marco è nato a Milano, codice fiscale "
        "DMRFNC80E01F205B, numero di telefono +39 0865989886, email di lavoro "
        "francesco.dimarco@hotmail.com."
    )
    batch = [probe] * 8  # _BATCH_SIZE=8 (benchmarks.py:29)
    gz = default_gazetteers()
    tagger = RuleTagger(gz)
    times, mems = [], []
    for _ in range(10):  # 10 repeats (benchmarks.py:56)
        t0 = time.perf_counter()
        for s in batch:
            detect_mentions(s, tagger, gz)
        times.append(time.perf_counter() - t0)
        mems.append(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0)
    return {
        "metric": "probe_batch8_avg_sec",
        "value": round(sum(times) / len(times), 6),
        "unit": "sec",
        "max_mem_mib": round(max(mems), 1),
        "min_mem_mib": round(min(mems), 1),
        "avg_mem_mib": round(sum(mems) / len(mems), 1),
        "runs": 10,
        "batch_size": 8,
    }


def run_stats() -> dict:
    """Per-stage `ds.stats()` for the headline pipeline — the evidence
    that wall time is dominated by useful compute (detection kernel)
    rather than scheduling or shuffle overhead. Prints the narrow-spine
    and wide-phase operator stats to stderr, one summary JSON line to
    stdout."""
    _init_ray()
    import re

    import ray
    import ray.data as rd

    from transner_ray.pipelines import kg

    paths = _kg_paths()
    shutil.rmtree(KG_SCRATCH, ignore_errors=True)
    # stats() belongs to the EXECUTED dataset object — keep the handle
    # that write_parquet drives
    narrow_out = kg.linked_triples_dataset(
        kg.sentences_dataset(kg.read_pages(paths))
    )
    narrow_out.write_parquet(f"{KG_SCRATCH}/triples")
    narrow_stats = narrow_out.stats()
    triples = rd.read_parquet(f"{KG_SCRATCH}/triples").materialize()
    edges = kg.edges_dataset(triples, settle=True)
    edges.write_parquet(f"{KG_SCRATCH}/edges")
    wide_stats = edges.stats()
    print("==== narrow spine ====", file=sys.stderr)
    print(narrow_stats, file=sys.stderr)
    print("==== wide phase (edges) ====", file=sys.stderr)
    print(wide_stats, file=sys.stderr)

    _UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0}

    def udf_seconds(stats: str) -> float:
        # sum the per-operator "UDF time" totals Ray prints (us/ms/s)
        total = 0.0
        for m in re.finditer(r"UDF time:.*?([0-9.]+)(us|ms|s) total", stats):
            total += float(m.group(1)) * _UNIT[m.group(2)]
        return round(total, 2)

    result = {
        "metric": "kg_pipeline_udf_time_sec",
        "value": udf_seconds(narrow_stats) + udf_seconds(wide_stats),
        "unit": "sec",
        "narrow_udf_sec": udf_seconds(narrow_stats),
        "wide_udf_sec": udf_seconds(wide_stats),
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--kg-only" in sys.argv:
        print(json.dumps(run_kg_only()))
    elif "--probe" in sys.argv:
        print(json.dumps(run_probe()))
    elif "--stats" in sys.argv:
        print(json.dumps(run_stats()))
    else:
        print(json.dumps(run_plain()))
