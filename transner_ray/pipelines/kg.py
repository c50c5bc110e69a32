"""The flagship KG-construction pipeline (SURVEY.md §3.4).

    read_parquet(pages) → extract (E) → split (S) → detect (N, actor
    pool) → [explode → mentions] / [triples (T) → link (L)] →
    canonicalize (C, combiner + groupby) → edges (G, combiner +
    groupby + sort('subj_id')) → write_parquet

Narrow stages are all ``map_batches`` over Arrow batches; the only
shuffles are the two final groupbys over combiner-reduced partials and
the one global sort of the edge table (SURVEY.md §4.2 skew notes on
why combiners defuse the Zipf head).

Two run modes:

* ``kg_datasets(pages_ds)``: pure streaming lazy composition — used by
  queries, tests and single-pass benches.
* ``run_partitioned(...)``: the resumable job — input files grouped
  into partitions, each processed to per-partition triples/mentions
  parquet with a lineage manifest (state/checkpoint.py); the wide
  phase (entities/edges) then runs over all partition outputs. A
  killed run re-runs only partitions without manifests.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray
import ray.data as rd

from ..gazetteers import default_gazetteers
from ..stages.detect import MentionDetector, explode_mentions_batch
from ..stages.extract import extract_text_batch
from ..stages.graph import (
    link_triples_batch,
    make_edge_partials,
    make_entity_partials,
    reduce_edge_bucket,
    reduce_entity_bucket,
)
from ..stages.split import split_sentences_batch
from ..stages.triples import triples_batch
from ..state.checkpoint import (
    CheckpointStore,
    PartitionManifest,
    fingerprint_files,
    plan_partitions,
    timed,
)

PAGES_COLUMNS = ["url", "html", "lang"]  # prune at the read: no warc_ts/text


def read_pages(paths: str | list[str]) -> rd.Dataset:
    return rd.read_parquet(paths, columns=PAGES_COLUMNS)


def sentences_dataset(
    pages: rd.Dataset,
    detect_concurrency: int | tuple[int, int] | None = None,
    detect_batch_size: int = 256,
    use_actor_pool: bool = False,
    gazetteers=None,
    tagger: str = "rule",
    model_path: str | None = None,
    detect_num_gpus: float = 0,
    repartition_before_detect: int | None = None,
) -> rd.Dataset:
    """pages → nested sentence-mention rows (the narrow spine).

    Default is the TASK-based detect stage (worker-process-cached
    state): Ray fuses read→extract→split→detect into one pipelined
    operator, so ``detect_batch_size`` effectively counts PAGES per
    fused task — sized so a task is ~0.5-1s of work and the task count
    far exceeds the CPU count. ``use_actor_pool=True`` switches to the
    ``MentionDetector`` actor pool (the shape the BertTagger GPU stage
    uses: model load amortized across batches, ``concurrency`` ×
    ``num_gpus`` sized to the cluster). On a GPU cluster pass
    ``tagger='bert', model_path=..., detect_num_gpus=1`` — the actor
    pool is forced on and each actor loads the model once (docs/
    SCALE.md "GPU on-ramp"). ``gazetteers`` overrides the
    default lookup state (custom religion/city sets — also how the
    SQL-checked gazetteer-mention gate injects a corpus-vocabulary
    set).

    ``repartition_before_detect`` inserts an EXPLICIT exchange between
    the CPU parse stages and the (GPU) detect stage. Ray Data's
    streaming executor normally makes this unnecessary — blocks hand
    off dynamically and backpressure matches the parse rate to the
    detect rate — so the default is None; set it when the parse output
    is pathologically skewed (a few huge pages → a few huge blocks
    starving most detector actors) or when detect actors are pinned to
    a small GPU node group and need more, smaller blocks to stay
    saturated.
    """
    extracted = pages.map_batches(
        extract_text_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return sentences_from_extracted(
        extracted,
        detect_concurrency=detect_concurrency,
        detect_batch_size=detect_batch_size,
        use_actor_pool=use_actor_pool,
        gazetteers=gazetteers,
        tagger=tagger,
        model_path=model_path,
        detect_num_gpus=detect_num_gpus,
        repartition_before_detect=repartition_before_detect,
    )


def sentences_from_extracted(
    extracted: rd.Dataset,
    detect_concurrency: int | tuple[int, int] | None = None,
    detect_batch_size: int = 256,
    use_actor_pool: bool = False,
    gazetteers=None,
    tagger: str = "rule",
    model_path: str | None = None,
    detect_num_gpus: float = 0,
    repartition_before_detect: int | None = None,
) -> rd.Dataset:
    """The split → detect tail of :func:`sentences_dataset`, entered at
    the post-stage-E boundary (``EXTRACTED`` rows: url/text/lang).
    This is where text-native sources plug in — JSONL/WET webtext dumps
    (``sources.jsonl.read_extracted_jsonl``) carry pre-extracted text
    and never had an ``html`` column to drop."""
    gz_ref = ray.put(gazetteers if gazetteers is not None else default_gazetteers())
    base = extracted.map_batches(split_sentences_batch, batch_format="pyarrow")
    if repartition_before_detect:
        base = base.repartition(repartition_before_detect)
    if tagger != "rule":
        # a model tagger in the task path would reload weights on every
        # worker-cache miss; force the amortizing shape
        use_actor_pool = True
    if use_actor_pool:
        kwargs: dict = {"gazetteers_ref": gz_ref}
        if tagger != "rule":
            kwargs.update(tagger=tagger, model_path=model_path)
        return base.map_batches(
            MentionDetector,
            batch_format="pyarrow",
            batch_size=detect_batch_size,
            concurrency=detect_concurrency or (1, 8),
            fn_constructor_kwargs=kwargs,
            **({"num_gpus": detect_num_gpus} if detect_num_gpus else {}),
        )
    from ..stages.detect import make_detect_fn

    return base.map_batches(
        make_detect_fn(gazetteers_ref=gz_ref),
        batch_format="pyarrow",
        batch_size=detect_batch_size,
    )


def mentions_dataset(sent_mentions: rd.Dataset) -> rd.Dataset:
    return sent_mentions.map_batches(explode_mentions_batch, batch_format="pyarrow")


def linked_triples_dataset(
    sent_mentions: rd.Dataset, link_mode: str = "alias"
) -> rd.Dataset:
    """Triples + entity linking. ``link_mode='alias'`` is the exact
    broadcast alias-table path; ``'embedding'`` adds the char-ngram
    embedding fallback for unknown surfaces (transner_ray.linking)."""
    triples = sent_mentions.map_batches(triples_batch, batch_format="pyarrow")
    if link_mode == "embedding":
        from ..linking import EmbeddingLinker, make_embedding_link_batch

        linker_ref = ray.put(EmbeddingLinker())
        return triples.map_batches(
            make_embedding_link_batch(linker_ref), batch_format="pyarrow"
        )
    return triples.map_batches(link_triples_batch, batch_format="pyarrow")


def entities_dataset(
    linked: rd.Dataset,
    settle: bool = False,
    wide_num_blocks: int = 8,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Canonicalization: per-block partial counts (the combiner that
    defuses Zipf-head skew) → partitioned hash-aggregate: groupby on
    the crc32 bucket column, ONE vectorized pandas reduce per bucket
    (stages/graph.py) — never one Python call per entity.

    ``wide_num_blocks`` coalesces the partials before the all-to-all:
    the sort-based shuffle creates blocks × partitions intermediate
    objects, so 100+ small partial blocks → a task storm (measured
    6x slower). ``num_buckets`` is the reduce fan-out (None → the
    64-bucket floor). Both knobs are SCALED WITH THE TRIPLE COUNT by
    ``run_partitioned`` (which knows the input size from the
    checkpoint parquet footers); callers composing lazily over inputs
    of unknown size keep the floors. ``settle=True`` materializes the
    partials (BEFORE the coalesce — see the ordering note below) —
    right when the upstream is parquet-backed; it EXECUTES the
    upstream at call time, so keep it False in lazy multi-output
    compositions."""
    # settle BEFORE the coalesce: non-shuffle repartition re-executes
    # a lazy upstream chain (round-5 finding — see bench.py narrow
    # phase), but over materialized blocks it is a cheap re-split of
    # pinned objects. Order matters: materialize-then-repartition runs
    # the read+partials map ONCE; the old repartition-then-materialize
    # ran it twice (a 2x input read at 10^9 triples).
    partials = linked.map_batches(
        make_entity_partials(num_buckets or 64), batch_format="pyarrow"
    )
    if settle:
        partials = partials.materialize()
    partials = partials.repartition(wide_num_blocks)
    return partials.groupby("bucket").map_groups(
        reduce_entity_bucket, batch_format="pandas"
    )


def edges_dataset(
    linked: rd.Dataset,
    settle: bool = False,
    wide_num_blocks: int = 8,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Edge weights + capped provenance (partitioned hash-aggregate),
    then the one global sort. Parameters as in entities_dataset."""
    # settle-then-coalesce ordering: see entities_dataset
    partials = linked.map_batches(
        make_edge_partials(num_buckets or 64), batch_format="pyarrow"
    )
    if settle:
        partials = partials.materialize()
    partials = partials.repartition(wide_num_blocks)
    return (
        partials.groupby("bucket")
        .map_groups(reduce_edge_bucket, batch_format="pandas")
        .sort("subj_id")
    )


def kg_datasets(
    pages: rd.Dataset,
    detect_concurrency: int | tuple[int, int] | None = None,
    detect_batch_size: int = 256,
) -> dict[str, rd.Dataset]:
    """Lazy composition of every stage output. NOTE: consuming more
    than one of these executes the shared narrow spine once per
    consumer — for multi-output runs use ``run_partitioned`` (which
    checkpoints the spine) or consume just one."""
    sm = sentences_dataset(pages, detect_concurrency, detect_batch_size)
    linked = linked_triples_dataset(sm)
    return {
        "sentence_mentions": sm,
        "mentions": mentions_dataset(sm),
        "triples": linked,
        "entities": entities_dataset(linked),
        "edges": edges_dataset(linked),
    }


# --------------------------------------------------------------------------
# resumable partitioned run
# --------------------------------------------------------------------------


def run_partitioned(
    input_files: list[str],
    ckpt_dir: str,
    out_dir: str | None = None,
    num_partitions: int = 4,
    detect_concurrency: int | tuple[int, int] | None = None,
    detect_batch_size: int = 256,
    write_mentions: bool = True,
    wide_num_blocks: int = 8,
    gazetteers=None,
    input_format: str = "parquet",
) -> dict:
    """Resumable KG job. Phase 1 (narrow, per partition): pages files →
    linked triples (+ flat mentions) parquet under ``ckpt_dir`` with a
    lineage manifest per partition; already-complete partitions are
    SKIPPED — but only when the manifest's recorded ``input_files``
    equals the current plan for that partition; a changed file listing
    or ``num_partitions`` invalidates the partition and it re-runs.
    Phase 2 (wide, over all partition outputs): entities + edges, edges
    globally sorted by subj_id, written under ``out_dir`` (defaults to
    ``ckpt_dir/out``). ``wide_num_blocks`` is threaded to the phase-2
    partial coalesce (see entities_dataset).

    Returns {'skipped': [...], 'ran': [...], 'entities': n, 'edges': n,
    'out_dir': ...}.

    Append-only ingest: with one partition per file
    (``num_partitions=len(input_files)``) and shard names that sort
    after the existing ones (date/sequence-numbered crawl shards do),
    appending files leaves completed partition identities untouched —
    a rerun processes ONLY the new files and re-reduces phase 2
    (pinned by ``test_append_only_ingest_runs_only_new_partitions``).

    ``input_format='jsonl'`` ingests WET-shaped line-delimited JSON
    shards (``sources.jsonl.read_extracted_jsonl`` field defaults)
    through the same partition plan, manifests, fingerprints and wide
    phase — a resumable job over a raw crawl dump needs no parquet
    conversion pass first.
    """
    store = CheckpointStore(ckpt_dir)
    parts = plan_partitions(input_files, num_partitions)
    # Manifests for partition ids beyond the current plan (a previous
    # run with MORE partitions) would feed phase 2 rows whose input
    # files are also covered by the current partitions — duplicates.
    # Invalidate them up front.
    for pid in store.completed_partitions():
        if pid >= len(parts):
            os.remove(store.manifest_path(pid))
            for stage in ("triples", "mentions", "sm"):
                store.clean_incomplete(stage, pid)
    ran, skipped = [], []
    for pid, files in enumerate(parts):
        if store.is_complete(pid):
            # manifest presence alone is not enough: re-running with a
            # different num_partitions or a changed input listing would
            # silently skip a partition whose file membership differs —
            # and a REGENERATED file at the same path (size/mtime
            # fingerprint mismatch) must invalidate too
            m = store.load_manifest(pid)
            # legacy-accept: manifests written before the fingerprint
            # field existed carry none — trust the file listing alone
            # rather than silently recomputing every pre-upgrade
            # partition on the first rerun after the format change.
            # The accept is one-shot: the manifest is rewritten with
            # the CURRENT fingerprint immediately, so a file
            # regenerated in place after this rerun invalidates the
            # partition like any other — exposure is bounded to the
            # first post-upgrade rerun, never indefinite.
            fp = m.get("input_fingerprint")
            if m.get("input_files") == files and (
                not fp or fp == fingerprint_files(files)
            ):
                if not fp:
                    store.write_manifest(
                        PartitionManifest(
                            partition=pid,
                            input_files=files,
                            rows=m.get("rows", {}),
                            wall_sec=m.get("wall_sec", 0.0),
                            status=m.get("status", "complete"),
                            input_fingerprint=fingerprint_files(files),
                        )
                    )
                skipped.append(pid)
                continue
            os.remove(store.manifest_path(pid))  # stale → re-run below
        t0 = timed()
        # 'sm' included: a stale sm tmp dir from a killed run would be
        # MERGED with the re-run's write (write_parquet filenames embed
        # per-write UUIDs) and silently duplicate every sentence
        for stage in ("triples", "mentions", "sm"):
            store.clean_incomplete(stage, pid)
        if input_format == "jsonl":
            from ..sources.jsonl import read_extracted_jsonl

            sm = sentences_from_extracted(
                read_extracted_jsonl(files),
                detect_concurrency,
                detect_batch_size,
                gazetteers=gazetteers,
            )
        else:
            sm = sentences_dataset(
                read_pages(files), detect_concurrency, detect_batch_size, gazetteers=gazetteers
            )
        rows: dict[str, int] = {}

        def _rows_written(stage: str) -> int:
            import glob as _glob

            import pyarrow.parquet as _pq

            return sum(
                _pq.read_metadata(f).num_rows
                for f in _glob.glob(os.path.join(store.tmp_stage_dir(stage, pid), "*.parquet"))
            )

        if write_mentions:
            # two consumers of the spine within one partition: checkpoint
            # the nested sentence-mentions once, then derive both outputs
            sm_dir = store.tmp_stage_dir("sm", pid)
            sm.write_parquet(sm_dir)
            sm = rd.read_parquet(sm_dir)
            mentions = mentions_dataset(sm)
            mentions.write_parquet(store.tmp_stage_dir("mentions", pid))
            rows["mentions"] = _rows_written("mentions")
            store.commit_stage_dir("mentions", pid)
        linked = linked_triples_dataset(sm)
        linked.write_parquet(store.tmp_stage_dir("triples", pid))
        rows["triples"] = _rows_written("triples")
        store.commit_stage_dir("triples", pid)
        if write_mentions:
            import shutil

            shutil.rmtree(store.tmp_stage_dir("sm", pid), ignore_errors=True)
        store.write_manifest(
            PartitionManifest(
                partition=pid,
                input_files=files,
                rows=rows,
                wall_sec=timed() - t0,
                input_fingerprint=fingerprint_files(files),
            )
        )
        ran.append(pid)

    # ---- phase 2: wide aggregates over all completed partitions --------
    # Re-run on every invocation (cheap relative to phase 1); written
    # via tmp-dir + atomic rename so a rerun REPLACES rather than
    # accumulates part files.
    import shutil

    out_dir = out_dir or os.path.join(ckpt_dir, "out")
    triple_files = store.completed_stage_files("triples")
    if not triple_files:
        # no completed partitions (empty input plan): a clean no-op
        # beats read_parquet([])'s unhelpful error
        return {
            "skipped": skipped,
            "ran": ran,
            "entities": 0,
            "edges": 0,
            "out_dir": out_dir,
        }
    # Scale the wide phase's fan-out with the actual triple count
    # (parquet footers only — no execution): at 10^9+ triples the
    # reduce is thousands of bounded tasks, not 64 tasks each holding
    # 1/64 of the partials. Explicit wide_num_blocks still wins.
    import pyarrow.parquet as _pq

    from ..ops.agg import scaled_num_buckets

    n_triples = sum(_pq.read_metadata(f).num_rows for f in triple_files)
    num_buckets = scaled_num_buckets(n_triples, floor=64)
    wide_num_blocks = max(wide_num_blocks, num_buckets // 8)
    triples = rd.read_parquet(triple_files)
    entities = entities_dataset(
        triples, settle=True, wide_num_blocks=wide_num_blocks, num_buckets=num_buckets
    )
    edges = edges_dataset(
        triples, settle=True, wide_num_blocks=wide_num_blocks, num_buckets=num_buckets
    )
    for name, ds in (("entities", entities), ("edges", edges)):
        final = os.path.join(out_dir, name)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
    n_entities = rd.read_parquet(os.path.join(out_dir, "entities")).count()
    n_edges = rd.read_parquet(os.path.join(out_dir, "edges")).count()
    return {
        "skipped": skipped,
        "ran": ran,
        "entities": n_entities,
        "edges": n_edges,
        "out_dir": out_dir,
    }
