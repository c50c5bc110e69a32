"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on a deterministic synthetic
pages corpus (BASELINE.json input_hint shape) derived from seed 42;
``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 as a callable over ``sf_dir``; ``oracle_sql()`` gives the
DuckDB-equivalent SQL where the op is SQL-expressible (KG pipeline
stages over synthetic pages and the sketch-based dedup ops are
rows-only by design — their correctness gate is the pytest oracle
suite instead).

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() anywhere in these callables.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

# docs per sf for the synthetic KG corpus (deterministic, cached in /tmp)
_KG_DOCS = {"sf0.001": 150, "sf0.01": 1000, "sf0.1": 8000}
_KG_SEED = 42

# corpus-vocabulary words injected as a custom religions gazetteer for
# the SQL-checked kg_gazetteer_mentions gate
_KG_GAZ_WORDS = ("customer", "spark", "window")


def _kg_pages_paths(sf_dir: str) -> list[str]:
    from transner_ray import synth

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    n_docs = _KG_DOCS.get(tag, 150)
    out = f"/tmp/transner_ray_pages/{tag}_seed{_KG_SEED}_{n_docs}"
    return synth.write_pages(out, seed=_KG_SEED, n_docs=n_docs, num_shards=8)


def _kg_spine(sf_dir: str):
    from transner_ray.pipelines import kg

    return kg.sentences_dataset(
        kg.read_pages(_kg_pages_paths(sf_dir)), detect_concurrency=(1, 4)
    )


def _kg_linked(sf_dir: str):
    from transner_ray.pipelines import kg

    return kg.linked_triples_dataset(_kg_spine(sf_dir))


def _kg_sentences_only(sf_dir: str):
    """Sentence split WITHOUT the detection stage (don't pay the model
    stage to list sentences)."""
    from transner_ray.pipelines import kg
    from transner_ray.stages.extract import extract_text_batch
    from transner_ray.stages.split import split_sentences_batch

    return (
        kg.read_pages(_kg_pages_paths(sf_dir))
        .map_batches(extract_text_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(split_sentences_batch, batch_format="pyarrow")
    )


def entry() -> Any:
    """Flagship: synthetic pages @ sf0.001 scale → KG edges (sorted)."""
    from transner_ray.pipelines import kg

    pages = kg.read_pages(_kg_pages_paths("/root/testdata/sf0.001"))
    return kg.edges_dataset(
        kg.linked_triples_dataset(kg.sentences_dataset(pages, detect_concurrency=(1, 4))),
        settle=True,
    )


def queries() -> dict[str, Callable[[str], Any]]:
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
    from transner_ray.ops import bpe as bpe_mod
    from transner_ray.ops import pagerank as pagerank_mod
    from transner_ray.ops import validate
    from transner_ray.pipelines import kg
    from transner_ray.synth import pages_from_documents

    def kg_extract(sf_dir: str):
        import ray.data as rd

        from transner_ray.stages.extract import extract_text_batch

        pages = rd.from_arrow(pages_from_documents(sf_dir)).drop_columns(["warc_ts", "text"])
        return pages.map_batches(extract_text_batch, batch_format="pyarrow")

    def kg_sentences_docs(sf_dir: str):
        """Sentence rows of the FULL spine (extract → split → detect)
        over documents-derived pages: gates that the detect stage
        passes sentence rows through byte-identically (the split-only
        variant kg_split_docs cannot see a detect-stage regression).
        The documents corpus is punctuation-free, so the sentence set
        is SQL-derivable."""
        import pyarrow as pa

        import ray.data as rd

        from transner_ray.pipelines import kg

        pages = rd.from_arrow(pages_from_documents(sf_dir)).drop_columns(["warc_ts", "text"])
        sm = kg.sentences_dataset(pages)
        return sm.map_batches(
            lambda t: pa.table({"url": t["url"], "sentence": t["sentence"]}),
            batch_format="pyarrow",
        )

    def kg_gazetteer_mentions(sf_dir: str):
        """Mention rows of the real detection stage, made SQL-checkable:
        a custom religions gazetteer of corpus-vocabulary words is
        injected, and over the punctuation-free documents corpus the
        preprocessing (punctuation separation, case restore) is the
        identity — so the reference's gazetteer semantics (one mention
        per whitespace token in the set, offset = FIRST substring
        occurrence, ner.py:243-251 bug kept) reduce to exact SQL:
        strpos(text, w) - 1."""
        import pyarrow as pa
        import pyarrow.compute as pc

        import ray.data as rd

        from transner_ray.gazetteers import Gazetteers
        from transner_ray.pipelines import kg

        pages = rd.from_arrow(pages_from_documents(sf_dir)).drop_columns(["warc_ts", "text"])
        gz = Gazetteers(
            cities=frozenset(), religions=frozenset(_KG_GAZ_WORDS)
        )
        men = kg.mentions_dataset(kg.sentences_dataset(pages, gazetteers=gz))

        def project(t: pa.Table) -> pa.Table:
            mask = pc.and_(
                pc.equal(t["detector"], pa.scalar("gazetteer")),
                pc.equal(t["type"], pa.scalar("RELIGION")),
            )
            t = t.filter(mask)
            return pa.table({"url": t["url"], "value": t["value"], "offset": t["offset"]})

        return men.map_batches(project, batch_format="pyarrow").sort(
            ["url", "offset", "value"]
        )

    def kg_regex_mentions(sf_dir: str):
        """Mention rows of the REAL regex-PII battery, made
        SQL-checkable: page text is a deterministic single-sentence
        carrier derived from doc_id alone ('Document number NNNNNNNNN
        filed', synth.pii_pages_from_documents), so the full extract →
        split → detect path must emit exactly one
        NL_CITIZEN_SERVICE_NUMBER mention per page at offset 16 with
        the 9-digit zero-padded id as value (reference pattern
        ner.py:57; boundary-strip ner.py:227-231)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        import ray.data as rd

        from transner_ray.pipelines import kg
        from transner_ray.synth import pii_pages_from_documents

        pages = rd.from_arrow(pii_pages_from_documents(sf_dir)).drop_columns(
            ["warc_ts", "text"]
        )
        men = kg.mentions_dataset(kg.sentences_dataset(pages))

        def project(t: pa.Table) -> pa.Table:
            mask = pc.and_(
                pc.equal(t["detector"], pa.scalar("regex")),
                pc.equal(t["type"], pa.scalar("NL_CITIZEN_SERVICE_NUMBER")),
            )
            t = t.filter(mask)
            return pa.table({"url": t["url"], "value": t["value"], "offset": t["offset"]})

        return men.map_batches(project, batch_format="pyarrow").sort(
            ["url", "offset", "value"]
        )

    def _born_spine(sf_dir: str):
        """extract → split → detect → triples over the born-in carrier
        corpus (synth.born_pages_from_documents) with a single-word
        PER/LOC phrase registry injected — every stage is the real
        one; only the corpus and the lookup state are synthetic."""
        import ray.data as rd

        from transner_ray.gazetteers import Gazetteers
        from transner_ray.pipelines import kg
        from transner_ray.stages.triples import triples_batch
        from transner_ray.synth import BORN_CITIES, BORN_PERSONS, born_pages_from_documents

        pages = rd.from_arrow(born_pages_from_documents(sf_dir)).drop_columns(
            ["warc_ts", "text"]
        )
        phrases = {(p,): "PER" for p in BORN_PERSONS}
        phrases.update({(c,): "LOC" for c in BORN_CITIES})
        gz = Gazetteers(
            cities=frozenset(), religions=frozenset(), phrases=phrases, max_phrase_len=1
        )
        return kg.sentences_dataset(pages, gazetteers=gz).map_batches(
            triples_batch, batch_format="pyarrow"
        )

    def kg_born_triples(sf_dir: str):
        """One born_in triple per carrier page, through the REAL triple
        extraction (kg.extract_triples first-PERSON / first-LOC-after
        selection + born cue) — subj/pred/obj SQL-derivable from
        doc_id."""
        import pyarrow as pa

        return (
            _born_spine(sf_dir)
            .map_batches(
                lambda t: pa.table(
                    {"url": t["url"], "subj": t["subj"], "pred": t["pred"], "obj": t["obj"]}
                ),
                batch_format="pyarrow",
            )
            .sort("url")
        )

    def kg_born_edges(sf_dir: str):
        """The same chain continued through entity linking and the
        partitioned hash-aggregate edge reduce (kg.edges_dataset) —
        gates canonicalization (per:/loc: namespaces) and edge weights
        in SQL."""
        import pyarrow as pa

        from transner_ray.pipelines import kg
        from transner_ray.stages.graph import link_triples_batch

        linked = _born_spine(sf_dir).map_batches(
            link_triples_batch, batch_format="pyarrow"
        )
        edges = kg.edges_dataset(linked, settle=True)
        return edges.map_batches(
            lambda t: pa.table(
                {
                    "subj_id": t["subj_id"],
                    "pred": t["pred"],
                    "obj_id": t["obj_id"],
                    "weight": t["weight"],
                }
            ),
            batch_format="pyarrow",
        ).sort(["subj_id", "obj_id"])

    def kg_born_edges_emblink(sf_dir: str):
        """kg_born_edges through the EMBEDDING linker (alias table +
        char-3-gram feature-hash cosine fallback) instead of the alias
        broadcast: every born surface is absent from the alias table
        and either registry-identical or below the 0.80 cosine
        threshold against every registry entry (pinned by
        test_born_surfaces_self_link), so the linker must resolve each
        surface to ITSELF and the edge table equals the alias-mode
        oracle — the first SQL gate on the embedding-linking path."""
        import pyarrow as pa

        from transner_ray.linking import make_embedding_link_batch
        from transner_ray.pipelines import kg

        linked = _born_spine(sf_dir).map_batches(
            make_embedding_link_batch(), batch_format="pyarrow"
        )
        edges = kg.edges_dataset(linked, settle=True)
        return edges.map_batches(
            lambda t: pa.table(
                {
                    "subj_id": t["subj_id"],
                    "pred": t["pred"],
                    "obj_id": t["obj_id"],
                    "weight": t["weight"],
                }
            ),
            batch_format="pyarrow",
        ).sort(["subj_id", "obj_id"])

    def kg_born_edges_joinlink(sf_dir: str):
        """kg_born_edges through the SHUFFLE-JOIN linker
        (linking.link_triples_via_join — SURVEY.md §2.4 J-new plan B,
        the path a broadcast-too-big alias table forces): two
        left-outer ``Dataset.join``s against the alias table on the
        normalized surfaces, then the same edge reduce. Born surfaces
        are alias-absent, so canon is null and each endpoint resolves
        to its own normalized surface — identical to the broadcast
        linker, sharing the born-edge SQL oracle."""
        import pyarrow as pa

        from transner_ray.linking import link_triples_via_join
        from transner_ray.pipelines import kg

        linked = link_triples_via_join(_born_spine(sf_dir), num_partitions=4)
        edges = kg.edges_dataset(linked, settle=True)
        return edges.map_batches(
            lambda t: pa.table(
                {
                    "subj_id": t["subj_id"],
                    "pred": t["pred"],
                    "obj_id": t["obj_id"],
                    "weight": t["weight"],
                }
            ),
            batch_format="pyarrow",
        ).sort(["subj_id", "obj_id"])

    def kg_partitioned_born_edges(sf_dir: str):
        """THE resumable job (kg.run_partitioned: per-partition lineage
        manifests -> phase-2 reduce -> atomic rename) under the
        driver's SQL gate, over the born carrier corpus written as
        real parquet shards. Repeat gate invocations RESUME from the
        manifests (phase 1 skips, phase 2 re-reduces) and must keep
        producing the oracle rows — the gate thereby also checks
        resume determinism across rounds. Shards regenerate whenever
        documents.parquet is newer (stale-cache guard); the input
        fingerprints then invalidate the manifests and the job
        re-runs."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import ray.data as rd

        from transner_ray.gazetteers import Gazetteers
        from transner_ray.pipelines import kg
        from transner_ray.synth import BORN_CITIES, BORN_PERSONS, born_pages_from_documents

        from transner_ray.ops.io import (
            cache_dir_for,
            cache_is_fresh,
            source_fingerprint,
            write_cache_marker,
        )

        src = f"{sf_dir}/documents.parquet"
        base = cache_dir_for("/tmp/transner_ray_born", src)
        pages_dir = os.path.join(base, "pages")
        os.makedirs(pages_dir, exist_ok=True)
        n_shards = 4
        paths = [
            os.path.join(pages_dir, f"pages-{i:04d}.parquet") for i in range(n_shards)
        ]
        marker = os.path.join(pages_dir, "_source.json")
        fp = source_fingerprint(src)
        stale = (not cache_is_fresh(marker, fp)) or any(
            not os.path.exists(p) for p in paths
        )
        if stale:
            tbl = born_pages_from_documents(sf_dir)
            per = (tbl.num_rows + n_shards - 1) // n_shards
            for i, p in enumerate(paths):
                pq.write_table(tbl.slice(i * per, per), p)
            write_cache_marker(marker, fp)

        phrases = {(p,): "PER" for p in BORN_PERSONS}
        phrases.update({(c,): "LOC" for c in BORN_CITIES})
        gz = Gazetteers(
            cities=frozenset(), religions=frozenset(), phrases=phrases, max_phrase_len=1
        )
        res = kg.run_partitioned(
            paths,
            os.path.join(base, "ckpt"),
            num_partitions=n_shards,
            write_mentions=False,
            gazetteers=gz,
        )
        edges = rd.read_parquet(os.path.join(res["out_dir"], "edges"))
        return edges.map_batches(
            lambda t: pa.table(
                {
                    "subj_id": t["subj_id"],
                    "pred": t["pred"],
                    "obj_id": t["obj_id"],
                    "weight": t["weight"],
                }
            ),
            batch_format="pyarrow",
        ).sort(["subj_id", "obj_id"])

    def kg_born_entities(sf_dir: str):
        """The canonicalization reduce (kg.entities_dataset: combiner
        partials → partitioned hash-aggregate → canonical surface /
        type / aliases / support) made SQL-checkable over the born
        carrier: every surface is alias-free and single-variant, so
        canonical = the word, aliases = [word], and support = the
        entity's endpoint count, all derivable from doc_id."""
        import pyarrow as pa

        from transner_ray.pipelines import kg
        from transner_ray.stages.graph import link_triples_batch

        linked = _born_spine(sf_dir).map_batches(
            link_triples_batch, batch_format="pyarrow"
        )
        ents = kg.entities_dataset(linked, settle=True)
        return ents.map_batches(
            lambda t: pa.table(
                {
                    "entity_id": t["entity_id"],
                    "canonical": t["canonical"],
                    "type": t["type"],
                    "aliases": t["aliases"],
                    "support": t["support"],
                }
            ),
            batch_format="pyarrow",
        ).sort("entity_id")

    def kg_split_docs(sf_dir: str):
        """Sentence splitter over documents-derived pages — the split
        itself is SQL-checkable (same regex semantics in DuckDB)."""
        import pyarrow as pa

        import ray.data as rd

        from transner_ray.stages.extract import extract_text_batch
        from transner_ray.stages.split import split_sentences_batch

        pages = rd.from_arrow(pages_from_documents(sf_dir)).drop_columns(["warc_ts", "text"])
        return (
            pages.map_batches(extract_text_batch, batch_format="pyarrow")
            .map_batches(split_sentences_batch, batch_format="pyarrow")
            .map_batches(
                lambda t: pa.table({"url": t["url"], "sentence": t["sentence"]}),
                batch_format="pyarrow",
            )
        )

    def kg_split_docs_jsonl(sf_dir: str):
        """The JSONL (WET-shaped) webtext source driven through the
        splitter: documents-derived EXTRACTED rows are sharded to
        line-delimited JSON under /tmp (mtime-guarded vs the source
        parquet), read back with sources.jsonl.read_extracted_jsonl,
        and split — same SQL oracle as kg_split_docs, so the gate
        proves the alternate ingest format end-to-end."""
        import json
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        from transner_ray.sources.jsonl import (
            read_extracted_jsonl,
            write_extracted_jsonl,
        )
        from transner_ray.stages.split import split_sentences_batch

        from transner_ray.ops.io import (
            cache_dir_for,
            cache_is_fresh,
            source_fingerprint,
            write_cache_marker,
        )

        src = f"{sf_dir}/documents.parquet"
        # cache keyed by a hash of the ABSOLUTE source path (basenames
        # collide across corpora), reused only on fingerprint EQUALITY
        out_dir = cache_dir_for("/tmp/transner_ray_jsonl", src)
        manifest = os.path.join(out_dir, "_manifest.json")
        fp = source_fingerprint(src)
        # the manifest (written LAST, atomically) is the completeness
        # marker: per-shard publish is atomic but the SET is not — an
        # interrupted writer must not leave a readable partial corpus
        paths: list[str] = []
        if cache_is_fresh(manifest, fp):
            listed = json.load(open(manifest))["paths"]
            if all(os.path.exists(p) for p in listed):
                paths = listed
        if not paths:
            shutil.rmtree(out_dir, ignore_errors=True)  # clear orphan shards
            docs = pq.read_table(src, columns=["doc_id", "text", "lang"])
            urls = pa.array(
                [f"https://docs.example/{d:08d}" for d in docs["doc_id"].to_pylist()],
                pa.string(),
            )
            tbl = pa.table(
                {"url": urls, "text": docs["text"], "lang": docs["lang"]}
            )
            paths = write_extracted_jsonl(tbl, out_dir, num_shards=4)
            write_cache_marker(manifest, fp, extra={"paths": paths})
        extracted = read_extracted_jsonl(paths)
        sents = extracted.map_batches(split_sentences_batch, batch_format="pyarrow")
        return sents.map_batches(
            lambda t: pa.table({"url": t["url"], "sentence": t["sentence"]}),
            batch_format="pyarrow",
        )

    # NOTE on dict ORDER: the driver's correctness gate checks the
    # FIRST 50 keys in dict order. The flagship KG gates, IR,
    # quantiles, joins, ANN, k-means, multimodal, the dedup suite and
    # the traindata suite come first. ROTATION RULE (round-4 verdict):
    # any query that has never appeared in a driver window — or whose
    # implementation changed this round — must be rotated into the
    # first 50 before new work lands; long-stable rows (driver-green
    # in CORRECTNESS_r01-r04) rotate out to make room, and the local
    # gate (scripts/check_queries.py) still runs ALL of them each
    # session. Round-5 rotation: in = kg_born_edges_joinlink (new),
    # decontaminate (rebuilt distributed eval-gram), epoch_shuffle,
    # vocab_topk, sample_exact_k, chunk_documents, ann_filtered,
    # bpe_merges, neardup_clusters; out = r04-checked rows-only
    # entries whose SQL siblings stay in-window, plus bigram_topk /
    # entity_pagerank (r04-green, machinery gated by in-window kin).
    # Late-r5: in = token_counts_bpe (new); out = ann_ivf (driver-green
    # r01-r04; IVF machinery still gated by ann_ivf_index/ann_filtered).
    return {
        # ---- KG pipeline stages (the north-star; documents-derived
        # variants are SQL-checked, synthetic-pages spine rows-only) ----
        "kg_extract_text": kg_extract,
        "kg_split_docs": kg_split_docs,
        "kg_split_docs_jsonl": kg_split_docs_jsonl,
        "kg_sentences_docs": kg_sentences_docs,
        "kg_gazetteer_mentions": kg_gazetteer_mentions,
        "kg_regex_mentions": kg_regex_mentions,
        "kg_born_triples": kg_born_triples,
        "kg_born_edges": kg_born_edges,
        "kg_born_edges_emblink": kg_born_edges_emblink,
        "kg_born_edges_joinlink": kg_born_edges_joinlink,
        "kg_partitioned_born_edges": kg_partitioned_born_edges,
        "kg_born_entities": kg_born_entities,
        # PageRank's quantized loop SQL-gated over the born graph
        # (unrolled-iteration oracle, bit-exact integer stream);
        # force_distributed so the gate runs the bucketed passes, not
        # the small-graph driver fast path. 5 iterations / 4 buckets:
        # each iteration is 2 materialized shuffles, a fixed ~6 s of
        # Ray dispatch on this host regardless of data size, so the
        # gate pays for 10 rounds, not 20 (the full-default loop is
        # pinned by the pytest fast==distributed==oracle equality).
        "born_entity_pagerank": lambda sf: pagerank_mod.entity_pagerank_over(
            kg_born_edges(sf), force_distributed=True, iters=5, num_buckets=4
        ),
        # (kg_mentions / kg_triples / kg_sentences / kg_entities /
        # kg_edges / kg_edges_emblink — the rows-only synthetic-pages
        # variants of machinery that IS SQL-gated via the born/docs
        # gates above — sit past position 50, driver-green in r01-r04)
        # ---- IR indexing + retrieval (all SQL-checked) ----
        "inverted_index": indexing.inverted_index,
        "tfidf_top_terms": indexing.tfidf_top_terms,
        "bm25_topk": indexing.bm25_topk,
        # exact distinct-terms sibling of the HLL sketch (SQL-checked)
        "distinct_terms": indexing.distinct_terms,
        # Misra-Gries candidates + exact verify pass → SQL-checkable
        "heavy_hitter_terms": sketches.heavy_hitter_terms,
        # ---- exact distributed quantiles (SQL-checked) ----
        "token_count_quantiles": quantiles.token_count_quantiles,
        "event_value_quantiles": quantiles.event_value_quantiles,
        # ---- custom time-series joins (SQL-checked) ----
        "asof_last_order": joins.last_order_before_event,
        "range_join_windows": joins.range_join_windows,
        # ---- similarity search ----
        "ann_brute_force": similarity.brute_force_topk,   # SQL-checked
        # LM-tokenizer pre-token counting (GPT-2-shape regex; exact
        # RE2 oracle) — new in round 5, so in-window per the rotation
        # rule; ann_ivf rotated out to past-window (driver-green
        # r01-r04; its IVF machinery stays gated by ann_ivf_index +
        # ann_filtered below)
        "token_counts_bpe": textstats.token_counts_bpe,   # SQL-checked
        # persisted list-partitioned IVF index (build once under /tmp,
        # nprobe pruning AT THE READ); exact mode shares the brute
        # force oracle, approximate recall pytest-gated
        "ann_ivf_index": similarity.ann_ivf_index,
        # metadata-filtered exact vector search (label predicate pushed
        # to the parquet read) — SQL-checked
        "ann_filtered": similarity.filtered_topk,
        # distributed Lloyd fit; rows-only (iterative float fit has no
        # SQL), pinned by exact-equality sequential oracle in pytest;
        # round-5: iterated dataset re-read per pass (no materialize)
        "kmeans_embeddings": similarity.kmeans_embeddings,
        # ---- multimodal plumbing (all SQL-checked) ----
        "media_metadata": multimodal.media_metadata,
        # feature-extract stage (vectorized numpy byte stats — the
        # embedding-model compute shape) and video frame sampling
        # (every 4th frame of the fake container as its own row)
        "media_features": multimodal.media_features,
        "frame_sample": multimodal.frame_sample,
        # ---- dedup suite ----
        "exact_dedup": dedup.exact_dedup,                 # SQL-checked
        # (minhash_dedup / simhash_dedup / ngram_jaccard_dedup /
        # embedding_neardup — the rows-only production entries of
        # machinery gated by the *_selfdup/_neardup SQL pairs below —
        # sit past position 50, driver-green in r04)
        # SQL-checked gates for the sketch machinery: the same
        # pipelines over a self-dup-augmented corpus, exact-dup slice
        # (planted dup of EVERY row → SQL text/vector-equality oracle)
        "minhash_selfdup_pairs": dedup.minhash_selfdup_pairs,
        "ngram_selfdup_pairs": dedup.ngram_selfdup_pairs,
        "simhash_selfdup_pairs": dedup.simhash_selfdup_pairs,
        "embedding_selfdup_pairs": dedup.embedding_selfdup_pairs,
        # SQL-checked gates for the NEAR-MISS path (similarity in
        # [threshold, 1)): perturbed-dup corpora with DuckDB-computable
        # exact Jaccard / guaranteed-bucket cosine oracles
        "minhash_neardup_pairs": dedup.minhash_neardup_pairs,
        "ngram_neardup_pairs": dedup.ngram_neardup_pairs,
        "embedding_neardup_pairs": dedup.embedding_neardup_pairs,
        # exact duplicated-substring detection (word-10-gram windows
        # occurring ≥2× corpus-wide), Lee et al. 2022 shape — SQL-checked
        "dup_window_docs": dedup.dup_window_docs,
        # incremental dedup of a new crawl shard against a PERSISTED
        # hash-bucketed fingerprint index (build under /tmp once,
        # co-partitioned anti-join, no broadcast) — SQL-checked
        "dedup_incremental": dedup.dedup_incremental,
        # ---- near-dup clustering (large-star/small-star CC) ----
        # chain-graph gate is SQL-checked; the minhash-fed variant is
        # rows-only (sketch upstream) with a union-find pytest oracle
        "doc_chain_components": cc.doc_chain_components,
        "neardup_clusters": cc.neardup_clusters,
        # ---- training-data curation suite ----
        # flagship composite: train split → quality → dedup keeper →
        # decontaminate → pack, in one streaming pass + one reduce
        "prepare_training_data": traindata.prepare_training_data,
        # ---- sequence packing (distributed prefix scan; SQL-checked) ----
        "pack_chunks": pack.pack_chunks,
        # round-5 rebuild (distributed eval-gram fold) — SQL-checked
        "decontaminate": traindata.decontaminate,
        "epoch_shuffle": traindata.epoch_shuffle,
        "vocab_topk": traindata.vocab_topk,
        # exact-k uniform sample (distributed top-k by Knuth hash,
        # blocks × k short rows to the driver, zero shuffle)
        "sample_exact_k": traindata.sample_exact_k,
        # sliding-window chunking (RAG-ingest shape; SQL-checked)
        "chunk_documents": traindata.chunk_documents,
        # BPE tokenizer training: ONE distributed word-count pass
        # (vocab_topk machinery, SQL-gated above) + driver merge loop
        # over the vocab-scale table; rows-only (iterative merges are
        # not SQL-expressible), exact-equality pytest oracle +
        # in-window SQL sibling vocab_topk
        "bpe_merges": bpe_mod.bpe_train,
        # ---------- position >50: long-stable rows below this line get
        # their driver verification from CORRECTNESS_r01-r04; the local
        # gate still checks every one of them each session ----------
        # IVF in EXACT mode (nprobe = n_centroids probes every list →
        # provably equal to brute force → shares its SQL oracle); the
        # approximate default stays pytest-gated (test_ann_ivf_recall).
        # Rotated past-window in r5 (driver-green r01-r04) to make room
        # for token_counts_bpe; in-window kin: ann_ivf_index, ann_filtered
        "ann_ivf": lambda sf: similarity.ivf_topk(sf, nprobe=16),  # SQL-checked
        "kg_mentions": lambda sf: kg.mentions_dataset(_kg_spine(sf)),
        "kg_triples": _kg_linked,
        "kg_sentences": _kg_sentences_only,
        "kg_entities": lambda sf: kg.entities_dataset(_kg_linked(sf), settle=True),
        "kg_edges": lambda sf: kg.edges_dataset(_kg_linked(sf), settle=True),
        # embedding-linker variant (alias + char-ngram embedding fallback)
        "kg_edges_emblink": lambda sf: kg.edges_dataset(
            kg.linked_triples_dataset(_kg_spine(sf), link_mode="embedding"), settle=True
        ),
        # graph analytics over the constructed KG (rows-only: iterative
        # float fit; exact-equality + float-reference pytest oracles;
        # machinery SQL-gated via in-window born_entity_pagerank)
        "entity_pagerank": pagerank_mod.entity_pagerank,
        # rows-only production dedup entries (machinery gated by the
        # in-window *_selfdup/_neardup SQL pairs)
        "minhash_dedup": dedup.minhash_dedup,
        "simhash_dedup": dedup.simhash_dedup,
        "ngram_jaccard_dedup": dedup.ngram_jaccard_dedup,
        "embedding_neardup": dedup.embedding_neardup,
        # HLL vocabulary-size sketch; rows-only (no SQL computes an
        # HLL), pinned by exact-merge + accuracy-bound pytest oracles
        # + in-window exact sibling distinct_terms
        "approx_distinct_tokens": sketches.approx_distinct_tokens,
        # mergeable-histogram sketch for continuous columns; rows-only
        # — error-bound + block-split invariance pinned in pytest;
        # exact in-window siblings are the SQL-gated definition
        "approx_value_quantiles": quantiles.approx_value_quantiles,
        "bigram_topk": indexing.bigram_topk,
        "stratified_sample": traindata.stratified_sample,
        "cap_per_group": traindata.cap_per_group,
        # ---- text analysis (SQL-checked) ----
        "token_counts": textstats.token_counts,
        "quality_signals": textstats.quality_signals,
        "fingerprints": textstats.fingerprints,
        "language_guess": textstats.language_guess,
        "stopword_stats": textstats.stopword_stats,
        "word_repetition": textstats.word_repetition,
        "curate_corpus": textstats.curate_corpus,
        # ---- relational operator suite (SQL-checked) ----
        "lineitem_pricing": relational.lineitem_pricing,
        "high_quantity_items": relational.high_quantity_items,
        "top_orders": relational.top_orders,
        "customers_per_region": relational.customers_per_region,
        "segment_revenue": relational.segment_revenue,
        "first_event_per_user_type": relational.first_event_per_user_type,
        "events_hourly": relational.events_hourly,
        "events_pivot": relational.events_pivot,
        "quality_checks": validate.quality_checks,
        "distinct_flag_status": relational.distinct_flag_status,
        "union_lower_count": relational.union_lower_count,
        "brand_stats": relational.brand_stats,
        "user_sessions": relational.user_sessions,
        "running_totals": relational.running_totals,
        "event_deltas": relational.event_deltas,
        "top_parts_per_brand": relational.top_parts_per_brand,
        "customers_without_big_orders": relational.customers_without_big_orders,
        "event_props_stats": relational.event_props_stats,
        "priority_revenue": relational.priority_revenue,
        "events_sliding": relational.events_sliding,
        "supplier_balance_by_nation": relational.supplier_balance_by_nation,
    }


def _born_person_sql() -> str:
    """DuckDB expression for BORN_PERSONS[doc_id % 5] (1-based list)."""
    from transner_ray.synth import BORN_PERSONS

    vals = ", ".join(f"'{p}'" for p in BORN_PERSONS)
    return f"list_value({vals})[(doc_id % {len(BORN_PERSONS)}) + 1]"


def _born_city_sql() -> str:
    """DuckDB expression for BORN_CITIES[(3*doc_id + 1) % 7]."""
    from transner_ray.synth import BORN_CITIES

    vals = ", ".join(f"'{c}'" for c in BORN_CITIES)
    return f"list_value({vals})[((3 * doc_id + 1) % {len(BORN_CITIES)}) + 1]"


_BORN_EDGES_SQL = f"""
    SELECT 'per:' || p AS subj_id, 'born_in' AS pred, 'loc:' || c AS obj_id,
           count(*) AS weight
    FROM (
      SELECT {_born_person_sql()} AS p, {_born_city_sql()} AS c FROM documents
    )
    GROUP BY 1, 2, 3
    ORDER BY subj_id, obj_id
"""


def _born_pagerank_sql() -> str:
    """Unrolled-iteration replica of the quantized PageRank loop over
    the born graph (see ops/pagerank.unrolled_pagerank_sql for why the
    integer streams match bit-for-bit)."""
    from transner_ray.ops.pagerank import unrolled_pagerank_sql

    edges = f"""
        SELECT 'per:' || p AS src, 'loc:' || c AS dst,
               CAST(count(*) AS BIGINT) AS w
        FROM (
          SELECT {_born_person_sql()} AS p, {_born_city_sql()} AS c FROM documents
        )
        GROUP BY 1, 2
    """
    return unrolled_pagerank_sql(edges, iters=5)


def oracle_sql() -> dict[str, str]:
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
        validate,
    )

    return {
        "lineitem_pricing": relational.LINEITEM_PRICING_SQL,
        "high_quantity_items": relational.HIGH_QUANTITY_ITEMS_SQL,
        "top_orders": relational.TOP_ORDERS_SQL,
        "customers_per_region": relational.CUSTOMERS_PER_REGION_SQL,
        "segment_revenue": relational.SEGMENT_REVENUE_SQL,
        "first_event_per_user_type": relational.FIRST_EVENT_SQL,
        "events_hourly": relational.EVENTS_HOURLY_SQL,
        "events_pivot": relational.EVENTS_PIVOT_SQL,
        "quality_checks": validate.QUALITY_CHECKS_SQL,
        "distinct_flag_status": relational.DISTINCT_FLAG_STATUS_SQL,
        "union_lower_count": relational.UNION_LOWER_COUNT_SQL,
        "brand_stats": relational.BRAND_STATS_SQL,
        "user_sessions": relational.USER_SESSIONS_SQL,
        "running_totals": relational.RUNNING_TOTALS_SQL,
        "event_deltas": relational.EVENT_DELTAS_SQL,
        "top_parts_per_brand": relational.TOP_PARTS_PER_BRAND_SQL,
        "customers_without_big_orders": relational.CUSTOMERS_WITHOUT_BIG_ORDERS_SQL,
        "event_props_stats": relational.EVENT_PROPS_STATS_SQL,
        "priority_revenue": relational.PRIORITY_REVENUE_SQL,
        "events_sliding": relational.EVENTS_SLIDING_SQL,
        "supplier_balance_by_nation": relational.SUPPLIER_BALANCE_SQL,
        "kg_split_docs": r"""
            SELECT 'https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
                   trim(s) AS sentence
            FROM (
              SELECT doc_id, unnest(regexp_extract_all(text, '[^.!?\n]*[.!?]+|[^.!?\n]+')) AS s
              FROM documents
            ) WHERE trim(s) != ''
        """,
        # the JSONL ingest path reproduces the parquet path exactly —
        # same oracle as kg_split_docs
        "kg_split_docs_jsonl": r"""
            SELECT 'https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
                   trim(s) AS sentence
            FROM (
              SELECT doc_id, unnest(regexp_extract_all(text, '[^.!?\n]*[.!?]+|[^.!?\n]+')) AS s
              FROM documents
            ) WHERE trim(s) != ''
        """,
        "token_counts": textstats.TOKEN_COUNTS_SQL,
        "token_counts_bpe": textstats.TOKEN_COUNTS_BPE_SQL,
        "quality_signals": textstats.QUALITY_SIGNALS_SQL,
        "fingerprints": textstats.FINGERPRINTS_SQL,
        "language_guess": textstats.LANGUAGE_GUESS_SQL,
        "stopword_stats": textstats.stopword_stats_sql(),
        "word_repetition": textstats.WORD_REPETITION_SQL,
        "curate_corpus": textstats.CURATE_CORPUS_SQL,
        "exact_dedup": dedup.EXACT_DEDUP_SQL,
        "doc_chain_components": cc.DOC_CHAIN_COMPONENTS_SQL,
        "pack_chunks": pack.PACK_CHUNKS_SQL,
        "decontaminate": traindata.DECONTAMINATE_SQL,
        "vocab_topk": traindata.VOCAB_TOPK_SQL,
        "stratified_sample": traindata.stratified_sample_sql(),
        "sample_exact_k": traindata.sample_exact_k_sql(),
        "chunk_documents": traindata.chunk_documents_sql(),
        "ann_filtered": similarity.filtered_topk_sql(),
        "cap_per_group": traindata.cap_per_group_sql(),
        "prepare_training_data": traindata.prepare_training_data_sql(),
        "epoch_shuffle": traindata.epoch_shuffle_sql(),
        "asof_last_order": joins.ASOF_LAST_ORDER_SQL,
        "range_join_windows": joins.RANGE_JOIN_WINDOWS_SQL,
        "distinct_terms": indexing.DISTINCT_TERMS_SQL,
        "heavy_hitter_terms": sketches.heavy_hitters_sql(),
        "inverted_index": indexing.INVERTED_INDEX_SQL,
        "tfidf_top_terms": indexing.TFIDF_SQL,
        "bm25_topk": indexing.BM25_TOPK_SQL,
        "bigram_topk": indexing.BIGRAM_TOPK_SQL,
        "token_count_quantiles": quantiles.TOKEN_COUNT_QUANTILES_SQL,
        "event_value_quantiles": quantiles.EVENT_VALUE_QUANTILES_SQL,
        "minhash_selfdup_pairs": dedup.SELFDUP_PAIRS_SQL,
        "ngram_selfdup_pairs": dedup.NGRAM_SELFDUP_PAIRS_SQL,
        "simhash_selfdup_pairs": dedup.SIMHASH_SELFDUP_PAIRS_SQL,
        "embedding_selfdup_pairs": dedup.EMB_SELFDUP_PAIRS_SQL,
        "minhash_neardup_pairs": dedup.MINHASH_NEARDUP_PAIRS_SQL,
        "ngram_neardup_pairs": dedup.NGRAM_NEARDUP_PAIRS_SQL,
        "embedding_neardup_pairs": dedup.EMB_NEARDUP_PAIRS_SQL,
        "dup_window_docs": dedup.DUP_WINDOW_DOCS_SQL,
        "dedup_incremental": dedup.DEDUP_INCREMENTAL_SQL,
        "ann_brute_force": similarity.brute_force_topk_sql(),
        # exact-mode IVF (nprobe = n_centroids) equals brute force
        "ann_ivf": similarity.brute_force_topk_sql(),
        "ann_ivf_index": similarity.brute_force_topk_sql(),
        "kg_sentences_docs": r"""
            SELECT 'https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
                   trim(s) AS sentence
            FROM (
              SELECT doc_id, unnest(regexp_extract_all(text, '[^.!?\n]*[.!?]+|[^.!?\n]+')) AS s
              FROM documents
            ) WHERE trim(s) != ''
        """,
        "kg_gazetteer_mentions": f"""
            WITH toks AS (
              SELECT doc_id, text, unnest(regexp_extract_all(text, '\\S+')) AS w
              FROM documents
            )
            SELECT 'https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
                   w AS value,
                   CAST(strpos(text, w) - 1 AS BIGINT) AS "offset"
            FROM toks
            WHERE w IN {_KG_GAZ_WORDS!r}
            ORDER BY url, "offset", value
        """,
        "kg_regex_mentions": """
            SELECT 'https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
                   lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0') AS value,
                   CAST(16 AS BIGINT) AS "offset"
            FROM documents
            ORDER BY url, "offset", value
        """,
        "kg_born_triples": f"""
            SELECT 'https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
                   {_born_person_sql()} AS subj,
                   'born_in' AS pred,
                   {_born_city_sql()} AS obj
            FROM documents
            ORDER BY url
        """,
        "kg_born_edges": _BORN_EDGES_SQL,
        "kg_born_edges_emblink": _BORN_EDGES_SQL,
        "kg_born_edges_joinlink": _BORN_EDGES_SQL,
        "born_entity_pagerank": _born_pagerank_sql(),
        "kg_partitioned_born_edges": _BORN_EDGES_SQL,
        "kg_born_entities": f"""
            WITH m AS (
              SELECT {_born_person_sql()} AS p, {_born_city_sql()} AS c FROM documents
            )
            SELECT 'per:' || p AS entity_id, p AS canonical, 'PERSON' AS type,
                   [p] AS aliases, count(*) AS support
            FROM m GROUP BY p
            UNION ALL
            SELECT 'loc:' || c, c, 'LOCATION', [c], count(*)
            FROM m GROUP BY c
            ORDER BY entity_id
        """,
        "media_metadata": multimodal.MEDIA_METADATA_SQL,
        "media_features": multimodal.MEDIA_FEATURES_SQL,
        "frame_sample": multimodal.FRAME_SAMPLE_SQL,
        "kg_extract_text": """
            SELECT 'https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
                   text, lang
            FROM documents
        """,
    }
