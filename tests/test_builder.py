"""Pipeline-builder extension surface (SURVEY.md §2.9)."""

import pyarrow as pa
import pytest

import ray.data as rd

from transner_ray import schemas
from transner_ray.pipelines.builder import PipelineConfig, Step, build_kg_pipeline
from transner_ray.tagger import resolve_model_path


def _tiny_pages():
    from transner_ray import synth

    return rd.from_arrow(synth.generate_pages_table(42, 6))


def test_builder_default_matches_direct(pages_small):
    from transner_ray.pipelines import kg

    outs = build_kg_pipeline(kg.read_pages(pages_small))
    direct = kg.linked_triples_dataset(kg.sentences_dataset(kg.read_pages(pages_small)))
    a = outs["triples"].to_pandas()
    b = direct.to_pandas()
    key = ["subj_id", "pred", "obj_id", "url", "sent_idx"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )


def test_builder_extra_step_and_schema_check():
    def drop_short(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(pc.utf8_length(batch.column("sentence")), 15))

    step = Step(
        name="drop_short",
        fn=drop_short,
        schema_in=schemas.SENTENCE_MENTIONS,
        schema_out=schemas.SENTENCE_MENTIONS,
    )
    outs = build_kg_pipeline(_tiny_pages(), PipelineConfig(extra_steps=(step,)))
    df = outs["sentence_mentions"].to_pandas()
    assert (df["sentence"].str.len() > 15).all()

    bad = Step(
        name="needs_missing",
        fn=lambda b: b,
        schema_in=pa.schema([("nonexistent_col", pa.string())]),
        schema_out=schemas.SENTENCE_MENTIONS,
    )
    with pytest.raises(ValueError, match="nonexistent_col"):
        build_kg_pipeline(_tiny_pages(), PipelineConfig(extra_steps=(bad,)))


def test_builder_dates_toggle():
    # Reference boundary quirk (ner.py:288): a date that is space-
    # surrounded OR sits just before a sentence-final '.' is REJECTED;
    # only string-final dates (IndexError path, end == len) and dates
    # glued to non-space chars survive. Use a string-final date.
    from transner_ray.htmlops import wrap_html
    from transner_ray.schemas import PAGES
    from transner_ray.synth import EPOCH_BASE_US

    text = "Maria Santos è nata a Cardenas il 13/08/1983"
    pages = rd.from_arrow(
        pa.Table.from_pylist(
            [
                {
                    "url": "https://t.example/1",
                    "warc_ts": EPOCH_BASE_US,
                    "html": wrap_html("t", text),
                    "text": text,
                    "lang": "it",
                }
            ],
            schema=PAGES,
        )
    )
    outs = build_kg_pipeline(pages, PipelineConfig(apply_dates=True))
    types = set()
    for lst in outs["sentence_mentions"].to_pandas()["mentions"]:
        types.update(m["type"] for m in lst)
    assert types & {"TIME", "T_OPENING"}
    # and the toggle off keeps them out
    outs_off = build_kg_pipeline(pages, PipelineConfig(apply_dates=False))
    types_off = set()
    for lst in outs_off["sentence_mentions"].to_pandas()["mentions"]:
        types_off.update(m["type"] for m in lst)
    assert not types_off & {"TIME", "T_OPENING"}


def test_resolve_model_path(tmp_path):
    p = tmp_path / "model_dir"
    p.mkdir()
    assert resolve_model_path(str(p)) == str(p)
    cache = tmp_path / "cache"
    (cache / "bert_x").mkdir(parents=True)
    assert resolve_model_path("bert_x", models_dir=str(cache)) == str(cache / "bert_x")
    with pytest.raises(FileNotFoundError):
        resolve_model_path("nope", models_dir=str(cache))


def _make_model_tarball(registry_dir, name, payload=b"weights"):
    import tarfile

    src = registry_dir / f"src-{name}" / name
    src.mkdir(parents=True)
    (src / "pytorch_model.bin").write_bytes(payload)
    (src / "config.json").write_text("{}")
    with tarfile.open(registry_dir / f"{name}.tar.gz", "w:gz") as tar:
        tar.add(src, arcname=name)


def test_resolve_model_path_registry_download(tmp_path):
    """The reference's third fallback (ner.py:139-151): fetch
    ``{registry}/{name}.tar.gz``, extract into the cache, return the
    cached dir. file:// registry = the air-gapped/offline-test path."""
    registry = tmp_path / "registry"
    registry.mkdir()
    _make_model_tarball(registry, "bert_dl")
    cache = tmp_path / "cache"

    got = resolve_model_path(
        "bert_dl", models_dir=str(cache), registry_url=registry.as_uri()
    )
    assert got == str(cache / "bert_dl")
    assert (cache / "bert_dl" / "pytorch_model.bin").read_bytes() == b"weights"
    # no staging litter left behind
    assert sorted(p.name for p in cache.iterdir()) == ["bert_dl"]

    # second resolve is a pure cache hit (registry may even be gone)
    import shutil

    shutil.rmtree(registry)
    assert resolve_model_path("bert_dl", models_dir=str(cache)) == str(
        cache / "bert_dl"
    )


def test_resolve_model_path_env_registry(tmp_path, monkeypatch):
    registry = tmp_path / "registry"
    registry.mkdir()
    _make_model_tarball(registry, "bert_env")
    monkeypatch.setenv("TRANSNER_RAY_MODEL_REGISTRY", registry.as_uri())
    cache = tmp_path / "cache"
    got = resolve_model_path("bert_env", models_dir=str(cache))
    assert got == str(cache / "bert_env")


def test_resolve_artifact_path_flat_file(tmp_path):
    """Flat-file artifact resolution (lid.176.bin shape, ner.py:156-161)."""
    from transner_ray.tagger import resolve_artifact_path

    registry = tmp_path / "registry"
    registry.mkdir()
    (registry / "lid.176.bin").write_bytes(b"fasttext-model")
    cache = tmp_path / "cache"

    got = resolve_artifact_path(
        "lid.176.bin", models_dir=str(cache), registry_url=registry.as_uri()
    )
    assert got == str(cache / "lid.176.bin")
    assert (cache / "lid.176.bin").read_bytes() == b"fasttext-model"
    assert sorted(p.name for p in cache.iterdir()) == ["lid.176.bin"]
    # cache hit on re-resolve; local path wins outright
    assert resolve_artifact_path("lid.176.bin", models_dir=str(cache)) == got
    assert resolve_artifact_path(got, models_dir=str(tmp_path / "other")) == got
    with pytest.raises(FileNotFoundError):
        resolve_artifact_path("nope.bin", models_dir=str(cache))


def test_resolve_model_path_rejects_traversal(tmp_path):
    import tarfile

    registry = tmp_path / "registry"
    registry.mkdir()
    evil = tmp_path / "evil.txt"
    evil.write_text("boom")
    with tarfile.open(registry / "bert_evil.tar.gz", "w:gz") as tar:
        tar.add(evil, arcname="../escaped.txt")
    cache = tmp_path / "cache"
    with pytest.raises(ValueError, match="unsafe member path"):
        resolve_model_path(
            "bert_evil", models_dir=str(cache), registry_url=registry.as_uri()
        )
    assert not (tmp_path / "escaped.txt").exists()


def test_resolve_model_path_rejects_link_members(tmp_path):
    """Symlink members can escape staging on interpreters without
    tarfile filter='data' — rejected up front on all versions."""
    import tarfile

    registry = tmp_path / "registry"
    registry.mkdir()
    with tarfile.open(registry / "bert_sym.tar.gz", "w:gz") as tar:
        info = tarfile.TarInfo("bert_sym/link")
        info.type = tarfile.SYMTYPE
        info.linkname = "/etc"
        tar.addfile(info)
    cache = tmp_path / "cache"
    with pytest.raises(ValueError, match="link member"):
        resolve_model_path(
            "bert_sym", models_dir=str(cache), registry_url=registry.as_uri()
        )
