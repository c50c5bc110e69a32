"""Pipeline-shape tests (layout knobs must not change results)."""

import pandas as pd


def test_repartition_before_detect_identical(pages_small):
    """The explicit CPU-parse → detect exchange is a pure layout
    change: mention rows must be identical with and without it."""
    from transner_ray.pipelines import kg

    a = (
        kg.mentions_dataset(kg.sentences_dataset(kg.read_pages(pages_small)))
        .to_pandas()
        .sort_values(["url", "sent_idx", "offset", "value"])
        .reset_index(drop=True)
    )
    b = (
        kg.mentions_dataset(
            kg.sentences_dataset(
                kg.read_pages(pages_small), repartition_before_detect=5
            )
        )
        .to_pandas()
        .sort_values(["url", "sent_idx", "offset", "value"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_jsonl_source_matches_parquet_spine(pages_small, tmp_path):
    """The JSONL (WET-shaped) ingest path: extracted rows sharded to
    line-delimited JSON, read back with read_extracted_jsonl and run
    through sentences_from_extracted, must produce mention rows
    IDENTICAL to the parquet → extract spine (the ingest format is a
    pure container change)."""
    import ray.data as rd

    from transner_ray.pipelines import kg
    from transner_ray.sources.jsonl import read_extracted_jsonl, write_extracted_jsonl
    from transner_ray.stages.extract import extract_text_batch

    extracted_tbl = (
        kg.read_pages(pages_small)
        .map_batches(extract_text_batch, batch_format="pyarrow")
        .to_pandas()
    )
    import pyarrow as pa

    paths = write_extracted_jsonl(
        pa.Table.from_pandas(extracted_tbl, preserve_index=False),
        str(tmp_path / "jsonl"),
        num_shards=3,
    )

    key = ["url", "sent_idx", "offset", "value"]
    via_jsonl = (
        kg.mentions_dataset(kg.sentences_from_extracted(read_extracted_jsonl(paths)))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    via_parquet = (
        kg.mentions_dataset(kg.sentences_dataset(kg.read_pages(pages_small)))
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_jsonl, via_parquet)


def test_jsonl_reader_field_mapping(tmp_path):
    """WET-style field names (content / WARC-Target-URI, no lang) map
    through text_col/url_col and default_lang backfill."""
    import json

    import pyarrow as pa

    from transner_ray.sources.jsonl import read_extracted_jsonl

    p = tmp_path / "wet.jsonl"
    with open(p, "w") as f:
        for i in range(4):
            f.write(
                json.dumps(
                    {
                        "WARC-Target-URI": f"https://ex.com/{i}",
                        "content": f"doc {i} body.",
                        "extra": i,
                    }
                )
                + "\n"
            )
    out = (
        read_extracted_jsonl(
            [str(p)], text_col="content", url_col="WARC-Target-URI", lang_col=None,
            default_lang="en",
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["url", "text", "lang"]
    assert out["lang"].unique().tolist() == ["en"]
    assert out["text"][0] == "doc 0 body."


def test_jsonl_reader_gzip(tmp_path):
    """Real WET dumps ship gzipped; the reader must stream .jsonl.gz."""
    import gzip
    import json

    from transner_ray.sources.jsonl import read_extracted_jsonl

    p = tmp_path / "part.jsonl.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        for i in range(5):
            f.write(json.dumps({"url": f"u{i}", "text": f"t {i}.", "lang": "en"}) + "\n")
    out = read_extracted_jsonl([str(p)]).to_pandas().sort_values("url")
    assert len(out) == 5 and out["text"].iloc[0] == "t 0."
