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
