"""Triple precision/recall vs the reference-semantics oracle — the
acceptance metric (BASELINE.json: P/R ≥ 0.95). Prints one JSON line.

    python scripts/check_pr.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from transner_ray import synth
    from transner_ray.oracle import run_oracle
    from transner_ray.pipelines import kg

    paths = synth.write_pages(f"/tmp/pr_pages_{n_docs}", seed=42, n_docs=n_docs, num_shards=8)
    rows = []
    for p in paths:
        rows.extend(pq.read_table(p).to_pylist())
    oracle = run_oracle(rows)
    want = set((t["subj_id"], t["pred"], t["obj_id"]) for t in oracle["triples"])

    df = kg.linked_triples_dataset(kg.sentences_dataset(kg.read_pages(paths))).to_pandas()
    got = set(zip(df["subj_id"], df["pred"], df["obj_id"]))

    tp = len(got & want)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(want))
    result = {
        "metric": "triple_precision_recall_vs_oracle",
        "n_docs": n_docs,
        "oracle_triples": len(want),
        "engine_triples": len(got),
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "pass": precision >= 0.95 and recall >= 0.95,
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
