"""Parallelism-invariance check (SURVEY.md §5.2 item 4): the SAME
input run in two fresh processes at different num_cpus must produce
IDENTICAL triples (content hash over the sorted triple set).

    python scripts/check_invariance.py [n_docs]
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

WORKER = r"""
import ray, sys, hashlib
n = int(sys.argv[1]); docs = int(sys.argv[2])
ray.init(address="local", num_cpus=n, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
from transner_ray import synth
from transner_ray.pipelines import kg
paths = synth.write_pages(f"/tmp/invariance_pages_{docs}", seed=42, n_docs=docs, num_shards=8)
df = kg.linked_triples_dataset(kg.sentences_dataset(kg.read_pages(paths))).to_pandas()
rows = sorted(zip(df["subj_id"], df["pred"], df["obj_id"], df["url"], df["sent_idx"],
                  df["confidence"].round(6)))
h = hashlib.sha256(repr(rows).encode()).hexdigest()
print("HASH", h, len(rows))
ray.shutdown()
"""


def run(ncpu: int, docs: int) -> tuple[str, int]:
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}, str(ncpu), str(docs)],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    line = [l for l in out.splitlines() if l.startswith("HASH")][-1]
    _, h, n = line.split()
    return h, int(n)


if __name__ == "__main__":
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    h2, n2 = run(2, docs)
    h8, n8 = run(8, docs)
    same = h2 == h8
    print(f"num_cpus=2: {n2} triples {h2[:16]}…")
    print(f"num_cpus=8: {n8} triples {h8[:16]}…")
    print("IDENTICAL" if same else "MISMATCH")
    sys.exit(0 if same else 1)
