"""Results persistence: CSV rows in the reference's schema.

flat/perlevel/perlabel rows: ``seed,model,hierarchy,f1-macro,accuracy``
(results.csv; appended at e.g. flat_amazon.py:144-147). MLP rows add
``dataset,category`` (MLP_flat.py:33). A JSONL mirror is written next to
the CSV for structured consumers.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Optional


def append_result(
    result_file: str,
    seed: int,
    model: str,
    hierarchy: str,
    f1_macro: float,
    accuracy: float,
    dataset: Optional[str] = None,
    category: Optional[str] = None,
):
    row = {"seed": seed, "model": model, "hierarchy": hierarchy}
    if dataset is not None:
        row["dataset"] = dataset
    if category is not None:
        row["category"] = category
    row.update({"f1-macro": f1_macro, "accuracy": accuracy})

    exists = os.path.isfile(result_file)
    with open(result_file, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row))
        if not exists:
            w.writeheader()
        w.writerow(row)
    with open(result_file + ".jsonl", "a") as f:
        f.write(json.dumps({**row, "ts": time.time()}) + "\n")
