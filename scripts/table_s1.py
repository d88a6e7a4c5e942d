#!/usr/bin/env python
"""Table S1: the 12-architecture sweep summary (reference table-s1.py).

Reads the checkpoints written by ``train_r1_tune.py --all`` under
out/r1-tune/<id>/ and reports per-architecture training loss and rollout
health.  The reference's per-protocol MAE columns need the missing cell-5
current recordings; training losses on the identical cached surface are the
comparable quantity available in this mount."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Table S1: architecture sweep.").parse_args()
OUT = setup(args, "table-s1")

from ionflux.figures import latex_table  # noqa: E402
from ionflux.models.registry import ARCHITECTURES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

rows = {}
missing = []
for arch_id, (n_layers, n_nodes) in ARCHITECTURES.items():
    meta = os.path.join(REPO, "out", "r1-tune", arch_id,
                        "best-model-checkpoint-2.json")
    if not os.path.exists(meta):
        missing.append(arch_id)
        continue
    with open(meta) as fh:
        d = json.load(fh)
    train_loss, rollout = d["loss"]
    rows[arch_id] = [f"{n_layers}x{n_nodes}", float(train_loss),
                     float(rollout), d["epoch"]]

if missing:
    print(f"missing sweeps: {missing} — run scripts/train_r1_tune.py --all")
if rows:
    latex_table(
        os.path.join(OUT, "table-s1.txt"),
        ["arch", "train loss (sum SSE)", "rollout mean|I|", "best @ iter"],
        rows,
        caption="r1-tune architecture sweep on the reference's cached cell-5 "
                "surface (measured-current MAE columns need the absent "
                "recordings)",
    )
