"""The export job (jobs/export_dataset.py) writes a complete train/test
dataset + descriptor from the event stream — the `metarank export`
workflow (main/command/Export.scala:28-77) end to end."""

from __future__ import annotations

import json
import os


def test_export_dataset_libsvm(spark, tmp_path):
    from jobs.export_dataset import main

    out = str(tmp_path / "ds")
    main([
        "--synthetic-users", "200", "--output", out,
        "--format", "libsvm", "--split", "hold_last",
    ])
    desc = json.load(open(os.path.join(out, "dataset.json")))
    assert desc["features"] == ["clicks", "cnt7", "ctr"]
    assert desc["dense_width"] == 4
    assert desc["rows"]["train"] + desc["rows"]["test"] == 200 * 2 * 12
    # hold_last holds WHOLE rankings: 200 users × 12 items go to test
    assert desc["rows"]["test"] == 200 * 12
    lines, part_qids = [], {}
    for d in ("train", "test"):
        part_qids[d] = set()
        for f in os.listdir(os.path.join(out, d)):
            if f.startswith("part"):
                rows = open(os.path.join(out, d, f)).read().splitlines()
                lines += rows
                part_qids[d] |= {r.split(" ")[1] for r in rows}
    assert len(lines) == 200 * 2 * 12
    # no qid group may straddle train and test (leakage + invalid LTR
    # eval groups — reference HoldLastStrategy holds whole clickthroughs)
    assert not (part_qids["train"] & part_qids["test"])
    # every line: label qid:<int> then idx:val pairs with 1-based indices
    lab, qid, *pairs = lines[0].split(" ")
    assert float(lab) in (0.0, 1.0) and qid.startswith("qid:")
    pairs = [p for p in pairs if p]  # all-zero rows leave no idx:val pairs
    assert all(":" in p and 1 <= int(p.split(":")[0]) <= 4 for p in pairs)


def test_export_model_selector(spark, tmp_path):
    """--model routes the export through that model's selector
    (config/Selector.scala, the TrainBuffer per-model accept): only the
    selected clickthroughs' rankings land in the dataset, whole rankings
    at a time."""
    from jobs.export_dataset import main
    from metarank_spark.datagen import synthetic_ranklens
    from metarank_spark.operators.clickthrough import clickthroughs
    from metarank_spark.selectors import Sample, select_clickthroughs

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "features:\n"
        "  - name: clicks\n"
        "    type: interaction_count\n"
        "    interaction: click\n"
        "    scope: item\n"
        "models:\n"
        "  half:\n"
        "    type: lambdamart\n"
        "    selector:\n"
        "      ratio: 0.5\n"
    )
    out = str(tmp_path / "dsm")
    main([
        "--synthetic-users", "120", "--output", out, "--format", "parquet",
        "--config", str(cfg), "--model", "half", "--split", "hold_last",
    ])
    desc = json.load(open(os.path.join(out, "dataset.json")))
    assert desc["model"] == "half" and "Sample" in desc["selector"]
    total = desc["rows"]["train"] + desc["rows"]["test"]
    # the selector genuinely prunes, whole 12-item rankings at a time,
    # and matches the selector applied by hand (datagen is deterministic)
    assert 0 < total < 120 * 2 * 12 and total % 12 == 0
    accepted = select_clickthroughs(
        clickthroughs(synthetic_ranklens(spark, users=120)), Sample(0.5)
    ).count()
    assert total == accepted * 12
