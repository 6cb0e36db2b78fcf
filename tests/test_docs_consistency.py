"""Docs-vs-artifact consistency (VERDICT r2 item 1c): the committed
BASELINE.md measured-results section must be exactly what
bench/make_baseline_table.py renders from the committed results.json, and
the roofline annotations in results.json must match the current models --
so a kernel/bench/model change that isn't propagated fails CI instead of
shipping a stale record for the third round running."""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "bench"))


def _results():
    with open(os.path.join(ROOT, "bench", "results.json")) as f:
        return json.load(f)


def test_baseline_md_matches_results_json():
    from make_baseline_table import BEGIN, END, render

    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        doc = f.read()
    assert BEGIN in doc and END in doc, "BASELINE.md lost its generated-section markers"
    committed = doc.split(BEGIN, 1)[1].split(END, 1)[0]
    generated = render(_results()).split(BEGIN, 1)[1].split(END, 1)[0]
    assert committed == generated, (
        "BASELINE.md is stale: re-run `python bench/make_baseline_table.py --write` "
        "after regenerating bench/results.json"
    )


def test_roofline_annotations_match_models():
    """pct_of_roof stored in results.json == recomputing from the current
    profiling models (catches model edits that skip re-annotation)."""
    from all_configs import annotate_rooflines

    res = _results()
    fresh = annotate_rooflines(json.loads(json.dumps(res)))
    for row, v in res.items():
        for field, val in v.items():
            if field.startswith(("pct_of_roof", "roof_sps")):
                assert abs(fresh[row][field] - val) <= max(1e-6 * abs(val), 0.05), (
                    row, field, val, fresh[row][field],
                    "stale annotation: run `python bench/all_configs.py --annotate`",
                )


def test_bench_record_matches_head_tree():
    """Artifact<->code staleness (VERDICT r3 weak-1): results.json carries a
    content-hash stamp of every perf-determining file at bench time; if any
    of those files changed since, the record is stale and this fails --
    re-run `python bench/all_configs.py` (or the affected rows) and
    `python bench/make_baseline_table.py --write`."""
    from all_configs import tree_stamp

    stamp = _results().get("_benched_tree")
    assert stamp, (
        "results.json lacks the _benched_tree stamp: regenerate it with "
        "`python bench/all_configs.py`"
    )
    current = tree_stamp()
    stale = sorted(
        p for p in set(stamp) | set(current) if stamp.get(p) != current.get(p)
    )
    assert not stale, (
        f"bench record is stale: {stale} changed since the last bench run; "
        "re-run the affected rows of bench/all_configs.py"
    )


def test_every_config_meets_north_star():
    """The BASELINE.json targets hold on the committed artifact: every
    reference-comparable row >=60 dB and >100x single-core C++."""
    res = _results()
    for row, v in res.items():
        if v.get("speedup_vs_cpp"):
            assert v["speedup_vs_cpp"] > 100, (row, v["speedup_vs_cpp"])
        snr = v.get("snr_db")
        if snr is not None and row != "geq":  # geq fast-linear is by-design
            assert snr >= 60.0, (row, snr)
    assert res["geq"].get("quant_kernel_exact") is True
    assert res["nlms_pallas"].get("kernel_exact_vs_oracle") is True
    assert res["bnlms_pallas"].get("kernel_exact_vs_oracle") is True
