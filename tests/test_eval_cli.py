"""On-the-fly eval CLI helpers (spnerf_tpu/eval/on_the_fly.py)."""

import numpy as np

from spnerf_tpu.eval.on_the_fly import bootstrap_ci


def test_bootstrap_ci_contains_mean_and_shrinks():
    rng = np.random.default_rng(0)
    small = rng.uniform(0.4, 0.8, 30)
    large = rng.uniform(0.4, 0.8, 3000)
    lo_s, hi_s = bootstrap_ci(small)
    lo_l, hi_l = bootstrap_ci(large)
    assert lo_s <= small.mean() <= hi_s
    assert lo_l <= large.mean() <= hi_l
    assert (hi_l - lo_l) < (hi_s - lo_s)


def test_bootstrap_ci_degenerate():
    lo, hi = bootstrap_ci([0.5])
    assert np.isnan(lo) and np.isnan(hi)
    lo, hi = bootstrap_ci([0.5, 0.5, 0.5])
    assert lo == hi == 0.5


def test_json_out_appends_tagged_record(tmp_path, monkeypatch):
    import json

    import spnerf_tpu.eval.on_the_fly as otf

    cfg = tmp_path / "c.yaml"
    cfg.write_text("pretrained: 'x/x_1.ckpt'\n")
    monkeypatch.setattr(otf, "run_repeatability",
                        lambda config, k, d: {"repeatability": 0.5,
                                              "repeatability_ci95": [0.4, 0.6],
                                              "pairs": 3})
    out = tmp_path / "q.jsonl"
    for _ in range(2):  # appends, never truncates
        otf.main(["--config-path", str(cfg), "--mode", "repeatability",
                  "--json-out", str(out)])
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(recs) == 2
    assert recs[0]["mode"] == "repeatability"
    assert recs[0]["pretrained"] == "x/x_1.ckpt"
    assert recs[0]["repeatability"] == 0.5


def test_fill_quality_table_rewrites_r5_rows(tmp_path, monkeypatch):
    import json

    import tools.fill_quality_table as fq

    doc = tmp_path / "d.md"
    doc.write_text(
        "| round | repeatability | h-correctness | matching score |\n"
        "|---|---|---|---|\n"
        "| r4 (a) | 0.5 | 0.6 | 0.4 |\n"
        "| r5 (stale) | 0.0 | 0.0 | 0.0 |\n")
    src = tmp_path / "q.jsonl"
    src.write_text(
        json.dumps({"mode": "repeatability", "pretrained": "d/d_9.ckpt",
                    "repeatability": 0.61,
                    "repeatability_ci95": [0.6, 0.62]}) + "\n" +
        json.dumps({"mode": "descriptors", "pretrained": "d/d_9.ckpt",
                    "correctness": 0.7, "correctness_ci95": [0.65, 0.75],
                    "matching_score": 0.5,
                    "matching_score_ci95": [0.45, 0.55]}) + "\n")
    monkeypatch.setattr(fq, "DOC", doc)
    monkeypatch.setattr(fq, "SRC", src)
    fq.main()
    text = doc.read_text()
    assert "r5 (stale)" not in text
    assert "| r5 (d_9) | 0.610 [0.600, 0.620] | 0.700 [0.650, 0.750] | " \
           "0.500 [0.450, 0.550] |" in text
    assert text.index("r4 (a)") < text.index("r5 (d_9)")
