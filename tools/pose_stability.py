"""Arm-wise stability summary over the matched-corpus pose sweep.

Reads docs/evidence/pose_auc_r5.jsonl (one row per checkpoint, written
by `demo/run_demo.sh pose`; last row per checkpoint tag wins), groups
rows by training arm (the checkpoint-name prefix: demo_sp_nerf /
demo_sp_ctl / baseline), and reports per-arm mean / std / min / max of
pose AUC across the checkpoint sweep — the round-4 stability protocol
(NeRF-supervision std vs homography std on AUC@10) repeated at matched
corpus size. The SIFT calibration row is passed through untouched.

Prints one JSON line per arm and rewrites the "## Stability summary"
section of docs/evidence/demo_r5_results.md.

Usage: python tools/pose_stability.py
"""

import json
import math
import re
from pathlib import Path

SRC = Path("docs/evidence/pose_auc_r5.jsonl")
DOC = Path("docs/evidence/demo_r5_results.md")
KEYS = ("auc5", "auc10", "auc20")


def arm_of(tag: str) -> str:
    return tag.split("/", 1)[0]


def stats(vals):
    n = len(vals)
    mean = sum(vals) / n
    std = math.sqrt(sum((v - mean) ** 2 for v in vals) / n) if n > 1 else 0.0
    return {"n": n, "mean": round(mean, 3), "std": round(std, 3),
            "min": round(min(vals), 3), "max": round(max(vals), 3)}


def main():
    if not SRC.exists():
        print(f"{SRC} not captured yet; nothing to summarize")
        return
    rows = {}
    with open(SRC) as f:
        for line in f:
            r = json.loads(line)
            rows[r.get("pretrained") or "?"] = r

    arms = {}
    for tag, r in rows.items():
        arms.setdefault(arm_of(tag), []).append(r)

    out_rows, md = [], []
    for arm in sorted(arms):
        group = arms[arm]
        row = {"metric": "pose_stability", "arm": arm,
               "checkpoints": len(group)}
        for k in KEYS:
            row[k] = stats([g[k] for g in group])
        out_rows.append(row)
        a10 = row["auc10"]
        md.append(f"| {arm} | {row['checkpoints']} | {a10['mean']:.2f} | "
                  f"{a10['std']:.2f} | {a10['min']:.2f} | {a10['max']:.2f} |")
        print(json.dumps(row))

    if DOC.exists():
        table = ("\n| arm | ckpts | AUC@10 mean | std | min | max |\n"
                 "|---|---|---|---|---|---|\n" + "\n".join(md) + "\n")
        text = DOC.read_text()
        marker = "## Stability summary"
        m = re.search(rf"({re.escape(marker)}[^\n]*\n)(.*?)(?=\n## |\Z)",
                      text, flags=re.S)
        if m:
            head = m.group(1)
            # keep any prose before the first table, replace from there
            body = m.group(2)
            prose = body.split("\n|", 1)[0].rstrip()
            text = (text[: m.start()] + head + prose + "\n" + table
                    + text[m.end():])
            DOC.write_text(text)
            print(f"# wrote stability table into {DOC}")


if __name__ == "__main__":
    main()
