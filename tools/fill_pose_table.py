"""Render docs/evidence/pose_auc_r5.jsonl as the markdown table in
docs/evidence/demo_r5_results.md (keeps committed evidence and the
human-readable doc in sync; last row per checkpoint tag wins).

Usage: python tools/fill_pose_table.py
"""

import json
import re
from pathlib import Path

DOC = Path("docs/evidence/demo_r5_results.md")
SRC = Path("docs/evidence/pose_auc_r5.jsonl")


def fmt(row, key):
    v = row[key]
    ci = row.get("ci95", {}).get(key)
    if ci:
        return f"{v:.2f} [{ci[0]:.2f}, {ci[1]:.2f}]"
    return f"{v:.2f}"


def main():
    if not SRC.exists():
        print(f"{SRC} not captured yet; nothing to fill")
        return
    rows = {}
    with open(SRC) as f:
        for line in f:
            r = json.loads(line)
            rows[r.get("pretrained") or "?"] = r

    lines = ["| checkpoint | AUC@5 | AUC@10 | AUC@20 | precision | "
             "matching score | pairs |",
             "|---|---|---|---|---|---|---|"]
    for tag, r in rows.items():
        lines.append(
            f"| `{tag}` | {fmt(r, 'auc5')} | {fmt(r, 'auc10')} | "
            f"{fmt(r, 'auc20')} | {fmt(r, 'precision')} | "
            f"{fmt(r, 'matching_score')} | {r.get('num_pairs', '?')} |")
    table = "\n".join(lines)

    doc = DOC.read_text()
    # replace the pose table block (header through last table row)
    pat = re.compile(
        r"\| checkpoint \| AUC@5 \|.*?(?=\n\n|\n#|\Z)", re.S)
    assert pat.search(doc), "pose table block not found"
    DOC.write_text(pat.sub(table, doc, count=1))
    print(f"wrote {len(rows)} rows into {DOC}")


if __name__ == "__main__":
    main()
