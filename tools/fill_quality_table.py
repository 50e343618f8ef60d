"""Sync the "Quality movement" table in demo_r5_results.md from
docs/evidence/quality_r5.jsonl (written by eval/on_the_fly --json-out).

Pairs up the newest repeatability and descriptors records per
checkpoint and rewrites the r5 rows (the r4 row is a fixed historical
anchor). Same keep-doc-and-evidence-in-sync contract as
fill_pose_table.py / fill_perf_table.py.

Usage: python tools/fill_quality_table.py
"""

import json
import re
from pathlib import Path

DOC = Path("docs/evidence/demo_r5_results.md")
SRC = Path("docs/evidence/quality_r5.jsonl")


def fmt(rec, key):
    v = rec.get(key)
    if v is None:
        return "—"
    ci = rec.get(f"{key}_ci95")
    if ci:
        return f"{v:.3f} [{ci[0]:.3f}, {ci[1]:.3f}]"
    return f"{v:.3f}"


def main():
    if not SRC.exists():
        print("no quality captures yet")
        return
    by_ckpt = {}
    for line in SRC.read_text().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        r = json.loads(line)
        tag = r.get("pretrained") or "?"
        by_ckpt.setdefault(tag, {})[r.get("mode")] = r

    rows = []
    for tag, recs in by_ckpt.items():
        rep = recs.get("repeatability", {})
        des = recs.get("descriptors", {})
        name = tag.rsplit("/", 1)[-1].replace(".ckpt", "")
        rows.append(
            f"| r5 ({name}) | {fmt(rep, 'repeatability')} | "
            f"{fmt(des, 'correctness')} | {fmt(des, 'matching_score')} |")
    if not rows:
        print("no parseable quality rows")
        return

    doc = DOC.read_text()
    lines = doc.splitlines()
    out, inserted = [], False
    for line in lines:
        if line.startswith("| r5 ("):
            if not inserted:
                out.extend(rows)
                inserted = True
            continue  # drop stale r4 rows
        out.append(line)
        if line.startswith("| r4 (") and not inserted:
            # insert right after the anchor row if no r4 rows existed
            out.extend(rows)
            inserted = True
    DOC.write_text("\n".join(out) + ("\n" if doc.endswith("\n") else ""))
    print(f"wrote {len(rows)} r5 quality rows")


if __name__ == "__main__":
    main()
