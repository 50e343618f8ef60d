"""Sync the "Perf captures this round" table in demo_r5_results.md from
the capture files the orchestrator writes, so committed evidence and the
human-readable doc cannot drift (same contract as fill_pose_table.py).

Usage: python tools/fill_perf_table.py
"""

import json
import re
from pathlib import Path

EV = Path("docs/evidence")
DOC = EV / "demo_r5_results.md"


def last_json_line(path: Path):
    """Last parseable JSON object in a file (captures may append)."""
    if not path.exists():
        return None
    out = None
    for line in path.read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                pass
    return out


def bench_cell():
    r = last_json_line(EV / "bench_r5_capture.json")
    if not r or "value" not in r:
        return None
    return (f"**{r['value']:,.0f} fps** ({r.get('mode', '?')}, "
            f"fused_mid={r.get('fused_mid')}, fused_tail={r.get('fused_tail')})")


def train_cells():
    path = EV / "bench_train_r5.jsonl"
    cells = {}
    if not path.exists():
        return cells
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        m = r.get("metric", "")
        if "value" in r:
            cells[m] = f"**{r['value']:.2f} steps/s**"
    return cells


def ha_cells():
    path = EV / "ha_r5_report.jsonl"
    rates, ious = {}, {}
    if not path.exists():
        return None
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        label = r.get("label", "?")
        if r.get("metric") == "ha_export_imgs_per_sec" and "value" in r:
            rates[label] = r["value"]
        if r.get("metric") == "ha_label_agreement" and "exact_iou" in r:
            ious[label] = r["exact_iou"]
    if not rates:
        return None
    parts = [f"{k} {v:.1f}" for k, v in rates.items()]
    cell = "**" + " / ".join(parts) + " img/s**"
    if ious:
        # deterministic-key measurements supersede the batch-confounded
        # ones (round 4: per-image warp keys depended on batch size
        # before tasks/export.py's fold_in fix) — show only the valid
        # protocol when present; the JSONL keeps the full history
        det = {k: v for k, v in ious.items() if "deterministic" in k}
        show = det or ious
        cell += "; exact-IoU vs bf16: " + ", ".join(
            f"{k.split('_vs_')[-1].replace('_deterministic_keys', '')} "
            f"{v:.2f}" for k, v in show.items())
    return cell


def nerf_cell():
    r = last_json_line(EV / "bench_nerf_r5.json")
    if not r or "value" not in r:
        return None
    v = r["value"]
    if r.get("unit", "").startswith("rays"):
        mode = r.get("mode", "")
        tail = mode.split(":")[-1] if ":" in mode else mode
        extra = (f" ({tail}, block={r['block']}/s_chunk={r['s_chunk']})"
                 if "block" in r else f" ({tail})" if tail else "")
        return f"**{v / 1e6:.1f}M rays/s**{extra}"
    return f"**{v:,.0f} {r.get('unit', '')}**"


def replace_cell(doc: str, row_key: str, cell: str) -> str:
    """Replace the 'round 5 column (3rd cell) of the row whose first
    cell contains row_key."""
    lines = doc.splitlines()
    for i, line in enumerate(lines):
        if not line.startswith("|") or row_key not in line.split("|")[1]:
            continue
        cols = line.split("|")
        # cols: ['', metric, round3, round4, target, capture, '']
        cols[3] = f" {cell} "
        lines[i] = "|".join(cols)
        return "\n".join(lines) + ("\n" if doc.endswith("\n") else "")
    raise SystemExit(f"row not found for key: {row_key}")


def main():
    doc = DOC.read_text()
    updates = []
    b = bench_cell()
    if b:
        doc = replace_cell(doc, "SuperPoint inference", b)
        updates.append("bench")
    tc = train_cells()
    for metric, cell in tc.items():
        if "magicpoint" in metric.lower():
            doc = replace_cell(doc, "Train step MagicPoint", cell)
            updates.append(metric)
        elif "superpoint" in metric.lower():
            doc = replace_cell(doc, "Train step SuperPoint", cell)
            updates.append(metric)
    h = ha_cells()
    if h:
        doc = replace_cell(doc, "HA pseudo-label export", h)
        updates.append("ha")
    n = nerf_cell()
    if n:
        doc = replace_cell(doc, "NeRF renderer", n)
        updates.append("nerf")
    DOC.write_text(doc)
    print(f"updated: {updates or 'nothing (no captures yet)'}")


if __name__ == "__main__":
    main()
