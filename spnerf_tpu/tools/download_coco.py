"""COCO train2014 downloader with retry + resume.

Counterpart of reference datasets/COCO/download.py:1-36. Streams the
archive with per-chunk progress, retries on transient failures, resumes
partial downloads via HTTP Range, then unpacks into the
``DATA_PATH/COCO/images/<split>`` layout the COCO dataset reads.

    python -m spnerf_tpu.tools.download_coco [--split training]
"""

from __future__ import annotations

import argparse
import time
import zipfile
from pathlib import Path

from spnerf_tpu.settings import DATA_PATH

URLS = {
    "training": "http://images.cocodataset.org/zips/train2014.zip",
    "validation": "http://images.cocodataset.org/zips/val2014.zip",
    "test": "http://images.cocodataset.org/zips/test2014.zip",
}


def download(url: str, dest: Path, retries: int = 10, chunk: int = 1 << 20):
    import requests  # deferred: offline environments can still import the pkg

    dest.parent.mkdir(parents=True, exist_ok=True)
    for attempt in range(retries):
        try:
            start = dest.stat().st_size if dest.exists() else 0
            headers = {"Range": f"bytes={start}-"} if start else {}
            with requests.get(url, stream=True, timeout=60,
                              headers=headers) as r:
                if r.status_code == 416:  # already complete
                    return dest
                r.raise_for_status()
                mode = "ab" if start and r.status_code == 206 else "wb"
                with open(dest, mode) as f:
                    for data in r.iter_content(chunk_size=chunk):
                        f.write(data)
            return dest
        except Exception as e:  # noqa: BLE001
            wait = min(2**attempt, 60)
            print(f"download failed ({e}); retrying in {wait}s "
                  f"({attempt + 1}/{retries})")
            time.sleep(wait)
    raise RuntimeError(f"failed to download {url} after {retries} attempts")


def unpack(archive: Path, split: str):
    out_dir = Path(DATA_PATH, "COCO", "images", split)
    out_dir.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(archive) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            target = out_dir / Path(info.filename).name
            if target.exists():
                continue
            with zf.open(info) as src, open(target, "wb") as dst:
                dst.write(src.read())
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--split", default="training", choices=sorted(URLS))
    args = p.parse_args(argv)
    url = URLS[args.split]
    archive = Path(DATA_PATH, "COCO", Path(url).name)
    download(url, archive)
    out = unpack(archive, args.split)
    print(f"COCO {args.split} ready at {out}")


if __name__ == "__main__":
    main()
