"""Global path roots.

The reference generates ``superpoint/settings.py`` at install time via
``setup.sh`` (reference setup.sh:1-8) defining DATA_PATH / CKPT_PATH /
EXPER_PATH, imported by every layer. We keep the same three roots but
source them from environment variables with sane defaults so the
framework works out of the box and in CI.
"""

import os
from pathlib import Path

_ROOT = Path(os.environ.get("SPNERF_ROOT", Path.home() / "spnerf_runs"))

DATA_PATH = Path(os.environ.get("SPNERF_DATA_PATH", _ROOT / "data"))
CKPT_PATH = Path(os.environ.get("SPNERF_CKPT_PATH", _ROOT / "ckpts"))
EXPER_PATH = Path(os.environ.get("SPNERF_EXPER_PATH", _ROOT / "outputs"))
