"""Build graphscope_spark.zip for ``spark-submit --py-files``.

Usage: python tools/make_pyfiles_zip.py [OUT.zip]   (default ./graphscope_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "graphscope_spark.zip"
    pkg = REPO / "graphscope_spark"
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = Path(root) / fn
                    zf.write(full, full.relative_to(REPO))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
