"""Build dist/h3_rs_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main():
    out = ROOT / "dist" / "h3_rs_spark.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((ROOT / "h3_rs_spark").rglob("*.py")):
            zf.write(py, py.relative_to(ROOT))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
