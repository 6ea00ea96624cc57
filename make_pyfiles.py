"""Build the spark-submit artifact: dist/tbdedup_spark.zip + dist/main.py.

The zip contains the package exactly as importable from executors via
--py-files; main.py is the thin driver that spark-submit runs.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    zip_path = os.path.join(dist, "tbdedup_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "tbdedup_spark")
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    with open(os.path.join(dist, "main.py"), "w") as f:
        f.write(
            "from tbdedup_spark.cli import main\n"
            "import sys\n"
            "sys.exit(main())\n"
        )
    print(f"built {zip_path}")


if __name__ == "__main__":
    main()
