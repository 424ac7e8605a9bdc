"""Build dist/gds_spark.zip for spark-submit --py-files.

Zips the `graph_data_science_spark` package (source only, no caches) so a
bare cluster's executors and driver can import it without installation —
the north rule's deployment vehicle.
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "graph_data_science_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "gds_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    os.replace(tmp, out_path)  # atomic publish, same discipline as sources/atomic.py
    return out_path


if __name__ == "__main__":
    print(build())
