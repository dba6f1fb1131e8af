"""Package the engine for spark-submit --py-files (north-star launch mode):

    python scripts/make_dist.py          # -> dist/engine.zip
    spark-submit --master <cluster> --py-files dist/engine.zip \
        --jars dist/minicat.jar,dist/mediadec.jar \
        engine/run_pipeline.py --pages ... --out ...

The zip carries the pure-Python packages (extraction/, engine/, fixtures/)
— everything executors need; no model artifacts exist (heuristic constants
are code, SURVEY.md §2.1 S10). The optional jars add the DSv2 MERGE
catalog and the JVM-native media decode UDFs (r4) — engine.session wires
them automatically when running from a checkout; under spark-submit pass
them via --jars as above.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGES = ("extraction", "engine", "fixtures")


def make_dist(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for pkg in PACKAGES:
            pkg_dir = os.path.join(REPO, pkg)
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    path = make_dist()
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")
