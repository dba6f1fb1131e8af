"""dist/engine.zip must be importable standalone — the spark-submit
--py-files contract (executors get only the zip on their path)."""

from __future__ import annotations

import subprocess
import sys


def test_engine_zip_is_self_contained(tmp_path):
    from scripts.make_dist import make_dist

    zip_path = make_dist(str(tmp_path / "engine.zip"))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import extraction, engine.stages, engine.pipeline, fixtures.gen_pages\n"
        "r = extraction.extract_document('u', b'<p>Long enough paragraph for the keep rule okay.</p>', 'en')\n"
        "assert r.status == 'ok' and r.n_kept == 1, r\n"
        "print('zip-ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, zip_path],
        capture_output=True, text=True, cwd=str(tmp_path),  # NOT the repo root
    )
    assert out.returncode == 0, out.stderr
    assert "zip-ok" in out.stdout
