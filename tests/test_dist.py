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


def test_spark_submit_py_files_end_to_end(tmp_path, pages_unit_path):
    """The north-star launch mode, executed for real: spark-submit with
    --py-files dist/engine.zip and the catalog/mediadec jars, from a
    NEUTRAL working directory (imports must resolve from the zip), running
    the flagship CLI over the fixture corpus — output byte-identical to
    the committed goldens."""
    import json
    import os
    import shutil

    from scripts.make_dist import make_dist

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = make_dist(str(tmp_path / "engine.zip"))
    driver_py = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(repo, "engine", "run_pipeline.py"), driver_py)
    out_dir = str(tmp_path / "extracted")
    jars = ",".join(
        p
        for p in (
            os.path.join(repo, "dist", "minicat.jar"),
            os.path.join(repo, "dist", "mediadec.jar"),
        )
        if os.path.exists(p)
    )
    cmd = [
        "spark-submit",
        "--master", "local[4]",
        "--py-files", zip_path,
        *(["--jars", jars] if jars else []),
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        driver_py,
        "--pages", pages_unit_path,
        "--out", out_dir,
        "--master", "local[4]",
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(tmp_path), timeout=420,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["rows"] == 64

    import duckdb

    got = {
        u: t
        for u, t in duckdb.sql(
            f"SELECT url, extracted_text FROM read_parquet('{out_dir}/**/*.parquet')"
        ).fetchall()
    }
    goldens_path = os.path.join(repo, "fixtures", "goldens", "sf_unit.jsonl")
    want = {
        json.loads(ln)["url"]: json.loads(ln)["extracted_text"]
        for ln in open(goldens_path, encoding="utf-8")
    }
    assert got == want
