"""Stop-on-failure smoke runner — the engine's analog of the reference's
``run_smoke_tests.py`` (STEP A preflight, STEP B per-operator, STEP C
end-to-end; per-step timeouts, stop at first failure,
``run_smoke_tests.py:35-220``).

    python scripts/run_smoke_tests.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS: list[tuple[str, list[str], int]] = []


def step(name: str, code: str, timeout: int) -> tuple[str, list[str], int]:
    return (name, [sys.executable, "-c", code], timeout)


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="smoke_")
    steps = [
        step("A: preflight", "import subprocess,sys;"
             f"sys.exit(subprocess.call([sys.executable,'{REPO}/scripts/preflight.py']))", 120),
        step("B.1: decode", """
from extraction import decode_html
assert decode_html('<p>caf\\xe9</p>'.encode('latin-1'))
assert decode_html(b'\\xff\\xfe') is not None
print('decode ok')
""", 30),
        step("B.2: segmentation", """
from extraction import segment_blocks
b = segment_blocks('<p>This paragraph is long enough to pass the minimum filter.</p>')
assert len(b) == 1 and b[0].kept, b
print('segmentation ok:', len(b), 'block(s)')
""", 30),
        step("B.3: normalization", """
from extraction import normalize_text
assert normalize_text('  a  b ', 'ltr') == 'a b'
out = normalize_text('\\u0633\\u0633\\u0633 xyz', 'rtl')
assert 'xyz' not in out and out
print('normalization ok')
""", 30),
        step("B.4: single-doc extract", """
from extraction import extract_document
r = extract_document('u', b'<nav><a href=x>n</a></nav><p>Long enough paragraph for the keep rule here.</p>', 'en')
assert r.status == 'ok' and r.n_kept == 1, r
print('extract ok:', repr(r.extracted_text[:40]))
""", 30),
        step("C: spark end-to-end + golden compare", f"""
import json, sys
sys.path.insert(0, {REPO!r})
from fixtures.gen_pages import gen_rows, write_parquet, compute_goldens
from engine.session import get_spark
from engine.pipeline import run_extract
rows = gen_rows(32, seed=42)
write_parquet(rows, {tmp!r} + '/pages.parquet')
goldens = {{g['url']: g['extracted_text'] for g in compute_goldens(rows)}}
spark = get_spark(app_name='smoke', master='local[4]')
got = {{r['url']: r['extracted_text'] for r in
       run_extract(spark.read.parquet({tmp!r} + '/pages.parquet'), num_parts=3).collect()}}
assert got == goldens, 'golden mismatch'
print('e2e ok:', len(got), 'docs byte-identical')
spark.stop()
""", 300),
        step("D: resume + merge idempotence", f"""
import sys
sys.path.insert(0, {REPO!r})
from fixtures.gen_pages import gen_rows, write_parquet
from engine.session import get_spark
from engine import pipeline, tableio
write_parquet(gen_rows(32, seed=1), {tmp!r} + '/p2.parquet')
spark = get_spark(app_name='smoke2', master='local[4]')
pages = spark.read.parquet({tmp!r} + '/p2.parquet')
out = {tmp!r} + '/extracted'
half = pages.filter('xxhash64(url) % 2 = 0')
tableio.merge_by_url(spark, out, pipeline.run_extract(half, run_id='a'))
todo = tableio.remaining(pages, out)
tableio.merge_by_url(spark, out, pipeline.run_extract(todo, run_id='b'))
final = spark.read.parquet(out)
assert final.count() == 32
assert final.groupBy('url').count().filter('count>1').count() == 0
print('resume ok: 32 rows, no dupes')
spark.stop()
""", 300),
    ]

    for name, cmd, timeout in steps:
        t0 = time.time()
        print(f"--- {name} (timeout {timeout}s)")
        try:
            proc = subprocess.run(
                cmd, timeout=timeout, cwd=REPO, capture_output=True, text=True
            )
        except subprocess.TimeoutExpired:
            print(f"FAILED: timeout after {timeout}s")
            sys.exit(1)
        tail = (proc.stdout or "").strip().splitlines()[-3:]
        for line in tail:
            print("   ", line)
        if proc.returncode != 0:
            print((proc.stderr or "").strip().splitlines()[-10:])
            print(f"FAILED: {name} (exit {proc.returncode}) — stopping")
            sys.exit(1)
        print(f"   PASSED in {time.time() - t0:.1f}s")

    print("\nALL SMOKE TESTS PASSED")


if __name__ == "__main__":
    main()
