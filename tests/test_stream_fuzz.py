"""Seeded smoke of tools/stream_fuzz.py — a small fixed slice of the
stream/batch parity battery so a regression in the streaming execution
path (state merge, watermark close, dedup first-seen) fails the suite;
the full 120-case battery runs in the round coverage sweep (COVERAGE.md).
"""

import os
import subprocess
import sys


def test_stream_fuzz_smoke():
    env = dict(os.environ, STREAM_FUZZ_SEED="9", STREAM_FUZZ_N="8")
    proc = subprocess.run(
        [sys.executable, "tools/stream_fuzz.py", "/root/testdata/sf0.001", "8"],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "STREAMFUZZ n=8 fails=0" in proc.stdout, (
        proc.stdout[-3000:] + proc.stderr[-2000:]
    )
