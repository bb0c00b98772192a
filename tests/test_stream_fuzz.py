"""Seeded smoke of tools/stream_fuzz.py — a small fixed slice of the
stream/batch parity battery so a regression in the streaming execution
path (state merge, watermark close, dedup first-seen, late-row filter)
fails the suite; the full 120+100-case battery runs in the round
coverage sweep (COVERAGE.md).
"""

import os
import re
import subprocess
import sys


def test_stream_fuzz_smoke():
    env = dict(
        os.environ,
        STREAM_FUZZ_SEED="9",
        STREAM_FUZZ_N="8",
        STREAM_FUZZ_LATE_N="6",
        STREAM_FUZZ_LATE_SESS_N="4",
    )
    proc = subprocess.run(
        [sys.executable, "tools/stream_fuzz.py", "/root/testdata/sf0.001", "8"],
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "STREAMFUZZ n=8 fails=0" in proc.stdout, (
        proc.stdout[-3000:] + proc.stderr[-2000:]
    )
    m = re.search(r"LATEFUZZ n=6 fails=(\d+) pairs_dropped=(\d+)", proc.stdout)
    assert m and m.group(1) == "0", proc.stdout[-3000:] + proc.stderr[-2000:]
    # the late slice must actually exercise lateness: at least one
    # (row, window) pair dropped by the watermark across the 6 cases
    assert int(m.group(2)) > 0, proc.stdout[-3000:]
    # session late mode (r11): parity through the merge-then-evict state
    # machine; drop counts accumulate over the full battery, so the smoke
    # only pins fails=0 here (lateness exercise is pinned by the battery's
    # LATESESSFUZZ rows_dropped in COVERAGE.md)
    s = re.search(r"LATESESSFUZZ n=4 fails=(\d+)", proc.stdout)
    assert s and s.group(1) == "0", proc.stdout[-3000:] + proc.stderr[-2000:]
