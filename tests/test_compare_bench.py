"""Unit tests for tools/compare_bench.py parsing — no Spark needed.

Pins the round-5 contract: the driver's ~2000-byte stdout tail must stay
parseable (summary object last on the line), payload keys must never be
mistaken for query timings, and failed queries must stay visible."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import compare_bench as cb  # noqa: E402


def _write(tmp_path, name, payload):
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


TAIL = (
    '"q_mid": 0.5, "q_big": 2.5, "q_fail": -1.0}, '
    '"summary": {"total_s": 3.0, "n_ok": 2, "n_failed": 1, '
    '"failed": ["q_fail"], "geomean_vs_prev": 1.01, '
    '"top5": {"q_big": 2.5, "q_mid": 0.5}}}'
)


def test_tail_load_drops_payload_keys_and_failures(tmp_path):
    path = _write(
        tmp_path,
        "tail.json",
        {"n": 5, "rc": 0, "cpus": 32, "sf": 0.1, "tail": TAIL, "parsed": None},
    )
    out = cb.load(path)
    assert out == {"q_mid": 0.5, "q_big": 2.5}
    # payload/summary scalar keys must never appear as fake queries
    assert not set(out) & cb._NON_QUERY_KEYS


def test_tail_summary_survives_truncation(tmp_path):
    path = _write(tmp_path, "tail.json", {"tail": TAIL})
    s = cb.load_summary(path)
    assert s == {
        "total_s": 3.0,
        "n_ok": 2,
        "n_failed": 1,
        "failed": ["q_fail"],
        "geomean_vs_prev": 1.01,
        "top5": {"q_big": 2.5, "q_mid": 0.5},
    }


def test_sidecar_load_and_summary(tmp_path):
    payload = {
        "metric": "suite_seconds",
        "value": 3.1,
        "queries": {"q_mid": 0.45, "q_big": 2.6, "q_fail": -1.0},
        "summary": {"total_s": 3.05, "n_ok": 2, "n_failed": 1, "failed": ["q_fail"]},
    }
    path = _write(tmp_path, "side.json", payload)
    assert cb.load(path)["q_big"] == 2.6
    assert cb.load_summary(path)["n_failed"] == 1


def test_bench_payload_roundtrip_matches_parser():
    """The bench.py emit order (summary LAST) is what load_summary's
    tail regex depends on — simulate a truncated driver record from a
    real payload dict and assert the summary still parses."""
    payload = {
        "metric": "suite_seconds",
        "value": 1.0,
        "queries": {"a": 0.4, "b": 0.6},
        "summary": {"total_s": 1.0, "n_ok": 2, "n_failed": 0, "failed": [], "top5": {"b": 0.6}},
    }
    line = json.dumps(payload)
    tail = line[-120:]  # driver keeps a suffix
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        json.dump({"tail": tail}, fh)
    s = cb.load_summary(fh.name)
    os.unlink(fh.name)
    assert s and s["total_s"] == 1.0 and s["n_failed"] == 0
