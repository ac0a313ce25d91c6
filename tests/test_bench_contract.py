"""The driver consumes bench.py's single JSON line — pin its contract
(a bench.py edit that breaks JSON emission or drops a field would
otherwise surface only in the driver's per-round BENCH_r{N} capture,
after the fact)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    # ONE subprocess covers both halves of the contract (JSON shape
    # AND the stderr warnings): each run pays full JVM bring-up, so a
    # second invocation doubles the wall-clock for nothing (review)
    env = dict(
        os.environ, BENCH_DOCS="64",
        BENCH_QUERIES=(
            "extract_e2e,lang_id,doc_fingerprint,winnow_pair_eval,typo_x"
        ),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, out.stdout[-2000:]
    d = json.loads(lines[0])
    assert d["metric"] == "headline_queries_total_seconds"
    assert d["unit"] == "sec" and d["value"] > 0
    # the unknown and deliberately-untimed names are EXCLUDED from the
    # JSON and warned about on stderr (never stdout)
    assert set(d["queries"]) == {"extract_e2e", "lang_id",
                                 "doc_fingerprint"}
    assert "typo_x" in out.stderr and "winnow_pair_eval" in out.stderr
    # every timed query carries rows and a shuffle-write delta
    assert set(d["rows"]) == set(d["queries"])
    assert set(d["shuffle_write_mb"]) == set(d["queries"])
    assert all(v >= 0 for v in d["shuffle_write_mb"].values())
    assert d["rows"]["lang_id"] > 0
    assert d["docs_per_sec"] > 0 and d["n_docs"] == 64
    # doc_fingerprint's zero-shuffle contract, visible in telemetry
    assert d["shuffle_write_mb"]["doc_fingerprint"] == 0.0
