"""End-to-end LLM prep pipeline smoke: raw documents through quality gate,
PII redaction, exact + near dedup, deterministic split, sharded write."""

from __future__ import annotations

import json
import subprocess
import sys


def test_run_llm_prep_end_to_end(tmp_path):
    out = str(tmp_path / "prep")
    res = subprocess.run(
        [sys.executable, "/root/repo/scripts/run_llm_prep.py",
         "/root/testdata/sf0.001", out],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    # monotone funnel: each stage keeps a subset
    assert (
        report["raw_docs"]
        >= report["after_quality_gate"]
        >= report["after_exact_dedup"]
        >= report["after_near_dedup"]
        > 0
    )
    # split partitions sum to the final corpus
    assert sum(report["splits"].values()) == report["after_near_dedup"]
    # deterministic rerun: identical counts (hash split + min-id reps)
    res2 = subprocess.run(
        [sys.executable, "/root/repo/scripts/run_llm_prep.py",
         "/root/testdata/sf0.001", out + "2"],
        capture_output=True, text=True, timeout=600,
    )
    assert res2.returncode == 0, res2.stderr[-2000:]
    report2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert report2["splits"] == report["splits"]
