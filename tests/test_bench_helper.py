"""bench.py's section runner must preserve partial evidence on timeout
(round-2 verdict, weak item 4: a SIGALRM must never erase the
streaming numbers from a driver artifact)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import run_section


def test_timeout_preserves_partial_evidence():
    def fn(out):
        out["p50_ms"] = 1.23          # completed rep lands immediately
        out["reps"] = 1
        time.sleep(5)                 # then the section blows its budget
        out["reps"] = 99              # never reached

    t0 = time.time()
    res = run_section(1, fn)
    assert time.time() - t0 < 4
    assert res["p50_ms"] == 1.23
    assert res["reps"] == 1
    assert res["timed_out"] is True


def test_no_timeout_passes_through():
    def fn(out):
        out["value"] = 7

    res = run_section(30, fn)
    assert res == {"value": 7}


def test_nothing_completed_still_reports_timeout():
    def fn(out):
        time.sleep(5)

    assert run_section(1, fn) == {"timed_out": True}
