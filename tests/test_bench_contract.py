"""bench.py driver-contract tests (VERDICT r3 "what's weak" #1).

Round 3 printed the record JSON only after every section and lost ALL
numbers to one slow compile. The contract now is: headline JSON prints
first (a guaranteed floor), every secondary section is budget-guarded and
re-prints the cumulative record, and the script exits 0 before the
driver's ~30-min kill. These tests exercise the Record/section machinery
directly — no 1.3B compile — plus a parse check on the emitted line.
"""

import importlib
import json
import sys
import time


def _fresh_bench(monkeypatch, budget):
    monkeypatch.setenv("OMNIMAMBA_BENCH_BUDGET_S", str(budget))
    sys.modules.pop("bench", None)
    import bench

    importlib.reload(bench)
    return bench


def test_headline_emits_parseable_json_with_extras(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch, 1500)
    bench.REC.value = 10.5
    bench.REC.emit()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "t2i_images_per_sec_per_chip_256px"
    assert rec["value"] == 10.5
    assert rec["vs_baseline"] == 2.1
    assert set(rec["extra"]) == {
        "t2i_cfg_images_per_sec",
        "t2i_int8_images_per_sec",
        "mmu_tok_per_sec_b48_int8",
        "mmu_tok_per_sec_best",
        "mmu_tok_per_sec_b1_int8",
        "mmu_tok_per_sec_b1_int8_merged",
        "train_step_ms_b8",
        "train_mfu_pct",
        "mixed_step_ms",
        "mixed_mfu_pct",
        "continuous_stream_tok_per_sec",
        "continuous_stream_p50_ms",
    }
    # unmeasured sections stay null, never crash the emit
    assert rec["extra"]["train_step_ms_b8"] is None


def test_section_skips_when_budget_exhausted(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch, 1500)
    bench.REC.value = 1.0
    ran = []

    # plenty of budget: runs, and re-emits the cumulative record
    @bench.section("cheap", est_cold_s=1)
    def _a():
        ran.append("cheap")
        bench.REC.extra["t2i_int8_images_per_sec"] = 2.0

    # worst-case cost exceeds what's left: must be skipped
    @bench.section("huge", est_cold_s=10**9)
    def _b():
        ran.append("huge")

    assert ran == ["cheap"]
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["extra"]["t2i_int8_images_per_sec"] == 2.0


def test_section_failure_never_kills_the_record(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch, 1500)
    bench.REC.value = 3.0

    @bench.section("boom", est_cold_s=1)
    def _b():
        raise RuntimeError("section exploded")

    @bench.section("after", est_cold_s=1)
    def _c():
        bench.REC.extra["mmu_tok_per_sec_best"] = 99.0

    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["value"] == 3.0
    assert rec["extra"]["mmu_tok_per_sec_best"] == 99.0


def test_budget_clock_counts_down(monkeypatch):
    bench = _fresh_bench(monkeypatch, 1500)
    r0 = bench.remaining()
    time.sleep(0.05)
    assert bench.remaining() < r0 <= 1500
