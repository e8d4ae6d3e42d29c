"""The bench writer contract: summary line and detail file are stamped
with ONE shared run id and the detail file is written atomically, so
BENCH_r*.json and BENCH_DETAIL.json can never describe different
executions (the round-3 artifacts did)."""

from __future__ import annotations

import json
import os

import bench


class TestEmitArtifacts:
    def test_shared_run_id_and_atomic_detail(self, tmp_path):
        detail_path = str(tmp_path / "BENCH_DETAIL.json")
        summary = {"metric": "m", "value": 1.0}
        detail = {"metric": "m", "value": 1.0, "queries": {"q": 0.5}}
        line = bench._emit_artifacts(summary, detail, detail_path)
        parsed = json.loads(line)
        on_disk = json.load(open(detail_path))
        assert parsed["run_id"] == on_disk["run_id"]
        assert parsed["run_id"].startswith("run-")
        # atomic: no tmp residue next to the final file
        assert not os.path.exists(detail_path + ".tmp")

    def test_preserves_caller_run_id(self, tmp_path):
        detail_path = str(tmp_path / "d.json")
        line = bench._emit_artifacts(
            {"run_id": "run-fixed"}, {}, detail_path
        )
        assert json.loads(line)["run_id"] == "run-fixed"
        assert json.load(open(detail_path))["run_id"] == "run-fixed"

    def test_line_cap_drops_cold_timings_before_evidence(self, tmp_path):
        detail_path = str(tmp_path / "d.json")
        big = {f"q{i}": 1.234 for i in range(400)}
        summary = {
            "queries": dict(big),
            "extensions": dict(big),
            "extensions_steady": {"e": 1.0},
            "skew": {"join_salted_speedup": 3.2},
            "sf1": {"pipeline_seq_per_sec": 1.0},
        }
        line = bench._emit_artifacts(summary, dict(summary), detail_path,
                                     max_line=2000)
        parsed = json.loads(line)
        assert len(line) <= 2000
        # evidence sections survive; bulky cold timings are dropped first
        assert "skew" in parsed and "sf1" in parsed
        assert "queries" not in parsed
        # the detail file keeps EVERYTHING regardless of the line cap
        assert "queries" in json.load(open(detail_path))
