"""The driver-facing benchmark must always produce its JSON contract.

bench.py is executed unattended at the end of every round; a silent
breakage there loses the round's headline measurement.  This smoke test
runs the underlying module in-process on a tiny slice and validates the
one-line JSON schema.
"""
import json

from icm_slam_tpu.benchmarks.headline import main


def test_headline_bench_json_contract(capsys):
    main(["--cpu", "--frames", "120", "--iters", "2"])
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["metric"] == "icm_refine_frames_per_s"
    assert payload["unit"] == "frames/s"
    assert payload["value"] > 0
    assert payload["vs_baseline"] > 0
    # truncated runs must not claim a full-depth quality number
    assert "ate_vs_reference_m_at_n30" not in payload


def test_headline_bench_fleet_and_profile_flags(capsys):
    main(["--cpu", "--frames", "120", "--iters", "2", "--reps", "1",
          "--fleet", "2", "--jacobi", "--profile", "turbo"])
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["fleet_worlds"] == 2
    assert payload["fleet_frames_per_s"] > 0
    assert payload["fleet_speedup_vs_single"] > 0
