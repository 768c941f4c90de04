"""The 12-benchmark sweep driver end-to-end (ref TEST_GIM_DKM.sh:1-15 ->
check.py -> analysis.py chain): fabricate two synthetic benchmarks, run
cli.sweep over a --tests subset with root_sift, and assert the dumps exist,
missing datasets are skipped (not fatal), and check + analysis agree."""

import os
from os.path import join

import numpy as np
import pytest


@pytest.mark.compileheavy  # >100s cold on the 1-core host (r5 durations run)
def test_sweep_runs_subset_checks_and_analyzes(tmp_path, capsys):
    from gim_tpu.cli import sweep
    from gim_tpu.data.synthetic import write_synthetic_benchmark
    from gim_tpu.eval.zeb import dump_path

    data_root = str(tmp_path / "data")
    write_synthetic_benchmark(data_root, n_pairs=3, seq="gl3d")
    write_synthetic_benchmark(data_root, n_pairs=3, seq="blendedmvs")

    out_dir = str(tmp_path / "dump")
    sweep.main(["--weight", "root_sift", "--version", "t0",
                "--data_root", data_root, "--out_dir", out_dir,
                "--tests", "GL3D", "BlendedMVS", "KITTI",
                "--img_size", "256", "--overwrite"])
    out = capsys.readouterr().out

    # KITTI has no data dir -> reported and skipped, sweep continues
    assert "KITTI: no data" in out
    assert "2 benchmarks run, 1 skipped" in out

    f_gl3d = dump_path(out_dir, "root_sift", "GL3D", "t0")
    f_bmvs = dump_path(out_dir, "root_sift", "BlendedMVS", "t0")
    assert os.path.exists(f_gl3d) and os.path.exists(f_bmvs)
    with open(f_gl3d) as f:
        assert len(f.read().splitlines()) == 4        # header + 3 pairs

    # the chained check (identifier consistency) and analysis (AUC table)
    # both ran over the dump dir
    assert "auc@ 5.0deg" in out or "mean auc@5" in out

    # analysis standalone returns the same AUCs the sweep printed
    from gim_tpu.cli import analysis

    res = analysis.main(["--dir", out_dir, "--wid", "root_sift",
                         "--version", "t0"])
    assert set(res) == {"GL3D", "BlendedMVS"}
    for v in res.values():
        assert np.isfinite(v) and 0.0 <= v <= 1.0
