"""hloc layer tests: quantized aggregation, match assignment, COLMAP db."""

import numpy as np

from gim_tpu.hloc.quantize import (KeypointAggregator, assign_to_keypoints,
                                   matches_from_ids, quantize_pts)


def test_quantize_pts_reference_rule():
    k = np.array([[10.3, 4.9], [0.2, 0.1]], np.float32)
    q = quantize_pts(k, 8)
    # round(round((kpts + .5)/ps)*ps - .5, 2)
    exp = np.round(np.round((k + 0.5) / 8) * 8 - 0.5, 2)
    np.testing.assert_allclose(q, exp)


def test_aggregator_votes_and_finalize():
    agg = KeypointAggregator(cell_size=8, max_error=2)
    # two pairs vote for nearby points in the same cell
    ids1 = agg.add("img", np.array([[10.0, 10.0], [50.0, 50.0]], np.float32),
                   np.array([1.0, 1.0]))
    ids2 = agg.add("img", np.array([[10.4, 10.2], [50.1, 49.8]], np.float32),
                   np.array([2.0, 1.0]))
    assert list(ids1) == list(ids2)  # same cells
    kpts, score = agg.finalize("img")
    assert len(kpts) == 2
    # the canonical point is the best-vote sub-bin (2px grid)
    assert np.abs(kpts[0] - np.array([9.5, 9.5])).max() <= 2.0


def test_assign_and_unique_matches():
    canonical = np.array([[10.0, 10.0], [50.0, 50.0], [90.0, 90.0]],
                         np.float32)
    kpts = np.array([[10.5, 10.2], [49.0, 50.5], [200.0, 200.0]], np.float32)
    ids = assign_to_keypoints(kpts, canonical, max_error=2.0)
    assert list(ids) == [0, 1, -1]

    ids0 = np.array([0, 0, 1, 2])
    ids1 = np.array([5, 5, 6, -1])
    scores = np.array([0.9, 0.5, 0.8, 0.7])
    m, sc = matches_from_ids(ids0, ids1, scores)
    # duplicate (0,5) keeps the best score; (2,-1) dropped
    assert (m == np.array([[0, 5], [1, 6]])).all() or \
        (m == np.array([[1, 6], [0, 5]])).all()
    assert 0.5 not in sc


def test_colmap_db_roundtrip(tmp_path):
    import sqlite3

    from gim_tpu.hloc.database import ColmapDB, pair_id_of

    path = str(tmp_path / "db.db")
    db = ColmapDB(path)
    cam = db.add_camera(2, 640, 480, np.array([600.0, 320, 240, 0]))
    i1 = db.add_image("a.png", cam)
    i2 = db.add_image("b.png", cam)
    kp = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    db.add_keypoints(i1, kp)
    db.add_keypoints(i2, kp)
    m = np.array([[0, 1], [1, 0]], np.uint32)
    db.add_matches(i1, i2, m)
    db.add_two_view_geometry(i1, i2, m)
    db.close()

    con = sqlite3.connect(path)
    rows = con.execute("SELECT rows, cols FROM keypoints").fetchall()
    assert rows == [(2, 4), (2, 4)]
    (pid, r, c, blob) = con.execute(
        "SELECT pair_id, rows, cols, data FROM matches").fetchone()
    assert pid == pair_id_of(i1, i2)
    got = np.frombuffer(blob, np.uint32).reshape(r, c)
    np.testing.assert_array_equal(got, m)


def test_pairs_and_names():
    from gim_tpu.hloc.pipeline import names_to_pair, pairs_from_exhaustive

    names = ["a.png", "b.png", "c.png"]
    pairs = pairs_from_exhaustive(names)
    assert len(pairs) == 3
    assert names_to_pair("x/a.png", "b.png") == "x-a.png/b.png"


def test_mvs_shell_commands(tmp_path):
    """MVS follow-up mirrors reconstruction.sh:7-20 conventions."""
    from gim_tpu.cli.reconstruction_mvs import run_mvs

    cmds = run_mvs(str(tmp_path), "room", "gim_dkm", dry_run=True)
    assert len(cmds) == 3
    assert cmds[0][1] == "image_undistorter"
    assert cmds[1][1] == "patch_match_stereo"
    assert cmds[2][1] == "stereo_fusion"
    assert cmds[0][3].endswith("inputs/room/images")
    assert cmds[2][-1].endswith("outputs/room/gim_dkm/dense/dense.ply")
