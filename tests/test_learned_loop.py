"""The learned-weights product loop: synthetic video -> factory ->
propagate -> train (orbax) -> Matcher.from_checkpoint -> eval.

These test the glue the full on-TPU run (tools/learned_loop.py) relies on;
the end-to-end AUC bar itself is established on hardware and recorded in
WORKLOG.md / docs/LEARNED_LOOP.md (ref product cycle README.md:215-246 ->
:312-334).
"""

import os

import numpy as np
import pytest


def test_synthetic_video_roundtrip(tmp_path):
    from gim_tpu.data.synthetic import write_synthetic_video
    from gim_tpu.data.video import VideoStreamer

    path = str(tmp_path / "v.avi")
    write_synthetic_video(path, n_frames=240, n_scenes=2, seed=7,
                          H=120, W=160)
    vs = VideoStreamer(path)
    assert vs.n_frames == 240
    f0 = vs.read(0)
    f_last = vs.read(239)
    assert f0.shape == (120, 160, 3) and f_last.shape == (120, 160, 3)
    # scene cut at frame 120: adjacent frames within a scene move a
    # little; across the cut the texture is brand new
    def mad(a, b):
        return np.abs(a.astype(np.int32) - b.astype(np.int32)).mean()

    within = mad(vs.read(60), vs.read(61))
    across = mad(vs.read(119), vs.read(120))
    assert across > 1.5 * within
    vs.close()


def test_propagate_discovers_factory_store_names(tmp_path):
    """Guards the real bug this round: the propagate CLI's discovery regex
    must accept the factory's `_s<skip>_r{T|F}` store names."""
    from gim_tpu.cli.propagate import discover_sources
    from gim_tpu.cli.video_preprocessor import store_name

    for method, skip, resize in [("root_sift", 10, False),
                                 ("gim_dkm", 20, True),
                                 ("gim_loftr", 40, False)]:
        os.makedirs(tmp_path / store_name(method, skip, resize),
                    exist_ok=True)
    (tmp_path / "propagate").mkdir()   # non-source dirs must be ignored
    (tmp_path / "_frames").mkdir()
    src = discover_sources(str(tmp_path))
    assert sorted(src) == [10, 20, 40]
    assert all(len(v) == 1 for v in src.values())


def test_load_benchmark_refuses_ambiguous_multidir_root(tmp_path):
    from gim_tpu.data.synthetic import write_synthetic_benchmark
    from gim_tpu.data.zeb import load_benchmark

    write_synthetic_benchmark(str(tmp_path), n_pairs=2, seq="synth0")
    write_synthetic_benchmark(str(tmp_path), n_pairs=2, seq="synth1")
    with pytest.raises(ValueError, match="several candidate sequences"):
        load_benchmark(str(tmp_path), "GL3D")
    pairs = load_benchmark(str(tmp_path), "GL3D", seq="synth1")
    assert len(pairs) == 2


def test_orbax_checkpoint_via_public_matcher_path(tmp_path):
    """cli.train saves {"variables", "opt_state"} through orbax;
    Matcher.from_checkpoint on the directory must restore the variables
    (the framework-native analog of the torch .ckpt load path,
    ref trainer/lightning.py:68-99)."""
    import jax
    import orbax.checkpoint as ocp

    from gim_tpu.api import Matcher
    from gim_tpu.config import GimConfig, LoFTRConfig
    from gim_tpu.models.loftr import init_params

    cfg = GimConfig(loftr=LoFTRConfig(max_matches=32))
    variables = init_params(jax.random.PRNGKey(0), cfg.loftr, (64, 64))
    mgr = ocp.CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, args=ocp.args.StandardSave(
        {"variables": variables, "opt_state": {"count": np.zeros(())}}))
    mgr.wait_until_finished()

    m = Matcher.from_checkpoint("gim_loftr", str(tmp_path / "ckpt"), cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(m.variables))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]))


def _fabricate_propagated_pairs(root, video, n_pairs=3):
    """Propagated-label .npy files in the on-disk layout Propagator writes
    (header row [i0 i1 i0 i1], then (N,4) labels)."""
    from gim_tpu.data.video import VideoStreamer

    os.makedirs(root, exist_ok=True)
    vs = VideoStreamer(video)
    rng = np.random.default_rng(0)
    H, W = vs.read(0).shape[:2]
    for k in range(n_pairs):
        i0, i1 = 2 * k, 2 * k + 1
        pts0 = rng.uniform([0, 0], [W - 1, H - 1], (200, 2))
        labels = np.concatenate([pts0, pts0 + rng.normal(0, 1, (200, 2))],
                                axis=1).astype(np.float32)
        header = np.array([[i0, i1, i0, i1]], np.float32)
        np.save(os.path.join(root, f"{i0}_{i1}.npy"),
                np.concatenate([header, labels], axis=0))
    vs.close()


@pytest.mark.slow
def test_train_cli_save_restore_continue(tmp_path):
    """orbax save -> restore -> continue through the real cli.train main
    (VERDICT round-2 item 1's resume requirement)."""
    from gim_tpu.cli import train as TR
    from gim_tpu.data.synthetic import write_synthetic_video

    video = str(tmp_path / "v.avi")
    write_synthetic_video(video, n_frames=8, n_scenes=1, seed=3,
                          H=96, W=128)
    prop = str(tmp_path / "propagate")
    _fabricate_propagated_pairs(prop, video)
    ckpt = str(tmp_path / "ckpt")

    common = ["--weight", "gim_loftr", "--labels_root", prop,
              "--video", video, "--img_size", "64", "--batch_size", "1",
              "--lr", "1e-4", "--warmup_steps", "1",
              "--ckpt_dir", ckpt, "--save_interval", "2",
              "--augmentation", "none"]
    TR.main(common + ["--max_steps", "2"])

    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt))
    assert mgr.latest_step() == 2

    # continue to 4: the resume path restores step-2 state and trains on
    TR.main(common + ["--max_steps", "4"])
    mgr = ocp.CheckpointManager(os.path.abspath(ckpt))
    assert mgr.latest_step() == 4

    # the public inference path loads the result
    from gim_tpu.api import Matcher

    m = Matcher.from_checkpoint("gim_loftr", ckpt)
    assert "params" in m.variables
