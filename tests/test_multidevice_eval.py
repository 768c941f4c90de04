"""Multi-device EVAL exercise (VERDICT round-1 item 10): match_fn +
pair_metrics under the virtual 8-device CPU mesh with the pair batch
sharded over the data axis — the eval-path counterpart of
dryrun_multichip's train step (SURVEY §2.8 row 1)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gim_tpu.api import match_fn
from gim_tpu.config import GimConfig, LoFTRConfig
from gim_tpu.eval.zeb import dedup_rows, gather_rows_multihost, pair_metrics
from gim_tpu.models.loftr import init_params
from gim_tpu.parallel.mesh import make_mesh


def test_sharded_eval_batch():
    n = len(jax.devices())
    assert n == 8
    mesh = make_mesh(jax.devices(), data_axis=n, model_axis=1)
    cfg = GimConfig(loftr=LoFTRConfig(max_matches=32))
    variables = init_params(jax.random.PRNGKey(0), cfg.loftr, (64, 64))

    B = n
    rng = np.random.default_rng(0)
    img = rng.random((B, 3, 64, 64)).astype(np.float32)
    # a non-degenerate GT relative pose (identity T gives E = 0 and NaN
    # epipolar distances)
    import cv2

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = cv2.Rodrigues(np.array([0.05, 0.2, 0.0]))[0]
    T[:3, 3] = [1.0, 0.1, 0.05]
    batch = {
        "color0": img,
        "color1": np.roll(img, 8, axis=-1),
        "scale0": np.ones((B, 2), np.float32),
        "scale1": np.ones((B, 2), np.float32),
        "K0": np.tile(np.array([[600.0, 0, 32], [0, 600, 32], [0, 0, 1]],
                               np.float32), (B, 1, 1)),
        "K1": np.tile(np.array([[600.0, 0, 32], [0, 600, 32], [0, 0, 1]],
                               np.float32), (B, 1, 1)),
        "T_0to1": np.tile(T, (B, 1, 1)),
    }

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    with mesh:
        variables = jax.device_put(variables, repl)
        im0 = jax.device_put(jnp.asarray(batch["color0"]), data_sh)
        im1 = jax.device_put(jnp.asarray(batch["color1"]), data_sh)
        s0 = jax.device_put(jnp.asarray(batch["scale0"]), data_sh)
        s1 = jax.device_put(jnp.asarray(batch["scale1"]), data_sh)

        fn = jax.jit(lambda v, a, b, c, d: match_fn(
            "gim_loftr", cfg, v, a, b, c, d))
        res = fn(variables, im0, im1, s0, s1)
        assert res.kpts0.shape == (B, 32, 2)
        # the match output stays sharded over the data axis
        assert res.kpts0.sharding.is_equivalent_to(data_sh, res.kpts0.ndim)

        m = pair_metrics(res.kpts0, res.kpts1, res.valid,
                         jax.device_put(jnp.asarray(batch["K0"]), data_sh),
                         jax.device_put(jnp.asarray(batch["K1"]), data_sh),
                         jax.device_put(jnp.asarray(batch["T_0to1"]),
                                        data_sh),
                         jax.random.PRNGKey(0), 0.5, 128)
    r = jax.device_get(m)
    assert r["R_errs"].shape == (B,)
    assert np.isfinite(r["epi_errs"]).all()

    rows = [{"identifier": f"p{i}", "covisible0": 0.5, "covisible1": 0.5,
             "epi_errs": r["epi_errs"][i], "inliers": r["inliers"][i],
             "R_errs": float(r["R_errs"][i]), "t_errs": float(r["t_errs"][i]),
             "t_errs2": float(r["t_errs2"][i])} for i in range(B)]
    rows = gather_rows_multihost(rows)   # single-process no-op path
    assert len(dedup_rows(rows)) == B
