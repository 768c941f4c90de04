"""Weight-port parity: random torch checkpoints -> flax params -> identical
activations. This is the de-risking harness of SURVEY §7 step 2: any layout
or math drift between the torch reference semantics and the JAX build fails
here before it can corrupt a real checkpoint port."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gim_tpu.config import LightGlueConfig, SuperPointConfig
from gim_tpu.models import lightglue as lg
from gim_tpu.models import superpoint as sp
from gim_tpu.weights import port
from tests.torch_ref import TorchLightGlue, TorchSuperPointNet

HIGH = jax.default_matmul_precision("highest")


def _sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_superpoint_dense_parity():
    torch.manual_seed(0)
    tnet = TorchSuperPointNet().eval()
    params = port.port_superpoint(_sd_numpy(tnet))

    rng = np.random.default_rng(0)
    img = rng.random((1, 1, 64, 80)).astype(np.float32)

    with torch.no_grad():
        t_scores, t_desc = tnet(torch.from_numpy(img))

    with HIGH:
        net = sp.SuperPointNet()
        j_scores, j_desc = net.apply(
            params, jnp.transpose(jnp.asarray(img), (0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(j_scores), t_scores.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(j_desc, (0, 3, 1, 2))), t_desc.numpy(),
        atol=2e-5)


def test_lightglue_parity_small():
    torch.manual_seed(1)
    dim, heads, n_layers, K = 64, 4, 3, 32
    tmodel = TorchLightGlue(dim=dim, heads=heads, n_layers=n_layers).eval()
    params = port.port_lightglue(_sd_numpy(tmodel), n_layers=n_layers)

    rng = np.random.default_rng(1)
    kpts0 = (rng.random((1, K, 2)) * 100).astype(np.float32)
    kpts1 = (rng.random((1, K, 2)) * 100).astype(np.float32)
    d0 = rng.standard_normal((1, K, dim)).astype(np.float32)
    d1 = rng.standard_normal((1, K, dim)).astype(np.float32)
    size = np.array([[120.0, 90.0]], np.float32)

    with torch.no_grad():
        t_scores = tmodel(*map(torch.from_numpy,
                               (kpts0, kpts1, d0, d1, size, size)))

    cfg = LightGlueConfig(input_dim=dim, descriptor_dim=dim, num_heads=heads,
                          n_layers=n_layers)
    model = lg.LightGlue(cfg)
    with HIGH:
        out = model.apply(params, jnp.asarray(kpts0), jnp.asarray(kpts1),
                          jnp.asarray(d0), jnp.asarray(d1),
                          jnp.asarray(size), jnp.asarray(size))

    np.testing.assert_allclose(np.asarray(out["log_assignment"]),
                               t_scores.numpy(), atol=5e-3)


def test_superpoint_extract_shapes():
    cfg = SuperPointConfig(max_num_keypoints=128, nms_radius=3)
    rng = jax.random.PRNGKey(0)
    params = sp.init_params(rng, cfg)
    img = jax.random.uniform(rng, (1, 1, 64, 80))
    out = sp.extract(params, img, cfg, pad_rng=jax.random.PRNGKey(1))
    assert out["keypoints"].shape == (1, 128, 2)
    assert out["descriptors"].shape == (1, 128, 256)
    assert out["scores"].shape == (1, 128)
    kp = np.asarray(out["keypoints"])
    assert kp[..., 0].max() <= 80 and kp[..., 1].max() <= 64
