"""Guard: the suite must run on the virtual 8-device CPU mesh, not the
tunneled TPU (the axon sitecustomize force-prepends 'axon' to
jax_platforms; conftest.py overrides it via the config API)."""
import jax


def test_suite_runs_on_virtual_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
