"""Worker process for the two-process multihost eval test
(tests/test_multiprocess_eval.py). Runs the REAL sharded zeb_eval path
under jax.distributed with process_count()==2 — the reference's DDP analog
(ref test.py:193-198, SURVEY §2.8 row 1)."""

import os
import sys


def main():
    coord, nproc, pid, data_root, out_dir = sys.argv[1:6]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    os.environ.setdefault("GIM_TPU_TEST_CACHE", "/tmp/gim_tpu_test_cache")

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["GIM_TPU_TEST_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nproc),
                               process_id=int(pid))
    assert jax.process_count() == int(nproc)

    from gim_tpu.cli import zeb_eval

    zeb_eval.main(["--weight", "root_sift", "--tests", "GL3D",
                   "--data_root", data_root, "--out_dir", out_dir,
                   "--version", "mh", "--img_size", "256", "--overwrite"])
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
