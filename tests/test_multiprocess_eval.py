"""TRUE multi-process exercise of the multihost eval path (VERDICT round-2
item 6): two jax.distributed CPU processes run the sharded zeb_eval
(pair-list sharding by process_index, gather_rows_multihost,
identifier dedup), and the merged dump must equal the single-process
result byte for byte. The reference's equivalent is genuinely
multi-process DDP (ref test.py:193-198); the single-process 8-device mesh
tests cannot catch process_count()>1 bugs."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_zeb_eval_matches_single_process(tmp_path):
    from gim_tpu.data.synthetic import write_synthetic_benchmark

    data_root = str(tmp_path / "data")
    write_synthetic_benchmark(data_root, n_pairs=5, seq="gl3d")

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    # single-process reference run (same worker script, nproc=1)
    out_single = str(tmp_path / "dump_single")
    coord = f"localhost:{_free_port()}"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
         coord, "1", "0", data_root, out_single],
        env=env, check=True, timeout=1800)

    # two-process run: shard 5 pairs over 2 ranks (rank0 gets the padded
    # duplicate -> dedup must drop it), gather, rank0 writes
    out_multi = str(tmp_path / "dump_multi")
    coord = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "multihost_worker.py"),
             coord, "2", str(pid), data_root, out_multi],
            env=env)
        for pid in range(2)
    ]
    for p in procs:
        assert p.wait(timeout=1800) == 0

    from gim_tpu.eval.zeb import dump_path

    f_single = dump_path(out_single, "root_sift", "GL3D", "mh")
    f_multi = dump_path(out_multi, "root_sift", "GL3D", "mh")
    with open(f_single) as a, open(f_multi) as b:
        single, multi = a.read(), b.read()
    assert single == multi
    assert len(single.splitlines()) == 6   # header + 5 unique pairs
