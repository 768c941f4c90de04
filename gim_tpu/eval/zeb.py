"""ZEB evaluation driver.

The TPU-native analog of the reference eval stack (ref test.py +
trainer/lightning.py:243-275): per pair it computes symmetric epipolar
errors, estimates the relative pose with the ON-CHIP batched RANSAC
(replacing the serial per-pair cv2.findEssentialMat host loop,
ref tools/metrics.py:125-168 — the throughput sink), and writes dump files
byte-compatible with `dump/zeb/[T] {weight} {scene:>15} {version}.txt`
(ref trainer/lightning.py:258-275) so the reference's check.py/analysis.py
workflows (and our ports) read them unchanged.
"""

from __future__ import annotations

import os
from functools import partial
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu.config import GimConfig
from gim_tpu.geometry.epipolar import essential_from_pose, \
    symmetric_epipolar_distance
from gim_tpu.geometry.pose import estimate_pose, relative_pose_error


@partial(jax.jit, static_argnames=("num_hypotheses",))
def pair_metrics(kpts0, kpts1, valid, K0, K1, T_0to1, key,
                 thresh: float = 0.5, num_hypotheses: int = 2048,
                 conf=None):
    """All per-pair metrics on device. Args batched (B, ...). Returns dict
    of (B, ...) arrays: epi_errs, R_errs, t_errs, t_errs2, inliers.

    `key` is either a single PRNG key (split across the batch) or a
    pre-split (B, 2) key batch — `evaluate` passes per-pair keys derived
    from the pair identifier so results are independent of how the pair
    list is sharded across processes/batches (the reproducibility property
    the reference gets from per-pair host cv2 RANSAC under seed 3407)."""
    E = essential_from_pose(T_0to1)
    epi = symmetric_epipolar_distance(kpts0, kpts1, E, K0, K1)

    def one(k0, k1, v, k0m, k1m, kk, cf):
        out = estimate_pose(k0, k1, v, k0m, k1m, kk, thresh, num_hypotheses,
                            conf=cf)
        return out

    keys = key if key.ndim == 2 else jax.random.split(key, kpts0.shape[0])
    if conf is None:
        conf = jnp.ones(kpts0.shape[:2], jnp.float32)
    pose = jax.vmap(one)(kpts0, kpts1, valid, K0, K1, keys, conf)
    t_err, r_err, t_err2 = relative_pose_error(T_0to1, pose["R"], pose["t"])
    r_err = jnp.where(pose["success"], r_err, jnp.inf)
    t_err = jnp.where(pose["success"], t_err, jnp.inf)
    t_err2 = jnp.where(pose["success"], t_err2, jnp.inf)
    return {"epi_errs": epi, "R_errs": r_err, "t_errs": t_err,
            "t_errs2": t_err2, "inliers": pose["inliers"] & valid}


def identifier_key(identifier: str) -> np.ndarray:
    """Deterministic per-pair PRNG key from the pair identifier (process-
    and batching-independent, unlike Python's salted hash())."""
    import hashlib

    d = hashlib.blake2s(identifier.encode(), digest_size=8).digest()
    return np.frombuffer(d, dtype=np.uint32).copy()


def format_rows(metrics_rows: list[dict], epi_err_thr: float = 5e-4) -> str:
    """Dump-file text (ref trainer/lightning.py:258-271 format)."""
    out = ("identifiers covisible0 covisible1 R_errs t_errs t_errs2 "
           "Bef.Prec Bef.Num Aft.Prec Aft.Num\n")
    mean = lambda x: sum(x) / max(len(x), 1)
    for r in metrics_rows:
        epi = r["epi_errs"]
        inl = r["inliers"]
        bef = epi < epi_err_thr
        aft = epi[inl] < epi_err_thr
        out += (f'{r["identifier"]} {r["covisible0"]} {r["covisible1"]} '
                f'{r["R_errs"]} {r["t_errs"]} {r["t_errs2"]} ')
        out += f"{mean(bef)} {sum(bef)} {mean(aft)} {sum(aft)}\n"
    return out


def dump_path(out_dir: str, weight: str, scene: str, version: str) -> str:
    return join(out_dir, f"[T] {weight} {scene:>15} {version}.txt")


# The reference's RANSAC zoo (ref test.py:51-59) maps OpenCV estimator
# variants onto our single on-chip implementation as presets:
# (num_hypotheses, use match confidences for PROSAC ordering).
RANSAC_ZOO = {
    "RANSAC": (2048, False),
    "FAST": (512, False),
    "MAGSAC": (2048, True),      # sigma-marginalized scoring is always on
    "PROSAC": (2048, True),
    "DEFAULT": (2048, False),
    "ACCURATE": (4096, True),
    "PARALLEL": (2048, True),
}


def evaluate(match, batches, *, key=None, ransac_thresh: float = 0.5,
             num_hypotheses: int = 2048, progress: bool = True,
             use_conf: bool = True):
    """Run `match(batch) -> MatchResult` over an iterable of batches and
    collect per-pair metric rows (host dicts).

    `batches` yield dicts from gim_tpu.data.zeb.batch_pairs. Matching and
    metric/pose computation run fully on device; only final scalars and
    the per-match epi/inlier vectors cross to host per batch.

    RANSAC keys are derived PER PAIR from the identifier (blake2s), so the
    dump is bit-identical no matter how the pair list is sharded across
    processes or batched (`check.py` consistency across world sizes).
    """
    del key  # per-pair identifier-derived keys (see docstring)
    rows = []
    for bi, batch in enumerate(batches):
        res = match(batch)
        keys = jnp.asarray(
            np.stack([identifier_key(i) for i in batch["identifier"]]))
        m = pair_metrics(res.kpts0, res.kpts1, res.valid,
                         jnp.asarray(batch["K0"]), jnp.asarray(batch["K1"]),
                         jnp.asarray(batch["T_0to1"]), keys,
                         ransac_thresh, num_hypotheses,
                         conf=res.conf if use_conf else None)
        m = jax.device_get(m)
        valid = np.asarray(res.valid)
        B = valid.shape[0]
        for b in range(B):
            v = valid[b]
            rows.append({
                "identifier": batch["identifier"][b],
                "covisible0": batch["covisible0"][b],
                "covisible1": batch["covisible1"][b],
                "epi_errs": m["epi_errs"][b][v],
                "inliers": m["inliers"][b][v],
                "R_errs": float(m["R_errs"][b]),
                "t_errs": float(m["t_errs"][b]),
                "t_errs2": float(m["t_errs2"][b]),
            })
        if progress:
            print(f"[zeb] batch {bi + 1}: {len(rows)} pairs", flush=True)
    return rows


def _coordination_client():
    """The jax.distributed coordination-service client (gRPC KV store +
    barriers), or None outside a distributed context."""
    try:
        from jax._src import distributed

        return distributed.global_state.client
    except Exception:
        return None


def barrier_multihost(name: str, timeout_ms: int = 20 * 60 * 1000) -> None:
    """Cross-process barrier over the coordination service (pure gRPC to
    the coordinator, generous configurable timeout) — NOT a device
    collective: CPU-backend collectives ride Gloo, whose ~30 s
    non-configurable TCP-pair connect window trips under per-rank compile
    skew on contended hosts (the reference's DDP never faces this because
    NCCL init happens before any compile, ref test.py:193-198)."""
    import jax

    if jax.process_count() == 1:
        return
    client = _coordination_client()
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


_GATHER_CALLS = [0]  # per-process call counter; ranks call in lockstep


def gather_rows_multihost(rows: list[dict],
                          timeout_ms: int = 20 * 60 * 1000) -> list[dict]:
    """Cross-host metric gather for pod eval — pickled rows through the
    coordination-service KV store (the replacement for the reference's
    Gloo object all_gather, ref tools/comm.py:95-176). Skew-tolerant: each
    rank publishes its blob then blocks on the others with a long timeout;
    no Gloo clique is ever built. No-op single-host."""
    import jax

    if jax.process_count() == 1:
        return rows
    import pickle

    client = _coordination_client()
    if client is not None:
        call_n = _GATHER_CALLS[0]
        _GATHER_CALLS[0] += 1
        pid = jax.process_index()
        client.key_value_set_bytes(f"zeb_rows/{call_n}/{pid}",
                                   pickle.dumps(rows))
        out = []
        for p in range(jax.process_count()):
            blob = client.blocking_key_value_get_bytes(
                f"zeb_rows/{call_n}/{p}", timeout_ms)
            out.extend(pickle.loads(blob))
        return out

    # fallback (no coordination service): padded-bytes device allgather
    import numpy as np
    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(rows), dtype=np.uint8)
    n = jnp.asarray([blob.size])
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    cap = int(sizes.max())
    padded = np.zeros(cap, np.uint8)
    padded[:blob.size] = blob
    all_blobs = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(padded)))
    out = []
    for b, sz in zip(all_blobs.reshape(jax.process_count(), cap), sizes):
        out.extend(pickle.loads(b[:int(sz)].tobytes()))
    return out


def dedup_rows(rows: list[dict]) -> list[dict]:
    """Dedup by identifier then sort (ref trainer/lightning.py:253-255)."""
    seen = {}
    for r in rows:
        seen.setdefault(r["identifier"], r)
    return [seen[k] for k in sorted(seen)]


def write_dump(rows: list[dict], out_dir: str, weight: str, scene: str,
               version: str, epi_err_thr: float = 5e-4) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = dump_path(out_dir, weight, scene, version)
    with open(path, "w") as f:
        f.write(format_rows(dedup_rows(rows), epi_err_thr))
    return path
