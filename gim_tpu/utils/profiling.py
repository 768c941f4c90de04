"""Tracing / profiling hooks.

The reference has none (SURVEY §5: only tqdm bars and a Timer util); this
adds the TPU-native story: jax.profiler traces (viewable in TensorBoard /
xprof) plus a stage timer that forces device sync via tiny scalar fetches
so numbers are honest under async dispatch and the tunneled runtime.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(name: str = "gim_tpu", out_dir: str | None = None):
    """jax.profiler trace context (enable with GIM_TPU_TRACE=1)."""
    import jax

    out_dir = out_dir or os.environ.get("GIM_TPU_TRACE_DIR",
                                        "/tmp/gim_tpu_trace")
    if os.environ.get("GIM_TPU_TRACE"):
        with jax.profiler.trace(out_dir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        yield


class StageTimer:
    """Accumulates per-stage wall time with forced device sync."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        import jax

        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            for leaf in jax.tree_util.tree_leaves(sync_on):
                jax.block_until_ready(leaf)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k:<28} {v * 1000:9.1f} ms  {100 * v / max(total, 1e-9):5.1f}%"
                 for k, v in sorted(self.times.items(), key=lambda x: -x[1])]
        lines.append(f"{'total':<28} {total * 1000:9.1f} ms")
        return "\n".join(lines)
