"""Per-stage timing + profiling hooks (observability subsystem).

The reference scatters ad-hoc `std::chrono`/`torch.cuda.synchronize` timers
(SURVEY.md §5); here one registry owns named stage timers and can emit a
summary or drive `jax.profiler` traces.

NOTE on this machine: on the tunneled `axon` TPU backend,
`block_until_ready()` does NOT synchronize — only a value fetch does — so
`device_sync()` fetches a tiny value to create a true barrier.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


def device_sync():
    """True device barrier (fetch-based; see module note)."""
    import jax
    import jax.numpy as jnp

    np.asarray(jnp.zeros(()))


class StageTimers:
    def __init__(self, sync: bool = False):
        self.samples = defaultdict(list)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str):
        if self.sync:
            device_sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                device_sync()
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "n": len(a),
                "mean_ms": float(a.mean() * 1e3),
                "median_ms": float(np.median(a) * 1e3),
                "p90_ms": float(np.percentile(a, 90) * 1e3),
                "total_s": float(a.sum()),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<28}{'n':>6}{'median':>10}{'mean':>10}{'p90':>10}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<28}{s['n']:>6}{s['median_ms']:>9.2f}ms"
                f"{s['mean_ms']:>9.2f}ms{s['p90_ms']:>9.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """jax.profiler trace of a region (TensorBoard-compatible)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
