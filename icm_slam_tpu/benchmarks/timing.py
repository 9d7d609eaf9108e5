"""The honest chained-median timing protocol, shared by every harness.

Two measurement traps on this runtime (CLAUDE.md) make naive timing
loops invalid:

* repeated executions with IDENTICAL input buffers are memoized by the
  runtime (~0.03 ms returns) — every timed call must consume the
  previous call's output, through a fresh buffer;
* single calls through the tunnel see 10-30 ms dispatch hiccups — the
  reported time is the MEDIAN of several chained reps.

The fresh buffer is made by adding 1e-30: subnormal, flushes to zero on
TPU, value-identical, but a new device allocation — defeating buffer
memoization without perturbing the computation.

Used by benchmarks/headline.py (single + fleet rows), fleet_curve.py and
modes_bench.py so the protocol cannot drift apart between harnesses.
"""
import time


def timed_chained_median_s(step, m0, x0, reps):
    """Median seconds per ``step`` call over ``reps`` chained calls.

    ``step(m, x) -> (m, x)``: one timed unit (typically a fused N-sweep
    refine loop) — must be already compiled/warmed by the caller.
    Returns ``(median_s, m, x)`` with the final chained state.
    """
    import jax
    import jax.numpy as jnp

    m, x = m0, x0
    ts = []
    for _ in range(max(1, reps)):
        x_in = x + jnp.asarray(1e-30, x.dtype)
        jax.block_until_ready(x_in)
        t0 = time.perf_counter()
        m, x = step(m, x_in)
        jax.block_until_ready(x)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], m, x
