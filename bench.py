"""Headline benchmark: fused K=8 N(0,1) Monte Carlo integrate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.md): 1e10 samples/sec/chip on TPU v5e on the
fused 8-function N(0,1) integrate.

The workload mirrors BASELINE.md config 2: eight integrands (moments, trig,
exp, an indicator, abs) fused into one compiled pass over shared samples.
Each dispatch sweeps 1e9 samples (the 1e8 baseline config scanned 10x
inside one program) so sustained device throughput — not the per-call
host round-trip, a ~27ms artifact of the test harness tunnel — dominates
the measurement; several dispatches with distinct seeds are timed and ALL
outputs are blocked on before the clock stops.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 1e10
N_SAMPLES = 1_000_000_000


def main() -> None:
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    from tpu_montecarlo.ops.integrate_pallas import build_integrate_fn_pallas
    from tpu_montecarlo.ops.integrate_xla import build_integrate_fn
    from tpu_montecarlo.sampling import DistKind
    from tpu_montecarlo.tracing import trace_function
    from tpu_montecarlo.utils.dispatch import make_integrate_plan

    fns = [
        lambda x: x,
        lambda x: x * x,
        lambda x: x * x * x,
        lambda x: x * x * x * x,
        lambda x: np.sin(x),
        lambda x: np.exp(-x * x),
        lambda x: x > 1.0,
        lambda x: abs(x),
    ]
    traced = tuple(trace_function(f) for f in fns)
    plan = make_integrate_plan(N_SAMPLES)
    on_tpu = jax.default_backend() == "tpu"
    samples_per_dispatch = plan.actual_samples
    if on_tpu:
        # Fused Pallas kernel — the TPU hot path (hardware PRNG, VMEM
        # accumulators); measured faster than the XLA sweep on v5e.
        run = build_integrate_fn_pallas(traced, DistKind.NORMAL, plan)
        # The Pallas grid rounds the sample count up again (at whatever
        # block size the builder picked); count what the device executes.
        samples_per_dispatch = run.actual_samples
    else:
        run = build_integrate_fn(traced, DistKind.NORMAL, plan)

    dummy = jnp.zeros(1, jnp.float32)
    params = jnp.asarray([0.0, 1.0], jnp.float32)

    n_repeats = 10 if on_tpu else 1

    # Warm-up: compile + load + first execution, forced to completion with a
    # host fetch (through the test-harness tunnel, block_until_ready alone
    # can return before the work is done — only the D2H copy truly syncs).
    np.asarray(run(np.uint32(42), params, dummy, dummy))

    t0 = time.perf_counter()
    outs = [
        run(np.uint32(1000 + rep), params, dummy, dummy)
        for rep in range(n_repeats)
    ]
    vals = [np.asarray(out) for out in outs]
    elapsed = time.perf_counter() - t0

    # Sanity: E[X^2] must be ~1 or the benchmark measured garbage.
    ex2 = float(vals[-1][1])
    assert abs(ex2 - 1.0) < 0.05, f"E[X^2] = {ex2}, expected ~1"

    samples_per_sec = samples_per_dispatch * n_repeats / elapsed
    print(
        json.dumps(
            {
                "metric": "samples_per_sec_chip_k8_normal",
                "value": samples_per_sec,
                "unit": "samples/s",
                "vs_baseline": samples_per_sec / BASELINE_SAMPLES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
