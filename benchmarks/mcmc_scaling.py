#!/usr/bin/env python3
"""MCMC throughput vs run length: quantify the dispatch/occupancy bound.

c14 shows the MCMC kernel sustains ~5e10 steps/s on long runs
(500k-step chains) while the 4096x11k benchmark shapes (c5b/c10/c9d)
sit at 1.5-1.8e10 — this harness measures WHERE the gap comes from by
sweeping ``n_steps`` at fixed chains (4096) and batch shape (the c5b
harness: seed_batch jobs per dispatch, `outer` pipelined dispatches,
best-of-2 rounds), recording steps/s per point.

The model: one dispatch costs a fixed overhead t0 (RPC + program
launch + grid spin-up across ~P programs/core scheduling) plus
n_iters * t_step device time; throughput = work / (t0 + work/rate),
so short runs are overhead-bound and the curve saturates at the
kernel's true step rate.  The fitted (t0, rate) pair is reported.

Writes benchmarks/mcmc_scaling.json and prints one line per point.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python \
          benchmarks/mcmc_scaling.py > /tmp/mcmc_scaling.log &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup_jax():
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return jax


def main():
    jax = _setup_jax()
    from tpu_montecarlo import Distribution, MonteCarloIntegrator

    integrator = MonteCarloIntegrator()
    chains = 4096
    repeats = 10
    outer = 3
    points = []
    # Burn-in fixed at 1/11 of steps (the c5b shape's ratio).
    for steps in (1_000, 3_000, 10_000, 30_000, 100_000, 300_000):
        burn = steps // 10
        prog = integrator.compile_mcmc(
            [lambda x: x * x],
            Distribution.normal(0.0, 1.0),
            Distribution.normal(0.0, 2.0),
            n_steps=steps, n_chains=chains, n_burnin=burn,
            seed_batch=repeats,
        )
        work = chains * (steps + burn)

        def fetch(out):
            return np.asarray(out[0])

        fetch(prog([42 + r for r in range(repeats)]))  # warm
        best = None
        for rnd in range(2):
            t0 = time.perf_counter()
            outs = [
                prog(
                    [
                        100 + (rnd * outer + o) * repeats + r
                        for r in range(repeats)
                    ]
                )
                for o in range(outer)
            ]
            for out in outs:
                fetch(out)
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        sps = work * repeats * outer / best
        per_dispatch = best / outer
        rec = {
            "n_steps": steps,
            "n_iters": steps + burn,
            "steps_per_sec": sps,
            "sec_per_dispatch": per_dispatch,
        }
        points.append(rec)
        print(json.dumps(rec), flush=True)

    # Fit t_dispatch = t0 + n_iters * t_step by least squares.
    n = np.array([p["n_iters"] for p in points], float)
    t = np.array([p["sec_per_dispatch"] for p in points], float)
    a = np.vstack([np.ones_like(n), n]).T
    (t0_fit, t_step), *_ = np.linalg.lstsq(a, t, rcond=None)
    rate = chains * repeats / t_step if t_step > 0 else float("inf")
    summary = {
        "chains": chains,
        "seed_batch": repeats,
        "fixed_overhead_sec_per_dispatch": float(t0_fit),
        "asymptotic_steps_per_sec": float(rate),
        "points": points,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "mcmc_scaling.json"
    )
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"# wrote {out_path}: t0={t0_fit * 1e3:.2f} ms/dispatch, "
          f"asymptotic {rate:.3e} steps/s", flush=True)


if __name__ == "__main__":
    main()
