"""Serving-mode demo: ahead-of-time handles, seed-batched dispatch, and
MCMC checkpoint/resume.

The reference recompiled its shader on every call; here programs compile
once (`compile_*` handles) and R independent jobs execute inside one
device program (`seed_batch=R`, batched as a kernel grid dimension on the
Pallas path — a 1000-job batch costs one host round-trip).
"""

import numpy as np

import tpu_montecarlo as mc


def main() -> None:
    integrator = mc.MonteCarloIntegrator()
    normal = mc.Distribution.normal(0.0, 1.0)

    # One compiled program, many jobs: 16 independent 1e6-sample
    # integrations of E[X^2] per dispatch.
    prog = integrator.compile_integrate(
        [lambda x: x * x], normal, n_samples=1_000_000, seed_batch=16
    )
    estimates = np.asarray(prog(range(16)))
    print("16 jobs, one dispatch; E[X^2] estimates:")
    print(" ", np.round(estimates.ravel(), 4))
    print("  spread:", float(estimates.std()))

    # Parameter sweep: the SAME compiled program prices a whole sigma
    # grid per dispatch — parameters are a runtime (R, 2) batch input.
    sigmas = [0.5, 1.0, 1.5, 2.0]
    sweep = integrator.compile_integrate(
        [lambda x: x * x], normal, n_samples=1_000_000,
        seed_batch=len(sigmas), param_batch=True,
    )
    params = mc.pack_param_batch(
        [mc.Distribution.normal(0.0, s) for s in sigmas]
    )
    var = np.asarray(sweep(range(len(sigmas)), params))
    print("sigma sweep, one dispatch; E[X^2] vs sigma^2:")
    for s, v in zip(sigmas, var.ravel()):
        print(f"  sigma={s}: {v:.4f} (expect {s * s})")

    # The same sweep WITH per-element error bars (in-kernel
    # pilot-shifted squares; one pilot row per rep): still one dispatch.
    sweep_se = integrator.compile_integrate(
        [lambda x: x * x], normal, n_samples=1_000_000,
        seed_batch=len(sigmas), param_batch=True, return_stderr=True,
    )
    v, se = sweep_se(range(len(sigmas)), params)
    v, se = np.asarray(v).ravel(), np.asarray(se).ravel()
    print("sigma sweep with error bars:")
    for s, vi, si in zip(sigmas, v, se):
        print(f"  sigma={s}: {vi:.4f} +/- {si:.4f}")

    # Batched MCMC: 4 independent chains-of-chains runs per dispatch.
    mcmc = integrator.compile_mcmc(
        [lambda x: x * x],
        normal,
        mc.Distribution.normal(0.0, 2.0),
        n_steps=2_000,
        n_chains=1024,
        n_burnin=200,
        seed_batch=4,
    )
    vals, accs = mcmc([1, 2, 3, 4])
    print("4 MCMC runs, one dispatch; E[X^2]:", np.round(np.asarray(vals).ravel(), 4))
    print("  acceptance:", np.round(np.asarray(accs), 3))

    # Checkpoint/resume: chain state stays on device between segments.
    r1 = integrator.integrate_mcmc(
        [lambda x: x * x], normal, mc.Distribution.normal(0.0, 2.0),
        n_steps=2_000, n_chains=1024, n_burnin=200, return_state=True,
    )
    r2 = integrator.integrate_mcmc(
        [lambda x: x * x], normal, mc.Distribution.normal(0.0, 2.0),
        n_steps=2_000, n_chains=1024, n_burnin=0,
        initial_state=r1.chain_state, seed=43,
    )
    print("segment 1:", round(r1.values[0], 4), r1.chain_state)
    print("segment 2 (resumed, no burn-in):", round(r2.values[0], 4))


if __name__ == "__main__":
    main()
