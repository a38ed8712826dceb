"""Sampler-mode proposal log-density for CUSTOM independence proposals
(round 5): the MCMC kernels take logq from the draw's own gathered
inverse-CDF slope — the EXACT density of the piecewise-linear-in-u
sampler — instead of a per-step x-space log-table segment scan, and the
proposal inverse table is downsampled under a Wasserstein-1 bound
(api/device._mcmc_prop_inverse).  MH stays exactly invariant for the
target at any inverse resolution because the acceptance ratio uses the
density the sampler actually draws from (the reference evaluates its
q-table instead, src/shader_gen.rs:525-526 — approximate whenever the
table interpolant deviates from the sampler's step density).

CPU interpreter runs (conftest forces an 8-device CPU topology); small
shapes, loose statistical tolerances."""

import numpy as np
import pytest

from tpu_montecarlo import Distribution, MonteCarloIntegrator
from tpu_montecarlo.api.device import _mcmc_prop_inverse
from tpu_montecarlo.sampling import dist_spec_of


def _beta():
    return Distribution.beta(2.0, 5.0)


class TestDownsampledInverse:
    def test_beta_downsamples_to_lane_multiple(self):
        d = _beta()
        t = np.asarray(_mcmc_prop_inverse(d, dist_spec_of(d)))
        assert t.shape[0] < dist_spec_of(d).x_table.shape[0]
        assert t.shape[0] % 128 == 0
        assert t.shape[0] >= 256

    def test_endpoints_and_monotonicity_preserved(self):
        d = _beta()
        s = dist_spec_of(d)
        t = np.asarray(_mcmc_prop_inverse(d, s), np.float64)
        full = np.asarray(s.x_table, np.float64)
        assert t[0] == pytest.approx(full[0], abs=1e-6)
        assert t[-1] == pytest.approx(full[-1], abs=1e-6)
        assert np.all(np.diff(t) >= 0)

    def test_wasserstein_bound_holds(self):
        d = _beta()
        s = dist_spec_of(d)
        t = np.asarray(_mcmc_prop_inverse(d, s), np.float64)
        full = np.asarray(s.x_table, np.float64)
        u_full = np.linspace(0.0, 1.0, full.shape[0])
        u_c = np.linspace(0.0, 1.0, t.shape[0])
        w1 = np.trapezoid(
            np.abs(np.interp(u_full, u_c, t) - full), u_full
        )
        span = full[-1] - full[0]
        assert w1 <= 2e-4 * span + 1e-9

    def test_cached_per_distribution(self):
        d = _beta()
        s = dist_spec_of(d)
        assert _mcmc_prop_inverse(d, s) is _mcmc_prop_inverse(d, s)


class TestSamplerLogqEstimates:
    """The kernel path's estimates under sampler-mode logq match the
    closed-form moments and the XLA backend (which keeps table-mode
    logq and the full-resolution inverse)."""

    def test_1d_table_prop_table_target_moments(self):
        # E[X] = 2/7, E[X^2] = 3/28 under Beta(2, 5).
        integ = MonteCarloIntegrator(backend="pallas")
        r = integ.integrate_mcmc(
            [lambda x: x, lambda x: x * x],
            _beta(),
            Distribution.beta(2.0, 5.0),
            n_steps=2000, n_chains=512, n_burnin=200, seed=3,
        )
        assert r.values[0] == pytest.approx(2.0 / 7.0, abs=0.02)
        assert r.values[1] == pytest.approx(3.0 / 28.0, abs=0.01)
        # Proposal == target: with the sampler's exact density the
        # acceptance ratio is ~1 everywhere (only the table-target /
        # sampler-density mismatch rejects).  Table-mode logq on a
        # downsampled inverse could not make this guarantee.
        assert r.acceptance_rate > 0.97

    def test_1d_matches_xla_backend(self):
        fns = [lambda x: x, lambda x: x * x]
        kw = dict(n_steps=2000, n_chains=512, n_burnin=200, seed=11)
        rp = MonteCarloIntegrator(backend="pallas").integrate_mcmc(
            fns, _beta(), Distribution.uniform(0.0, 1.0), **kw
        )
        rx = MonteCarloIntegrator(backend="xla").integrate_mcmc(
            fns, _beta(), Distribution.uniform(0.0, 1.0), **kw
        )
        np.testing.assert_allclose(rp.values, rx.values, atol=0.02)

    def test_nd_table_dim_matches_moments(self):
        # Beta(2,5) x N(0,1) product target, Beta table proposal in
        # dim 0 (the c9f benchmark shape): E[x * y] = 0.
        integ = MonteCarloIntegrator(backend="pallas")
        r = integ.integrate_mcmc(
            [lambda x, y: x * y, lambda x, y: x],
            [_beta(), Distribution.normal(0.0, 1.0)],
            [Distribution.beta(2.0, 5.0), Distribution.normal(0.0, 2.0)],
            n_steps=2000, n_chains=512, n_burnin=200, seed=4,
        )
        assert r.values[0] == pytest.approx(0.0, abs=0.03)
        assert r.values[1] == pytest.approx(2.0 / 7.0, abs=0.02)

    def test_fidelity_pipeline_failure_now_kernel_eligible(self):
        # A spiky irregular-grid table whose uniform-grid q-table
        # resample FAILS the strict 0.01-nat fidelity pipeline
        # (previously: XLA-only as a kernel proposal).  Sampler-mode
        # logq needs no q-table at all, so the stateless kernel path
        # takes it — and is exact by construction (the acceptance uses
        # the density the sampler actually draws from).
        from tpu_montecarlo.api.device import _proposal_kernel_log_tables

        x = np.sort(np.concatenate([
            np.linspace(0.0, 4.0, 900),
            np.linspace(1.999, 2.001, 200),
        ]))
        pv = 0.2 + np.exp(-0.5 * ((x - 2.0) / 0.0005) ** 2) * 50.0

        def mk():
            return Distribution.from_pdf_table(x, pv)

        assert _proposal_kernel_log_tables(mk()) is None
        target = Distribution.normal(2.0, 0.8)
        kw = dict(n_steps=3000, n_chains=512, n_burnin=300, seed=5)
        rp = MonteCarloIntegrator(backend="pallas").integrate_mcmc(
            [lambda v: v, lambda v: v * v], target, mk(), **kw
        )
        rx = MonteCarloIntegrator(backend="xla").integrate_mcmc(
            [lambda v: v, lambda v: v * v], target, mk(), **kw
        )
        np.testing.assert_allclose(rp.values, rx.values, atol=0.05)
        assert rp.acceptance_rate == pytest.approx(
            rx.acceptance_rate, abs=0.03
        )

    def test_tempered_custom_proposal_rides_kernel(self):
        # Round 5: CUSTOM proposal dims in the TEMPERED kernel too —
        # sampler-mode logq needs no q-table, and the logq values swap
        # between rungs exactly like analytic closed forms (q is
        # rung-independent).  Target 0.5 N(-2,1) + 0.5 N(2,1) (table):
        # E[X] = 0, E[X^2] = 5.
        import math

        target = Distribution.from_pdf(
            lambda x: math.exp(-0.5 * (x - 2.0) ** 2)
            + math.exp(-0.5 * (x + 2.0) ** 2),
            support=(-6.0, 6.0),
        )
        prop = Distribution.from_pdf(
            lambda x: math.exp(-0.5 * (x / 3.0) ** 2),
            support=(-7.0, 7.0),
        )
        r = MonteCarloIntegrator(backend="pallas").integrate_mcmc(
            [lambda x: x, lambda x: x * x], target, prop,
            n_steps=2000, n_chains=512, n_burnin=200, seed=3,
            temperatures=[1.0, 2.0, 4.0],
        )
        assert r.values[0] == pytest.approx(0.0, abs=0.1)
        assert r.values[1] == pytest.approx(5.0, abs=0.2)
        assert 0.0 < r.diagnostics["swap_rate"] <= 1.0
        rx = MonteCarloIntegrator(backend="xla").integrate_mcmc(
            [lambda x: x, lambda x: x * x], target, prop,
            n_steps=2000, n_chains=512, n_burnin=200, seed=4,
            temperatures=[1.0, 2.0, 4.0],
        )
        # Acceptance rates agree closely: both backends evaluate the
        # same proposal (the downsampled inverse's density is exact for
        # the samples it draws).
        assert r.acceptance_rate == pytest.approx(
            rx.acceptance_rate, abs=0.05
        )
        np.testing.assert_allclose(r.values, rx.values, atol=0.2)

    def test_tempered_custom_dim_nd_product(self):
        # Mixed analytic + CUSTOM proposal dims under the ladder.
        beta = _beta()
        r = MonteCarloIntegrator(backend="pallas").integrate_mcmc(
            [lambda x, y: x * y],
            [beta, Distribution.normal(0.0, 1.0)],
            [Distribution.beta(2.0, 5.0), Distribution.normal(0.0, 2.0)],
            n_steps=1500, n_chains=512, n_burnin=200, seed=5,
            temperatures=[1.0, 2.0],
        )
        assert r.values[0] == pytest.approx(0.0, abs=0.03)

    def test_stateful_run_keeps_table_logq_path(self):
        # Resume-capable runs recompute logq from x alone, so they keep
        # the table-mode convention AND the full-resolution inverse;
        # minting + resuming must still produce correct moments.
        integ = MonteCarloIntegrator(backend="pallas")
        r1 = integ.integrate_mcmc(
            [lambda x: x], _beta(), Distribution.beta(2.0, 5.0),
            n_steps=1000, n_chains=512, n_burnin=200, seed=5,
            return_state=True,
        )
        r2 = integ.integrate_mcmc(
            [lambda x: x], _beta(), Distribution.beta(2.0, 5.0),
            n_steps=1000, n_chains=512, n_burnin=0, seed=6,
            initial_state=r1.chain_state,
        )
        assert r2.values[0] == pytest.approx(2.0 / 7.0, abs=0.02)
