"""Zero-density-span (gapped) custom distributions on the Pallas path.

Round-1 exiled these to the XLA searchsorted sampler; now host-built
gap-respecting (value, slope) tables (tables.gapped_*_tables) sample them
in-kernel — the slope table is decoupled from diff(values), so the
piecewise-linear inverse jumps each gap exactly at a knot and no sample
ever lands inside a gap (the reference's knot-exact binary-search
semantics, src/distribution.rs:128-158).
"""

import warnings

import numpy as np
import pytest

from tpu_montecarlo import Distribution, MonteCarloIntegrator


def _gapped():
    x = np.linspace(0.0, 1.0, 2048)
    p = np.where((x > 0.4) & (x < 0.6), 0.0, 1.0)
    return Distribution.from_pdf_table(x, p)


def _bimodal_gapped():
    # Two uniform islands with a hard hole between them.
    x = np.linspace(-3.0, 3.0, 2048)
    p = np.where((np.abs(x) > 1.0) & (np.abs(x) < 2.5), 1.0, 0.0)
    return Distribution.from_pdf_table(x, p)


class TestGappedHostTables:
    def test_stratified_map_never_in_gap(self):
        from tpu_montecarlo.sampling import dist_spec_of
        from tpu_montecarlo.tables import (
            find_zero_density_gaps,
            gapped_stratified_tables,
        )

        d = _gapped()
        spec = dist_spec_of(d)
        assert spec.exact_inverse
        _, pdf_vals = d.get_or_compute_pdf_table()
        gaps = find_zero_density_gaps(spec.x_table, spec.cdf_table, pdf_vals)
        assert len(gaps) == 1
        c, xl, xr = gaps[0]
        assert 0.39 < xl < 0.41 and 0.59 < xr < 0.61

        ts, dts = gapped_stratified_tables(spec.x_table, spec.cdf_table, gaps)
        # Evaluate the kernel's map x = ts[s, j] + frac * dts[s, j] densely.
        w = np.linspace(0.0, 1.0, 1001, endpoint=False)
        pos = w * (ts.shape[1] - 1)
        j = pos.astype(np.int32)
        frac = pos - j
        for s in range(ts.shape[0]):
            x = ts[s, j] + frac * dts[s, j]
            assert not np.any((x > xl + 1e-4) & (x < xr - 1e-4))

    def test_flat_inverse_map_never_in_gap(self):
        from tpu_montecarlo.sampling import dist_spec_of
        from tpu_montecarlo.tables import (
            find_zero_density_gaps,
            gapped_inverse_tables,
        )

        d = _gapped()
        spec = dist_spec_of(d)
        _, pdf_vals = d.get_or_compute_pdf_table()
        gaps = find_zero_density_gaps(spec.x_table, spec.cdf_table, pdf_vals)
        t, dt = gapped_inverse_tables(spec.x_table, spec.cdf_table, gaps)
        c, xl, xr = gaps[0]
        u = np.linspace(0.0, 1.0, 100_001, endpoint=False)
        pos = u * (len(t) - 1)
        i0 = np.clip(pos.astype(np.int32), 0, len(t) - 2)
        frac = pos - i0
        x = t[i0] + frac * dt[i0]
        assert not np.any((x > xl + 1e-4) & (x < xr - 1e-4))
        # And both branches are actually reachable.
        assert np.any(x < xl) and np.any(x > xr)

    def test_two_gaps_snapping_to_one_knot(self):
        """Regression: two gaps separated by a sliver carrying less mass
        than one u-knot snap to the SAME knot; applied independently, the
        second gap's jump rewrite overwrote the first's and the jump
        interval interpolated across gap 1's interior (measured 279/2e6
        emulated lookups inside the gap).  Colliding gaps must merge into
        one combined jump."""
        from tpu_montecarlo.sampling import dist_spec_of
        from tpu_montecarlo.tables import (
            find_zero_density_gaps,
            gapped_inverse_tables,
        )

        x = np.linspace(0.0, 1.0, 8192)
        p = np.ones_like(x)
        p[(x > 0.40) & (x < 0.45)] = 0.0          # gap 1
        p[(x > 0.4502) & (x < 0.60)] = 0.0        # gap 2
        # sliver [0.45, 0.4502]: mass ~2e-4/0.8 < one 4096-grid knot
        d = Distribution.from_pdf_table(x, p)
        spec = dist_spec_of(d)
        assert spec.exact_inverse
        _, pdf_vals = d.get_or_compute_pdf_table()
        gaps = find_zero_density_gaps(spec.x_table, spec.cdf_table, pdf_vals)
        assert len(gaps) == 2
        t, dt = gapped_inverse_tables(spec.x_table, spec.cdf_table, gaps)
        u = np.linspace(0.0, 1.0, 2_000_001, endpoint=False)
        pos = u * (len(t) - 1)
        i0 = np.clip(pos.astype(np.int32), 0, len(t) - 2)
        frac = pos - i0
        xs = t[i0] + frac * dt[i0]
        for _, xl, xr in gaps:
            inside = (xs > xl + 1e-4) & (xs < xr - 1e-4)
            assert not np.any(inside), (xl, xr, xs[inside][:5])
        assert np.any(xs < gaps[0][1]) and np.any(xs > gaps[1][2])


class TestGappedPallas:
    @pytest.fixture()
    def pallas_integrator(self):
        return MonteCarloIntegrator(backend="pallas")

    def test_integrate_no_samples_in_gap(self, pallas_integrator):
        d = _gapped()
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # forced pallas must not degrade
            r = pallas_integrator.integrate(
                [lambda x: x, lambda x: (x > 0.41) * (x < 0.59)], d,
                n_samples=400_000, seed=42,
            )
        assert r.values[1] == 0.0  # not one sample inside the gap
        assert abs(r.values[0] - 0.5) < 0.02

    def test_integrate_bimodal_island_moments(self, pallas_integrator):
        d = _bimodal_gapped()
        # The indicator leaves a knot-spacing margin at the hole edges: the
        # boundary trapezoids (p>0 knot at ~1.0015, p=0 knot at ~0.9985)
        # legitimately carry density just inside |x| = 1.
        r = pallas_integrator.integrate(
            [lambda x: x, lambda x: x * x, lambda x: abs(x) < 0.99], d,
            n_samples=400_000, seed=7,
        )
        # E[X]=0 by symmetry; E[X^2] for |x| ~ U(1, 2.5):
        # (2.5^3 - 1) / (3 * 1.5) = 3.25
        assert abs(r.values[0]) < 0.03
        assert abs(r.values[1] - 3.25) < 0.05
        assert r.values[2] == 0.0  # hole stays empty

    def test_is_gapped_proposal(self, pallas_integrator):
        # The proposal's weight table is now the TRUE sampling density
        # (from_pdf_table rescales the pdf with the cdf normalization:
        # 1/0.8 = 1.25 on the islands).  A proposal that cannot reach
        # the gap (0.4, 0.6) therefore yields the support-restricted
        # integral ∫_islands x·p(x) dx = 0.4, NOT the full E[X] = 0.5 —
        # the previous 0.5 was an unnormalized-weight bias (x1/0.8)
        # coincidentally standing in for the unreachable gap mass.
        proposal = _gapped()
        target = Distribution.uniform(0.0, 1.0)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            r = pallas_integrator.integrate_importance_sampling(
                [lambda x: x], target, proposal, n_samples=400_000
            )
        assert np.isfinite(r.values[0])
        assert abs(r.values[0] - 0.4) < 0.02
        # A normalized proposal COVERING the support recovers E[X]=0.5.
        full = Distribution.uniform(0.0, 1.0)
        r2 = pallas_integrator.integrate_importance_sampling(
            [lambda x: x], target, full, n_samples=400_000
        )
        assert abs(r2.values[0] - 0.5) < 0.02

    def test_mcmc_gapped_proposal_not_absorbed(self, pallas_integrator):
        proposal = _gapped()
        target = Distribution.uniform(0.0, 1.0)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            r = pallas_integrator.integrate_mcmc(
                [lambda x: x], target, proposal,
                n_steps=2000, n_chains=256, n_burnin=200,
            )
        # With absorbing gap states this read ~0.63 in round 1.
        assert abs(r.values[0] - 0.5) < 0.03

    @pytest.mark.parametrize("backend", ["pallas", "xla"])
    def test_gap_edge_states_not_absorbing(self, backend):
        """An ASYMMETRIC functional exposes edge-absorbed chains (the mean
        is blind: edges 0.4/0.6 average to 0.5).  Before the proposal
        log-floor guard, log q at states inside the boundary trapezoid
        interpolated toward -100, chains fell in and never left: E[x^2]
        drifted 0.343 -> 0.280 over 5000 steps with acceptance collapsing
        0.90 -> 0.46.

        NOTE the stationary value: an independence sampler can never
        visit states its proposal cannot emit, so the chain samples the
        uniform target RESTRICTED to the proposal's islands
        [0, 0.4] u [0.6, 1]: E[X^2] = 1.25 * (0.4^3 + 1 - 0.6^3) / 3
        = 0.35333, acceptance ~1 (constant densities cancel)."""
        proposal = _gapped()
        target = Distribution.uniform(0.0, 1.0)
        it = MonteCarloIntegrator(backend=backend)
        r = it.integrate_mcmc(
            [lambda v: v * v], target, proposal,
            n_steps=5000, n_chains=256, n_burnin=0, seed=1,
        )
        assert abs(r.values[0] - 0.35333) < 0.01
        assert r.acceptance_rate > 0.95

    def test_matches_xla_backend(self):
        d = _gapped()
        fns = [lambda x: x, lambda x: x * x]
        rp = MonteCarloIntegrator(backend="pallas").integrate(
            fns, d, n_samples=400_000, seed=3
        )
        rx = MonteCarloIntegrator(backend="xla").integrate(
            fns, d, n_samples=400_000, seed=3
        )
        np.testing.assert_allclose(rp.values, rx.values, atol=0.02)

    def test_high_k_gapped_shrinks_block_in_kernel(self):
        """K=64 fused integrands over a gapped custom stay in-kernel: the
        block shrinks to 128 rows and the gap-respecting tables are built
        at 16 strata to match.  Bin masses over the gap must be zero and
        the histogram must sum to 1 (forced pallas, no fallback warning)."""
        edges = np.linspace(0.0, 1.0, 65)

        def bin_fn(lo, hi):
            return lambda v: (v >= lo) * (v < hi)

        fns = [
            bin_fn(float(a), float(b))
            for a, b in zip(edges[:-1], edges[1:])
        ]
        d = _gapped()
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            r = MonteCarloIntegrator(backend="pallas").integrate(
                fns, d, n_samples=400_000, seed=5
            )
        masses = np.asarray(r.values)
        assert abs(masses.sum() - 1.0) < 1e-3
        # Bins fully inside the (0.4, 0.6) gap carry zero mass.
        inside = (edges[:-1] >= 0.4 + 1e-6) & (edges[1:] <= 0.6 - 1e-6)
        assert inside.sum() >= 10
        assert np.all(masses[inside] == 0.0)
        # Island bins carry ~uniform density 1.25 each (width 1/64).
        outside = (edges[1:] <= 0.4) | (edges[:-1] >= 0.6)
        np.testing.assert_allclose(
            masses[outside], 1.25 / 64.0, atol=0.01
        )
