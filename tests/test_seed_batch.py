"""Seed-batched AOT handles: R independent jobs in ONE device dispatch.

The batched program statically unrolls the single-seed program, so each
batch element must reproduce the unbatched handle bit-for-bit — the whole
point is amortising per-dispatch host/link latency without changing any
sampling semantics.
"""

import numpy as np
import pytest

from tpu_montecarlo import Distribution, MonteCarloIntegrator

SEEDS = [7, 42, 1234]


@pytest.fixture(params=["auto", "pallas"])
def integrator(request):
    return MonteCarloIntegrator(backend=request.param)


class TestSeedBatch:
    def test_integrate_batched_matches_single(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        fns = [lambda x: x, lambda x: x * x]
        single = integrator.compile_integrate(fns, d, n_samples=200_000)
        batched = integrator.compile_integrate(
            fns, d, n_samples=200_000, seed_batch=len(SEEDS)
        )
        out = np.asarray(batched(SEEDS))
        assert out.shape == (len(SEEDS), 2)
        for i, s in enumerate(SEEDS):
            np.testing.assert_array_equal(out[i], np.asarray(single(s)))

    def test_integrate_batched_custom_table(self, integrator):
        beta = Distribution.beta(2.0, 5.0)
        fns = [lambda x: x]
        single = integrator.compile_integrate(fns, beta, n_samples=100_000)
        batched = integrator.compile_integrate(
            fns, beta, n_samples=100_000, seed_batch=2
        )
        out = np.asarray(batched([3, 4]))
        np.testing.assert_array_equal(out[0], np.asarray(single(3)))
        np.testing.assert_array_equal(out[1], np.asarray(single(4)))

    def test_is_batched_matches_single(self, integrator):
        p = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        fns = [lambda x: x * x]
        single = integrator.compile_importance_sampling(
            fns, p, q, n_samples=100_000
        )
        batched = integrator.compile_importance_sampling(
            fns, p, q, n_samples=100_000, seed_batch=2
        )
        out = np.asarray(batched([5, 6]))
        np.testing.assert_array_equal(out[0], np.asarray(single(5)))
        np.testing.assert_array_equal(out[1], np.asarray(single(6)))

    def test_mcmc_batched_matches_single(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        fns = [lambda x: x]
        single = integrator.compile_mcmc(
            fns, d, q, n_steps=100, n_chains=256, n_burnin=20
        )
        batched = integrator.compile_mcmc(
            fns, d, q, n_steps=100, n_chains=256, n_burnin=20, seed_batch=2
        )
        vals, accs = batched([5, 6])
        vals = np.asarray(vals)
        accs = np.asarray(accs)
        assert vals.shape == (2, 1) and accs.shape == (2,)
        v5, a5 = single(5)
        np.testing.assert_array_equal(vals[0], np.asarray(v5))
        assert accs[0] == pytest.approx(float(np.asarray(a5)))

    def test_large_grid_batch(self):
        """The Pallas path batches via a grid dimension (traced once, not
        unrolled) — a large batch must stay cheap and exact."""
        integ = MonteCarloIntegrator(backend="pallas")
        d = Distribution.normal(0.0, 1.0)
        single = integ.compile_integrate([lambda x: x * x], d, n_samples=50_000)
        batched = integ.compile_integrate(
            [lambda x: x * x], d, n_samples=50_000, seed_batch=16
        )
        seeds = list(range(21, 37))
        out = np.asarray(batched(seeds))
        assert out.shape == (16, 1)
        np.testing.assert_array_equal(out[0], np.asarray(single(21)))
        np.testing.assert_array_equal(out[15], np.asarray(single(36)))
        assert np.all(np.abs(out - 1.0) < 0.05)

    def test_wrong_seed_count_rejected(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        batched = integrator.compile_integrate(
            [lambda x: x], d, n_samples=100_000, seed_batch=3
        )
        with pytest.raises(ValueError, match="seeds"):
            batched([1, 2])

    def test_batch_on_mesh(self, mesh8):
        integ = MonteCarloIntegrator(mesh=mesh8)
        d = Distribution.normal(0.0, 1.0)
        fns = [lambda x: x * x]
        single = integ.compile_integrate(fns, d, n_samples=400_000)
        batched = integ.compile_integrate(
            fns, d, n_samples=400_000, seed_batch=2
        )
        out = np.asarray(batched([8, 9]))
        np.testing.assert_array_equal(out[0], np.asarray(single(8)))
        np.testing.assert_array_equal(out[1], np.asarray(single(9)))
