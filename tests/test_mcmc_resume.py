"""Chain-state checkpoint/resume — a capability addition over the
stateless one-shot reference (SURVEY.md §5: chain state never left GPU
registers there)."""

import numpy as np
import pytest

from tpu_montecarlo import Distribution, McmcState


class TestResume:
    def test_state_returned(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        r = integrator.integrate_mcmc(
            [lambda x: x], d, q,
            n_steps=200, n_chains=256, n_burnin=50, return_state=True,
        )
        assert isinstance(r.chain_state, McmcState)
        assert r.chain_state.n_chains == 256
        assert np.all(np.isfinite(r.chain_state.x))
        assert np.all(np.isfinite(r.chain_state.log_p))

    def test_state_not_returned_by_default(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        r = integrator.integrate_mcmc(
            [lambda x: x], d, q, n_steps=100, n_chains=256, n_burnin=10
        )
        assert r.chain_state is None

    def test_resume_continues_chains(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        r1 = integrator.integrate_mcmc(
            [lambda x: x, lambda x: x * x], d, q,
            n_steps=500, n_chains=512, n_burnin=200, return_state=True,
        )
        # Resumed run: no burn-in needed, chains already converged.
        r2 = integrator.integrate_mcmc(
            [lambda x: x, lambda x: x * x], d, q,
            n_steps=500, n_chains=512, n_burnin=0,
            initial_state=r1.chain_state, return_state=True, seed=43,
        )
        assert abs(r2.values[0]) < 0.15
        assert abs(r2.values[1] - 1.0) < 0.25
        # Chains actually moved.
        assert not np.array_equal(r1.chain_state.x, r2.chain_state.x)

    def test_resumed_estimate_uses_given_state(self, integrator):
        """Pin all chains far in the tail with a near-zero-acceptance setup:
        the resumed estimate must reflect the pinned state."""
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 1.0)
        pinned = McmcState(
            x=np.full(256, 5.0, np.float32),
            # Lie about log_p: claim the pinned position is vastly more
            # probable than anywhere else so every proposal is rejected.
            log_p=np.full(256, 1e6, np.float32),
        )
        r = integrator.integrate_mcmc(
            [lambda x: x], d, q,
            n_steps=50, n_chains=256, n_burnin=0,
            initial_state=pinned,
        )
        assert r.values[0] == pytest.approx(5.0, abs=1e-4)
        assert r.acceptance_rate == 0.0

    def test_chain_count_mismatch_rejected(self, integrator):
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        bad = McmcState(np.zeros(100, np.float32), np.zeros(100, np.float32))
        with pytest.raises(ValueError, match="chains"):
            integrator.integrate_mcmc(
                [lambda x: x], d, q,
                n_steps=10, n_chains=256, initial_state=bad,
            )

    def test_resume_on_mesh(self, mesh8):
        from tpu_montecarlo import MonteCarloIntegrator

        integ = MonteCarloIntegrator(mesh=mesh8)
        d = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.0, 2.0)
        r1 = integ.integrate_mcmc(
            [lambda x: x], d, q,
            n_steps=200, n_chains=512, n_burnin=50, return_state=True,
        )
        assert r1.chain_state.n_chains == 512
        r2 = integ.integrate_mcmc(
            [lambda x: x], d, q,
            n_steps=200, n_chains=512, n_burnin=0,
            initial_state=r1.chain_state, seed=44,
        )
        assert abs(r2.values[0]) < 0.2
