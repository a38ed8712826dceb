"""Random-walk Metropolis proposals (``RandomWalk``).

A proposal family beyond the reference, whose MCMC is an independence
sampler only (reference acceptance carries state-independent log-q terms,
src/shader_gen.rs:466-539).  The tests cover: statistical correctness on
analytic / extended / custom-table targets, burn-in step adaptation
converging to the target acceptance rate, the stderr / diagnostics /
resume / seed-batch compositions, sharded execution, the host quantile
helper that picks init ranges, and the argument-validation surface.
"""

import numpy as np
import pytest

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    RandomWalk,
    integrate_mcmc,
)


@pytest.fixture(scope="module")
def integ():
    return MonteCarloIntegrator()


# ---------------------------------------------------------------------------
# Statistical correctness
# ---------------------------------------------------------------------------


class TestRandomWalkEstimates:
    def test_normal_target_moments(self, integ):
        target = Distribution.normal(3.0, 2.0)
        r = integ.integrate_mcmc(
            [lambda x: x, lambda x: x * x],
            target,
            RandomWalk(step_size=2.0),
            n_steps=2000,
            n_chains=1024,
            n_burnin=500,
            seed=7,
        )
        assert abs(r.values[0] - 3.0) < 0.1
        assert abs(r.values[1] - 13.0) < 0.5
        assert 0.0 < r.acceptance_rate < 1.0

    def test_exponential_target(self, integ):
        target = Distribution.exponential(2.0)
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=0.7),
            n_steps=3000,
            n_chains=1024,
            n_burnin=500,
            seed=11,
        )
        assert abs(r.values[0] - 0.5) < 0.05

    def test_extended_family_target(self, integ):
        # Gumbel(1, 2): E[X] = loc + gamma * scale.
        target = Distribution.gumbel(1.0, 2.0)
        expected = 1.0 + 0.5772156649 * 2.0
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=3.0),
            n_steps=3000,
            n_chains=1024,
            n_burnin=500,
            seed=5,
        )
        assert abs(r.values[0] - expected) < 0.15

    def test_custom_table_target(self, integ):
        # Laplace-shaped table target centred at 1.
        target = Distribution.from_pdf(
            lambda x: np.exp(-abs(x - 1.0)), support=(-9.0, 11.0)
        )
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=1.5),
            n_steps=3000,
            n_chains=1024,
            n_burnin=500,
            seed=3,
        )
        assert abs(r.values[0] - 1.0) < 0.15

    def test_module_level_entry(self):
        target = Distribution.normal(0.0, 1.0)
        r = integrate_mcmc(
            [lambda x: x * x],
            target,
            RandomWalk(step_size=1.0),
            n_steps=1500,
            n_chains=512,
            n_burnin=300,
            seed=2,
        )
        assert abs(r.values[0] - 1.0) < 0.1

    def test_bimodal_target_where_independence_fails(self, integ):
        # A two-mode target: a narrow N(0,1) independence proposal can't
        # reach the far mode, the random walk crosses via the bridge.
        target = Distribution.from_pdf(
            lambda x: np.exp(-0.5 * (x - 4.0) ** 2)
            + np.exp(-0.5 * (x + 4.0) ** 2)
            + 1e-4,
            support=(-10.0, 10.0),
        )
        r = integ.integrate_mcmc(
            [lambda x: x * x],
            target,
            RandomWalk(step_size=4.0),
            n_steps=4000,
            n_chains=1024,
            n_burnin=1000,
            seed=9,
        )
        # E[X^2] ~ 17 for the symmetric two-mode mixture.
        assert abs(r.values[0] - 17.0) < 1.0


# ---------------------------------------------------------------------------
# Step adaptation
# ---------------------------------------------------------------------------


class TestAdaptation:
    def test_adapts_down_to_target_accept(self, integ):
        # Start with an absurdly large step: acceptance would be ~0.
        target = Distribution.normal(3.0, 2.0)
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=50.0, adapt=True),
            n_steps=2000,
            n_chains=1024,
            n_burnin=1000,
            seed=7,
        )
        assert abs(r.values[0] - 3.0) < 0.15
        assert abs(r.acceptance_rate - 0.44) < 0.1

    def test_adapts_up_from_tiny_step(self, integ):
        target = Distribution.normal(0.0, 1.0)
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=1e-3, adapt=True),
            n_steps=2000,
            n_chains=1024,
            n_burnin=1000,
            seed=13,
        )
        assert abs(r.values[0]) < 0.15
        assert abs(r.acceptance_rate - 0.44) < 0.12

    def test_custom_target_accept(self, integ):
        target = Distribution.normal(0.0, 1.0)
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=10.0, adapt=True, target_accept=0.25),
            n_steps=2000,
            n_chains=1024,
            n_burnin=1000,
            seed=21,
        )
        assert abs(r.acceptance_rate - 0.25) < 0.08

    def test_fixed_step_ignores_target_accept(self, integ):
        # Without adapt the chain keeps the requested step exactly: two
        # runs differing only in target_accept are bit-identical.
        target = Distribution.normal(0.0, 1.0)
        rs = [
            integ.integrate_mcmc(
                [lambda x: x],
                target,
                RandomWalk(step_size=1.0, target_accept=ta),
                n_steps=500,
                n_chains=512,
                n_burnin=100,
                seed=4,
            )
            for ta in (0.2, 0.8)
        ]
        assert rs[0].values[0] == rs[1].values[0]


# ---------------------------------------------------------------------------
# Feature compositions
# ---------------------------------------------------------------------------


class TestCompositions:
    def test_stderr(self, integ):
        target = Distribution.normal(3.0, 2.0)
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=2.0),
            n_steps=2000,
            n_chains=1024,
            n_burnin=500,
            seed=7,
            return_stderr=True,
        )
        assert r.stderr is not None and r.stderr[0] > 0
        # The error bar should cover the truth within a few sigma.
        assert abs(r.values[0] - 3.0) < 6 * r.stderr[0]

    def test_diagnostics_mixed_chains(self, integ):
        target = Distribution.normal(0.0, 1.0)
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=1.5),
            n_steps=2000,
            n_chains=512,
            n_burnin=500,
            seed=17,
            return_diagnostics=True,
        )
        assert float(r.diagnostics["r_hat"][0]) < 1.05
        assert float(r.diagnostics["ess"][0]) > 1000

    def test_diagnostics_flag_slow_mixing(self, integ):
        # A tiny fixed step over a wide target mixes too slowly for the
        # run length: R-hat should flag it (well above the mixed case).
        target = Distribution.normal(0.0, 5.0)
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=0.01),
            n_steps=400,
            n_chains=512,
            n_burnin=50,
            seed=17,
            return_diagnostics=True,
        )
        assert float(r.diagnostics["r_hat"][0]) > 1.5

    def test_resume_fixed_step(self, integ):
        target = Distribution.normal(3.0, 2.0)
        rw = RandomWalk(step_size=2.0)
        r1 = integ.integrate_mcmc(
            [lambda x: x],
            target,
            rw,
            n_steps=500,
            n_chains=512,
            n_burnin=200,
            seed=1,
            return_state=True,
        )
        r2 = integ.integrate_mcmc(
            [lambda x: x],
            target,
            rw,
            n_steps=500,
            n_chains=512,
            n_burnin=0,
            seed=1,
            initial_state=r1.chain_state,
        )
        assert abs(r2.values[0] - 3.0) < 0.3
        # Resumed segment must draw fresh streams, not replay segment 0.
        assert r2.values[0] != r1.values[0]

    def test_seed_batch_handle_matches_single_calls(self, integ):
        target = Distribution.normal(1.0, 1.0)
        rw = RandomWalk(step_size=1.5)
        prog = integ.compile_mcmc(
            [lambda x: x],
            target,
            rw,
            n_steps=300,
            n_chains=512,
            n_burnin=100,
            seed_batch=3,
        )
        vals, accs = prog(np.array([5, 6, 7], np.uint32))
        for i, s in enumerate((5, 6, 7)):
            r = integ.integrate_mcmc(
                [lambda x: x],
                target,
                rw,
                n_steps=300,
                n_chains=512,
                n_burnin=100,
                seed=s,
            )
            assert float(vals[i][0]) == r.values[0]
            assert float(accs[i]) == pytest.approx(r.acceptance_rate)

    def test_sharded_matches_expectation(self, mesh8):
        integ = MonteCarloIntegrator(mesh=mesh8)
        target = Distribution.normal(2.0, 1.0)
        r = integ.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=1.5),
            n_steps=1500,
            n_chains=1024,
            n_burnin=300,
            seed=23,
        )
        assert abs(r.values[0] - 2.0) < 0.1


# ---------------------------------------------------------------------------
# Init ranges and quantiles
# ---------------------------------------------------------------------------


class TestInitAndQuantiles:
    def test_quantile_closed_forms(self):
        assert Distribution.uniform(2.0, 6.0).quantile(0.25) == 3.0
        n = Distribution.normal(0.0, 1.0)
        assert abs(n.quantile(0.975) - 1.959964) < 1e-5
        e = Distribution.exponential(2.0)
        assert abs(e.quantile(0.5) - np.log(2.0) / 2.0) < 1e-12
        c = Distribution.cauchy(1.0, 2.0)
        assert abs(c.quantile(0.75) - 3.0) < 1e-9
        lg = Distribution.logistic(0.0, 1.0)
        assert abs(lg.quantile(0.5)) < 1e-12
        w = Distribution.weibull(2.0, 3.0)
        assert abs(w.quantile(0.5) - 3.0 * np.log(2.0) ** 0.5) < 1e-9
        p = Distribution.pareto(1.0, 2.0)
        assert abs(p.quantile(0.75) - 2.0) < 1e-9

    def test_quantile_custom_table(self):
        d = Distribution.from_pdf(
            lambda x: 1.0 if 0.0 <= x < 2.0 else 0.0, support=(0.0, 2.0)
        )
        assert abs(d.quantile(0.25) - 0.5) < 2e-3

    def test_quantile_validation(self):
        d = Distribution.normal()
        for q in (0.0, 1.0, -0.1, 1.1):
            with pytest.raises(ValueError):
                d.quantile(q)

    def test_default_init_range_is_central_interval(self):
        target = Distribution.normal(2.0, 3.0)
        row = RandomWalk(step_size=0.5).pack_params(target)
        assert row.shape == (4,) and row.dtype == np.float32
        assert row[0] == np.float32(0.5)
        assert abs(row[1] - (2.0 - 2.326 * 3.0)) < 0.01
        assert abs(row[2] - (2.0 + 2.326 * 3.0)) < 0.01

    def test_explicit_init_range(self, integ):
        target = Distribution.normal(0.0, 1.0)
        rw = RandomWalk(step_size=1.0, init_range=(-0.5, 0.5))
        row = rw.pack_params(target)
        assert row[1] == np.float32(-0.5) and row[2] == np.float32(0.5)
        r = integ.integrate_mcmc(
            [lambda x: x], target, rw,
            n_steps=1000, n_chains=512, n_burnin=300, seed=3,
        )
        assert abs(r.values[0]) < 0.15


# ---------------------------------------------------------------------------
# Validation surface
# ---------------------------------------------------------------------------


class TestValidation:
    def test_ctor_validation(self):
        with pytest.raises(ValueError):
            RandomWalk(step_size=0.0)
        with pytest.raises(ValueError):
            RandomWalk(target_accept=0.0)
        with pytest.raises(ValueError):
            RandomWalk(target_accept=1.0)
        with pytest.raises(ValueError):
            RandomWalk(init_range=(1.0, 1.0))

    def test_adapt_needs_burnin(self, integ):
        target = Distribution.normal()
        with pytest.raises(ValueError, match="burn-in"):
            integ.integrate_mcmc(
                [lambda x: x], target, RandomWalk(adapt=True), n_burnin=0
            )

    def test_adapt_is_stateless_only(self, integ):
        target = Distribution.normal()
        with pytest.raises(ValueError, match="stateless"):
            integ.integrate_mcmc(
                [lambda x: x],
                target,
                RandomWalk(adapt=True),
                return_state=True,
            )

    def test_param_batch_rejected(self, integ):
        target = Distribution.normal()
        with pytest.raises(ValueError, match="param_batch"):
            integ.compile_mcmc(
                [lambda x: x],
                target,
                RandomWalk(),
                seed_batch=2,
                param_batch=True,
            )
