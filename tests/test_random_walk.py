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
# Pallas kernel backend (interpret mode on CPU)
# ---------------------------------------------------------------------------


class TestPallasKernel:
    """The in-kernel random walk (ops/mcmc_pallas.py random_walk=True).

    Forced backend="pallas" runs the real kernel through the Pallas
    interpreter; streams differ from the XLA backend (hardware-PRNG
    counter model vs jax.random), so cross-backend checks are
    statistical, not bitwise.  Sizes are kept small — the interpreter
    executes the MH loop step by step.
    """

    @pytest.fixture(scope="class")
    def kern(self):
        return MonteCarloIntegrator(backend="pallas")

    def test_fixed_step_moments(self, kern):
        target = Distribution.normal(3.0, 2.0)
        r = kern.integrate_mcmc(
            [lambda x: x, lambda x: x * x],
            target,
            RandomWalk(step_size=2.0),
            n_steps=400,
            n_chains=512,
            n_burnin=100,
            seed=7,
        )
        assert abs(r.values[0] - 3.0) < 0.15
        assert abs(r.values[1] - 13.0) < 0.8
        assert 0.0 < r.acceptance_rate < 1.0

    def test_adapts_to_target_accept(self, kern):
        # A 50x-too-large starting step must be tuned down in-kernel.
        target = Distribution.normal(3.0, 2.0)
        r = kern.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=50.0, adapt=True),
            n_steps=400,
            n_chains=512,
            n_burnin=300,
            seed=7,
        )
        assert abs(r.values[0] - 3.0) < 0.2
        assert abs(r.acceptance_rate - 0.44) < 0.1

    def test_custom_table_target(self, kern):
        target = Distribution.from_pdf(
            lambda x: np.exp(-abs(x - 1.0)), support=(-9.0, 11.0)
        )
        r = kern.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=1.5),
            n_steps=400,
            n_chains=512,
            n_burnin=100,
            seed=3,
        )
        assert abs(r.values[0] - 1.0) < 0.25

    def test_matches_xla_statistically(self, kern):
        target = Distribution.exponential(2.0)
        rw = RandomWalk(step_size=0.7)
        kwargs = dict(n_steps=600, n_chains=512, n_burnin=150, seed=11)
        rp = kern.integrate_mcmc([lambda x: x], target, rw, **kwargs)
        rx = MonteCarloIntegrator(backend="xla").integrate_mcmc(
            [lambda x: x], target, rw, **kwargs
        )
        assert abs(rp.values[0] - rx.values[0]) < 0.05
        assert abs(rp.acceptance_rate - rx.acceptance_rate) < 0.05

    def test_stderr_stays_in_kernel(self, kern):
        target = Distribution.normal(3.0, 2.0)
        r = kern.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=2.0),
            n_steps=400,
            n_chains=512,
            n_burnin=100,
            seed=7,
            return_stderr=True,
        )
        assert r.stderr is not None and r.stderr[0] > 0
        assert abs(r.values[0] - 3.0) < 6 * r.stderr[0]

    def test_seed_batch_handle_matches_single_calls(self, kern):
        target = Distribution.normal(1.0, 1.0)
        rw = RandomWalk(step_size=1.5)
        kwargs = dict(n_steps=200, n_chains=512, n_burnin=50)
        prog = kern.compile_mcmc(
            [lambda x: x], target, rw, seed_batch=2, **kwargs
        )
        vals, accs = prog(np.array([5, 9], np.uint32))
        for i, s in enumerate((5, 9)):
            r = kern.integrate_mcmc(
                [lambda x: x], target, rw, seed=s, **kwargs
            )
            assert float(vals[i][0]) == r.values[0]
            assert float(accs[i]) == pytest.approx(r.acceptance_rate)

    def test_resume_fixed_step(self, kern):
        target = Distribution.normal(3.0, 2.0)
        rw = RandomWalk(step_size=2.0)
        r1 = kern.integrate_mcmc(
            [lambda x: x],
            target,
            rw,
            n_steps=200,
            n_chains=512,
            n_burnin=100,
            seed=1,
            return_state=True,
        )
        r2 = kern.integrate_mcmc(
            [lambda x: x],
            target,
            rw,
            n_steps=200,
            n_chains=512,
            n_burnin=0,
            seed=1,
            initial_state=r1.chain_state,
        )
        assert abs(r2.values[0] - 3.0) < 0.4
        # The resumed segment draws fresh streams, not a replay.
        assert r2.values[0] != r1.values[0]

    def test_sharded_matches_expectation(self, mesh8):
        kern = MonteCarloIntegrator(backend="pallas", mesh=mesh8)
        target = Distribution.normal(2.0, 1.0)
        r = kern.integrate_mcmc(
            [lambda x: x],
            target,
            RandomWalk(step_size=1.5),
            n_steps=400,
            n_chains=1024,
            n_burnin=100,
            seed=23,
        )
        assert abs(r.values[0] - 2.0) < 0.15

    def test_builder_rejects_param_batch_custom_target(self):
        # A random walk's own rows always batch; the analytic-family
        # gate still applies to the TARGET (a custom table cannot take
        # runtime parameter words).
        from tpu_montecarlo.ops.mcmc_pallas import build_mcmc_fn_pallas
        from tpu_montecarlo.sampling import DistKind

        with pytest.raises(ValueError, match="analytic"):
            build_mcmc_fn_pallas(
                [lambda x: x],
                DistKind.CUSTOM,
                DistKind.CUSTOM,
                100,
                10,
                512,
                interpret=True,
                seed_batch=2,
                param_batch=True,
                random_walk=True,
            )


# ---------------------------------------------------------------------------
# Multi-dimensional random walks
# ---------------------------------------------------------------------------


def _corr_gauss_logp(x, y):
    # Correlated bivariate normal, rho = 0.6: E[XY] = 0.6.
    return -0.5 * (x * x + y * y - 1.2 * x * y) / (1.0 - 0.36)


class TestNdRandomWalk:
    """d-dimensional random-walk MH: a RandomWalk proposal with a
    sequence-of-Distributions (product) or joint log-density target.
    The dimension count comes from the target itself (sequence length
    or the density's arity)."""

    def test_product_target_moments(self, integ):
        targets = [
            Distribution.normal(1.0, 1.0), Distribution.exponential(2.0)
        ]
        r = integ.integrate_mcmc(
            [lambda x, y: x, lambda x, y: y, lambda x, y: x * y],
            targets,
            RandomWalk(step_size=[1.5, 0.6]),
            n_steps=2000,
            n_chains=1024,
            n_burnin=500,
            seed=7,
        )
        assert abs(r.values[0] - 1.0) < 0.1
        assert abs(r.values[1] - 0.5) < 0.05
        assert abs(r.values[2] - 0.5) < 0.08  # independent dims

    def test_joint_target_with_adaptation(self, integ):
        r = integ.integrate_mcmc(
            [lambda x, y: x * y],
            _corr_gauss_logp,
            RandomWalk(
                step_size=1.0, adapt=True, target_accept=0.3,
                init_range=(-3.0, 3.0),
            ),
            n_steps=3000,
            n_chains=1024,
            n_burnin=1000,
            seed=3,
        )
        assert abs(r.values[0] - 0.6) < 0.08
        assert abs(r.acceptance_rate - 0.3) < 0.06

    def test_joint_target_needs_init_range(self, integ):
        with pytest.raises(ValueError, match="init_range"):
            integ.integrate_mcmc(
                [lambda x, y: x],
                _corr_gauss_logp,
                RandomWalk(step_size=1.0),
                n_steps=100,
                n_chains=256,
                n_burnin=10,
            )

    def test_step_size_length_mismatch(self, integ):
        targets = [Distribution.normal(), Distribution.normal()]
        with pytest.raises(ValueError, match="dimension"):
            integ.integrate_mcmc(
                [lambda x, y: x],
                targets,
                RandomWalk(step_size=[1.0, 2.0, 3.0]),
                n_steps=100,
                n_chains=256,
                n_burnin=10,
            )

    def test_per_dim_init_ranges(self, integ):
        targets = [Distribution.normal(), Distribution.uniform(2.0, 4.0)]
        rw = RandomWalk(
            step_size=1.0, init_range=[(-2.0, 2.0), (2.5, 3.5)]
        )
        rows = rw.pack_params_nd(targets, 2)
        assert rows.shape == (2, 4)
        assert rows[0][1] == np.float32(-2.0)
        assert rows[1][2] == np.float32(3.5)
        r = integ.integrate_mcmc(
            [lambda x, y: y],
            targets,
            rw,
            n_steps=1000,
            n_chains=512,
            n_burnin=300,
            seed=5,
        )
        assert abs(r.values[0] - 3.0) < 0.1

    def test_var_args_target_rejected(self, integ):
        with pytest.raises(TypeError, match="dimension"):
            integ.integrate_mcmc(
                [lambda x, y: x],
                lambda *xs: -sum(v * v for v in xs),
                RandomWalk(step_size=1.0, init_range=(-2.0, 2.0)),
                n_steps=100,
                n_chains=256,
            )

    def test_three_dim_arity_detection(self, integ):
        # d is read off the joint density's own signature.
        r = integ.integrate_mcmc(
            [lambda x, y, z: x * x + y * y + z * z],
            lambda x, y, z: -0.5 * (x * x + y * y + z * z),
            RandomWalk(step_size=1.2, init_range=(-3.0, 3.0)),
            n_steps=2000,
            n_chains=1024,
            n_burnin=500,
            seed=11,
        )
        assert abs(r.values[0] - 3.0) < 0.15

    def test_stderr_and_resume(self, integ):
        targets = [Distribution.normal(2.0, 1.0), Distribution.normal()]
        rw = RandomWalk(step_size=1.2)
        rs = integ.integrate_mcmc(
            [lambda x, y: x],
            targets,
            rw,
            n_steps=1500,
            n_chains=512,
            n_burnin=300,
            seed=9,
            return_stderr=True,
        )
        assert rs.stderr is not None and rs.stderr[0] > 0
        assert abs(rs.values[0] - 2.0) < 6 * rs.stderr[0]
        r1 = integ.integrate_mcmc(
            [lambda x, y: x],
            targets,
            rw,
            n_steps=500,
            n_chains=512,
            n_burnin=200,
            seed=1,
            return_state=True,
        )
        r2 = integ.integrate_mcmc(
            [lambda x, y: x],
            targets,
            rw,
            n_steps=500,
            n_chains=512,
            n_burnin=0,
            seed=1,
            initial_state=r1.chain_state,
        )
        assert abs(r2.values[0] - 2.0) < 0.3
        assert r2.values[0] != r1.values[0]

    def test_diagnostics(self, integ):
        targets = [Distribution.normal(), Distribution.normal()]
        r = integ.integrate_mcmc(
            [lambda x, y: x + y],
            targets,
            RandomWalk(step_size=1.5),
            n_steps=2000,
            n_chains=512,
            n_burnin=500,
            seed=17,
            return_diagnostics=True,
        )
        assert float(r.diagnostics["r_hat"][0]) < 1.05

    def test_sharded(self, mesh8):
        integ = MonteCarloIntegrator(mesh=mesh8)
        r = integ.integrate_mcmc(
            [lambda x, y: x * y],
            _corr_gauss_logp,
            RandomWalk(step_size=1.0, init_range=(-3.0, 3.0)),
            n_steps=1500,
            n_chains=1024,
            n_burnin=300,
            seed=23,
        )
        assert abs(r.values[0] - 0.6) < 0.1


class TestNdRandomWalkPallas:
    """The nd random-walk kernel tier (interpret mode on CPU)."""

    @pytest.fixture(scope="class")
    def kern(self):
        return MonteCarloIntegrator(backend="pallas")

    def test_product_target(self, kern):
        targets = [
            Distribution.normal(1.0, 1.0), Distribution.exponential(2.0)
        ]
        r = kern.integrate_mcmc(
            [lambda x, y: x, lambda x, y: y],
            targets,
            RandomWalk(step_size=[1.5, 0.6]),
            n_steps=400,
            n_chains=512,
            n_burnin=150,
            seed=7,
        )
        assert abs(r.values[0] - 1.0) < 0.15
        assert abs(r.values[1] - 0.5) < 0.08

    def test_joint_target_adapts(self, kern):
        r = kern.integrate_mcmc(
            [lambda x, y: x * y],
            _corr_gauss_logp,
            RandomWalk(
                step_size=1.0, adapt=True, target_accept=0.3,
                init_range=(-3.0, 3.0),
            ),
            n_steps=500,
            n_chains=512,
            n_burnin=400,
            seed=3,
        )
        assert abs(r.values[0] - 0.6) < 0.12
        assert abs(r.acceptance_rate - 0.3) < 0.07

    def test_matches_xla_statistically(self, kern):
        targets = [Distribution.normal(2.0, 1.0), Distribution.normal()]
        rw = RandomWalk(step_size=1.2)
        kwargs = dict(n_steps=600, n_chains=512, n_burnin=150, seed=11)
        rp = kern.integrate_mcmc([lambda x, y: x], targets, rw, **kwargs)
        rx = MonteCarloIntegrator(backend="xla").integrate_mcmc(
            [lambda x, y: x], targets, rw, **kwargs
        )
        assert abs(rp.values[0] - rx.values[0]) < 0.07

    def test_seed_batch_handle_matches_single_calls(self, kern):
        targets = [Distribution.normal(1.0, 1.0), Distribution.normal()]
        rw = RandomWalk(step_size=1.2)
        kwargs = dict(n_steps=200, n_chains=512, n_burnin=50)
        prog = kern.compile_mcmc(
            [lambda x, y: x + y], targets, rw, seed_batch=2, **kwargs
        )
        vals, accs = prog(np.array([5, 9], np.uint32))
        for i, s in enumerate((5, 9)):
            r = kern.integrate_mcmc(
                [lambda x, y: x + y], targets, rw, seed=s, **kwargs
            )
            assert float(vals[i][0]) == r.values[0]
            assert float(accs[i]) == pytest.approx(r.acceptance_rate)

    def test_stderr_in_kernel(self, kern):
        targets = [Distribution.normal(3.0, 2.0), Distribution.normal()]
        r = kern.integrate_mcmc(
            [lambda x, y: x],
            targets,
            RandomWalk(step_size=1.5),
            n_steps=400,
            n_chains=512,
            n_burnin=100,
            seed=7,
            return_stderr=True,
        )
        assert r.stderr is not None and r.stderr[0] > 0
        assert abs(r.values[0] - 3.0) < 6 * r.stderr[0]

    def test_sharded_joint(self, mesh8):
        kern = MonteCarloIntegrator(backend="pallas", mesh=mesh8)
        r = kern.integrate_mcmc(
            [lambda x, y: x * y],
            _corr_gauss_logp,
            RandomWalk(step_size=1.0, init_range=(-3.0, 3.0)),
            n_steps=400,
            n_chains=1024,
            n_burnin=150,
            seed=23,
        )
        assert abs(r.values[0] - 0.6) < 0.12


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

    def test_param_batch_custom_target_rejected(self, integ):
        # Walk rows always batch, but the target stays gated to the
        # analytic families (custom tables are host-built per
        # distribution and carry no runtime parameter words).
        target = Distribution.beta(2.0, 5.0)
        with pytest.raises(ValueError, match="analytic"):
            integ.compile_mcmc(
                [lambda x: x],
                target,
                RandomWalk(),
                seed_batch=2,
                param_batch=True,
            )


# ---------------------------------------------------------------------------
# Parameter-batched random walks: one compiled program sweeping
# (target parameters, walk rows) pairs in a single dispatch
# ---------------------------------------------------------------------------


class TestRandomWalkParamBatch:
    SEEDS = [7, 42, 1234]

    def _targets(self):
        from tpu_montecarlo import pack_param_batch

        dists = [
            Distribution.normal(0.0, 1.0),
            Distribution.normal(1.0, 2.0),
            Distribution.normal(-2.0, 0.5),
        ]
        return dists, pack_param_batch(dists)

    def test_pack_shapes_and_tag(self):
        from tpu_montecarlo import (
            pack_random_walk_batch,
            pack_random_walk_batch_nd,
        )

        dists, _ = self._targets()
        walks = [RandomWalk(step_size=s) for s in (1.0, 2.4, 5.0)]
        p = pack_random_walk_batch(walks, dists)
        assert p.shape == (3, 4) and p.family == "rw"
        np.testing.assert_allclose(p[:, 0], [1.0, 2.4, 5.0])
        # Per-row default init range = that row's central 98% interval.
        np.testing.assert_allclose(
            p[1, 1:3],
            [dists[1].quantile(0.01), dists[1].quantile(0.99)],
            rtol=1e-5,
        )
        pn = pack_random_walk_batch_nd(walks, [dists[0], dists[1]])
        assert pn.shape == (3, 2, 4) and pn.family == "rw"
        pj = pack_random_walk_batch_nd(
            [RandomWalk(step_size=1.0, init_range=(-3, 3))] * 2, d=3
        )
        assert pj.shape == (2, 3, 4)

    def test_pack_validation(self):
        from tpu_montecarlo import (
            pack_random_walk_batch,
            pack_random_walk_batch_nd,
        )

        dists, _ = self._targets()
        with pytest.raises(ValueError, match="at least one"):
            pack_random_walk_batch([], dists[0])
        with pytest.raises(TypeError, match="RandomWalk"):
            pack_random_walk_batch([dists[0]], dists[0])
        with pytest.raises(ValueError, match="walks but"):
            pack_random_walk_batch([RandomWalk()] * 2, dists)
        with pytest.raises(ValueError, match="init_range"):
            pack_random_walk_batch([RandomWalk()])  # no target, no range
        with pytest.raises(ValueError, match="pass d="):
            pack_random_walk_batch_nd(
                [RandomWalk(init_range=(-1, 1))]
            )
        # Adaptation is compile-time: mixed adapt= rows would silently
        # adapt every row, so the pack rejects them outright.
        with pytest.raises(ValueError, match="share adapt"):
            pack_random_walk_batch(
                [RandomWalk(adapt=True), RandomWalk()], dists[0]
            )

    def test_adapt_tag_must_match_program(self):
        """A fixed-step pack is rejected by a program compiled with an
        adaptive walk (and vice versa): adaptation is a compile-time
        kernel phase, so silently adapting a fixed-step row would break
        the element-bit-equal-to-unbatched guarantee."""
        from tpu_montecarlo import (
            pack_param_batch,
            pack_random_walk_batch,
        )

        integ = MonteCarloIntegrator()
        dists, tp = self._targets()
        fixed = pack_random_walk_batch([RandomWalk()] * 3, dists)
        adaptive = pack_random_walk_batch(
            [RandomWalk(adapt=True)] * 3, dists
        )
        assert fixed.family == "rw" and adaptive.family == "rw_adapt"
        prog = integ.compile_mcmc(
            [lambda x: x], dists[0], RandomWalk(adapt=True),
            n_steps=100, n_chains=256, n_burnin=20,
            seed_batch=3, param_batch=True,
        )
        with pytest.raises(ValueError, match="fixed-step RandomWalk"):
            prog(self.SEEDS, tp, fixed)
        vals, _ = prog(self.SEEDS, tp, adaptive)
        assert np.asarray(vals).shape == (3, 1)

    @pytest.mark.parametrize("backend", ["pallas", "xla"])
    def test_elements_match_unbatched(self, backend):
        """Each batch element reproduces the unbatched handle built from
        the same (target, walk) pair with the same seed — bit-for-bit on
        both backends (the kernel grid reps and the lax.map elements
        keep the exact single-job streams)."""
        from tpu_montecarlo import (
            pack_param_batch,
            pack_random_walk_batch,
        )

        integ = MonteCarloIntegrator(backend=backend)
        dists, tp = self._targets()
        walks = [RandomWalk(step_size=s) for s in (1.0, 2.4, 0.7)]
        pp = pack_random_walk_batch(walks, dists)
        fns = [lambda x: x, lambda x: x * x]
        kw = dict(n_steps=300, n_chains=512, n_burnin=100)
        prog = integ.compile_mcmc(
            fns, dists[0], walks[0], seed_batch=3, param_batch=True, **kw
        )
        vals, acc = prog(self.SEEDS, tp, pp)
        vals, acc = np.asarray(vals), np.asarray(acc)
        assert vals.shape == (3, 2) and acc.shape == (3,)
        for i, (s, d, w) in enumerate(zip(self.SEEDS, dists, walks)):
            single = integ.compile_mcmc(fns, d, w, **kw)
            sv, sa = single(s)
            np.testing.assert_array_equal(vals[i], np.asarray(sv))
            np.testing.assert_array_equal(acc[i], np.asarray(sa))

    def test_adaptive_sweep_hits_target_acceptance(self):
        """A step-size sweep with adapt=True: every row lands near its
        own target acceptance regardless of its (bad) initial step."""
        from tpu_montecarlo import (
            pack_param_batch,
            pack_random_walk_batch,
        )

        integ = MonteCarloIntegrator(backend="pallas")
        dists, tp = self._targets()
        walks = [
            RandomWalk(step_size=s, adapt=True, target_accept=ta)
            for s, ta in ((20.0, 0.44), (0.01, 0.3), (8.0, 0.6))
        ]
        pp = pack_random_walk_batch(walks, dists)
        prog = integ.compile_mcmc(
            [lambda x: x], dists[0], walks[0],
            n_steps=1500, n_chains=512, n_burnin=600,
            seed_batch=3, param_batch=True, return_stderr=True,
        )
        vals, acc, se = prog(self.SEEDS, tp, pp)
        vals, acc = np.asarray(vals).ravel(), np.asarray(acc)
        np.testing.assert_allclose(vals, [0.0, 1.0, -2.0], atol=0.25)
        np.testing.assert_allclose(acc, [0.44, 0.3, 0.6], atol=0.12)
        assert np.all(np.asarray(se) > 0)

    @pytest.mark.parametrize("backend", ["pallas", "xla"])
    def test_nd_elements_match_unbatched(self, backend):
        from tpu_montecarlo import (
            pack_param_batch_nd,
            pack_random_walk_batch_nd,
        )

        integ = MonteCarloIntegrator(backend=backend)
        rows = [
            [Distribution.normal(0.0, 1.0), Distribution.normal(0.0, 1.0)],
            [Distribution.normal(1.0, 1.0), Distribution.normal(-1.0, 2.0)],
        ]
        tp = pack_param_batch_nd(rows)
        walks = [
            RandomWalk(step_size=[1.0, 2.0]),
            RandomWalk(step_size=0.8),
        ]
        pp = pack_random_walk_batch_nd(walks, rows)
        fns = [lambda x, y: x + y]
        kw = dict(n_steps=300, n_chains=512, n_burnin=100)
        prog = integ.compile_mcmc(
            fns, rows[0], walks[0], seed_batch=2, param_batch=True, **kw
        )
        vals, acc = prog(self.SEEDS[:2], tp, pp)
        vals, acc = np.asarray(vals), np.asarray(acc)
        for i, (s, row, w) in enumerate(zip(self.SEEDS, rows, walks)):
            single = integ.compile_mcmc(fns, row, w, **kw)
            sv, sa = single(s)
            np.testing.assert_array_equal(vals[i], np.asarray(sv))
            np.testing.assert_array_equal(acc[i], np.asarray(sa))

    def test_wrong_pack_rejected_at_dispatch(self):
        from tpu_montecarlo import (
            pack_param_batch,
            pack_random_walk_batch,
        )

        integ = MonteCarloIntegrator()
        dists, tp = self._targets()
        pp = pack_random_walk_batch([RandomWalk()] * 3, dists)
        prog = integ.compile_mcmc(
            [lambda x: x], dists[0], RandomWalk(),
            n_steps=100, n_chains=256, n_burnin=10,
            seed_batch=3, param_batch=True,
        )
        with pytest.raises(ValueError, match="RandomWalk"):
            prog(self.SEEDS, tp, tp)  # family pack in the walk slot
        with pytest.raises(ValueError, match="expected a"):
            prog(self.SEEDS, tp, np.zeros((3, 2), np.float32))
        # And the reverse: a walk pack where family rows are expected
        # (the family tag mismatch fires before the shape check).
        with pytest.raises(ValueError, match="RandomWalk proposals"):
            prog(self.SEEDS, pp, pp)
