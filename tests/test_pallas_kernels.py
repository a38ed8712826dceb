"""Pallas kernel tier: interpreter-mode runs on CPU (SURVEY.md §5 sanitizer
tier — the kernels execute in the Pallas interpreter, validating kernel
logic without TPU hardware; statistical tolerances are loose because
interpreter runs must stay small)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_montecarlo.ops.integrate_pallas import (
    build_integrate_fn_pallas,
    pallas_supports,
    plan_pallas_grid,
)
from tpu_montecarlo.ops.mcmc_pallas import (
    build_mcmc_fn_pallas,
    mcmc_pallas_supports,
    plan_mcmc_grid,
)
from tpu_montecarlo.sampling import DistKind
from tpu_montecarlo.tracing import trace_function
from tpu_montecarlo.utils.dispatch import make_integrate_plan

_DUMMY = np.zeros(1, np.float32)


def _fns():
    return tuple(
        trace_function(f) for f in [lambda x: x, lambda x: x * x]
    )


class TestSupportMatrix:
    def test_analytic_supported(self):
        assert pallas_supports(DistKind.UNIFORM)
        assert pallas_supports(DistKind.NORMAL)
        assert pallas_supports(DistKind.EXPONENTIAL)

    def test_custom_integrate_supported_via_inv_table(self):
        assert pallas_supports(DistKind.CUSTOM)

    def test_custom_mcmc_not_supported(self):
        assert not mcmc_pallas_supports(DistKind.CUSTOM, DistKind.NORMAL)
        assert not mcmc_pallas_supports(DistKind.NORMAL, DistKind.CUSTOM)

    def test_grid_plans_cover_request(self):
        for n in (1, 1000, 32768, 32769, 10_000_000):
            programs, loops, actual = plan_pallas_grid(n)
            assert actual >= n
            assert programs >= 1 and loops >= 1

    def test_mcmc_grid_covers_chains(self):
        for chains in (1, 256, 1024, 4096, 65536):
            programs, rows, actual = plan_mcmc_grid(chains)
            assert actual >= chains
            assert rows % 8 == 0


class TestInterpretedIntegrate:
    @pytest.mark.parametrize(
        "kind,params,expect_mean",
        [
            (DistKind.UNIFORM, [0.0, 1.0], 0.5),
            (DistKind.NORMAL, [0.0, 1.0], 0.0),
            (DistKind.EXPONENTIAL, [2.0, 0.0], 0.5),
        ],
    )
    def test_sampler_means(self, kind, params, expect_mean):
        plan = make_integrate_plan(200_000, target_threads=1024)
        run = build_integrate_fn_pallas(
            _fns(), kind, plan, interpret=True
        )
        vals = np.asarray(
            run(np.uint32(42), jnp.asarray(params, jnp.float32), _DUMMY, _DUMMY)
        )
        assert abs(vals[0] - expect_mean) < 0.05

    def test_normal_second_moment(self):
        plan = make_integrate_plan(500_000, target_threads=1024)
        run = build_integrate_fn_pallas(
            _fns(), DistKind.NORMAL, plan, interpret=True
        )
        vals = np.asarray(
            run(
                np.uint32(42),
                jnp.asarray([0.0, 1.0], jnp.float32),
                _DUMMY,
                _DUMMY,
            )
        )
        assert abs(vals[1] - 1.0) < 0.05

    def test_reproducible_for_fixed_seed(self):
        plan = make_integrate_plan(100_000, target_threads=1024)
        run = build_integrate_fn_pallas(
            _fns(), DistKind.UNIFORM, plan, interpret=True
        )
        p = jnp.asarray([0.0, 1.0], jnp.float32)
        v1 = np.asarray(run(np.uint32(7), p, _DUMMY, _DUMMY))
        v2 = np.asarray(run(np.uint32(7), p, _DUMMY, _DUMMY))
        np.testing.assert_array_equal(v1, v2)

    def test_custom_table_sampling(self):
        from tpu_montecarlo import Distribution
        from tpu_montecarlo.sampling import dist_spec_of

        beta = Distribution.beta(2.0, 5.0)
        spec = dist_spec_of(beta)
        plan = make_integrate_plan(200_000, target_threads=1024)
        run = build_integrate_fn_pallas(
            _fns(), DistKind.CUSTOM, plan, interpret=True
        )
        vals = np.asarray(
            run(
                np.uint32(42),
                jnp.asarray(spec.params),
                jnp.asarray(spec.x_table),
                jnp.asarray(spec.cdf_table),
            )
        )
        assert abs(vals[0] - 2.0 / 7.0) < 0.02

    def test_custom_table_must_be_lane_multiple(self):
        plan = make_integrate_plan(1000)
        run = build_integrate_fn_pallas(
            _fns(), DistKind.CUSTOM, plan, interpret=True
        )
        with pytest.raises(ValueError):
            run(
                np.uint32(42),
                jnp.zeros(2, jnp.float32),
                jnp.zeros(100, jnp.float32),
                jnp.zeros(1, jnp.float32),
            )


class TestInterpretedMCMC:
    def test_normal_target(self):
        run = build_mcmc_fn_pallas(
            _fns(),
            proposal_kind=DistKind.NORMAL,
            target_kind=DistKind.NORMAL,
            n_steps=300,
            n_burnin=50,
            total_chains=1024,
            interpret=True,
        )
        vals, acc = run(
            np.uint32(42),
            jnp.asarray([0.0, 2.0], jnp.float32),
            jnp.asarray([0.0, 1.0], jnp.float32),
        )
        vals = np.asarray(vals)
        assert abs(vals[0]) < 0.15
        assert abs(vals[1] - 1.0) < 0.25
        assert 0.3 < float(acc) < 0.9

    def test_accept_everything_when_q_equals_p(self):
        run = build_mcmc_fn_pallas(
            _fns(),
            proposal_kind=DistKind.NORMAL,
            target_kind=DistKind.NORMAL,
            n_steps=100,
            n_burnin=10,
            total_chains=1024,
            interpret=True,
        )
        _, acc = run(
            np.uint32(42),
            jnp.asarray([0.0, 1.0], jnp.float32),
            jnp.asarray([0.0, 1.0], jnp.float32),
        )
        assert float(acc) > 0.99

    def test_custom_rejected(self):
        with pytest.raises(ValueError):
            build_mcmc_fn_pallas(
                _fns(),
                proposal_kind=DistKind.CUSTOM,
                target_kind=DistKind.NORMAL,
                n_steps=10,
                n_burnin=0,
                total_chains=256,
            )
