"""Multi-device sharding tier — the tier the single-device reference lacks.

Runs on the 8-virtual-CPU-device mesh from conftest.  Validates that
sample/chain data parallelism over a ``jax.sharding.Mesh`` (psum over the
mesh axis) produces the same estimates as single-device execution for the
same workload plan — the grid-shape-independence property the counter-based
RNG design guarantees (SURVEY.md §2.4, §7.3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_montecarlo import Distribution, MonteCarloIntegrator
from tpu_montecarlo.ops.integrate_xla import build_integrate_fn
from tpu_montecarlo.ops.mcmc_xla import build_mcmc_fn, plan_chains
from tpu_montecarlo.sampling import DistKind
from tpu_montecarlo.tracing import trace_function
from tpu_montecarlo.utils.dispatch import make_integrate_plan


def _fns():
    return tuple(
        trace_function(f)
        for f in [lambda x: x, lambda x: x * x, lambda x: x > 1.0]
    )


class TestShardedIntegrate:
    def test_mesh_matches_single_device_exactly(self, mesh8):
        """Same plan, same seeds per chunk => sharded result must equal the
        single-device result bit-for-bit (streams keyed by global chunk)."""
        traced = _fns()
        plan = make_integrate_plan(
            800_000, target_threads=1024, max_chunk_elems=100 * 1024, n_dev=8
        )
        assert plan.n_chunks % 8 == 0
        dummy = jnp.zeros(1, jnp.float32)
        params = jnp.asarray([0.0, 1.0], jnp.float32)

        single = build_integrate_fn(traced, DistKind.NORMAL, plan)
        sharded = build_integrate_fn(traced, DistKind.NORMAL, plan, mesh=mesh8)
        v1 = np.asarray(single(np.uint32(42), params, dummy, dummy))
        v8 = np.asarray(sharded(np.uint32(42), params, dummy, dummy))
        np.testing.assert_allclose(v1, v8, rtol=1e-6)

    def test_sharded_statistics(self, mesh8):
        integ = MonteCarloIntegrator(mesh=mesh8)
        dist = Distribution.normal(0.0, 1.0)
        result = integ.integrate(
            [lambda x: x, lambda x: x * x], dist, n_samples=4_000_000
        )
        assert abs(result.values[0]) < 0.01
        assert abs(result.values[1] - 1.0) < 0.01

    def test_sharded_custom_table_dist(self, mesh8):
        integ = MonteCarloIntegrator(mesh=mesh8)
        dist = Distribution.beta(2.0, 5.0)
        result = integ.integrate([lambda x: x], dist, n_samples=2_000_000)
        assert abs(result.values[0] - 2.0 / 7.0) < 0.02

    def test_auto_mesh_api(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        integ = MonteCarloIntegrator(mesh="auto")
        dist = Distribution.uniform(0.0, 1.0)
        result = integ.integrate([lambda x: x], dist, n_samples=1_000_000)
        assert abs(result.values[0] - 0.5) < 0.01

    def test_bad_mesh_arg_rejected(self):
        with pytest.raises(TypeError):
            MonteCarloIntegrator(mesh=42)


class TestShardedIS:
    def test_sharded_importance_sampling(self, mesh8):
        integ = MonteCarloIntegrator(mesh=mesh8)
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 1.5)
        result = integ.integrate_importance_sampling(
            [lambda x: x * x], target, proposal, n_samples=2_000_000
        )
        assert abs(result.values[0] - 1.0) < 0.02


class TestShardedMCMC:
    def test_chain_plan_divides_over_devices(self):
        total = plan_chains(1000, None, 8)
        assert total % 8 == 0
        assert total >= 1000

    def test_sharded_mcmc_statistics(self, mesh8):
        integ = MonteCarloIntegrator(mesh=mesh8)
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 2.0)
        result = integ.integrate_mcmc(
            [lambda x: x, lambda x: x * x], target, proposal,
            n_steps=1000, n_chains=1024, n_burnin=100,
        )
        assert abs(result.values[0]) < 0.1
        assert abs(result.values[1] - 1.0) < 0.2
        assert 0.0 < result.acceptance_rate <= 1.0

    def test_sharded_mcmc_reproducible(self, mesh8):
        integ = MonteCarloIntegrator(mesh=mesh8)
        target = Distribution.normal(0.0, 1.0)
        proposal = Distribution.normal(0.0, 2.0)
        r1 = integ.integrate_mcmc(
            [lambda x: x], target, proposal,
            n_steps=300, n_chains=512, n_burnin=50, seed=9,
        )
        r2 = integ.integrate_mcmc(
            [lambda x: x], target, proposal,
            n_steps=300, n_chains=512, n_burnin=50, seed=9,
        )
        np.testing.assert_array_almost_equal(r1.values, r2.values)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, ".")
        from __graft_entry__ import entry

        fn, args = entry()
        out = np.asarray(jax.jit(fn)(*args))
        assert out.shape == (8,)
        assert abs(out[1] - 1.0) < 0.05

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, ".")
        from __graft_entry__ import dryrun_multichip

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        dryrun_multichip(8)


class TestShardedPallas:
    def test_sharded_pallas_integrate_interpret(self, mesh8):
        """The Pallas kernel's mesh branch (psum over the mesh axis) runs
        in interpreter mode on the virtual CPU mesh."""
        from tpu_montecarlo.ops.integrate_pallas import (
            build_integrate_fn_pallas,
        )

        traced = _fns()
        plan = make_integrate_plan(600_000, n_dev=8)
        run = build_integrate_fn_pallas(
            traced, DistKind.NORMAL, plan, mesh=mesh8, interpret=True
        )
        dummy = jnp.zeros(1, jnp.float32)
        vals = np.asarray(
            run(np.uint32(42), jnp.asarray([0.0, 1.0], jnp.float32),
                dummy, dummy)
        )
        assert abs(vals[0]) < 0.05
        assert abs(vals[1] - 1.0) < 0.05

    def test_sharded_pallas_mcmc_interpret(self, mesh8):
        from tpu_montecarlo.ops.mcmc_pallas import build_mcmc_fn_pallas

        run = build_mcmc_fn_pallas(
            _fns(),
            proposal_kind=DistKind.NORMAL,
            target_kind=DistKind.NORMAL,
            n_steps=100,
            n_burnin=20,
            total_chains=8 * 1024,
            mesh=mesh8,
            interpret=True,
        )
        dummy = jnp.zeros(1, jnp.float32)
        vals, acc = run(
            np.uint32(42),
            jnp.asarray([0.0, 2.0], jnp.float32),
            jnp.asarray([0.0, 1.0], jnp.float32),
            *([dummy] * 6),
        )
        assert abs(float(np.asarray(vals)[1]) - 1.0) < 0.3
        assert 0.0 < float(acc) <= 1.0
