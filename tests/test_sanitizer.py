"""Sanitizer tier (SURVEY.md §5): the reference is race-free by
construction and has no sanitizers; here the equivalents are (a) the Pallas
interpreter tests (test_pallas_kernels.py) and (b) checkify NaN/Inf checks
over the jitted estimators, asserting the compute paths produce no
non-finite intermediates for standard workloads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from tpu_montecarlo.ops.integrate_xla import build_integrate_fn
from tpu_montecarlo.ops.mcmc_xla import build_mcmc_fn
from tpu_montecarlo.sampling import DistKind
from tpu_montecarlo.tracing import trace_function
from tpu_montecarlo.utils.dispatch import make_integrate_plan

_DUMMY = jnp.zeros(1, jnp.float32)


def _checked(fn):
    return checkify.checkify(fn, errors=checkify.float_checks)


class TestNaNChecks:
    @pytest.mark.parametrize(
        "kind,params",
        [
            (DistKind.UNIFORM, [0.0, 1.0]),
            (DistKind.NORMAL, [0.0, 1.0]),
            (DistKind.EXPONENTIAL, [2.0, 0.0]),
        ],
    )
    def test_integrate_sweep_is_finite(self, kind, params):
        traced = tuple(
            trace_function(f) for f in [lambda x: x, lambda x: x * x]
        )
        plan = make_integrate_plan(100_000, target_threads=1024)
        run = build_integrate_fn(traced, kind, plan)
        err, out = _checked(run)(
            np.uint32(42), jnp.asarray(params, jnp.float32), _DUMMY, _DUMMY
        )
        err.throw()  # raises if any NaN/Inf was produced anywhere
        assert np.all(np.isfinite(np.asarray(out)))

    def test_mcmc_sweep_is_finite(self):
        # The -100 log-floor keeps the acceptance ratio finite even for
        # out-of-support proposals; checkify proves it end-to-end.
        traced = (trace_function(lambda x: x * x),)
        run = build_mcmc_fn(
            traced,
            proposal_kind=DistKind.UNIFORM,
            target_kind=DistKind.NORMAL,
            n_steps=200,
            n_burnin=20,
            total_chains=256,
        )
        err, (vals, acc) = _checked(run)(
            np.uint32(42),
            jnp.asarray([-6.0, 6.0], jnp.float32),
            jnp.asarray([0.0, 1.0], jnp.float32),
            *([_DUMMY] * 6),
        )
        err.throw()
        assert np.all(np.isfinite(np.asarray(vals)))
