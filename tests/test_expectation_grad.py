"""Differentiable expectations: pathwise (reparameterization) gradients
of E[f(X_params)] with respect to the family parameters.

A capability outside the reference's WGSL-codegen design, natural in JAX:
``expectation_fn`` returns a pure jittable estimator over runtime params
whose value matches ``integrate`` on the XLA path bit-for-bit, and whose
``jax.grad`` is the unbiased pathwise gradient (the uniform/normal base
draws are parameter-independent; every analytic transform is
differentiable in its parameters).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    expectation_fn,
    integrate,
)

N = 400_000


class TestValueParity:
    def test_matches_integrate_bitwise(self):
        d = Distribution.normal(1.5, 2.0)
        fns = [lambda x: x, lambda x: x * x]
        est = expectation_fn(fns, d, n_samples=N)
        vals = np.asarray(est(jnp.asarray([1.5, 2.0]), seed=42))
        ref = integrate(fns, d, n_samples=N, seed=42, backend="xla")
        np.testing.assert_array_equal(vals, np.float32(ref.values))

    def test_qmc_matches_integrate_bitwise(self):
        d = Distribution.uniform(0.0, 2.0)
        est = expectation_fn([lambda x: x * x], d, n_samples=N, method="qmc")
        vals = np.asarray(est(jnp.asarray([0.0, 2.0]), seed=7))
        ref = integrate(
            [lambda x: x * x], d, n_samples=N, seed=7, backend="xla",
            method="qmc",
        )
        np.testing.assert_array_equal(vals, np.float32(ref.values))


class TestGradients:
    def test_normal_second_moment(self):
        # E[(m + s Z)^2] = m^2 + s^2  =>  d/dm = 2m, d/ds = 2s.
        est = expectation_fn(
            [lambda x: x * x], Distribution.normal(0.0, 1.0), n_samples=N
        )
        g = jax.grad(lambda p: est(p)[0])(jnp.asarray([1.0, 2.0]))
        assert abs(g[0] - 2.0) < 0.05
        assert abs(g[1] - 4.0) < 0.05

    def test_uniform_mean(self):
        # E[a + U (b - a)] = (a + b) / 2  =>  d/da = d/db = 1/2.
        est = expectation_fn(
            [lambda x: x], Distribution.uniform(0.0, 1.0), n_samples=N
        )
        g = jax.grad(lambda p: est(p)[0])(jnp.asarray([-1.0, 3.0]))
        assert abs(g[0] - 0.5) < 0.01
        assert abs(g[1] - 0.5) < 0.01

    def test_exponential_mean(self):
        # E[X] = 1/lambda  =>  d/dlambda = -1/lambda^2.
        est = expectation_fn(
            [lambda x: x], Distribution.exponential(1.0), n_samples=N
        )
        lam = 2.0
        g = jax.grad(lambda p: est(p)[0])(jnp.asarray([lam, 0.0]))
        assert abs(g[0] - (-1.0 / lam**2)) < 0.01

    def test_jit_grad_composes(self):
        est = expectation_fn(
            [lambda x: x * x], Distribution.normal(0.0, 1.0), n_samples=N
        )
        g = jax.jit(jax.grad(lambda p: est(p)[0]))(jnp.asarray([0.5, 1.0]))
        assert abs(g[0] - 1.0) < 0.05

    def test_second_order(self):
        # d^2/dm^2 E[(m + s Z)^2] = 2 exactly (the estimator is quadratic
        # in m, so this holds to float precision, not just statistically).
        est = expectation_fn(
            [lambda x: x * x], Distribution.normal(0.0, 1.0), n_samples=N
        )
        dm = jax.grad(lambda p: est(p)[0])
        h = jax.grad(lambda p: dm(p)[0])(jnp.asarray([0.3, 1.2]))
        assert abs(h[0] - 2.0) < 1e-3

    def test_vmap_parameter_sweep(self):
        est = expectation_fn(
            [lambda x: x], Distribution.normal(0.0, 1.0), n_samples=N
        )
        grid = jnp.stack(
            [jnp.asarray([m, 1.0]) for m in (-1.0, 0.0, 2.0)]
        )
        vals = jax.vmap(est)(grid)
        for v, m in zip(np.asarray(vals)[:, 0], (-1.0, 0.0, 2.0)):
            assert abs(v - m) < 0.01

    def test_qmc_gradient(self):
        est = expectation_fn(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            n_samples=N, method="qmc",
        )
        g = jax.grad(lambda p: est(p)[0])(jnp.asarray([1.0, 2.0]))
        assert abs(g[0] - 2.0) < 0.01
        assert abs(g[1] - 4.0) < 0.01


class TestShardedGradient:
    def test_grad_through_psum(self):
        est = MonteCarloIntegrator(mesh="auto").expectation_fn(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            n_samples=800_000,
        )
        g = jax.grad(lambda p: est(p)[0])(jnp.asarray([1.0, 2.0]))
        assert abs(g[0] - 2.0) < 0.05
        assert abs(g[1] - 4.0) < 0.05


class TestValidation:
    def test_custom_rejected(self):
        with pytest.raises(ValueError, match="expectation_fn applies"):
            expectation_fn([lambda x: x], Distribution.beta(2.0, 5.0))

    def test_params_shape_checked(self):
        # A wrong-shaped params array must error, not be silently
        # misread through JAX's clamped gather semantics.
        est = expectation_fn(
            [lambda x: x], Distribution.normal(0.0, 1.0), n_samples=N
        )
        with pytest.raises(ValueError, match=r"\(2,\) params"):
            est(jnp.asarray([2.0]))
        with pytest.raises(ValueError, match=r"\(2,\) params"):
            est(jnp.zeros((3, 2)))

    def test_forced_pallas_warns(self):
        with pytest.warns(UserWarning, match="XLA sweep"):
            MonteCarloIntegrator(backend="pallas").expectation_fn(
                [lambda x: x], Distribution.normal(0.0, 1.0), n_samples=N
            )
