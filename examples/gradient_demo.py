"""Differentiable expectations demo: optimize distribution parameters by
gradient descent THROUGH the Monte Carlo estimator.

`expectation_fn` returns a pure jittable JAX function of the family
parameters with unbiased pathwise (reparameterization) gradients — a
capability outside the reference's WGSL-codegen design.  Here we recover
the parameters of a normal distribution by matching moments: minimise
L(theta) = (E[X] - m*)^2 + (E[X^2] - (m*^2 + s*^2))^2 with jax.grad
descending straight through the sampler.
"""

import numpy as np

import jax
import jax.numpy as jnp

import tpu_montecarlo as mc


def main() -> None:
    target_mean, target_std = 1.5, 0.7
    m1_star = target_mean
    m2_star = target_mean**2 + target_std**2

    est = mc.expectation_fn(
        [lambda x: x, lambda x: x * x],
        mc.Distribution.normal(0.0, 1.0),
        n_samples=400_000,
    )

    def loss(theta):
        # theta = (mean, log_std): the log parameterization keeps std
        # positive along the whole descent path.
        params = jnp.stack([theta[0], jnp.exp(theta[1])])
        m1, m2 = est(params)
        return (m1 - m1_star) ** 2 + (m2 - m2_star) ** 2

    import optax

    opt = optax.adam(0.05)
    theta = jnp.asarray([0.0, np.log(2.0)])  # far-off initial
    state = opt.init(theta)

    @jax.jit
    def step_fn(theta, state):
        g = jax.grad(loss)(theta)
        updates, state = opt.update(g, state)
        return optax.apply_updates(theta, updates), state

    for step in range(800):
        theta, state = step_fn(theta, state)
        if step % 160 == 0:
            print(
                f"step {step:3d}: mean={float(theta[0]):+.4f} "
                f"std={float(jnp.exp(theta[1])):.4f} "
                f"loss={float(loss(theta)):.6f}"
            )

    mean, std = float(theta[0]), float(np.exp(theta[1]))
    print(f"recovered: mean={mean:.4f} (true {target_mean}), "
          f"std={std:.4f} (true {target_std})")
    assert abs(mean - target_mean) < 0.03
    assert abs(std - target_std) < 0.03

    # Sensitivity sweep: d E[X^2] / d(mean, std) across a parameter grid,
    # one vmap'd call.
    sens = jax.vmap(jax.grad(lambda p: est(p)[1]))(
        jnp.stack([jnp.asarray([m, 1.0]) for m in (-1.0, 0.0, 1.0, 2.0)])
    )
    print("d E[X^2]/d(mean, std) at std=1, mean in [-1, 0, 1, 2]:")
    print(np.round(np.asarray(sens), 3))  # rows ~ [2 mean, 2.0]


if __name__ == "__main__":
    main()
