"""Importance-sampling proposal-quality diagnostics
(``return_diagnostics=True`` on integrate_importance_sampling).

An addition over the reference (point estimates only): the Kish
effective sample size (Σw)²/Σw², the mean weight, and the weight CV are
read from a constant-1 integrand folded through the same weight
machinery as the user's functions — in-kernel, no extra dispatch.
"""

import math

import numpy as np
import pytest

import tpu_montecarlo as mc
from tpu_montecarlo import Distribution, MonteCarloIntegrator
from tpu_montecarlo.api import integrate_importance_sampling


class TestEss:
    def test_perfect_proposal_gives_full_ess(self):
        # p == q -> w == 1 exactly -> ESS == n, cv == 0, mean weight 1.
        n = 400_000
        r = integrate_importance_sampling(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            Distribution.normal(0.0, 1.0), n_samples=n,
            return_diagnostics=True,
        )
        d = r.diagnostics
        assert abs(d["mean_weight"] - 1.0) < 1e-4
        assert d["ess"] > 0.999 * n
        assert d["weight_cv"] < 1e-2

    def test_shifted_proposal_matches_closed_form(self):
        # p = N(0,1), q = N(mu,1): E_q[w^2] = e^{mu^2}, so
        # ESS/n -> e^{-mu^2} (Kish).  mu = 1 -> 0.368.
        n = 2_000_000
        r = integrate_importance_sampling(
            [lambda x: x], Distribution.normal(0.0, 1.0),
            Distribution.normal(1.0, 1.0), n_samples=n,
            return_diagnostics=True,
        )
        d = r.diagnostics
        assert abs(d["mean_weight"] - 1.0) < 0.01
        assert abs(d["ess"] / n - math.exp(-1.0)) < 0.02
        # ess = n / (1 + cv^2) consistency.
        assert abs(d["ess"] - n / (1 + d["weight_cv"] ** 2)) < 1e-3 * n

    def test_bad_proposal_flags_low_ess(self):
        n = 400_000
        r = integrate_importance_sampling(
            [lambda x: x], Distribution.normal(0.0, 1.0),
            Distribution.normal(2.5, 1.0), n_samples=n,
            return_diagnostics=True,
        )
        assert r.diagnostics["ess"] < 0.01 * n

    def test_values_match_plain_run(self):
        # The diagnostics column must not perturb the user's estimates:
        # same backend, same streams -> bit-equal values.
        fns = [lambda x: x, lambda x: x * x]
        p = Distribution.normal(0.0, 1.0)
        q = Distribution.normal(0.5, 1.2)
        it = MonteCarloIntegrator(backend="pallas")
        r_d = it.integrate_importance_sampling(
            fns, p, q, n_samples=300_000, seed=3, return_diagnostics=True,
        )
        r_p = it.integrate_importance_sampling(
            fns, p, q, n_samples=300_000, seed=3,
        )
        np.testing.assert_array_equal(
            np.float32(r_d.values), np.float32(r_p.values)
        )
        assert r_d.stderr is None  # not requested

    def test_with_stderr_too(self):
        r = integrate_importance_sampling(
            [lambda x: x], Distribution.normal(0.0, 1.0),
            Distribution.normal(0.5, 1.1), n_samples=300_000,
            return_stderr=True, return_diagnostics=True,
        )
        assert r.stderr is not None and r.stderr.shape == (1,)
        assert abs(r.values[0]) < 5 * r.stderr[0]
        assert "ess" in r.diagnostics

    def test_table_weight_route(self):
        # Non-traceable target -> in-kernel table weights; the weight
        # column rides the same kernel.
        def box(x):
            return float(int(abs(x) < 1.0)) * 0.5

        target = Distribution.from_pdf(box, support=(-1.0, 1.0))
        n = 300_000
        r = integrate_importance_sampling(
            [lambda x: x * x], target, Distribution.uniform(-1.5, 1.5),
            n_samples=n, return_diagnostics=True,
        )
        d = r.diagnostics
        # w = 1.5 on |x|<1 (prob 2/3), 0 outside: E[w]=1, E[w^2]=1.5
        # -> ESS/n = 2/3.  The table PDF linearizes the box edges over
        # one knot (~1e-3 of the support), nudging E[w^2] slightly; the
        # tolerance covers that plus MC noise.
        assert abs(d["mean_weight"] - 1.0) < 0.01
        assert abs(d["ess"] / n - 2.0 / 3.0) < 0.03

    def test_nd_product_weights(self):
        # 2-d shifted normals: ESS/n = e^{-(mu1^2 + mu2^2)}.
        n = 2_000_000
        r = integrate_importance_sampling(
            [lambda x, y: x + y],
            [Distribution.normal(0.0, 1.0)] * 2,
            [Distribution.normal(0.8, 1.0), Distribution.normal(0.6, 1.0)],
            n_samples=n, return_diagnostics=True,
        )
        d = r.diagnostics
        assert abs(d["mean_weight"] - 1.0) < 0.01
        assert abs(d["ess"] / n - math.exp(-1.0)) < 0.02

    def test_qmc_rejected(self):
        with pytest.raises(ValueError, match="iid"):
            integrate_importance_sampling(
                [lambda x: x], Distribution.normal(0.0, 1.0),
                Distribution.normal(1.0, 1.0), n_samples=100_000,
                method="qmc", return_diagnostics=True,
            )
        with pytest.raises(ValueError, match="iid"):
            integrate_importance_sampling(
                [lambda x, y: x + y],
                [Distribution.normal(0.0, 1.0)] * 2,
                [Distribution.normal(1.0, 1.0)] * 2,
                n_samples=100_000, method="qmc", return_diagnostics=True,
            )
