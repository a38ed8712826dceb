"""Quasi-Monte Carlo (``method="qmc"``): rotated radical-inverse point
sets through the unchanged sampling transforms (ops/qmc.py).

A capability beyond the plain-MC reference.  Contract under test:
  * identical API surface (integrate / compile / IS), routed by a
    ``method`` kwarg validated against {"mc", "qmc"};
  * deterministic per seed, distinct across seeds (Cranley-Patterson
    rotations), bit-equal between batched and single-seed handles;
  * accuracy on smooth integrands far better than MC at equal N —
    asserted with tolerances an MC run at these sample counts would
    miss by 1-2 orders of magnitude.
"""

import warnings

import numpy as np
import pytest

from tpu_montecarlo import (
    Distribution,
    MonteCarloIntegrator,
    integrate,
    integrate_importance_sampling,
)


class TestRadicalInverse:
    def test_bitrev32_matches_python(self):
        import jax.numpy as jnp

        from tpu_montecarlo.ops.qmc import bitrev32

        idx = np.array(
            [0, 1, 2, 3, 0x80000000, 0xDEADBEEF, 0xFFFFFFFF], np.uint32
        )
        got = np.asarray(bitrev32(jnp.asarray(idx)))
        want = np.array(
            [int(f"{v:032b}"[::-1], 2) for v in idx], np.uint32
        )
        np.testing.assert_array_equal(got, want)

    def test_u01_covers_unit_interval(self):
        import jax.numpy as jnp

        from tpu_montecarlo.ops.qmc import derive_shift, qmc_u01_halfopen

        idx = jnp.arange(4096, dtype=jnp.uint32)
        u = np.sort(np.asarray(qmc_u01_halfopen(idx, derive_shift(7, 1))))
        assert 0.0 <= u[0] and u[-1] < 1.0
        # The first 4096 van der Corput points are a (0,12)-net: one point
        # per length-1/4096 subinterval, so consecutive gaps are tiny.
        gaps = np.diff(u)
        assert gaps.max() < 2.5 / 4096


class TestQmcAccuracy:
    """Tolerances chosen ~10x tighter than a typical MC error at the same
    N — they fail if QMC silently degrades to MC-rate convergence."""

    def test_uniform(self):
        d = Distribution.uniform(0.0, 1.0)
        r = integrate(
            [lambda x: x, lambda x: x * x], d,
            n_samples=1_000_000, seed=7, method="qmc",
        )
        assert abs(r.values[0] - 0.5) < 1e-5
        assert abs(r.values[1] - 1.0 / 3.0) < 1e-5

    def test_normal_moments(self):
        d = Distribution.normal(0.0, 1.0)
        r = integrate(
            [lambda x: x, lambda x: x * x, lambda x: x * x * x * x],
            d, n_samples=1_000_000, seed=3, method="qmc",
        )
        assert abs(r.values[0] - 0.0) < 1e-3
        assert abs(r.values[1] - 1.0) < 1e-3
        assert abs(r.values[2] - 3.0) < 5e-3

    def test_normal_mean_no_shape_bias(self):
        """E[X] must sit at the f32-noise floor for EVERY sample-count
        shape.  Historical regression: a Box-Muller pair construction
        with a round(2^32/n_pairs) angular stride left a coverage gap
        whose E[X] bias grew with N (9.7e-4 measured at 1e8).  The
        current 1-D inverse-CDF construction (sampling.normal_from_u01)
        is shape-independent by design; this locks that in."""
        d = Distribution.normal(0.0, 1.0)
        for n in (400_000, 4_000_000):
            r = integrate(
                [lambda x: x, lambda x: np.sin(x)], d,
                n_samples=n, seed=2, method="qmc",
            )
            assert abs(r.values[0]) < 5e-5
            assert abs(r.values[1]) < 5e-5

    def test_exponential(self):
        d = Distribution.exponential(2.0)
        r = integrate(
            [lambda x: x], d, n_samples=1_000_000, seed=7, method="qmc"
        )
        assert abs(r.values[0] - 0.5) < 1e-4

    def test_custom_table_beta(self):
        d = Distribution.beta(2.0, 5.0)
        r = integrate(
            [lambda x: x], d, n_samples=1_000_000, seed=7, method="qmc"
        )
        assert abs(r.values[0] - 2.0 / 7.0) < 1e-4

    def test_beats_mc_on_uniform(self):
        d = Distribution.uniform(0.0, 1.0)
        fns = [lambda x: x * x]
        errs = {}
        for method in ("mc", "qmc"):
            errs[method] = max(
                abs(
                    integrate(
                        fns, d, n_samples=200_000, seed=s, method=method
                    ).values[0]
                    - 1.0 / 3.0
                )
                for s in (1, 2, 3)
            )
        assert errs["qmc"] < errs["mc"] / 10

    def test_importance_sampling_qmc(self):
        tgt = Distribution.normal(0.0, 1.0)
        prop = Distribution.normal(0.0, 2.0)
        r = integrate_importance_sampling(
            [lambda x: x * x], tgt, prop,
            n_samples=1_000_000, seed=5, method="qmc",
        )
        assert abs(r.values[0] - 1.0) < 1e-4


class TestQmcPallas:
    def test_pallas_kernel_accuracy(self):
        it = MonteCarloIntegrator(backend="pallas")
        d = Distribution.normal(0.0, 1.0)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            r = it.integrate(
                [lambda x: x, lambda x: x * x], d,
                n_samples=500_000, seed=3, method="qmc",
            )
        assert abs(r.values[0]) < 1e-3
        assert abs(r.values[1] - 1.0) < 2e-3

    def test_pallas_custom_stratified_qmc(self):
        it = MonteCarloIntegrator(backend="pallas")
        beta = Distribution.beta(2.0, 5.0)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            r = it.integrate(
                [lambda x: x], beta, n_samples=500_000, seed=3,
                method="qmc",
            )
        assert abs(r.values[0] - 2.0 / 7.0) < 1e-4

    def test_pallas_gapped_qmc_no_gap_mass(self):
        x = np.linspace(0.0, 1.0, 2048)
        p = np.where((x > 0.4) & (x < 0.6), 0.0, 1.0)
        d = Distribution.from_pdf_table(x, p)
        it = MonteCarloIntegrator(backend="pallas")
        r = it.integrate(
            [lambda v: (v > 0.41) * (v < 0.59), lambda v: v],
            d, n_samples=200_000, seed=2, method="qmc",
        )
        assert r.values[0] == 0.0
        assert abs(r.values[1] - 0.5) < 5e-3


class TestQmcContracts:
    def test_method_validated(self):
        d = Distribution.normal(0.0, 1.0)
        with pytest.raises(ValueError, match="method"):
            integrate([lambda x: x], d, n_samples=1000, method="sobol")

    def test_deterministic_per_seed(self):
        d = Distribution.normal(0.0, 1.0)
        fns = [lambda x: x * x]
        a = integrate(fns, d, n_samples=100_000, seed=9, method="qmc")
        b = integrate(fns, d, n_samples=100_000, seed=9, method="qmc")
        np.testing.assert_array_equal(a.values, b.values)
        c = integrate(fns, d, n_samples=100_000, seed=10, method="qmc")
        assert not np.array_equal(a.values, c.values)

    @pytest.mark.parametrize("backend", ["auto", "pallas"])
    def test_seed_batch_bit_equal(self, backend):
        it = MonteCarloIntegrator(backend=backend)
        d = Distribution.normal(0.0, 1.0)
        fns = [lambda x: x, lambda x: x * x]
        single = it.compile_integrate(
            fns, d, n_samples=100_000, method="qmc"
        )
        batched = it.compile_integrate(
            fns, d, n_samples=100_000, seed_batch=3, method="qmc"
        )
        seeds = [11, 12, 13]
        out = np.asarray(batched(seeds))
        for i, s in enumerate(seeds):
            np.testing.assert_array_equal(out[i], np.asarray(single(s)))

    def test_mesh_sharded_qmc(self, mesh8):
        it = MonteCarloIntegrator(mesh=mesh8)
        d = Distribution.uniform(0.0, 1.0)
        r = it.integrate(
            [lambda x: x * x], d, n_samples=400_000, seed=4, method="qmc"
        )
        assert abs(r.values[0] - 1.0 / 3.0) < 1e-5

    def test_qmc_past_one_cycle_builds(self):
        # Past one 2^32-point vdc cycle the program now auto-segments
        # instead of raising (one rotation per full cycle); the build
        # must succeed and trace cleanly.
        import jax
        from tpu_montecarlo.ops.integrate_xla import build_integrate_fn
        from tpu_montecarlo.sampling import DistKind
        from tpu_montecarlo.tracing import trace_function
        from tpu_montecarlo.utils.dispatch import IntegratePlan

        plan = IntegratePlan(65_536, 512, 200, 65_536 * 512 * 200)
        assert plan.actual_samples >= 1 << 32
        run = build_integrate_fn(
            (trace_function(lambda x: x),), DistKind.NORMAL, plan,
            method="qmc",
        )
        import jax.numpy as jnp
        out = jax.eval_shape(
            run, jnp.uint32(0), jnp.zeros(2, jnp.float32),
            jnp.zeros(1, jnp.float32), jnp.zeros(1, jnp.float32),
        )
        assert out.shape == (1,)


class TestQmcAutoSegmentation:
    """Runs past one 2^32-point vdc cycle auto-split into independently
    rotated segments (qmc.derive_segment_shift) instead of raising.
    Tested at CPU scale by shrinking the segment size."""

    def _patched(self, monkeypatch, size):
        from tpu_montecarlo.ops import qmc

        monkeypatch.setattr(qmc, "QMC_MAX_SAMPLES", size)

    def test_xla_segmented_accuracy(self, monkeypatch):
        # Segment boundary at 2^20 samples; a 4M-sample run spans ~4
        # segments and must stay accurate (each segment is a complete,
        # independently rotated point set).
        self._patched(monkeypatch, 1 << 20)
        r = MonteCarloIntegrator(backend="xla").integrate(
            [lambda x: x, lambda x: x * x],
            Distribution.uniform(0.0, 1.0),
            n_samples=4_194_304, method="qmc", seed=901,
        )
        assert abs(r.values[0] - 0.5) < 2e-4
        assert abs(r.values[1] - 1 / 3) < 2e-4

    def test_pallas_segmented_accuracy(self, monkeypatch):
        self._patched(monkeypatch, 1 << 20)
        r = MonteCarloIntegrator(backend="pallas").integrate(
            [lambda x: x * x], Distribution.normal(0.0, 1.0),
            n_samples=4_194_304, method="qmc", seed=902,
        )
        assert abs(r.values[0] - 1.0) < 5e-4

    def test_pallas_segmented_custom_table(self, monkeypatch):
        self._patched(monkeypatch, 1 << 20)
        r = MonteCarloIntegrator(backend="pallas").integrate(
            [lambda x: x], Distribution.beta(2.0, 5.0),
            n_samples=2_097_152, method="qmc", seed=903,
        )
        assert abs(r.values[0] - 2 / 7) < 2e-3

    def test_segments_are_distinct_rotations(self, monkeypatch):
        # With one segment per kernel block, a constant-0 local index
        # would repeat points unless each segment re-rotates; the E[X]
        # estimate under U(0,1) stays accurate only if rotations vary.
        self._patched(monkeypatch, 1 << 10)  # smaller than one block
        r = MonteCarloIntegrator(backend="pallas").integrate(
            [lambda x: x], Distribution.uniform(0.0, 1.0),
            n_samples=1_048_576, method="qmc", seed=904,
        )
        assert abs(r.values[0] - 0.5) < 1e-3

    def test_sub_limit_bit_compat(self, monkeypatch):
        # Below the segment size nothing changes: segment 0 keeps the
        # base rotation, so a patched-limit run at a size that still
        # fits one segment is bit-identical to the unpatched path.
        base = MonteCarloIntegrator(backend="xla").integrate(
            [lambda x: x], Distribution.uniform(0.0, 1.0),
            n_samples=250_000, method="qmc", seed=905,
        )
        self._patched(monkeypatch, 1 << 18)  # forces segmented build
        seg = MonteCarloIntegrator(backend="xla").integrate(
            [lambda x: x], Distribution.uniform(0.0, 1.0),
            n_samples=250_001, method="qmc", seed=905,
        )
        # Different n -> different plan/cache key, same first segment
        # rotation; estimates agree to the shared-prefix level.
        assert abs(base.values[0] - seg.values[0]) < 2e-5
