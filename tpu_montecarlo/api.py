"""Public API: MonteCarloIntegrator, IntegrationResult, convenience funcs.

Call signatures, defaults, validation messages and result conventions match
the reference (reference: python/wgpu_montecarlo/__init__.py:611-1266):

  * ``integrate(functions, distribution, n_samples=1_000_000, seed=42)``
  * ``integrate_importance_sampling(...)`` — PDFs that trace compile into
    closed-form ``f·p/q`` weight kernels; PDFs that don't fall back to
    interpolated PDF-table lookups (same routing triggers as the reference's
    TranspilerError, __init__.py:826-838)
  * ``integrate_mcmc(functions, target, proposal, n_steps=10_000,
    n_chains=1024, n_burnin=1_000, seed=42)``
  * results come back float64 in an ``IntegrationResult``

Unlike the reference — which re-generates and re-compiles its shader on
every call (SURVEY.md §3.2) — compiled programs are cached, keyed by the
traced functions and workload plan, so repeat calls skip compilation.
"""

from __future__ import annotations

import hashlib
import warnings
from collections import OrderedDict
from typing import Callable, List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from .distributions import Distribution, HMC, RandomWalk
from .ops.integrate_xla import build_integrate_fn
from .ops.mcmc_xla import build_mcmc_fn, plan_chains
from .sampling import (
    DistKind,
    dist_spec_of,
    ensure_param_batch_family,
    pdf_from_table,
)
from .tables import is_uniform_grid
from .tracing import TraceError, trace_function
from .utils.dispatch import make_integrate_plan
from .wgsl_frontend import trace_wgsl_function

__all__ = [
    "IntegrationResult",
    "McmcState",
    "MonteCarloIntegrator",
    "integrate",
    "integrate_importance_sampling",
    "integrate_mcmc",
]

_DUMMY_TABLE = np.zeros(1, dtype=np.float32)


class McmcState:
    """Checkpointable MCMC chain state: per-chain position and cached
    target log-density.  Returned by ``integrate_mcmc(...,
    return_state=True)`` and accepted back via ``initial_state=`` to extend
    chains across calls — a resume capability the stateless one-shot
    reference lacks (SURVEY.md §5, chain state never left GPU registers
    there).  Multi-dimensional runs carry ``x`` as a (d, n_chains)
    position matrix (1-D runs keep the flat vector)."""

    def __init__(self, x: np.ndarray, log_p: np.ndarray, segment: int = 0):
        self.x = np.asarray(x, np.float32)
        self.log_p = np.asarray(log_p, np.float32)
        # Resume-segment counter, folded into the RNG key so continuation
        # runs draw fresh streams even under the same seed.
        self.segment = int(segment)

    @property
    def n_chains(self) -> int:
        return int(self.x.shape[-1])

    @property
    def ndim_state(self) -> int:
        """State dimensionality: 1 for scalar chains, d for nd chains."""
        return 1 if self.x.ndim == 1 else int(self.x.shape[0])

    def __repr__(self):
        return (
            f"McmcState(n_chains={self.n_chains}, "
            f"d={self.ndim_state}, segment={self.segment})"
        )


class IntegrationResult:
    """Estimates from a Monte Carlo run.

    Attributes:
        values: float64 array of expected values, one per function.
        n_samples: total requested sample count.
        n_functions: number of integrands.
        acceptance_rate: MCMC only — sampling-phase acceptance fraction
            (None for plain/IS integration; an observability addition over
            the reference).
        chain_state: MCMC only — final ``McmcState`` when requested with
            ``return_state=True``, else None.
        stderr: float64 array of Monte Carlo standard errors, one per
            function, when requested with ``return_stderr=True``; else
            None (an addition over the reference, which returns point
            estimates only).
        diagnostics: dict when requested with ``return_diagnostics=True``,
            else None.  MCMC: ``"r_hat"`` ((K,) float64 split-R-hat
            potential scale reduction) and ``"ess"`` ((K,) float64
            effective sample size).  Importance sampling: ``"ess"``
            (Kish effective sample size of the weighted sample),
            ``"mean_weight"``, and ``"weight_cv"``.
        samples: MCMC only — (m, n_chains) float32 thinned post-burn-in
            draws when requested with ``return_samples=m`` (nd runs:
            (m, n_chains, d)); else None.  Raw chain output for
            downstream inference, a surface the expectations-only
            reference lacks.
    """

    def __init__(
        self,
        values,
        n_samples: int,
        n_functions: int,
        acceptance_rate: Optional[float] = None,
        chain_state: Optional[McmcState] = None,
        stderr=None,
        diagnostics: Optional[dict] = None,
        samples=None,
    ):
        self.values = np.array(values, dtype=np.float64)
        self.n_samples = n_samples
        self.n_functions = n_functions
        self.acceptance_rate = acceptance_rate
        self.chain_state = chain_state
        self.stderr = (
            None if stderr is None else np.array(stderr, dtype=np.float64)
        )
        self.diagnostics = diagnostics
        self.samples = None if samples is None else np.asarray(samples)

    def __repr__(self):
        return (
            f"IntegrationResult(values={self.values}, "
            f"n_samples={self.n_samples})"
        )

    def __getitem__(self, idx):
        return self.values[idx]

    def __len__(self):
        return self.n_functions


def _unit_integrand(n_args: int = 1) -> Callable:
    """Constant-1 integrand of the given arity, pre-tagged as traced.

    Folded through the IS weight wrappers it evaluates to the raw weight
    w(x) = p(x)/q(x), so the diagnostics path reads the weight's mean
    and (via the stderr accumulators) second moment with no new kernel
    code.  ``x*0 + 1`` rather than the literal 1.0 so kernel
    accumulators receive a full sample block."""

    def one(*xs):
        return xs[0] * 0.0 + 1.0

    one.__tpu_mc_traced__ = True
    one.__tpu_mc_key__ = ("unit_integrand", n_args)
    return one


def _weight_diagnostics(mean_w: float, se_w: float, n_samples: int) -> dict:
    """IS proposal-quality diagnostics from the weight column's mean and
    standard error: Kish effective sample size (Σw)²/Σw², the weight
    coefficient of variation (ess = n / (1 + cv²)), and the mean weight
    itself (≈1 when both densities are normalized)."""
    var_w = se_w * se_w * n_samples
    denom = var_w + mean_w * mean_w
    return {
        "ess": float(n_samples * mean_w * mean_w / denom)
        if denom > 0
        else 0.0,
        "mean_weight": float(mean_w),
        "weight_cv": float(np.sqrt(var_w) / mean_w)
        if mean_w > 0
        else float("inf"),
    }


class _ProgramCache:
    """Bounded LRU of compiled programs.  Holding the traced functions in
    the key tuple keeps their ids stable for the cache's lifetime."""

    def __init__(self, maxsize: int = 128):
        self._store: OrderedDict = OrderedDict()
        self._maxsize = maxsize

    def get_or_build(self, key, builder):
        if key in self._store:
            self._store.move_to_end(key)
            return self._store[key]
        value = builder()
        self._store[key] = value
        if len(self._store) > self._maxsize:
            self._store.popitem(last=False)
        return value


_GLOBAL_CACHE = _ProgramCache()


def _resolve_mesh(mesh):
    if mesh is None or isinstance(mesh, jax.sharding.Mesh):
        return mesh
    if mesh == "auto":
        devices = jax.devices()
        if len(devices) == 1:
            return None
        return jax.sharding.Mesh(np.array(devices), ("mc",))
    raise TypeError(f"mesh must be None, 'auto' or a jax Mesh, got {mesh!r}")


def _mesh_key(mesh):
    if mesh is None:
        return None
    return (tuple(d.id for d in mesh.devices.flat), mesh.axis_names)


class MonteCarloIntegrator:
    """TPU-accelerated Monte Carlo integrator for expected values.

    Fuses K integrands into a single compiled pass over shared samples
    (E[f_1(X)] … E[f_K(X)] in one sweep), with native device sampling for
    uniform/normal/exponential/table distributions and on-device reduction.

    Args:
        target_threads: lane-width knob, kept from the reference API
            (default 65,536; reference src/engine.rs:164).  For MCMC it
            overrides ``n_chains`` (reference quirk, src/engine.rs:860).
        backend: "auto" | "xla" | "pallas".  "auto" picks the fused Pallas
            kernels on TPU where available and the XLA sweep elsewhere.
        mesh: None (single device), "auto" (1-D mesh over all visible
            devices), or a ``jax.sharding.Mesh`` — samples/chains are
            sharded over the mesh and reduced with psum over ICI.
    """

    def __init__(
        self,
        target_threads: Optional[int] = None,
        backend: str = "auto",
        mesh=None,
    ):
        if backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"Unknown backend: {backend!r}")
        self._target_threads = target_threads
        self._backend = backend
        self._mesh = _resolve_mesh(mesh)
        self._cache = _GLOBAL_CACHE

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _trace_user_functions(self, functions, n_args: int = 1) -> tuple:
        if len(functions) == 0:
            raise ValueError("At least one function is required")
        traced = []
        for func in functions:
            if isinstance(func, str):
                tf = trace_wgsl_function(func)
                arity = getattr(tf, "__tpu_mc_arity__", n_args)
                if arity != n_args:
                    raise ValueError(
                        f"WGSL function {tf.__name__!r} takes {arity} "
                        f"argument(s) but the integration is "
                        f"{n_args}-dimensional"
                    )
                traced.append(tf)
            elif callable(func):
                traced.append(trace_function(func, n_args))
            else:
                raise TypeError(
                    f"Function must be callable or WGSL string, got {type(func)}"
                )
        return tuple(traced)

    def _use_pallas(self, kind: DistKind) -> bool:
        del kind  # per-kind routing happens at the call sites
        if self._backend == "xla":
            return False
        try:
            from .ops import integrate_pallas  # noqa: F401
        except Exception:
            if self._backend == "pallas":
                # An explicitly forced backend must not silently degrade.
                raise
            return False
        if self._backend == "pallas":
            return True
        return jax.default_backend() == "tpu"

    def _pallas_eligible(
        self, spec, traced, plan_samples=None, seed_batch: int = 1,
        with_stderr: bool = False, param_batch: bool = False,
    ) -> bool:
        """Shared Pallas-kernel eligibility gate for the sampling side:
        kernel-supported family, lane-multiple inverse table (and no
        exact-inverse requirement — in-kernel searchsorted is not a thing),
        <=128 fused integrands, none carrying table-lookup closures and all
        evaluating on a (rows, 128) lane block (functions with
        sample-dependent ``while`` loops trace as scalar programs but their
        vector cond cannot lower inside the kernel — those take the XLA
        sweep, which vmaps them).  Warns when a forced backend='pallas' has
        to fall back."""
        from .ops.integrate_pallas import pallas_supports, pick_block_rows

        gapped = spec.kind == DistKind.CUSTOM and spec.exact_inverse
        ok = (
            pallas_supports(spec.kind)
            and len(traced) <= 128
            # a block row count fitting the VMEM budget must exist (high-K
            # kernels shrink the block instead of routing to XLA; the
            # budget includes the seed_batch x programs output buffer)
            and pick_block_rows(
                len(traced), spec.kind, gapped=gapped,
                plan_samples=plan_samples,
                n_dev=1 if self._mesh is None else self._mesh.size,
                seed_batch=seed_batch,
                with_stderr=with_stderr,
                param_batch=param_batch,
            )
            is not None
            and not any(
                getattr(f, "__tpu_mc_no_pallas__", False) for f in traced
            )
            and _block_traceable(traced)
            # Heavy-tailed customs: the kernel's uniform-u stratified
            # tables share the resampled inverse's tail-moment bias, so
            # they must take the XLA searchsorted sampler.
            and not spec.heavy_tail
            and (
                spec.kind != DistKind.CUSTOM
                # Zero-density-span (exact_inverse) customs sample through
                # host-built gap-respecting tables.
                or spec.exact_inverse
                or (
                    spec.x_table is not None
                    and spec.x_table.shape[0] >= 2
                )
            )
        )
        if not ok and self._backend == "pallas":
            warnings.warn(
                "backend='pallas' requested but this workload is not "
                "Pallas-eligible (table-lookup closure, a function that "
                "does not evaluate on a lane block, too many fused "
                "integrands for the kernel VMEM budget, or an "
                "incompatible table layout); running the XLA backend "
                "instead",
                stacklevel=3,
            )
        return ok

    # ------------------------------------------------------------------
    # integrate
    # ------------------------------------------------------------------

    def integrate(
        self,
        functions: List[Union[Callable, str]],
        distribution: Distribution,
        n_samples: int = 1_000_000,
        seed: int = 42,
        method: str = "mc",
        return_stderr: bool = False,
        qmc_rotations: int = 8,
        control_variates=None,
    ) -> IntegrationResult:
        """Compute E[f_i(X)] for all functions on shared samples.

        ``control_variates=[(g, E[g]), ...]``: control-variate variance
        reduction (beyond the reference) — each estimate is corrected by
        the regression-optimal combination of the controls' deviations
        from their KNOWN means, ``theta_i = mean(f_i) - c_i^T (mean(g) -
        E[g])``; all moments fuse into one program on shared samples
        (both backends), and ``return_stderr`` reports the REDUCED
        residual error.  ``method='mc'`` only.

        ``method="qmc"`` draws a seed-rotated low-discrepancy point set
        instead of pseudo-random samples (ops/qmc.py): identical sampling
        semantics per family, ~O(log N / N) convergence on smooth
        integrands — a capability beyond the plain-MC reference.

        ``method="antithetic"`` uses each uniform draw at ``u`` AND its
        mirror ``1 - u`` through the monotone inverse-CDF transforms
        (classic antithetic variates, also beyond the reference):
        unbiased, same sample count, half the RNG draws, variance at
        most iid MC for integrands monotone in x — and EXACT
        cancellation for odd integrands under symmetric distributions.
        ``return_stderr`` treats the pair mean as the iid unit, so the
        error bar reports the antithetic estimator's true (reduced)
        error.  Multi-dimensional runs mirror the uniform vector
        componentwise (XLA path).

        ``return_stderr=True`` additionally estimates the Monte Carlo
        standard error per function (``result.stderr``, an addition over
        the point-estimates-only reference): stderr_i =
        sqrt(Var[f_i(X)] / N).  Error bars ride the fused Pallas kernel
        whenever the plain run would (pilot-shifted sum-of-squares
        accumulators).

        Under ``method="qmc"`` error bars come from RANDOMIZED QMC
        instead (the iid variance formula neither tracks nor bounds the
        error of a deterministic point set): the sample budget splits
        across ``qmc_rotations`` independent seed-derived rotations —
        one seed-batched device program, all rotations in one dispatch —
        and the result is their mean with stderr = spread /
        sqrt(rotations), an honest estimate of the returned value's
        rQMC error.  Each rotation keeps the full low-discrepancy
        structure, so the composite estimate converges at the QMC rate
        while the spread tracks it.

        Tail note: the kernel normal sampler inverts the CDF from a
        24-bit uniform, truncating at ~5.2 sigma; ``backend="xla"``
        draws untruncated normals.  Integrands concentrated beyond
        ~5 sigma should force ``backend="xla"`` (or use importance
        sampling with a shifted proposal, which is also how the
        reference's ~5.77-sigma Box-Muller truncation was worked
        around)."""
        if control_variates is not None:
            return self._integrate_with_cv(
                functions, distribution, n_samples, seed, method,
                return_stderr, control_variates,
            )
        if isinstance(distribution, (list, tuple)):
            dists = list(distribution)
            if not dists or not all(
                isinstance(dd, Distribution) for dd in dists
            ):
                raise TypeError(
                    "a distribution sequence must be a non-empty list of "
                    "Distribution objects (one per integrand argument)"
                )
            if len(dists) > 1:
                return self._integrate_nd(
                    functions, dists, n_samples, seed, method,
                    return_stderr, qmc_rotations,
                )
            distribution = dists[0]  # 1-element sequence == scalar path
        traced = self._trace_user_functions(functions)
        if return_stderr and method == "qmc":
            if qmc_rotations < 2:
                raise ValueError(
                    "qmc_rotations must be >= 2 to estimate an rQMC "
                    f"error bar (got {qmc_rotations})"
                )
            r = qmc_rotations
            prog = self.compile_integrate(
                functions, distribution,
                n_samples=-(-n_samples // r), seed_batch=r, method="qmc",
            )
            # Distinct seed words -> independent hash-derived rotations
            # (ops/qmc.derive_shift); golden-ratio stride keeps them
            # well-separated for consecutive user seeds too.
            seeds = np.uint32(seed) + np.uint32(0x9E3779B9) * np.arange(
                r, dtype=np.uint32
            )
            vals = np.asarray(prog(seeds), dtype=np.float64)  # (r, K)
            return IntegrationResult(
                values=vals.mean(axis=0),
                n_samples=n_samples,
                n_functions=len(functions),
                stderr=vals.std(axis=0, ddof=1) / np.sqrt(r),
            )
        if return_stderr:
            values, stderr = self._run_integrate(
                traced, distribution, n_samples, seed, method=method,
                with_stderr=True,
            )
            return IntegrationResult(
                values=values, n_samples=n_samples,
                n_functions=len(functions), stderr=stderr,
            )
        values = self._run_integrate(
            traced, distribution, n_samples, seed, method=method
        )
        return IntegrationResult(
            values=values, n_samples=n_samples, n_functions=len(functions)
        )

    def compile_integrate(
        self,
        functions: List[Union[Callable, str]],
        distribution: Distribution,
        n_samples: int = 1_000_000,
        seed_batch: int = 1,
        method: str = "mc",
        param_batch: bool = False,
        return_stderr: bool = False,
    ) -> Callable:
        """Ahead-of-time handle for serving: returns ``prog(seed) ->
        jax.Array (K,)`` with tracing, compilation, and device uploads done
        once.  Repeat calls cost one dispatch — no per-call host work and no
        host round-trips beyond the result fetch the caller chooses to do.
        (A capability the reference lacks: it re-generated and re-compiled
        its shader on every call, SURVEY.md §3.2.)

        ``seed_batch=R`` returns ``prog(seeds) -> jax.Array (R, K)``
        instead: R independent n_samples-integrations (one per seed) run
        back-to-back inside ONE device program, so per-dispatch host/link
        latency amortises over the batch — the serving-throughput mode.

        ``param_batch=True`` additionally makes the distribution's
        parameters a runtime batch input: ``prog(seeds, params) ->
        jax.Array (R, K)`` with ``params`` an (R, 2) float32 array of
        family parameter pairs (build it with :func:`pack_param_batch`;
        R = ``seed_batch``).  One compiled program then serves an entire
        parameter sweep — e.g. a volatility surface — in a single
        dispatch, with each batch element exactly equal to an unbatched
        call with that (seed, distribution).  Analytic families only
        (uniform / normal / exponential); ``distribution`` supplies the
        family and the compile-time shape.

        ``return_stderr=True``: the handle returns ``(values, stderrs)``
        — with a seed batch, two (R, K) arrays, each element bit-equal
        to its unbatched error-bar call (the in-kernel pilot-shifted
        squares ride the same batched grid; param batches get one pilot
        row per rep).  Serving a whole parameter sweep WITH per-job
        error bars costs one dispatch.

        ``distribution`` may be a SEQUENCE of per-dimension Distributions
        (d-ary functions): the handle serves the multi-dimensional
        integrate family, with ``seed_batch`` riding the nd kernel's
        batch grid dimension.  ``param_batch=True`` then takes ``params``
        as an (R, d, 2) array — one :func:`pack_param_batch` row per
        dimension — so a single compiled nd program serves a
        d-dimensional parameter sweep.
        """
        if isinstance(distribution, (list, tuple)):
            dists = list(distribution)
            if not dists or not all(
                isinstance(dd, Distribution) for dd in dists
            ):
                raise TypeError(
                    "a distribution sequence must be a non-empty list "
                    "of Distribution objects"
                )
            if len(dists) > 1:
                d = len(dists)
                traced = self._trace_user_functions(functions, n_args=d)
                if param_batch:
                    kinds = []
                    for dd in dists:
                        kk = dist_spec_of(dd).kind
                        ensure_param_batch_family(kk)
                        kinds.append(kk)
                    run, dev_args = self._nd_program(
                        traced, dists, n_samples, method,
                        with_stderr=return_stderr, seed_batch=seed_batch,
                        param_batch=True,
                    )
                    if (
                        getattr(run, "__native_param_batch__", 0)
                        != seed_batch
                    ):
                        run = _nd_param_map_adapter(run, d)
                    return _nd_param_prog(
                        run, dev_args, seed_batch, d, tuple(kinds)
                    )
                run, dev_args = self._nd_program(
                    traced, dists, n_samples, method,
                    with_stderr=return_stderr, seed_batch=seed_batch,
                )
                return self._finalize_prog(
                    run, dev_args, seed_batch, n_param_args=0
                )
            distribution = dists[0]
        traced = self._trace_user_functions(functions)
        spec = dist_spec_of(distribution)
        if param_batch:
            ensure_param_batch_family(spec.kind)
        run, dev_args = self._get_integrate_program(
            traced, distribution, n_samples, seed_batch=seed_batch,
            method=method, param_batch=param_batch,
            with_stderr=return_stderr,
        )
        return self._finalize_prog(
            run, dev_args, seed_batch, param_batch=param_batch,
            param_kinds=(spec.kind,),
        )

    def expectation_fn(
        self,
        functions: List[Union[Callable, str]],
        distribution: Distribution,
        n_samples: int = 1_000_000,
        method: str = "mc",
    ) -> Callable:
        """Differentiable expectation estimator — a capability outside the
        reference's codegen design: returns ``est(params, seed=42) ->
        (K,) jnp.float32`` computing E[f_i(X_params)] with exactly the
        ``integrate`` XLA-path sampling semantics, as a pure jittable JAX
        function of the family parameters.

        Gradients are pathwise (reparameterization): the underlying
        uniform/normal draws are parameter-independent and every analytic
        transform is differentiable in its parameters, so ``jax.grad(est)``
        is an unbiased gradient estimator for a.e.-differentiable
        integrands (indicator integrands get zero pathwise gradient —
        use a smooth surrogate).  ``jax.jit``, ``jax.vmap`` (parameter
        sweeps), and higher-order ``jax.grad`` all compose; with
        ``mesh=...`` the gradient rides the same psum as the value.

        ``params`` packs as in :func:`pack_param_batch`: uniform ->
        (min, max), normal -> (mean, std), exponential -> (lambda,
        ignored).  Analytic families only: CUSTOM distributions sample
        through host-built tables whose construction is not traced.
        ``distribution`` supplies the family and default packing shape.
        """
        if self._backend == "pallas":
            # The forced-backend no-silent-degrade convention: AD needs
            # the pure-JAX sweep — the Pallas kernels (hardware PRNG,
            # Mosaic) have no gradient path.
            warnings.warn(
                "backend='pallas' requested but expectation_fn always "
                "runs the XLA sweep (the differentiable path); the "
                "Pallas kernels cannot be differentiated",
                stacklevel=2,
            )
        if isinstance(distribution, (list, tuple)):
            dists = list(distribution)
            if not dists or not all(
                isinstance(dd, Distribution) for dd in dists
            ):
                raise TypeError(
                    "a distribution sequence must be a non-empty list of "
                    "Distribution objects"
                )
            if len(dists) > 1:
                # Multi-dimensional differentiable expectation:
                # est(params) takes a (d, 2) array of per-dimension
                # family parameter rows.
                d = len(dists)
                for dd in dists:
                    ensure_param_batch_family(
                        dist_spec_of(dd).kind, feature="expectation_fn"
                    )
                traced_nd = self._trace_user_functions(
                    functions, n_args=d
                )
                # Always the XLA nd sweep: AD traverses it; the nd
                # kernel (hardware PRNG, Mosaic) has no gradient path.
                run_nd, dev_args_nd = self._nd_program(
                    traced_nd, dists, n_samples, method, force_xla=True
                )
                _, xt_t, ct_t = dev_args_nd

                def est_nd(params, seed: int = 42):
                    arr = jnp.asarray(params, jnp.float32)
                    if arr.shape != (d, 2):
                        raise ValueError(
                            f"expected a ({d}, 2) params array (one "
                            "pack_param_batch row per dimension), got "
                            f"shape {arr.shape}"
                        )
                    params_t = tuple(arr[j] for j in range(d))
                    return run_nd(jnp.uint32(seed), params_t, xt_t, ct_t)

                return est_nd
            distribution = dists[0]
        spec = dist_spec_of(distribution)
        ensure_param_batch_family(spec.kind, feature="expectation_fn")
        traced = self._trace_user_functions(functions)
        mesh = self._mesh
        n_dev = 1 if mesh is None else mesh.size
        plan = make_integrate_plan(
            n_samples, self._target_threads, n_dev=n_dev
        )
        # Always the XLA sweep (shared program cache with backend="xla"):
        # it is pure JAX end-to-end, so AD traverses it.
        run = self._xla_integrate_program(traced, spec, plan, method)
        dummy = _tbl(None)

        def est(params, seed: int = 42):
            params_arr = jnp.asarray(params, jnp.float32)
            if params_arr.shape != (2,):
                # JAX's clamped gather would silently misread a
                # wrong-shaped array (e.g. params[1] of a (1,) array
                # clamps to params[0]).
                raise ValueError(
                    f"expected a (2,) params array (pack as "
                    f"pack_param_batch does), got shape {params_arr.shape}"
                )
            return run(jnp.uint32(seed), params_arr, dummy, dummy)

        return est

    def _xla_integrate_program(
        self, traced, spec, plan, method: str, with_stderr: bool = False
    ):
        """The cached XLA integrate program for (fns, spec, plan, method,
        with_stderr) — the single builder behind the backend='xla'
        integrate path, expectation_fn, and return_stderr runs, so the
        shared cache key can never go out of sync with the build
        arguments."""
        mesh = self._mesh
        key = (
            "integrate_xla",
            _fns_key(traced),
            spec.kind,
            plan,
            _table_shapes(spec),
            _mesh_key(mesh),
            method,
            with_stderr,
        )
        return self._cache.get_or_build(
            key,
            lambda: build_integrate_fn(
                traced, spec.kind, plan, mesh=mesh,
                exact_inverse=spec.exact_inverse, method=method,
                with_stderr=with_stderr,
            ),
        )

    def _batched_prog(self, run, dev_args, seed_batch: int) -> Callable:
        """One-RPC seed-batched dispatch for programs without native grid
        batching (the XLA paths) — the zero-param-args case of
        _param_batched_prog: prog(seeds)[i] equals prog(seeds[i]) of the
        unbatched handle bit-for-bit."""
        return self._param_batched_prog(
            run, dev_args, seed_batch, n_param_args=0
        )

    def _param_batched_prog(
        self, run, dev_args, seed_batch: int, n_param_args: int = 1,
        param_kinds=(),
    ) -> Callable:
        """(seed, params...)-tuple batching for programs without native
        grid batching (the XLA paths): ``lax.map`` sweeps the R tuples
        through the single-job program inside one jit — traced once, so
        program size is independent of R, and each element keeps its exact
        single-job semantics and streams.  ``n_param_args``: leading param
        arrays batched alongside the seed (0 = seed-only batching, 1 for
        integrate, 2 for MCMC's proposal+target pair)."""
        if seed_batch < 1:
            raise ValueError("seed_batch must be >= 1")
        # The batched wrapper is cached ON the run object itself (not in
        # the global LRU keyed by id(run): after an LRU eviction CPython
        # may reuse the id for a different program, and the stale lookup
        # would silently dispatch the wrong workload).  The wrapper's
        # lifetime is then exactly its program's.
        wrappers = getattr(run, "__batched_wrappers__", None)
        if wrappers is None:
            wrappers = {}
            try:
                run.__batched_wrappers__ = wrappers
            except (AttributeError, TypeError):
                pass  # unattachable run: build fresh below (correct, slower)
        wkey = (seed_batch, n_param_args)
        batched = wrappers.get(wkey)
        if batched is None:
            batched = jax.jit(
                lambda seeds, params, *args: jax.lax.map(
                    lambda sp: run(sp[0], *sp[1], *args), (seeds, params)
                )
            )
            wrappers[wkey] = batched
        return _checked_batch_prog(
            lambda seeds_arr, params_arrs, rest: batched(
                seeds_arr, params_arrs, *rest
            ),
            dev_args, seed_batch, n_param_args, param_kinds,
        )

    def _finalize_prog(
        self, run, dev_args, seed_batch: int, param_batch: bool = False,
        n_param_args: int = 1, param_kinds=(),
    ) -> Callable:
        if param_batch:
            if seed_batch < 1:
                raise ValueError("seed_batch must be >= 1")
            if getattr(run, "__native_param_batch__", 0) == seed_batch:
                # Pallas path: params ride the kernel's batch grid
                # dimension (one SMEM row per rep).
                return _checked_batch_prog(
                    lambda seeds_arr, params_arrs, rest: run(
                        seeds_arr, *params_arrs, *rest
                    ),
                    dev_args, seed_batch, n_param_args, param_kinds,
                )
            return self._param_batched_prog(
                run, tuple(dev_args), seed_batch, n_param_args, param_kinds
            )
        if seed_batch != 1:
            if getattr(run, "__native_seed_batch__", 1) == seed_batch:
                # The program batches R sweeps as a grid dimension itself
                # (Pallas path) — pass the seed vector straight through.
                def prog(seeds):
                    seeds_arr = np.asarray(seeds, np.uint32)
                    if seeds_arr.shape != (seed_batch,):
                        raise ValueError(
                            f"expected {seed_batch} seeds, got shape "
                            f"{seeds_arr.shape}"
                        )
                    return run(seeds_arr, *dev_args)

                return prog
            return self._batched_prog(run, tuple(dev_args), seed_batch)

        def prog(seed):
            return run(np.uint32(seed), *dev_args)

        return prog

    def _run_integrate(
        self, traced, distribution, n_samples, seed, method: str = "mc",
        with_stderr: bool = False,
    ):
        run, dev_args = self._get_integrate_program(
            traced, distribution, n_samples, method=method,
            with_stderr=with_stderr,
        )
        return run(np.uint32(seed), *dev_args)

    def _integrate_with_cv(
        self, functions, distribution, n_samples, seed, method,
        return_stderr, control_variates,
    ) -> IntegrationResult:
        """Control-variate integration (variance reduction beyond the
        reference): ``theta_i = mean(f_i) - c_i^T (mean(g) - E[g])``
        with the regression-optimal ``c_i = Cov(g)^-1 Cov(g, f_i)``,
        for user controls ``g_j`` of KNOWN means.

        Every needed moment is itself a plain integrand: the
        pilot-shifted products ``(f_i - a_i)(g_j - b_j)``,
        ``(g_j - b_j)(g_l - b_l)`` and squares compose over the traced
        user functions and fuse into ONE standard program on shared
        samples — so the whole estimator rides either backend (Pallas
        kernel included), sharding, and the K>128 multi-pass driver,
        with no new device machinery.  Pilots ``a, b`` are the
        functions' values at the distribution median: arbitrary fixed
        shifts that keep ``E[XY] - E[X]E[Y]`` away from float32
        catastrophic cancellation (the same trick as the stderr
        accumulators).  Coefficients are the classic same-run plug-in
        (O(1/n) bias — negligible at MC sample counts; Glasserman,
        "Monte Carlo Methods in Financial Engineering" §4.1).  stderr
        (when asked) is the per-function regression residual,
        ``sqrt((Var f - cov^T Cov(g)^-1 cov) / n)`` — the reduced error
        the corrected estimator actually has."""
        if method != "mc":
            raise ValueError(
                "control_variates supports method='mc' only "
                "(coefficients and residual variances are iid-sample "
                f"estimates); got method={method!r}"
            )
        pairs = list(control_variates)
        if not pairs:
            raise ValueError(
                "control_variates must be a non-empty list of "
                "(function, known_mean) pairs"
            )
        g_fns, g_means = [], []
        for p in pairs:
            if not (isinstance(p, (list, tuple)) and len(p) == 2):
                raise TypeError(
                    "each control variate is a (function, known_mean) "
                    f"pair, got {p!r}"
                )
            g_fns.append(p[0])
            g_means.append(float(p[1]))
        if isinstance(distribution, (list, tuple)):
            dists = list(distribution)
            if not dists or not all(
                isinstance(dd, Distribution) for dd in dists
            ):
                raise TypeError(
                    "a distribution sequence must be a non-empty list "
                    "of Distribution objects"
                )
        else:
            dists = [distribution]
        d = len(dists)
        k = len(functions)
        n_cv = len(g_fns)
        traced_f = self._trace_user_functions(functions, n_args=d)
        traced_g = self._trace_user_functions(g_fns, n_args=d)

        # Median-point pilots: one block evaluation per function on the
        # host path; any fixed constant works, a near-center one keeps
        # the product moments at O(spread^2) instead of O(mean^2).
        meds = [
            jnp.full((8, 128), float(dd.quantile(0.5)), jnp.float32)
            for dd in dists
        ]

        def _pilot(t):
            return float(np.asarray(jnp.mean(t(*meds))))

        a = np.array([_pilot(t) for t in traced_f])
        b = np.array([_pilot(t) for t in traced_g])

        def _shift(t, s):
            def fn(*xs, _t=t, _s=np.float32(s)):
                return _t(*xs) - _s

            return fn

        def _prod(ta, tb):
            def fn(*xs, _a=ta, _b=tb):
                return _a(*xs) * _b(*xs)

            return fn

        sf = [_shift(t, ai) for t, ai in zip(traced_f, a)]
        sg = [_shift(t, bj) for t, bj in zip(traced_g, b)]
        composed = list(traced_f) + list(traced_g)
        for i in range(k):
            for j in range(n_cv):
                composed.append(_prod(sf[i], sg[j]))
        for j in range(n_cv):
            for l in range(j, n_cv):
                composed.append(_prod(sg[j], sg[l]))
        if return_stderr:
            composed += [_prod(sf[i], sf[i]) for i in range(k)]
        composed = tuple(composed)

        n_dev = 1 if self._mesh is None else self._mesh.size
        n_act = make_integrate_plan(
            n_samples, self._target_threads, n_dev=n_dev
        ).actual_samples
        if d > 1:
            run, dev_args = self._nd_program(composed, dists, n_samples, "mc")
        else:
            run, dev_args = self._get_integrate_program(
                composed, dists[0], n_samples, method="mc"
            )
        # The kernel grid may re-round the plan's count.
        n_act = getattr(run, "actual_samples", n_act)
        out = np.asarray(run(np.uint32(seed), *dev_args), np.float64)

        m_f = out[:k]
        m_g = out[k:k + n_cv]
        pos = k + n_cv
        fg = out[pos:pos + k * n_cv].reshape(k, n_cv)
        pos += k * n_cv
        # Cov(f_i, g_j) = E[(f-a)(g-b)] - (m_f - a)(m_g - b).
        cov_fg = fg - np.outer(m_f - a, m_g - b)
        gram = np.zeros((n_cv, n_cv))
        for j in range(n_cv):
            for l in range(j, n_cv):
                v = out[pos] - (m_g[j] - b[j]) * (m_g[l] - b[l])
                gram[j, l] = gram[l, j] = v
                pos += 1
        # lstsq tolerates degenerate controls (a constant g has zero
        # variance AND zero covariance, so its coefficient is free —
        # the minimum-norm solution sets it to 0).
        coef = np.linalg.lstsq(gram, cov_fg.T, rcond=None)[0]  # (C, K)
        theta = m_f - coef.T.dot(m_g - np.array(g_means))
        stderr = None
        if return_stderr:
            ff = out[pos:pos + k]
            var_f = np.maximum(ff - (m_f - a) ** 2, 0.0)
            explained = np.sum(cov_fg * coef.T, axis=1)
            resid = np.maximum(var_f - explained, 0.0)
            stderr = np.sqrt(resid / float(n_act))
        return IntegrationResult(
            values=theta, n_samples=n_samples, n_functions=k,
            stderr=stderr,
        )

    # ------------------------------------------------------------------
    # multi-dimensional integrate (capability extension: the reference's
    # device layer binds exactly one distribution per program,
    # src/engine.rs:250-264 — here E[f(X_1..X_d)] runs over independent
    # per-dimension distributions on the XLA backend)
    # ------------------------------------------------------------------

    def _integrate_nd(
        self, functions, dists, n_samples, seed, method,
        return_stderr, qmc_rotations,
    ) -> IntegrationResult:
        d = len(dists)
        traced = self._trace_user_functions(functions, n_args=d)
        if return_stderr and method == "qmc":
            # Randomized QMC, as in 1-D: independent seed-derived
            # rotations of the d-dimensional digital net; here the
            # rotations run as R program calls (the nd path has no grid
            # batching yet — R is small).
            if qmc_rotations < 2:
                raise ValueError(
                    "qmc_rotations must be >= 2 to estimate an rQMC "
                    f"error bar (got {qmc_rotations})"
                )
            r = qmc_rotations
            run, dev_args = self._nd_program(
                traced, dists, -(-n_samples // r), method
            )
            seeds = np.uint32(seed) + np.uint32(0x9E3779B9) * np.arange(
                r, dtype=np.uint32
            )
            vals = np.stack(
                [np.asarray(run(np.uint32(s), *dev_args)) for s in seeds]
            ).astype(np.float64)
            return IntegrationResult(
                values=vals.mean(axis=0),
                n_samples=n_samples,
                n_functions=len(functions),
                stderr=vals.std(axis=0, ddof=1) / np.sqrt(r),
            )
        run, dev_args = self._nd_program(
            traced, dists, n_samples, method, with_stderr=return_stderr
        )
        out = run(np.uint32(seed), *dev_args)
        if return_stderr:
            values, stderr = out
            return IntegrationResult(
                values=values, n_samples=n_samples,
                n_functions=len(functions), stderr=stderr,
            )
        return IntegrationResult(
            values=out, n_samples=n_samples, n_functions=len(functions)
        )

    def _nd_pallas_eligible(
        self, specs, traced, plan_samples, with_stderr, method
    ) -> bool:
        """nd kernel gate: analytic or plain-table dims (gap-respecting
        exact_inverse customs route to XLA), <=128 fused d-ary integrands
        that evaluate on lane blocks, and a block row count fitting the
        VMEM budget with d sample blocks + resident tables in flight."""
        from .ops.integrate_nd_pallas import (
            _strat_dim,
            nd_pallas_supports,
            pick_nd_rows,
        )

        kinds = tuple(s.kind for s in specs)
        d = len(kinds)
        sdim = _strat_dim(kinds, method)
        tables_ok = True
        table_sizes = []
        for j, s in enumerate(specs):
            if s.kind != DistKind.CUSTOM:
                table_sizes.append(0)
                continue
            if (
                s.exact_inverse
                or s.x_table is None
                or s.x_table.shape[0] < 2
            ):
                tables_ok = False
                table_sizes.append(0)
                continue
            m = int(s.x_table.shape[0])
            table_sizes.append(m)
            if j != sdim and m % 128 != 0:
                # Full-inverse dims use the segment lane-gather layout.
                tables_ok = False
        ok = (
            nd_pallas_supports(kinds)
            and tables_ok
            and len(traced) <= 128
            and pick_nd_rows(
                len(traced), d, plan_samples,
                n_dev=1 if self._mesh is None else self._mesh.size,
                with_stderr=with_stderr,
                kinds=kinds, table_sizes=tuple(table_sizes),
                method=method,
            )
            is not None
            and not any(
                getattr(f, "__tpu_mc_no_pallas__", False) for f in traced
            )
            and _block_traceable(traced, n_args=d)
        )
        if not ok and self._backend == "pallas":
            warnings.warn(
                "backend='pallas' requested but this nd workload is not "
                "kernel-eligible (gap-respecting or incompatible table "
                "dimension, a function that does not evaluate on lane "
                "blocks, or over the VMEM budget); running the XLA "
                "backend instead",
                stacklevel=3,
            )
        return ok

    def _nd_program(
        self, traced, dists, n_samples, method, with_stderr: bool = False,
        force_xla: bool = False, seed_batch: int = 1,
        param_batch: bool = False,
    ):
        from .ops.integrate_nd import build_integrate_nd_fn

        specs = [dist_spec_of(dd) for dd in dists]
        mesh = self._mesh
        n_dev = 1 if mesh is None else mesh.size
        plan = make_integrate_plan(
            n_samples, self._target_threads, n_dev=n_dev
        )
        kinds = tuple(s.kind for s in specs)
        exact_inverses = tuple(s.exact_inverse for s in specs)

        if (
            not force_xla
            and self._use_pallas(kinds[0])
            and self._nd_pallas_eligible(
                specs, traced, plan.actual_samples, with_stderr, method
            )
        ):
            from .ops.integrate_nd_pallas import build_integrate_nd_pallas

            table_sizes = tuple(
                int(s.x_table.shape[0]) if s.kind == DistKind.CUSTOM else 0
                for s in specs
            )
            interpret = jax.default_backend() != "tpu"
            key = (
                "integrate_nd_pallas",
                _fns_key(traced),
                kinds,
                table_sizes,
                plan,
                _mesh_key(mesh),
                interpret,
                method,
                with_stderr,
                seed_batch,
                param_batch,
            )
            kern = self._cache.get_or_build(
                key,
                lambda: build_integrate_nd_pallas(
                    traced, kinds, plan, mesh=mesh, interpret=interpret,
                    method=method, with_stderr=with_stderr,
                    table_sizes=table_sizes, seed_batch=seed_batch,
                    param_batch=param_batch,
                ),
            )

            if param_batch:
                # Handle shape (seeds, (R, d, 2) params): compile-time
                # dists supply only the families; params are runtime.
                def run_kernel(seed, params, xt_t, ct_t):
                    del xt_t, ct_t
                    return kern(seed, params)
            else:

                def run_kernel(seed, params_t, xt_t, ct_t):
                    # Same call convention as the XLA nd program;
                    # analytic dims' (dummy) tables ride along unused,
                    # custom dims' uniform-u inverse tables prep inside
                    # the jitted kernel wrapper.
                    del ct_t
                    return kern(seed, jnp.stack(params_t), xt_t)

            run_kernel = _tag_native_batch(
                run_kernel, seed_batch, param_batch=param_batch
            )

            per = [
                _device_args_of(dd, s) for dd, s in zip(dists, specs)
            ]
            dev_args = (
                tuple(p[0] for p in per),
                tuple(p[1] for p in per),
                tuple(p[2] for p in per),
            )
            return run_kernel, dev_args
        key = (
            "integrate_nd",
            _fns_key(traced),
            kinds,
            exact_inverses,
            plan,
            tuple(_table_shapes(s) for s in specs),
            _mesh_key(mesh),
            method,
            with_stderr,
        )
        run = self._cache.get_or_build(
            key,
            lambda: build_integrate_nd_fn(
                traced, kinds, plan, mesh=mesh,
                exact_inverses=exact_inverses, method=method,
                with_stderr=with_stderr,
            ),
        )
        per = [
            _device_args_of(dd, s) for dd, s in zip(dists, specs)
        ]
        dev_args = (
            tuple(p[0] for p in per),
            tuple(p[1] for p in per),
            tuple(p[2] for p in per),
        )
        return run, dev_args

    def _get_integrate_program(
        self, traced, distribution, n_samples, seed_batch: int = 1,
        method: str = "mc", param_batch: bool = False,
        with_stderr: bool = False,
    ):
        if method not in ("mc", "qmc", "antithetic"):
            raise ValueError(
                f"method must be 'mc', 'qmc' or 'antithetic', got {method!r}"
            )
        spec = dist_spec_of(distribution)
        mesh = self._mesh
        n_dev = 1 if mesh is None else mesh.size

        if (
            len(traced) > 128
            and not param_batch
            and self._use_pallas(spec.kind)
        ):
            multi = self._multi_pass_integrate_program(
                traced, distribution, spec, n_samples, method,
                seed_batch=seed_batch, with_stderr=with_stderr,
            )
            if multi is not None:
                return multi

        if self._use_pallas(spec.kind):
            from .ops.integrate_pallas import (
                build_integrate_fn_pallas,
                pallas_supports,
            )

            plan = make_integrate_plan(
                n_samples, self._target_threads, n_dev=n_dev
            )
            # Error-bar runs stay on the kernel path too: the kernel
            # carries pilot-shifted sum-of-squares accumulators (the
            # VMEM gate accounts for the doubled blocks).
            if self._pallas_eligible(
                spec, traced,
                plan_samples=plan.actual_samples, seed_batch=seed_batch,
                with_stderr=with_stderr, param_batch=param_batch,
            ):
                # Off-TPU a forced pallas backend runs in the interpreter
                # (kernel-logic validation; the compiled path needs Mosaic).
                interpret = jax.default_backend() != "tpu"
                gapped = spec.kind == DistKind.CUSTOM and spec.exact_inverse
                key = (
                    "integrate_pallas",
                    _fns_key(traced),
                    spec.kind,
                    plan,
                    _table_shapes(spec),
                    _mesh_key(mesh),
                    interpret,
                    gapped,
                    seed_batch,
                    method,
                    param_batch,
                    with_stderr,
                )
                run = self._cache.get_or_build(
                    key,
                    lambda: _tag_native_batch(
                        build_integrate_fn_pallas(
                            traced, spec.kind, plan, mesh=mesh,
                            interpret=interpret, gapped_tables=gapped,
                            seed_batch=seed_batch, method=method,
                            param_batch=param_batch,
                            with_stderr=with_stderr,
                        ),
                        seed_batch,
                        param_batch=param_batch,
                    ),
                )
                if gapped:
                    params_dev = _device_args_of(distribution, spec)[0]
                    ts, dts = _device_gapped_tables(
                        distribution, spec, stratified=True,
                        segments=run.block_rows // 8,
                    )
                    return run, (params_dev, ts, dts)
                return run, _device_args_of(distribution, spec)

        plan = make_integrate_plan(n_samples, self._target_threads, n_dev=n_dev)
        run = self._xla_integrate_program(
            traced, spec, plan, method, with_stderr=with_stderr
        )
        return run, _device_args_of(distribution, spec)

    def _multi_pass_integrate_program(
        self, traced, distribution, spec, n_samples, method,
        seed_batch: int = 1, with_stderr: bool = False,
    ):
        """K > 128 fused workloads: chain ceil(K/128) kernel passes over
        IDENTICAL sample streams — each pass re-generates the same
        counter-keyed stream (same seed words, same grid, same pinned
        block rows), so all K integrands still share samples.  This is
        the reference's any-K accumulator semantics
        (src/shader_gen.rs:264-282) without the ~500x XLA table-sampling
        cliff beyond the kernel's 128-lane output row.  Regenerating
        samples costs ~1 sampler eval per pass — a few percent of a
        128-integrand pass's work.  Returns (run, dev_args), or None
        when the passes cannot ride the kernel (callers fall to XLA)."""
        from .ops.integrate_pallas import (
            build_integrate_fn_pallas,
            pick_block_rows,
        )

        mesh = self._mesh
        n_dev = 1 if mesh is None else mesh.size
        plan = make_integrate_plan(
            n_samples, self._target_threads, n_dev=n_dev
        )
        n_groups = -(-len(traced) // 128)
        gsize = -(-len(traced) // n_groups)
        groups = [
            tuple(traced[i : i + gsize])
            for i in range(0, len(traced), gsize)
        ]
        gapped = spec.kind == DistKind.CUSTOM and spec.exact_inverse
        rows = pick_block_rows(
            gsize, spec.kind, gapped=gapped,
            plan_samples=plan.actual_samples, n_dev=n_dev,
            seed_batch=seed_batch, with_stderr=with_stderr,
        )
        if rows is None:
            return None
        for g in groups:
            if not self._pallas_eligible(
                spec, g, plan_samples=plan.actual_samples,
                seed_batch=seed_batch, with_stderr=with_stderr,
            ):
                return None
        interpret = jax.default_backend() != "tpu"
        runs = []
        for g in groups:
            key = (
                "integrate_pallas",
                _fns_key(g),
                spec.kind,
                plan,
                _table_shapes(spec),
                _mesh_key(mesh),
                interpret,
                gapped,
                seed_batch,
                method,
                False,
                with_stderr,
                ("rows", rows),
            )
            runs.append(
                self._cache.get_or_build(
                    key,
                    lambda g=g: build_integrate_fn_pallas(
                        g, spec.kind, plan, mesh=mesh,
                        interpret=interpret, gapped_tables=gapped,
                        method=method, block_rows=rows,
                        seed_batch=seed_batch, with_stderr=with_stderr,
                    ),
                )
            )
        if gapped:
            params_dev = _device_args_of(distribution, spec)[0]
            ts, dts = _device_gapped_tables(
                distribution, spec, stratified=True, segments=rows // 8
            )
            dev_args = (params_dev, ts, dts)
        else:
            dev_args = _device_args_of(distribution, spec)

        # Batched results are (R, K_g) per pass (concat on the function
        # axis); unbatched are (K_g,).
        cat_axis = 1 if seed_batch != 1 else 0

        def run_multi(seed, *args):
            outs = [r(seed, *args) for r in runs]
            if with_stderr:
                return (
                    jnp.concatenate([o[0] for o in outs], axis=cat_axis),
                    jnp.concatenate([o[1] for o in outs], axis=cat_axis),
                )
            return jnp.concatenate(outs, axis=cat_axis)

        run_multi.actual_samples = runs[0].actual_samples
        run_multi.block_rows = rows
        run_multi = _tag_native_batch(run_multi, seed_batch)
        return run_multi, dev_args

    # ------------------------------------------------------------------
    # importance sampling
    # ------------------------------------------------------------------

    def integrate_importance_sampling(
        self,
        functions: List[Union[Callable, str]],
        target_distribution: Distribution,
        proposal_distribution: Distribution,
        n_samples: int = 1_000_000,
        seed: int = 42,
        method: str = "mc",
        return_stderr: bool = False,
        qmc_rotations: int = 8,
        return_diagnostics: bool = False,
    ) -> IntegrationResult:
        """Compute E_p[f(X)] sampling from q with weights p(x)/q(x).

        All K functions share samples and see identical weights (the weight
        is folded into each integrand, reference __init__.py:893-905).  PDFs
        that fail tracing fall back to interpolated table lookups with the
        0-outside-support convention (reference distribution.rs:186-190).

        ``return_stderr=True``: ``result.stderr`` estimates the standard
        error of each weighted estimator f_i(X) p(X)/q(X) — the quantity
        that tells you whether the proposal is any good (see integrate).
        Error bars stay in-kernel on BOTH routes: traced PDFs fold the
        weight into each integrand, table PDFs accumulate pilot-shifted
        squares of the in-kernel table-weighted values (the pilot mean
        is weighted on the same quantile grid).  Under ``method="qmc"``
        error bars come from ``qmc_rotations`` independent rotations in
        one seed-batched dispatch (randomized QMC — see
        :meth:`integrate`).

        ``return_diagnostics=True``: ``result.diagnostics`` reports
        proposal quality from the weight moments — ``"ess"`` (Kish
        effective sample size (Σw)²/Σw²: how many iid target draws the
        weighted sample is worth), ``"mean_weight"`` (≈1 when both
        densities are normalized — a consistency check), and
        ``"weight_cv"`` (weight coefficient of variation;
        ess = n / (1 + cv²)).  Computed IN-KERNEL by folding a
        constant-1 integrand through the same weight machinery (its
        weighted value IS w) and reading the weight's mean and second
        moment from the stderr accumulators — no extra dispatch.
        ``method="mc"`` only (the per-sample weight variance is an iid
        quantity)."""
        t_seq = isinstance(target_distribution, (list, tuple))
        q_seq = isinstance(proposal_distribution, (list, tuple))
        if t_seq or q_seq:
            if not (t_seq and q_seq):
                raise TypeError(
                    "multi-dimensional importance sampling needs BOTH "
                    "target and proposal as sequences of Distributions"
                )
            targets = list(target_distribution)
            proposals = list(proposal_distribution)
            if (
                not targets
                or len(targets) != len(proposals)
                or not all(
                    isinstance(dd, Distribution)
                    for dd in targets + proposals
                )
            ):
                raise TypeError(
                    "target/proposal sequences must be equal-length "
                    "non-empty lists of Distribution objects"
                )
            if len(targets) > 1:
                return self._integrate_is_nd(
                    functions, targets, proposals, n_samples, seed,
                    method, return_stderr, qmc_rotations,
                    return_diagnostics=return_diagnostics,
                )
            target_distribution = targets[0]
            proposal_distribution = proposals[0]
        if return_diagnostics:
            if method != "mc":
                raise ValueError(
                    "return_diagnostics estimates the per-sample weight "
                    "variance, an iid quantity; use method='mc' (got "
                    f"method={method!r})"
                )
            prog = self._get_is_program(
                list(functions) + [_unit_integrand()],
                target_distribution, proposal_distribution, n_samples,
                method=method, with_stderr=True,
            )
            values, stderr = prog(seed)
            v = np.asarray(values, np.float64)
            s = np.asarray(stderr, np.float64)
            return IntegrationResult(
                values=v[:-1], n_samples=n_samples,
                n_functions=len(functions),
                stderr=s[:-1] if return_stderr else None,
                diagnostics=_weight_diagnostics(v[-1], s[-1], n_samples),
            )
        if return_stderr and method == "qmc":
            if qmc_rotations < 2:
                raise ValueError(
                    "qmc_rotations must be >= 2 to estimate an rQMC "
                    f"error bar (got {qmc_rotations})"
                )
            r = qmc_rotations
            prog = self.compile_importance_sampling(
                functions, target_distribution, proposal_distribution,
                n_samples=-(-n_samples // r), seed_batch=r, method="qmc",
            )
            seeds = np.uint32(seed) + np.uint32(0x9E3779B9) * np.arange(
                r, dtype=np.uint32
            )
            vals = np.asarray(prog(seeds), dtype=np.float64)  # (r, K)
            return IntegrationResult(
                values=vals.mean(axis=0),
                n_samples=n_samples,
                n_functions=len(functions),
                stderr=vals.std(axis=0, ddof=1) / np.sqrt(r),
            )
        prog = self._get_is_program(
            functions, target_distribution, proposal_distribution, n_samples,
            method=method, with_stderr=return_stderr,
        )
        if return_stderr:
            values, stderr = prog(seed)
            return IntegrationResult(
                values=values, n_samples=n_samples,
                n_functions=len(functions), stderr=stderr,
            )
        values = prog(seed)
        return IntegrationResult(
            values=values, n_samples=n_samples, n_functions=len(functions)
        )

    def compile_importance_sampling(
        self,
        functions: List[Union[Callable, str]],
        target_distribution: Distribution,
        proposal_distribution: Distribution,
        n_samples: int = 1_000_000,
        seed_batch: int = 1,
        method: str = "mc",
        return_stderr: bool = False,
    ) -> Callable:
        """Ahead-of-time IS handle: ``prog(seed) -> jax.Array (K,)``; with
        ``seed_batch=R``, ``prog(seeds) -> (R, K)`` in one dispatch (see
        compile_integrate).  ``return_stderr=True``: the handle returns
        ``(values, stderrs)`` pairs (per batch element with a seed
        batch)."""
        return self._get_is_program(
            functions, target_distribution, proposal_distribution, n_samples,
            seed_batch=seed_batch, method=method,
            with_stderr=return_stderr,
        )

    def _get_is_program(
        self, functions, target_distribution, proposal_distribution,
        n_samples, seed_batch: int = 1, method: str = "mc",
        with_stderr: bool = False,
    ) -> Callable:
        """IS program: ``prog(seed) -> (K,) jax.Array`` — or, with
        ``with_stderr=True``, ``prog(seed) -> ((K,) values, (K,) stderrs)``
        on the XLA sweep.

        Both PDFs traceable -> closed-form weight folded into each integrand
        (the weighted closures lower into the Pallas kernel as-is).  Any
        table PDF -> in-kernel uniform-grid table weights on TPU when
        eligible, else the XLA sweep with interpolating closures.
        """
        if len(functions) == 0:
            raise ValueError("At least one function is required")
        traced = self._trace_user_functions(functions)
        p_mode = self._pdf_mode(target_distribution)
        q_mode = self._pdf_mode(proposal_distribution)

        if p_mode[0] == "traced" and q_mode[0] == "traced":
            weighted_fns = self._weighted_fns(traced, p_mode[1], q_mode[1])
            run, dev_args = self._get_integrate_program(
                weighted_fns, proposal_distribution, n_samples,
                seed_batch=seed_batch, method=method,
                with_stderr=with_stderr,
            )
            return self._finalize_prog(run, dev_args, seed_batch)

        spec = dist_spec_of(proposal_distribution)
        mesh = self._mesh
        n_dev = 1 if mesh is None else mesh.size

        pallas_ok = False
        if self._use_pallas(spec.kind):
            from .ops.integrate_pallas import build_integrate_fn_pallas

            plan = make_integrate_plan(
                n_samples, self._target_threads, n_dev=n_dev
            )
            pallas_ok = self._pallas_eligible(
                spec, traced,
                plan_samples=plan.actual_samples, seed_batch=seed_batch,
            )
            was_eligible = pallas_ok
            # Table PDFs need uniform x-grids for in-kernel lookup —
            # irregular user grids are resampled host-side (error-bounded)
            # to stay in-kernel; traced PDFs must evaluate on a lane block
            # like the integrands.
            p_mode_k = _uniform_table_mode(target_distribution, p_mode)
            q_mode_k = _uniform_table_mode(
                proposal_distribution, q_mode, "proposal"
            )
            for mode in (p_mode_k, q_mode_k):
                if not pallas_ok:
                    break
                if mode is None:
                    pallas_ok = False
                elif mode[0] != "table":
                    pallas_ok = _block_traceable((mode[1],))
            if pallas_ok:
                # Re-check the kernel VMEM budget with the IS extras: the
                # resident weight tables plus the p/q/weight value blocks
                # that live alongside every eval.
                from .ops.integrate_pallas import pick_block_rows

                n_wt = sum(
                    1 for m in (p_mode_k, q_mode_k) if m[0] == "table"
                )
                pallas_ok = (
                    pick_block_rows(
                        len(traced), spec.kind,
                        n_weight_tables=n_wt, extra_blocks=3,
                        gapped=spec.kind == DistKind.CUSTOM
                        and spec.exact_inverse,
                        plan_samples=plan.actual_samples,
                        n_dev=n_dev,
                        seed_batch=seed_batch,
                        with_stderr=with_stderr,
                    )
                    is not None
                )
            if was_eligible and not pallas_ok and self._backend == "pallas":
                warnings.warn(
                    "backend='pallas' requested but an IS weight PDF is not "
                    "kernel-eligible (a table x-grid too irregular to "
                    "resample within error bounds, or a PDF that does not "
                    "evaluate on a lane block); running the XLA backend "
                    "instead",
                    stacklevel=3,
                )

        if pallas_ok:
            interpret = jax.default_backend() != "tpu"

            def mode_arg(mode):
                return "table" if mode[0] == "table" else mode[1]

            def mode_key(mode, dist):
                if mode[0] == "table":
                    return (
                        "pdf_table",
                        hashlib.sha1(
                            np.ascontiguousarray(mode[1])
                        ).hexdigest(),
                        hashlib.sha1(
                            np.ascontiguousarray(mode[2])
                        ).hexdigest(),
                    )
                return _fn_key(mode[1])

            gapped = spec.kind == DistKind.CUSTOM and spec.exact_inverse
            key = (
                "is_pallas",
                _fns_key(traced),
                spec.kind,
                plan,
                _table_shapes(spec),
                mode_key(p_mode_k, target_distribution),
                mode_key(q_mode_k, proposal_distribution),
                _mesh_key(mesh),
                interpret,
                gapped,
                seed_batch,
                method,
                with_stderr,
            )
            run = self._cache.get_or_build(
                key,
                lambda: _tag_native_batch(
                    build_integrate_fn_pallas(
                        traced,
                        spec.kind,
                        plan,
                        mesh=mesh,
                        interpret=interpret,
                        is_weight=(mode_arg(p_mode_k), mode_arg(q_mode_k)),
                        gapped_tables=gapped,
                        seed_batch=seed_batch,
                        method=method,
                        with_stderr=with_stderr,
                    ),
                    seed_batch,
                ),
            )
            if gapped:
                ts, dts = _device_gapped_tables(
                    proposal_distribution, spec, stratified=True,
                    segments=run.block_rows // 8,
                )
                dev_args = [
                    _device_args_of(proposal_distribution, spec)[0], ts, dts,
                ]
            else:
                dev_args = list(
                    _device_args_of(proposal_distribution, spec)
                )
            if p_mode_k[0] == "table":
                dev_args += list(
                    _device_mode_tables(target_distribution, p_mode_k)
                )
            if q_mode_k[0] == "table":
                dev_args += list(
                    _device_mode_tables(
                        proposal_distribution, q_mode_k, "proposal"
                    )
                )
            return self._finalize_prog(run, dev_args, seed_batch)

        weighted_fns = self._weighted_fns(
            traced,
            self._mode_evaluator(p_mode),
            self._mode_evaluator(q_mode),
        )
        run, dev_args = self._get_integrate_program(
            weighted_fns, proposal_distribution, n_samples,
            seed_batch=seed_batch, method=method, with_stderr=with_stderr,
        )
        return self._finalize_prog(run, dev_args, seed_batch)

    def _pdf_mode(self, dist: Distribution):
        """("traced", fn) when the PDF traces, else ("table", x, pdf) —
        the traceability probe driving the closed-form vs table routing
        (reference __init__.py:826-838)."""
        try:
            return ("traced", trace_function(dist._pdf_func))
        except (TraceError, TypeError):
            pass
        x_table, pdf_table = dist.get_or_compute_pdf_table()
        return ("table", x_table, pdf_table)

    @staticmethod
    def _mode_evaluator(mode) -> Callable:
        """Scalar pdf evaluator for a _pdf_mode result: the traced callable,
        or an interpolating closure over the tables (0 outside support,
        reference distribution.rs:186-190)."""
        if mode[0] == "traced":
            return mode[1]
        x_table, pdf_table = mode[1], mode[2]
        xt = jnp.asarray(x_table)
        pt = jnp.asarray(pdf_table)
        uniform = is_uniform_grid(x_table)

        def table_pdf(x):
            return pdf_from_table(x, xt, pt, uniform=uniform)

        # Table lookups need gathers the Pallas integrate kernel does not
        # lower; integrands carrying this closure stay on the XLA sweep.
        table_pdf.__tpu_mc_no_pallas__ = True
        table_pdf.__tpu_mc_traced__ = True
        table_pdf.__tpu_mc_key__ = (
            "pdf_table",
            hashlib.sha1(np.ascontiguousarray(x_table)).hexdigest(),
            hashlib.sha1(np.ascontiguousarray(pdf_table)).hexdigest(),
        )
        return table_pdf

    def _weighted_fns(self, traced, p_eval, q_eval) -> tuple:
        def weighted(f):
            def wf(x):
                # Guard q(x) > 0: rounding can put a sample exactly on a
                # point of zero proposal density (table edge), and one
                # inf/NaN weight would poison the whole mean.  Such points
                # carry zero probability mass, so weight 0 is exact.
                q = q_eval(x)
                safe_q = jnp.where(q > 0, q, 1.0)
                return jnp.where(q > 0, f(x) * p_eval(x) / safe_q, 0.0)

            wf.__tpu_mc_no_pallas__ = any(
                getattr(g, "__tpu_mc_no_pallas__", False)
                for g in (f, p_eval, q_eval)
            )
            wf.__tpu_mc_traced__ = True
            wf.__tpu_mc_key__ = (
                "is_weight",
                _fn_key(f),
                _fn_key(p_eval),
                _fn_key(q_eval),
            )
            return wf

        return tuple(weighted(f) for f in traced)

    def _pdf_evaluator(self, dist: Distribution) -> Callable:
        """Closed-form traced PDF when traceable, else table interpolation
        — the traceability probe that mirrors the reference's
        try-transpile/except routing (__init__.py:826-838)."""
        return self._mode_evaluator(self._pdf_mode(dist))

    def _weighted_fns_nd(self, traced, p_evals, q_evals) -> tuple:
        """d-dimensional IS weight folding: w(x_1..x_d) = prod_j
        p_j(x_j)/q_j(x_j) under independence, with the same
        zero-proposal-density guard as the 1-D wrapper applied to every
        dimension (one zero q_j carries zero probability mass, so the
        whole weight is exactly 0)."""

        def weighted(f):
            def wf(*xs):
                qs = [qe(x) for qe, x in zip(q_evals, xs)]
                ps = [pe(x) for pe, x in zip(p_evals, xs)]
                ok = qs[0] > 0
                for q in qs[1:]:
                    ok = jnp.logical_and(ok, q > 0)
                q_prod = qs[0]
                for q in qs[1:]:
                    q_prod = q_prod * q
                p_prod = ps[0]
                for p in ps[1:]:
                    p_prod = p_prod * p
                safe_q = jnp.where(ok, q_prod, 1.0)
                return jnp.where(ok, f(*xs) * p_prod / safe_q, 0.0)

            wf.__tpu_mc_no_pallas__ = any(
                getattr(g, "__tpu_mc_no_pallas__", False)
                for g in (f, *p_evals, *q_evals)
            )
            wf.__tpu_mc_traced__ = True
            wf.__tpu_mc_key__ = (
                "is_weight_nd",
                _fn_key(f),
                tuple(_fn_key(p) for p in p_evals),
                tuple(_fn_key(q) for q in q_evals),
            )
            return wf

        return tuple(weighted(f) for f in traced)

    def _integrate_is_nd(
        self, functions, targets, proposals, n_samples, seed, method,
        return_stderr, qmc_rotations, return_diagnostics=False,
    ) -> IntegrationResult:
        """Multi-dimensional importance sampling: sample each dimension
        from its proposal, fold the product weight into every integrand,
        and run the nd sweep (an extension beyond the strictly 1-D
        reference).  ``return_diagnostics``: same weight-column trick as
        the 1-D path — a constant-1 integrand rides the product-weight
        wrappers, and its mean/second moment give ESS / weight CV."""
        d = len(targets)
        traced = self._trace_user_functions(functions, n_args=d)
        if return_diagnostics:
            if method != "mc":
                raise ValueError(
                    "return_diagnostics estimates the per-sample weight "
                    "variance, an iid quantity; use method='mc' (got "
                    f"method={method!r})"
                )
            traced = traced + (_unit_integrand(d),)
        p_evals = [self._pdf_evaluator(t) for t in targets]
        q_evals = [self._pdf_evaluator(q) for q in proposals]
        weighted = self._weighted_fns_nd(traced, p_evals, q_evals)
        out = self._integrate_nd(
            weighted, proposals, n_samples, seed, method,
            return_stderr or return_diagnostics, qmc_rotations,
        )
        if not return_diagnostics:
            # _integrate_nd counted the weighted tuple; same length as
            # the input.
            return out
        v = np.asarray(out.values, np.float64)
        s = np.asarray(out.stderr, np.float64)
        return IntegrationResult(
            values=v[:-1], n_samples=n_samples,
            n_functions=len(functions),
            stderr=s[:-1] if return_stderr else None,
            diagnostics=_weight_diagnostics(v[-1], s[-1], n_samples),
        )

    def _parse_nd_mcmc_args(self, target, proposal):
        """Validate and normalise the nd MCMC argument surface: returns
        ``(proposals, targets, target_fn, d)`` with exactly one of
        ``targets`` (per-dim product) / ``target_fn`` (traced joint
        log-density) set.  A :class:`RandomWalk` proposal returns
        ``proposals=None`` (the walk carries no per-dimension proposal
        distributions); ``d`` then comes from the target — the sequence
        length, or a joint log-density's own arity."""
        if isinstance(proposal, RandomWalk):
            proposals = None
            d = None  # fixed by the target below
        elif isinstance(proposal, Distribution):
            proposals = [proposal]
        elif isinstance(proposal, (list, tuple)):
            proposals = list(proposal)
        else:
            raise TypeError(
                "proposal must be a Distribution, a sequence of "
                f"Distributions, or a RandomWalk, got {type(proposal)}"
            )
        if proposals is not None:
            if not proposals or not all(
                isinstance(p, Distribution) for p in proposals
            ):
                raise TypeError(
                    "proposal sequence must be a non-empty list of "
                    "Distribution objects"
                )
            d = len(proposals)

        target_fn = None
        targets = None
        if isinstance(target, (list, tuple)):
            targets = list(target)
            if d is None:
                d = len(targets)
            if len(targets) != d or not all(
                isinstance(t, Distribution) for t in targets
            ):
                raise TypeError(
                    "target sequence must be a non-empty list of "
                    f"Distribution objects matching the {d} "
                    "proposal dimension(s)"
                )
            if not targets:
                raise TypeError(
                    "target sequence must be a non-empty list of "
                    "Distribution objects"
                )
        elif isinstance(target, Distribution):
            if d not in (None, 1):
                raise TypeError(
                    "multi-dimensional MCMC needs the target as a "
                    f"sequence of {d} Distributions or a {d}-ary "
                    "log-density function"
                )
            d = 1
            targets = [target]
        elif callable(target) or isinstance(target, str):
            # Joint log-density (up to an additive constant).  With a
            # RandomWalk proposal the dimension count comes from the
            # density's own arity.
            if d is None:
                d = _target_arity(target)
            target_fn = self._trace_user_functions([target], n_args=d)[0]
        else:
            raise TypeError(
                f"Unsupported target type for MCMC: {type(target)}"
            )
        return proposals, targets, target_fn, d

    def _nd_mcmc_pallas_eligible(
        self, prop_kinds, targ_kinds, target_fn, traced, total_chains,
        d, return_stderr, hmc_L: int = 0,
    ) -> bool:
        """nd MCMC kernel gate: analytic proposal dims (vacuous for a
        RandomWalk proposal, ``prop_kinds=()``), analytic-product or
        block-traceable joint-fn target, <=127 fused d-ary integrands
        evaluating on lane blocks, and d state blocks fitting VMEM."""
        from .ops.mcmc_nd_pallas import (
            mcmc_nd_pallas_supports,
            mcmc_nd_vmem_fits,
        )
        from .ops.mcmc_pallas import plan_mcmc_grid

        n_dev = 1 if self._mesh is None else self._mesh.size
        programs, rows, _ = plan_mcmc_grid(total_chains)
        programs = -(-programs // n_dev) * n_dev
        ok = (
            mcmc_nd_pallas_supports(prop_kinds, targ_kinds)
            and len(traced) < 128
            and not any(
                getattr(f, "__tpu_mc_no_pallas__", False) for f in traced
            )
            and _block_traceable(traced, n_args=d)
            and (
                target_fn is None
                or (
                    not getattr(target_fn, "__tpu_mc_no_pallas__", False)
                    and _block_traceable((target_fn,), n_args=d)
                )
            )
            and mcmc_nd_vmem_fits(
                len(traced), d, rows, programs // n_dev,
                with_stderr=return_stderr, hmc=bool(hmc_L),
            )
        )
        if not ok and self._backend == "pallas":
            warnings.warn(
                "backend='pallas' requested but this nd MCMC workload is "
                "not kernel-eligible (table-sampled dimension, a function "
                "that does not evaluate on lane blocks, or over the VMEM "
                "budget); running the XLA backend instead",
                stacklevel=4,
            )
        return ok

    def _nd_mcmc_kernel_program(
        self, traced, proposals, prop_specs, targets, target_fn,
        n_steps, n_burnin, total_chains, return_stderr,
        seed_batch: int = 1, param_batch: bool = False,
        proposal_rw=None, d: int = 0,
    ):
        """Cached nd MH Pallas kernel program (analytic dims; product or
        joint-fn target) + its device args ``(prop_params_t,
        targ_params_t)``.  ``seed_batch=R`` batches R runs as the
        kernel's leading grid dimension (tagged native).
        ``proposal_rw``: a RandomWalk proposal — the kernel then runs
        random-walk MH and ``prop_params_t`` becomes its (d, 4)
        parameter rows (``d`` required then; otherwise unused)."""
        from .ops.mcmc_nd_pallas import build_mcmc_nd_pallas

        mesh = self._mesh
        random_walk = proposal_rw is not None
        hmc_L = (
            proposal_rw.n_leapfrog
            if isinstance(proposal_rw, HMC)
            else 0
        )
        if random_walk:
            prop_kinds = ()
            prop_params_t = jnp.asarray(
                proposal_rw.pack_params_nd(targets, d)
            )
            prop_key = (
                ("hmc", hmc_L, proposal_rw.adapt)
                if hmc_L
                else ("rw", proposal_rw.adapt)
            )
        else:
            prop_kinds = tuple(s.kind for s in prop_specs)
            prop_params_t = tuple(
                _device_args_of(p, s)[0]
                for p, s in zip(proposals, prop_specs)
            )
            prop_key = prop_kinds
        if target_fn is not None:
            targ_kinds = None
            targ_params_t = ()
            targ_key = ("fn", _fn_key(target_fn))
        else:
            targ_specs = [dist_spec_of(t) for t in targets]
            targ_kinds = tuple(s.kind for s in targ_specs)
            targ_params_t = tuple(
                _device_args_of(t, s)[0]
                for t, s in zip(targets, targ_specs)
            )
            targ_key = ("kinds", targ_kinds)
        interpret = jax.default_backend() != "tpu"
        key = (
            "mcmc_nd_pallas",
            _fns_key(traced),
            prop_key,
            targ_key,
            n_steps,
            n_burnin,
            total_chains,
            _mesh_key(mesh),
            interpret,
            return_stderr,
            seed_batch,
            param_batch,
        )
        run = self._cache.get_or_build(
            key,
            lambda: _tag_native_batch(
                build_mcmc_nd_pallas(
                    traced, prop_kinds, n_steps, n_burnin, total_chains,
                    targ_kinds=targ_kinds, target_logpdf_fn=target_fn,
                    mesh=mesh, interpret=interpret,
                    with_stderr=return_stderr, seed_batch=seed_batch,
                    param_batch=param_batch,
                    random_walk=random_walk,
                    rw_adapt=random_walk and proposal_rw.adapt,
                    rw_d=d if random_walk else 0,
                    hmc_leapfrog=hmc_L,
                ),
                seed_batch,
                param_batch=param_batch,
            ),
        )
        return run, (prop_params_t, targ_params_t)

    def _run_mcmc_nd_pallas(
        self, functions, traced, proposals, prop_specs, targets,
        target_fn, n_steps, n_chains, n_burnin, seed, total_chains,
        return_stderr, proposal_rw=None, d: int = 0,
    ) -> IntegrationResult:
        """Dispatch one nd MCMC run on the fused Pallas kernel (analytic
        dims or RandomWalk; product or joint-fn target)."""
        run, dev_args = self._nd_mcmc_kernel_program(
            traced, proposals, prop_specs, targets, target_fn,
            n_steps, n_burnin, total_chains, return_stderr,
            proposal_rw=proposal_rw, d=d,
        )
        out = run(np.uint32(seed), *dev_args)
        return IntegrationResult(
            values=out[0],
            n_samples=n_chains * n_steps,
            n_functions=len(functions),
            acceptance_rate=float(out[1]),
            stderr=out[2] if return_stderr else None,
        )

    def _integrate_mcmc_nd(
        self, functions, target, proposal, n_steps, n_chains, n_burnin,
        seed, initial_state, return_state, return_stderr,
        return_diagnostics, return_samples: int = 0,
    ) -> IntegrationResult:
        """Multi-dimensional MH: per-dimension proposal distributions with
        either a product-of-Distributions target or a user JOINT
        log-density callable/WGSL string of d arguments — the latter is a
        capability the strictly 1-D reference cannot express
        (src/shader_gen.rs:496-509 binds one target per program)."""
        want_state = return_state or initial_state is not None
        if return_diagnostics and n_steps < 4:
            raise ValueError("return_diagnostics needs n_steps >= 4")
        proposals, targets, target_fn, d = self._parse_nd_mcmc_args(
            target, proposal
        )

        if d == 1 and target_fn is None:
            # Pure 1-D in disguise: take the scalar path (full feature
            # surface incl. resume/diagnostics/Pallas kernel).
            return self.integrate_mcmc(
                functions, targets[0],
                proposal if proposals is None else proposals[0],
                n_steps=n_steps,
                n_chains=n_chains, n_burnin=n_burnin, seed=seed,
                initial_state=initial_state, return_state=return_state,
                return_stderr=return_stderr,
                return_diagnostics=return_diagnostics,
                return_samples=return_samples or None,
            )

        random_walk = proposals is None
        traced = self._trace_user_functions(functions, n_args=d)
        prop_specs = (
            None if random_walk else [dist_spec_of(p) for p in proposals]
        )
        mesh = self._mesh
        n_dev = 1 if mesh is None else mesh.size
        total_chains = plan_chains(n_chains, self._target_threads, n_dev)

        prop_kinds_early = (
            () if random_walk else tuple(s.kind for s in prop_specs)
        )
        targ_kinds_early = (
            None
            if target_fn is not None
            else tuple(dist_spec_of(t).kind for t in targets)
        )
        if (
            not return_diagnostics
            and not return_samples
            and not want_state
            and self._use_pallas(DistKind.NORMAL)
            and self._nd_mcmc_pallas_eligible(
                prop_kinds_early, targ_kinds_early, target_fn, traced,
                total_chains, d, return_stderr,
                hmc_L=(
                    proposal.n_leapfrog
                    if isinstance(proposal, HMC)
                    else 0
                ),
            )
        ):
            return self._run_mcmc_nd_pallas(
                functions, traced, proposals, prop_specs, targets,
                target_fn, n_steps, n_chains, n_burnin, seed,
                total_chains, return_stderr,
                proposal_rw=proposal if random_walk else None, d=d,
            )
        if (
            return_diagnostics or return_samples
        ) and self._backend == "pallas":
            warnings.warn(
                "backend='pallas' requested but "
                + ("return_diagnostics" if return_diagnostics
                   else "return_samples")
                + " runs on the XLA backend (an inference surface, not "
                "a throughput path)",
                stacklevel=3,
            )

        use_init = initial_state is not None
        run, dev_args = self._nd_mcmc_xla_program(
            traced, proposals, prop_specs, targets, target_fn,
            n_steps, n_burnin, total_chains, return_stderr,
            with_diagnostics=return_diagnostics,
            with_state=want_state, use_init_state=use_init,
            proposal_rw=proposal if random_walk else None, d=d,
            with_samples=return_samples,
        )
        if want_state:
            if use_init:
                xs = np.asarray(initial_state.x, np.float32)
                if xs.ndim != 2 or xs.shape != (d, total_chains):
                    raise ValueError(
                        f"initial_state carries x of shape {xs.shape} "
                        f"but this nd run plans ({d}, {total_chains}); "
                        "pass the state back with the same dimensions "
                        "and n_chains/target_threads"
                    )
                x0 = jnp.asarray(xs)
                logp0 = jnp.asarray(initial_state.log_p, jnp.float32)
                segment = initial_state.segment + 1
            else:
                x0 = jnp.zeros((d, total_chains), jnp.float32)
                logp0 = jnp.zeros(total_chains, jnp.float32)
                segment = 0
            out = run(
                np.uint32(seed), *dev_args, x0, logp0, jnp.int32(segment)
            )
            values, acc_rate, x_f, logp_f = out
            chain_state = McmcState(
                np.asarray(x_f), np.asarray(logp_f), segment=segment
            )
            return IntegrationResult(
                values=values,
                n_samples=n_chains * n_steps,
                n_functions=len(functions),
                acceptance_rate=float(acc_rate),
                chain_state=chain_state if return_state else None,
            )
        out = run(np.uint32(seed), *dev_args)
        values, acc_rate = out[0], out[1]
        idx = 2
        stderr = None
        diagnostics = None
        samples = None
        if return_stderr:
            stderr = out[idx]
            idx += 1
        if return_diagnostics:
            diagnostics = {
                "r_hat": np.array(out[idx], dtype=np.float64),
                "ess": np.array(out[idx + 1], dtype=np.float64),
            }
            idx += 2
        if return_samples:
            # Builder buffer is (m, d, total_chains); surface as
            # (m, n_chains, d) draws.
            samples = np.transpose(np.asarray(out[idx]), (0, 2, 1))
        return IntegrationResult(
            values=values,
            n_samples=n_chains * n_steps,
            n_functions=len(functions),
            acceptance_rate=float(acc_rate),
            stderr=stderr,
            diagnostics=diagnostics,
            samples=samples,
        )

    def _nd_mcmc_xla_program(
        self, traced, proposals, prop_specs, targets, target_fn,
        n_steps, n_burnin, total_chains, return_stderr,
        with_diagnostics: bool = False,
        with_state: bool = False, use_init_state: bool = False,
        proposal_rw=None, d: int = 0, with_samples: int = 0,
    ):
        """Cached XLA nd MH program (any family mix) + its device args
        (the 8 per-dimension param/table tuples).  ``proposal_rw``: a
        RandomWalk proposal — the program then runs random-walk MH with
        per-dimension (4,) parameter rows in the params slots and
        dummies in every proposal table slot (``d`` required then)."""
        from .ops.mcmc_nd import build_mcmc_nd_fn

        mesh = self._mesh
        dummy = _tbl(None)
        random_walk = proposal_rw is not None
        hmc_L = (
            proposal_rw.n_leapfrog
            if isinstance(proposal_rw, HMC)
            else 0
        )
        if random_walk:
            rows = proposal_rw.pack_params_nd(targets, d)
            prop_kinds = (DistKind.NORMAL,) * d  # ignored by the builder
            prop_exact = (False,) * d
            prop_dev = [
                (jnp.asarray(rows[j]), dummy, dummy) for j in range(d)
            ]
            prop_log_dev = [(dummy, dummy)] * d
            prop_uniform = [False] * d
            prop_key = (
                ("hmc", hmc_L, proposal_rw.adapt)
                if hmc_L
                else ("rw", proposal_rw.adapt)
            )
        else:
            prop_kinds = tuple(s.kind for s in prop_specs)
            prop_exact = tuple(s.exact_inverse for s in prop_specs)
            prop_dev = [
                _device_args_of(p, s)
                for p, s in zip(proposals, prop_specs)
            ]
            prop_log_dev = []
            prop_uniform = []
            for p, s in zip(proposals, prop_specs):
                if s.kind == DistKind.CUSTOM:
                    lx, lp = _device_log_tables_of(p, "proposal")
                    prop_log_dev.append((lx, lp))
                    prop_uniform.append(
                        bool(is_uniform_grid(np.asarray(lx)))
                    )
                else:
                    prop_log_dev.append((dummy, dummy))
                    prop_uniform.append(False)
            prop_key = prop_kinds

        if target_fn is not None:
            targ_kinds = None
            targ_uniform = ()
            targ_params_t = ()
            targ_lx_t = ()
            targ_lp_t = ()
            targ_key = ("fn", _fn_key(target_fn))
            targ_shapes = ()
        else:
            targ_specs = [dist_spec_of(t) for t in targets]
            targ_kinds = tuple(s.kind for s in targ_specs)
            targ_params_t = tuple(
                _device_args_of(t, s)[0]
                for t, s in zip(targets, targ_specs)
            )
            targ_log_dev = []
            targ_uniform = []
            for t, s in zip(targets, targ_specs):
                if s.kind == DistKind.CUSTOM:
                    lx, lp = _device_log_tables_of(t)
                    targ_log_dev.append((lx, lp))
                    targ_uniform.append(
                        bool(is_uniform_grid(np.asarray(lx)))
                    )
                else:
                    targ_log_dev.append((dummy, dummy))
                    targ_uniform.append(False)
            targ_uniform = tuple(targ_uniform)
            targ_lx_t = tuple(t[0] for t in targ_log_dev)
            targ_lp_t = tuple(t[1] for t in targ_log_dev)
            targ_key = (
                "kinds", targ_kinds, targ_uniform,
                tuple(a.shape for a in targ_lx_t),
            )
            targ_shapes = tuple(_table_shapes(s) for s in targ_specs)

        key = (
            "mcmc_nd",
            _fns_key(traced),
            prop_key,
            prop_exact,
            tuple(prop_uniform),
            targ_key,
            n_steps,
            n_burnin,
            total_chains,
            (
                None
                if random_walk
                else tuple(_table_shapes(s) for s in prop_specs)
            ),
            targ_shapes,
            tuple(t[0].shape for t in prop_log_dev),
            _mesh_key(mesh),
            return_stderr,
            with_diagnostics,
            with_state,
            use_init_state,
            with_samples,
        )
        run = self._cache.get_or_build(
            key,
            lambda: build_mcmc_nd_fn(
                traced, prop_kinds, n_steps, n_burnin, total_chains,
                targ_kinds=targ_kinds, target_logpdf_fn=target_fn,
                targ_uniform=targ_uniform,
                prop_uniform=tuple(prop_uniform),
                prop_exact_inverses=prop_exact,
                mesh=mesh, with_stderr=return_stderr,
                with_diagnostics=with_diagnostics,
                with_state=with_state, use_init_state=use_init_state,
                random_walk=random_walk,
                rw_adapt=random_walk and proposal_rw.adapt,
                with_samples=with_samples,
                hmc_leapfrog=hmc_L,
            ),
        )
        dev_args = (
            tuple(p[0] for p in prop_dev),
            targ_params_t,
            tuple(p[1] for p in prop_dev),
            tuple(p[2] for p in prop_dev),
            targ_lx_t,
            targ_lp_t,
            tuple(t[0] for t in prop_log_dev),
            tuple(t[1] for t in prop_log_dev),
        )
        return run, dev_args

    def _integrate_mcmc_pt(
        self, functions, target, proposal, temperatures, n_steps,
        n_chains, n_burnin, seed, initial_state, return_state,
        return_stderr, return_diagnostics, return_samples,
    ) -> IntegrationResult:
        """Parallel tempering (replica exchange): T replicas of every
        chain run against ``pi^(1/T_t)`` and adjacent temperature rungs
        periodically exchange states, so the cold (T=1) chains — the
        only ones that enter the estimates — mix across modes that trap
        a plain local sampler (see ops/mcmc_pt.py).  A capability beyond
        the reference's independence-only sampler
        (src/shader_gen.rs:466-539)."""
        if not isinstance(proposal, RandomWalk):
            raise TypeError(
                "temperatures requires a RandomWalk or HMC proposal "
                "(tempering repairs LOCAL samplers; an independence "
                f"sampler already proposes globally), got "
                f"{type(proposal)}"
            )
        temps = [float(t) for t in temperatures]
        if len(temps) < 2:
            raise ValueError(
                "temperatures needs >= 2 rungs (the first is the "
                f"target itself), got {temps}"
            )
        if temps[0] != 1.0:
            raise ValueError(
                f"temperatures must start at 1.0 (the true target), "
                f"got {temps}"
            )
        if any(
            not np.isfinite(t) or t2 <= t1
            for t, (t1, t2) in zip(temps[1:], zip(temps, temps[1:]))
        ):
            raise ValueError(
                f"temperatures must be finite and strictly increasing, "
                f"got {temps}"
            )
        if return_state or initial_state is not None:
            raise ValueError(
                "temperatures applies to stateless MCMC runs only "
                "(the ladder state is not checkpointed)"
            )
        if return_samples and not 1 <= int(return_samples) <= n_steps:
            raise ValueError(
                f"return_samples must be in [1, n_steps={n_steps}], "
                f"got {return_samples}"
            )
        if return_diagnostics and n_steps < 4:
            raise ValueError("return_diagnostics needs n_steps >= 4")
        _check_random_walk_args(proposal, n_burnin, False)
        betas = tuple(1.0 / t for t in temps)
        _, targets, target_fn, d = self._parse_nd_mcmc_args(
            target, proposal
        )
        traced = self._trace_user_functions(functions, n_args=d)
        mesh = self._mesh
        n_dev = 1 if mesh is None else mesh.size
        total_chains = plan_chains(n_chains, self._target_threads, n_dev)
        if self._backend == "pallas":
            warnings.warn(
                "backend='pallas' requested but parallel tempering runs "
                "on the XLA backend (an exploration surface, not a "
                "throughput path)",
                stacklevel=3,
            )
        run, dev_args = self._pt_mcmc_program(
            traced, targets, target_fn, betas, proposal, d,
            n_steps, n_burnin, total_chains, return_stderr,
            return_diagnostics, with_samples=int(return_samples or 0),
        )
        out = run(np.uint32(seed), *dev_args)
        values, acc_rate, swap_rate = out[0], out[1], out[2]
        idx = 3
        stderr = None
        samples = None
        # Tempered runs always surface the swap rate — THE ladder-tuning
        # diagnostic (~0: rungs don't overlap, add rungs; ~1: rungs
        # redundant, spread them).
        diagnostics = {"swap_rate": float(swap_rate)}
        if return_stderr:
            stderr = out[idx]
            idx += 1
        if return_diagnostics:
            diagnostics["r_hat"] = np.array(out[idx], dtype=np.float64)
            diagnostics["ess"] = np.array(out[idx + 1], dtype=np.float64)
            idx += 2
        if return_samples:
            # Builder buffer is (m, d, total_chains); surface the
            # family's conventions — (m, n_chains) for a 1-D
            # Distribution target, (m, n_chains, d) otherwise.
            arr = np.transpose(np.asarray(out[idx]), (0, 2, 1))
            samples = (
                arr[:, :, 0] if (d == 1 and target_fn is None) else arr
            )
        return IntegrationResult(
            values=values,
            n_samples=n_chains * n_steps,
            n_functions=len(functions),
            acceptance_rate=float(acc_rate),
            stderr=stderr,
            diagnostics=diagnostics,
            samples=samples,
        )

    def _pt_mcmc_program(
        self, traced, targets, target_fn, betas, proposal_rw, d,
        n_steps, n_burnin, total_chains, return_stderr,
        with_diagnostics, with_samples: int = 0,
    ):
        """Cached parallel-tempering program + its device args.  The
        walk rows ride as runtime args (a step-size change re-uses the
        compiled program); the ladder itself (betas), the adapt mode and
        the leapfrog length are compile-time."""
        from .ops.mcmc_pt import build_pt_mcmc_fn

        mesh = self._mesh
        dummy = _tbl(None)
        hmc_L = (
            proposal_rw.n_leapfrog
            if isinstance(proposal_rw, HMC)
            else 0
        )
        rows = proposal_rw.pack_params_nd(targets, d)
        prop_params_t = tuple(jnp.asarray(rows[j]) for j in range(d))
        if target_fn is not None:
            targ_kinds = None
            targ_uniform = ()
            targ_params_t = ()
            targ_lx_t = ()
            targ_lp_t = ()
            targ_key = ("fn", _fn_key(target_fn))
            targ_shapes = ()
        else:
            targ_specs = [dist_spec_of(t) for t in targets]
            targ_kinds = tuple(s.kind for s in targ_specs)
            targ_params_t = tuple(
                _device_args_of(t, s)[0]
                for t, s in zip(targets, targ_specs)
            )
            targ_log_dev = []
            targ_uniform = []
            for t, s in zip(targets, targ_specs):
                if s.kind == DistKind.CUSTOM:
                    lx, lp = _device_log_tables_of(t)
                    targ_log_dev.append((lx, lp))
                    targ_uniform.append(
                        bool(is_uniform_grid(np.asarray(lx)))
                    )
                else:
                    targ_log_dev.append((dummy, dummy))
                    targ_uniform.append(False)
            targ_uniform = tuple(targ_uniform)
            targ_lx_t = tuple(t[0] for t in targ_log_dev)
            targ_lp_t = tuple(t[1] for t in targ_log_dev)
            targ_key = (
                "kinds", targ_kinds, targ_uniform,
                tuple(a.shape for a in targ_lx_t),
            )
            targ_shapes = tuple(_table_shapes(s) for s in targ_specs)

        key = (
            "mcmc_pt",
            _fns_key(traced),
            betas,
            ("hmc", hmc_L, proposal_rw.adapt),
            targ_key,
            n_steps,
            n_burnin,
            total_chains,
            targ_shapes,
            _mesh_key(mesh),
            return_stderr,
            with_diagnostics,
            with_samples,
        )
        run = self._cache.get_or_build(
            key,
            lambda: build_pt_mcmc_fn(
                traced, d, betas, n_steps, n_burnin, total_chains,
                targ_kinds=targ_kinds, target_logpdf_fn=target_fn,
                targ_uniform=targ_uniform, mesh=mesh,
                with_stderr=return_stderr,
                with_diagnostics=with_diagnostics,
                rw_adapt=proposal_rw.adapt,
                hmc_leapfrog=hmc_L,
                with_samples=with_samples,
            ),
        )
        dev_args = (prop_params_t, targ_params_t, targ_lx_t, targ_lp_t)
        return run, dev_args

    def _compile_mcmc_nd(
        self, functions, target, proposal, n_steps, n_chains, n_burnin,
        seed_batch, param_batch, return_stderr,
    ) -> Callable:
        """AOT handle for multi-dimensional MCMC: ``prog(seed) ->
        ((K,), acceptance[, (K,) stderr])``, or batched ``prog(seeds)``
        with ``seed_batch=R`` — R runs ride the nd kernel's grid
        dimension when eligible (analytic dims), else a traced lax.map
        over the XLA nd program.  ``param_batch=True`` (product-analytic
        targets): ``prog(seeds, target_params, proposal_params)`` with
        each params arg an (R, d, 2) array (pack_param_batch_nd) — one
        program serves a d-dimensional posterior/tempering sweep per
        dispatch."""
        proposals, targets, target_fn, d = self._parse_nd_mcmc_args(
            target, proposal
        )
        if d == 1 and target_fn is None:
            return self.compile_mcmc(
                functions, targets[0],
                proposal if proposals is None else proposals[0],
                n_steps=n_steps,
                n_chains=n_chains, n_burnin=n_burnin,
                seed_batch=seed_batch, param_batch=param_batch,
                return_stderr=return_stderr,
            )
        if param_batch and target_fn is not None:
            raise ValueError(
                "param_batch needs a product-of-Distributions target "
                "(a joint log-density function carries no runtime "
                "parameters)"
            )
        random_walk = proposals is None
        if random_walk:
            # With param_batch the proposal slot takes (R, d, 4)
            # RandomWalk rows (pack_random_walk_batch_nd); the target's
            # analytic-family gate below still applies.
            _check_random_walk_args(proposal, n_burnin, False)
        traced = self._trace_user_functions(functions, n_args=d)
        prop_specs = (
            None if random_walk else [dist_spec_of(p) for p in proposals]
        )
        mesh = self._mesh
        n_dev = 1 if mesh is None else mesh.size
        total_chains = plan_chains(n_chains, self._target_threads, n_dev)
        prop_kinds = (
            () if random_walk else tuple(s.kind for s in prop_specs)
        )
        targ_kinds = (
            None
            if target_fn is not None
            else tuple(dist_spec_of(t).kind for t in targets)
        )
        if param_batch:
            for kk in prop_kinds:
                ensure_param_batch_family(kk, "proposal")
            for kk in targ_kinds:
                ensure_param_batch_family(kk, "target")
        kernel_ok = (
            self._use_pallas(DistKind.NORMAL)
            and self._nd_mcmc_pallas_eligible(
                prop_kinds, targ_kinds, target_fn, traced,
                total_chains, d, return_stderr,
                hmc_L=(
                    proposal.n_leapfrog
                    if isinstance(proposal, HMC)
                    else 0
                ),
            )
        )
        if kernel_ok:
            run, dev_args = self._nd_mcmc_kernel_program(
                traced, proposals, prop_specs, targets, target_fn,
                n_steps, n_burnin, total_chains, return_stderr,
                seed_batch=seed_batch, param_batch=param_batch,
                proposal_rw=proposal if random_walk else None, d=d,
            )
        else:
            run, dev_args = self._nd_mcmc_xla_program(
                traced, proposals, prop_specs, targets, target_fn,
                n_steps, n_burnin, total_chains, return_stderr,
                proposal_rw=proposal if random_walk else None, d=d,
            )
        if param_batch:
            if not kernel_ok:
                run = _nd_mcmc_param_map_adapter(run, d, dev_args[2:])
            return _nd_mcmc_param_prog(
                run, seed_batch, d, targ_kinds, prop_kinds,
                random_walk=random_walk,
                rw_adapt=random_walk and proposal.adapt,
            )
        return self._finalize_prog(
            run, dev_args, seed_batch, n_param_args=0
        )

    # ------------------------------------------------------------------
    # MCMC
    # ------------------------------------------------------------------

    def integrate_mcmc(
        self,
        functions: List[Union[Callable, str]],
        target_distribution: Distribution,
        proposal_distribution: Union[Distribution, RandomWalk],
        n_steps: int = 10_000,
        n_chains: int = 1024,
        n_burnin: int = 1_000,
        seed: int = 42,
        initial_state: Optional[McmcState] = None,
        return_state: bool = False,
        return_stderr: bool = False,
        return_diagnostics: bool = False,
        return_samples: Optional[int] = None,
        temperatures: Optional[List[float]] = None,
    ) -> IntegrationResult:
        """Compute E_p[f(X)] with parallel independence-sampler
        Metropolis-Hastings chains (one chain per lane).

        ``temperatures=[1.0, T_2, ..., T_R]`` (ascending, first entry
        1.0; requires a :class:`RandomWalk` or :class:`HMC` proposal)
        switches on PARALLEL TEMPERING: every chain is replicated at
        each temperature against ``p(x)^(1/T)``, adjacent rungs
        exchange states through the replica-exchange acceptance rule
        every step, and the estimates come from the T=1 rung — the hot
        rungs cross energy barriers the cold sampler cannot, so
        multimodal targets mix (see ops/mcmc_pt.py).  Tempered results
        always carry ``result.diagnostics["swap_rate"]`` (accepted /
        attempted exchanges — ~0 means the ladder's rungs don't
        overlap, near 1 means rungs are redundant; healthy is roughly
        0.2-0.6).  Composes with ``return_stderr``,
        ``return_diagnostics`` and ``return_samples`` (cold-rung
        draws); stateless runs only; XLA backend.

        ``return_samples=m`` (stateless runs, ``1 <= m <= n_steps``):
        ``result.samples`` holds (m, n_chains) float32 thinned
        post-burn-in draws — the chain states every ``n_steps // m``
        sampling steps — raw chain output for downstream inference
        (histograms, quantiles, posterior predictive) at user-bounded
        memory; a surface the expectations-only reference lacks.  Runs
        on the XLA backend.

        Passing :class:`RandomWalk` as ``proposal_distribution`` switches
        to random-walk MH — ``x' = x + step * N(0, 1)``, acceptance
        ``log u < log p(x') - log p(x)`` — a proposal family beyond the
        reference's independence-only sampler; use it whenever no
        analytic family envelopes the target well (the independence
        chain's acceptance collapses there, the random walk still mixes).
        ``RandomWalk(adapt=True)`` tunes the step per chain during
        burn-in toward ``target_accept``; adaptive runs are
        stateless-only (the tuned steps are not checkpointed).

        Passing :class:`HMC` switches to Hamiltonian Monte Carlo:
        each iteration draws a fresh momentum, runs ``n_leapfrog``
        leapfrog steps guided by the autodiff gradient of the target's
        log-density, and applies the exact Metropolis energy
        correction — trajectories cross the target in a few steps where
        a random walk diffuses, so the effective sample size per step
        is far higher on smooth targets.  Works with analytic, table
        (piecewise-linear gradient), and joint log-density targets;
        ``adapt=True`` tunes the step toward ``target_accept=0.8``
        during burn-in exactly as the random walk does.

        ``return_state=True`` attaches the final per-chain state to the
        result; passing it back as ``initial_state`` resumes those chains
        (skipping the fresh proposal-draw initialisation; burn-in still
        runs as requested).

        ``return_stderr=True`` (stateless runs only): ``result.stderr``
        estimates the standard error of each value from the BETWEEN-CHAIN
        variance of the per-chain means — chains are independent, so this
        is a valid MCMC error bar that automatically accounts for
        within-chain autocorrelation (an addition over the reference).
        Error bars ride the Pallas kernel whenever the plain run would
        (pilot-shifted per-program squares, Chan-recombined).

        ``return_diagnostics=True`` (stateless runs, ``n_steps >= 4``):
        ``result.diagnostics["r_hat"]`` is the split-R-hat
        potential-scale-reduction statistic per function — each chain's
        sampling phase is split into two halves and the between- vs
        within-sequence variances compared; values near 1 indicate
        mixing, values well above 1 flag a proposal that explores the
        target too slowly.  ``result.diagnostics["ess"]`` is the
        matching effective sample size (m*n*var+/B, capped at the
        diagnostic draw count): how many INDEPENDENT draws the
        correlated chains are worth.  Diagnostics runs execute on the
        XLA backend.
        """
        if len(functions) == 0:
            raise ValueError("At least one function is required")
        if n_steps <= 0:
            raise ValueError("n_steps must be positive")
        if n_chains <= 0:
            raise ValueError("n_chains must be positive")
        if n_burnin < 0:
            raise ValueError("n_burnin must be non-negative")
        if return_stderr and (return_state or initial_state is not None):
            raise ValueError(
                "return_stderr applies to stateless MCMC runs only "
                "(resumed segments' between-chain variance reflects the "
                "segment, not the combined run)"
            )
        if return_diagnostics and (
            return_state or initial_state is not None
        ):
            raise ValueError(
                "return_diagnostics applies to stateless MCMC runs only"
            )
        if return_samples is not None:
            m_samp = int(return_samples)
            if return_state or initial_state is not None:
                raise ValueError(
                    "return_samples applies to stateless MCMC runs only"
                )
            if not 1 <= m_samp <= n_steps:
                raise ValueError(
                    f"return_samples must be in [1, n_steps={n_steps}], "
                    f"got {return_samples}"
                )
        else:
            m_samp = 0
        if temperatures is not None:
            return self._integrate_mcmc_pt(
                functions, target_distribution, proposal_distribution,
                temperatures, n_steps, n_chains, n_burnin, seed,
                initial_state, return_state, return_stderr,
                return_diagnostics, m_samp,
            )
        if isinstance(proposal_distribution, RandomWalk):
            _check_random_walk_args(
                proposal_distribution, n_burnin,
                return_state or initial_state is not None,
            )

        p_seq = isinstance(proposal_distribution, (list, tuple))
        t_dist = isinstance(target_distribution, Distribution)
        if p_seq or isinstance(target_distribution, (list, tuple)) or (
            not t_dist and (
                callable(target_distribution)
                or isinstance(target_distribution, str)
            )
        ):
            # Multi-dimensional MCMC (and 1-D custom joint log-density
            # targets, the d=1 case of the same machinery).
            return self._integrate_mcmc_nd(
                functions, target_distribution, proposal_distribution,
                n_steps, n_chains, n_burnin, seed,
                initial_state=initial_state, return_state=return_state,
                return_stderr=return_stderr,
                return_diagnostics=return_diagnostics,
                return_samples=m_samp,
            )

        traced = self._trace_user_functions(functions)

        want_state = return_state or initial_state is not None

        if not want_state:
            stateless, _ = self._get_mcmc_program(
                traced,
                target_distribution,
                proposal_distribution,
                n_steps,
                n_chains,
                n_burnin,
                with_stderr=return_stderr,
                with_diagnostics=return_diagnostics,
                with_samples=m_samp,
            )
            outs = stateless(seed)
            values, acc_rate = outs[0], outs[1]
            idx = 2
            stderr = None
            diagnostics = None
            samples = None
            if return_stderr:
                stderr = outs[idx]
                idx += 1
            if return_diagnostics:
                diagnostics = {
                    "r_hat": np.array(outs[idx], dtype=np.float64),
                    "ess": np.array(outs[idx + 1], dtype=np.float64),
                }
                idx += 2
            if m_samp:
                samples = np.asarray(outs[idx])
            return IntegrationResult(
                values=values,
                n_samples=n_chains * n_steps,
                n_functions=len(functions),
                acceptance_rate=float(acc_rate),
                stderr=stderr,
                diagnostics=diagnostics,
                samples=samples,
            )

        # Checkpoint/resume: both backends surface chain state (the Pallas
        # kernel carries it in VMEM for the whole sweep and writes the
        # final (x, log_p) blocks; reference bar: state never leaves the
        # device, src/shader_gen.rs:390-392).  The backends plan chain
        # counts differently, so a resume state minted on one routes back
        # to it via its chain count.
        use_init = initial_state is not None
        prog, state_chains = self._get_mcmc_program(
            traced,
            target_distribution,
            proposal_distribution,
            n_steps,
            n_chains,
            n_burnin,
            with_state=True,
            use_init_state=use_init,
            initial_chains=initial_state.n_chains if use_init else None,
        )
        if use_init and initial_state.n_chains != state_chains:
            raise ValueError(
                f"initial_state has {initial_state.n_chains} chains but "
                f"this run plans {state_chains}; pass the state back with "
                "the same n_chains/target_threads (and the backend that "
                "produced it)"
            )
        if use_init:
            x0 = jnp.asarray(initial_state.x, jnp.float32)
            logp0 = jnp.asarray(initial_state.log_p, jnp.float32)
            segment = initial_state.segment + 1
        else:
            x0 = jnp.zeros(state_chains, jnp.float32)
            logp0 = jnp.zeros(state_chains, jnp.float32)
            segment = 0
        values, acc_rate, x_f, logp_f = prog(
            seed, x0, logp0, jnp.int32(segment)
        )
        chain_state = McmcState(
            np.asarray(x_f), np.asarray(logp_f), segment=segment
        )

        total_samples = n_chains * n_steps
        return IntegrationResult(
            values=values,
            n_samples=total_samples,
            n_functions=len(functions),
            acceptance_rate=float(acc_rate),
            chain_state=chain_state if return_state else None,
        )

    def compile_mcmc(
        self,
        functions: List[Union[Callable, str]],
        target_distribution: Distribution,
        proposal_distribution: Union[Distribution, RandomWalk],
        n_steps: int = 10_000,
        n_chains: int = 1024,
        n_burnin: int = 1_000,
        seed_batch: int = 1,
        param_batch: bool = False,
        return_stderr: bool = False,
    ) -> Callable:
        """Ahead-of-time MCMC handle for serving: ``prog(seed) ->
        ((K,) jax.Array, acceptance jax scalar)`` — tracing, compilation and
        uploads done once; each call is one device dispatch.  With
        ``seed_batch=R``: ``prog(seeds) -> ((R, K), (R,))`` in one dispatch
        (see compile_integrate).

        ``return_stderr=True``: the handle returns ``(values,
        acceptance, stderrs)`` — with a seed or param batch,
        per-element between-chain error bars ride the same batched
        kernel grid (each rep's in-kernel pilot comes from its own
        init draw).

        ``param_batch=True`` additionally makes both distributions'
        parameters runtime batch inputs: ``prog(seeds, target_params,
        proposal_params) -> ((R, K), (R,))`` with each params arg an
        (R, 2) float32 array (:func:`pack_param_batch`; R =
        ``seed_batch``) — one compiled program serves a whole
        posterior/proposal sweep per dispatch.  Analytic families only.
        With a :class:`RandomWalk` proposal the proposal-params slot
        instead takes (R, 4) walk rows (:func:`pack_random_walk_batch`;
        (R, d, 4) via :func:`pack_random_walk_batch_nd` for nd runs) —
        one program serves a step-size/adaptation sweep, e.g. for
        calibrating the walk against a batch of tempered targets."""
        if len(functions) == 0:
            raise ValueError("At least one function is required")
        if n_steps <= 0:
            raise ValueError("n_steps must be positive")
        if n_chains <= 0:
            raise ValueError("n_chains must be positive")
        if n_burnin < 0:
            raise ValueError("n_burnin must be non-negative")
        p_seq = isinstance(proposal_distribution, (list, tuple))
        t_dist = isinstance(target_distribution, Distribution)
        if p_seq or isinstance(target_distribution, (list, tuple)) or (
            not t_dist and (
                callable(target_distribution)
                or isinstance(target_distribution, str)
            )
        ):
            return self._compile_mcmc_nd(
                functions, target_distribution, proposal_distribution,
                n_steps, n_chains, n_burnin, seed_batch, param_batch,
                return_stderr,
            )
        if isinstance(proposal_distribution, RandomWalk):
            _check_random_walk_args(
                proposal_distribution, n_burnin, False
            )
            if param_batch:
                # The proposal-params slot takes (R, 4) RandomWalk rows
                # (pack_random_walk_batch); only the target's family is
                # gated to the analytic, runtime-parameterizable set.
                ensure_param_batch_family(
                    dist_spec_of(target_distribution).kind, "target"
                )
        elif param_batch:
            for role, d in (
                ("target", target_distribution),
                ("proposal", proposal_distribution),
            ):
                ensure_param_batch_family(dist_spec_of(d).kind, role)
        traced = self._trace_user_functions(functions)
        prog, _ = self._get_mcmc_program(
            traced,
            target_distribution,
            proposal_distribution,
            n_steps,
            n_chains,
            n_burnin,
            seed_batch=seed_batch,
            param_batch=param_batch,
            with_stderr=return_stderr,
        )
        return prog

    def _mcmc_pallas_ok(
        self, traced, prop_spec, targ_spec,
        target_distribution, proposal_distribution,
        random_walk: bool = False,
    ) -> bool:
        """Pallas-kernel eligibility for an MCMC workload: CUSTOM families
        need uniform log-pdf x-grids (host-built ones are) and a
        lane-multiple inverse-CDF table for the in-kernel lookups; the
        kernel also reserves one output lane for the accept count, capping
        K at 127.  Anything else routes to the XLA backend.
        ``random_walk=True`` (prop_spec is None): the proposal is a
        tableless symmetric Gaussian step, so only the target-side checks
        apply."""
        probe_kind = targ_spec.kind if random_walk else prop_spec.kind
        if not self._use_pallas(probe_kind):
            return False
        from .ops.mcmc_pallas import mcmc_pallas_supports

        ok = (
            mcmc_pallas_supports(probe_kind, targ_spec.kind)
            and len(traced) < 128
            and _block_traceable(traced)
        )
        if ok and targ_spec.kind == DistKind.CUSTOM:
            ok = _uniform_log_tables(target_distribution) is not None
        if ok and not random_walk and prop_spec.kind == DistKind.CUSTOM:
            # exact_inverse proposals sample through host-built
            # gap-respecting tables (always lane-multiple); the q-table
            # must additionally pass the proposal-fidelity pipeline.
            ok = (
                _proposal_kernel_log_tables(proposal_distribution)
                is not None
            ) and not prop_spec.heavy_tail and (
                prop_spec.exact_inverse
                or (
                    prop_spec.x_table is not None
                    and prop_spec.x_table.shape[0] % 128 == 0
                )
            )
        return ok

    def _get_mcmc_program(
        self,
        traced,
        target_distribution,
        proposal_distribution,
        n_steps,
        n_chains,
        n_burnin,
        with_state: bool = False,
        use_init_state: bool = False,
        initial_chains: Optional[int] = None,
        seed_batch: int = 1,
        param_batch: bool = False,
        with_stderr: bool = False,
        with_diagnostics: bool = False,
        with_samples: int = 0,
    ):
        """MCMC program + the chain count its state carries.

        Stateless: ``prog(seed) -> (values, acceptance)``.  With
        ``with_state=True``: ``prog(seed, x0, logp0, segment) -> (values,
        acceptance, x_final, logp_final)``; ``initial_chains`` (the resume
        state's chain count, if resuming) steers routing — a state minted
        by the XLA backend keeps routing there when its count doesn't fit
        the Pallas plan."""
        if with_state and seed_batch != 1:
            raise ValueError(
                "seed_batch applies to stateless MCMC programs only"
            )
        if with_state and param_batch:
            raise ValueError(
                "param_batch applies to stateless MCMC programs only"
            )
        if with_stderr and with_state:
            raise ValueError(
                "with_stderr applies to stateless MCMC programs only"
            )
        if with_diagnostics:
            if with_state:
                raise ValueError(
                    "with_diagnostics applies to stateless MCMC programs "
                    "only"
                )
            if seed_batch != 1 or param_batch:
                raise ValueError(
                    "with_diagnostics is not supported on batched programs"
                )
        if with_samples:
            if with_state:
                raise ValueError(
                    "return_samples applies to stateless MCMC runs only"
                )
            if seed_batch != 1 or param_batch:
                raise ValueError(
                    "return_samples is not supported on batched programs"
                )
        random_walk = isinstance(proposal_distribution, RandomWalk)
        rw_adapt = random_walk and proposal_distribution.adapt
        hmc_L = (
            proposal_distribution.n_leapfrog
            if isinstance(proposal_distribution, HMC)
            else 0
        )
        prop_spec = (
            None if random_walk else dist_spec_of(proposal_distribution)
        )
        targ_spec = dist_spec_of(target_distribution)
        mesh = self._mesh
        n_dev = 1 if mesh is None else mesh.size
        total_chains = plan_chains(n_chains, self._target_threads, n_dev)

        # Diagnostics and raw-draw runs take the XLA backend (inference
        # surfaces, not the serving hot path; the kernel reduces chains
        # to program sums and Mosaic has no dynamic_update_slice for the
        # thinned-draw buffer).
        if (with_diagnostics or with_samples) and self._backend == "pallas":
            warnings.warn(
                "backend='pallas' requested but "
                + ("return_diagnostics" if with_diagnostics
                   else "return_samples")
                + " runs the XLA MCMC backend",
                stacklevel=3,
            )
        # In-kernel HMC needs the gradient traced from a closed form:
        # table targets would need gather-VJP scatters Mosaic lacks.
        pallas_ok = (
            not with_diagnostics
            and not with_samples
            and (hmc_L == 0 or targ_spec.kind != DistKind.CUSTOM)
        ) and self._mcmc_pallas_ok(
            traced, prop_spec, targ_spec,
            target_distribution, proposal_distribution,
            random_walk=random_walk,
        )
        if pallas_ok:
            # The kernel keeps the (seed_batch x programs, 128) sums
            # buffer (tripled for error-bar runs: sums / SS / centroid
            # rows) and, stateful, the whole chain-state blocks resident
            # in VMEM; workloads over the budget take the XLA backend
            # instead of compile-OOMing.
            from .ops.mcmc_pallas import mcmc_vmem_fits, plan_mcmc_grid

            programs, rows, _ = plan_mcmc_grid(total_chains)
            programs = -(-programs // n_dev) * n_dev
            pallas_ok = mcmc_vmem_fits(
                len(traced), rows, programs // n_dev,
                seed_batch=seed_batch, with_state=with_state,
                table_bytes=_mcmc_table_bytes(
                    prop_spec, targ_spec,
                    target_distribution, proposal_distribution,
                ),
                with_stderr=with_stderr,
                hmc=bool(hmc_L),
            )
        if pallas_ok and with_state:
            from .ops.mcmc_pallas import plan_state_chains

            pallas_state_chains = plan_state_chains(total_chains, n_dev)
            if (
                initial_chains is not None
                and initial_chains != pallas_state_chains
                and initial_chains == total_chains
            ):
                pallas_ok = False  # state minted by the XLA backend
        if (
            not pallas_ok
            and not (with_diagnostics or with_samples)
            and self._backend == "pallas"
        ):
            # (with_diagnostics / with_samples already warned above.)
            warnings.warn(
                "backend='pallas' requested but this MCMC workload is "
                "not Pallas-eligible; running the XLA backend instead",
                stacklevel=3,
            )
        if pallas_ok:
            from .ops.mcmc_pallas import build_mcmc_fn_pallas

            interpret = jax.default_backend() != "tpu"
            prop_gapped = (
                not random_walk
                and prop_spec.kind == DistKind.CUSTOM
                and prop_spec.exact_inverse
            )
            key = (
                "mcmc_pallas",
                _fns_key(traced),
                (
                    (("hmc", hmc_L, rw_adapt) if hmc_L else ("rw", rw_adapt))
                    if random_walk
                    else prop_spec.kind
                ),
                targ_spec.kind,
                n_steps,
                n_burnin,
                total_chains,
                None if random_walk else _table_shapes(prop_spec),
                _mesh_key(mesh),
                interpret,
                (with_state, use_init_state, prop_gapped),
                seed_batch,
                param_batch,
                with_stderr,
            )
            native_batch = seed_batch
            run = self._cache.get_or_build(
                key,
                lambda: _tag_native_batch(
                    build_mcmc_fn_pallas(
                        traced,
                        targ_spec.kind if random_walk else prop_spec.kind,
                        targ_spec.kind,
                        n_steps,
                        n_burnin,
                        total_chains,
                        mesh=mesh,
                        interpret=interpret,
                        with_state=with_state,
                        use_init_state=use_init_state,
                        prop_gapped=prop_gapped,
                        seed_batch=native_batch,
                        param_batch=param_batch,
                        with_stderr=with_stderr,
                        random_walk=random_walk,
                        rw_adapt=rw_adapt,
                        hmc_leapfrog=hmc_L,
                    ),
                    native_batch,
                    param_batch=param_batch,
                ),
            )
            dummy = _tbl(None)
            if random_walk:
                # (step, init_lo, init_hi, target_accept) row; the
                # proposal-side table slots carry dummies (the kernel
                # never reads them for a random walk).
                prop_dev = (
                    jnp.asarray(
                        proposal_distribution.pack_params(
                            target_distribution
                        )
                    ),
                    dummy,
                    dummy,
                )
            elif prop_gapped:
                t, dt = _device_gapped_tables(
                    proposal_distribution, prop_spec, stratified=False
                )
                prop_dev = (
                    _device_args_of(proposal_distribution, prop_spec)[0],
                    t,
                    dt,
                )
            else:
                prop_dev = _device_args_of(
                    proposal_distribution, prop_spec
                )
            targ_dev = _device_args_of(target_distribution, targ_spec)
            targ_log_dev = (
                _device_uniform_log_tables(target_distribution)
                if targ_spec.kind == DistKind.CUSTOM
                else (dummy, dummy)
            )
            prop_log_dev = (
                _device_uniform_log_tables(proposal_distribution, "proposal")
                if not random_walk and prop_spec.kind == DistKind.CUSTOM
                else (dummy, dummy)
            )
            static_args = (
                prop_dev[0],
                targ_dev[0],
                prop_dev[1],
                prop_dev[2],
                *targ_log_dev,
                *prop_log_dev,
            )

            if with_state:

                def prog(seed, x0, logp0, segment):
                    return run(np.uint32(seed), *static_args, x0, logp0, segment)

                return prog, pallas_state_chains

            return (
                self._finalize_mcmc_prog(
                    run, static_args, seed_batch, param_batch,
                    (
                        ("rw_adapt" if rw_adapt else "rw", targ_spec.kind)
                        if random_walk
                        else (prop_spec.kind, targ_spec.kind)
                    ),
                ),
                total_chains,
            )

        # Log-pdf tables are fetched for both distributions (reference
        # __init__.py:1077-1081) but only consulted for CUSTOM families —
        # analytic ones use closed forms (shader_gen.rs:543-571).  A
        # random-walk proposal has no density of its own: its table slots
        # carry dummies and its params row is (step, init_lo, init_hi,
        # target_accept).
        targ_lx, targ_lp = target_distribution.get_log_pdf_table()
        targ_uniform = is_uniform_grid(targ_lx)
        if random_walk:
            prop_lx = np.zeros(1, np.float32)
            prop_uniform = False
            prop_kind_key = (
                ("hmc", hmc_L, rw_adapt) if hmc_L else ("rw", rw_adapt)
            )
            prop_kind = DistKind.NORMAL  # ignored by the builder
            prop_exact_inverse = False
            prop_table_key = None
        else:
            prop_lx, prop_lp = proposal_distribution.get_log_pdf_table()
            prop_uniform = is_uniform_grid(prop_lx)
            prop_kind_key = prop_spec.kind
            prop_kind = prop_spec.kind
            prop_exact_inverse = prop_spec.exact_inverse
            prop_table_key = _table_shapes(prop_spec)
        key = (
            "mcmc_xla",
            _fns_key(traced),
            prop_kind_key,
            targ_spec.kind,
            n_steps,
            n_burnin,
            total_chains,
            prop_table_key,
            (targ_lx.shape, prop_lx.shape),
            _mesh_key(mesh),
            (with_state, use_init_state, targ_uniform, prop_uniform),
            with_stderr,
            with_diagnostics,
            with_samples,
        )
        run = self._cache.get_or_build(
            key,
            lambda: build_mcmc_fn(
                traced,
                prop_kind,
                targ_spec.kind,
                n_steps,
                n_burnin,
                total_chains,
                mesh=mesh,
                with_state=with_state,
                use_init_state=use_init_state,
                targ_table_uniform=targ_uniform,
                prop_table_uniform=prop_uniform,
                prop_exact_inverse=prop_exact_inverse,
                with_stderr=with_stderr,
                with_diagnostics=with_diagnostics,
                random_walk=random_walk,
                rw_adapt=rw_adapt,
                with_samples=with_samples,
                hmc_leapfrog=hmc_L,
            ),
        )
        use_targ_table = targ_spec.kind == DistKind.CUSTOM
        use_prop_table = (
            not random_walk and prop_spec.kind == DistKind.CUSTOM
        )
        dummy = _tbl(None)
        if random_walk:
            prop_dev = (
                jnp.asarray(
                    proposal_distribution.pack_params(target_distribution)
                ),
                dummy,
                dummy,
            )
        else:
            prop_dev = _device_args_of(proposal_distribution, prop_spec)
        targ_dev = _device_args_of(target_distribution, targ_spec)
        targ_log_dev = (
            _device_log_tables_of(target_distribution)
            if use_targ_table
            else (dummy, dummy)
        )
        prop_log_dev = (
            _device_log_tables_of(proposal_distribution, "proposal")
            if use_prop_table
            else (dummy, dummy)
        )
        static_args = (
            prop_dev[0],
            targ_dev[0],
            prop_dev[1],
            prop_dev[2],
            *targ_log_dev,
            *prop_log_dev,
        )

        if with_state:

            def prog(seed, x0, logp0, segment):
                return run(np.uint32(seed), *static_args, x0, logp0, segment)

            return prog, total_chains

        return (
            self._finalize_mcmc_prog(
                run, static_args, seed_batch, param_batch,
                (
                    ("rw_adapt" if rw_adapt else "rw", targ_spec.kind)
                    if random_walk
                    else (prop_spec.kind, targ_spec.kind)
                ),
            ),
            total_chains,
        )

    def _finalize_mcmc_prog(
        self, run, static_args, seed_batch: int, param_batch: bool,
        param_kinds=(),
    ) -> Callable:
        """Finalize a stateless MCMC program.  The internal run signature
        leads with (proposal_params, target_params); the param-batched
        user handle mirrors compile_mcmc's (target, proposal) arg order."""
        inner = self._finalize_prog(
            run, static_args, seed_batch, param_batch=param_batch,
            n_param_args=2, param_kinds=param_kinds,
        )
        if not param_batch:
            return inner

        def prog(seeds, target_params, proposal_params):
            return inner(seeds, proposal_params, target_params)

        return prog


def _mcmc_table_bytes(
    prop_spec, targ_spec, target_distribution, proposal_distribution
) -> int:
    """Bytes of VMEM-resident custom tables the MCMC kernel would keep:
    the proposal inverse-CDF (value, slope) pair plus the 128-padded
    (values, dx) log-pdf tables for each CUSTOM role.  Feeds the
    mcmc_vmem_fits routing gate so an incompressible giant user table
    falls back to XLA instead of compile-OOMing the kernel.
    ``prop_spec`` is None for random-walk proposals (no tables)."""

    def _padded(n: int) -> int:
        return -(-int(n) // 128) * 128

    total = 0
    if prop_spec is not None and prop_spec.kind == DistKind.CUSTOM:
        if prop_spec.exact_inverse:
            from .tables import INV_CDF_TABLE_SIZE

            total += 2 * INV_CDF_TABLE_SIZE * 4
        elif prop_spec.x_table is not None:
            total += 2 * int(prop_spec.x_table.shape[0]) * 4
        t = _proposal_kernel_log_tables(proposal_distribution)
        if t is not None:
            total += 2 * _padded(len(t[0])) * 4
    if targ_spec.kind == DistKind.CUSTOM:
        t = _uniform_log_tables(target_distribution)
        if t is not None:
            total += 2 * _padded(len(t[0])) * 4
    return total


def _tag_native_batch(run, seed_batch: int, param_batch: bool = False):
    """Mark a program whose signature already takes an (R,) seed vector
    (and, with ``param_batch``, an (R, 2) params array) and returns
    (R, K) — _finalize_prog then skips the unroll wrapper.
    (jitted callables may not accept attributes; wrap if needed.)"""
    if seed_batch == 1 and not param_batch:
        return run

    def _set_tags(obj):
        if seed_batch != 1:
            obj.__native_seed_batch__ = seed_batch
        if param_batch:
            obj.__native_param_batch__ = seed_batch

    try:
        _set_tags(run)
        return run
    except (AttributeError, TypeError):
        def tagged(*args):
            return run(*args)

        _set_tags(tagged)
        for attr in ("actual_samples", "block_rows"):
            if hasattr(run, attr):
                setattr(tagged, attr, getattr(run, attr))
        return tagged


def _target_arity(target) -> int:
    """Dimension count of a joint log-density target for entry points
    where no per-dimension proposal list fixes d (RandomWalk proposals):
    WGSL strings carry their declared parameter count; Python callables
    expose theirs via ``inspect.signature`` (positional parameters)."""
    if isinstance(target, str):
        tf = trace_wgsl_function(target)
        return int(getattr(tf, "__tpu_mc_arity__", 1))
    import inspect

    try:
        sig = inspect.signature(target)
    except (TypeError, ValueError):
        raise TypeError(
            "cannot determine the dimension count of this joint "
            "log-density; pass a plain function of d positional "
            "arguments (or per-dimension proposal Distributions)"
        )
    kinds = [p.kind for p in sig.parameters.values()]
    if any(
        k in (inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD)
        for k in kinds
    ):
        raise TypeError(
            "a joint log-density taking *args/**kwargs has no fixed "
            "dimension count; declare d positional arguments"
        )
    return sum(
        1
        for k in kinds
        if k
        in (
            inspect.Parameter.POSITIONAL_ONLY,
            inspect.Parameter.POSITIONAL_OR_KEYWORD,
        )
    )


def _check_random_walk_args(
    rw: RandomWalk, n_burnin: int, stateful: bool
) -> None:
    """Shared RandomWalk argument validation for the MCMC entry points:
    step adaptation happens during burn-in (so it needs one) and produces
    per-chain steps the checkpoint state does not carry (so adaptive
    runs are stateless-only; fixed-step random walks resume fine)."""
    name = type(rw).__name__  # RandomWalk or its HMC subclass
    if rw.adapt and n_burnin <= 0:
        raise ValueError(
            f"{name}(adapt=True) tunes the step during burn-in; "
            "pass n_burnin > 0 (or a fixed step_size with adapt=False)"
        )
    if rw.adapt and stateful:
        raise ValueError(
            f"{name}(adapt=True) is stateless-only: the adapted "
            "per-chain steps are not part of the checkpoint state.  "
            "Resume with a fixed step_size (adapt=False) instead"
        )


def _checked_batch_prog(dispatch, dev_args, seed_batch, n_param_args, param_kinds):
    """The shared (seeds, *params) handle shape of every param-batched
    program: validate/stage the batch args, then hand (seeds_arr,
    params_arrs, trailing dev args) to the path-specific ``dispatch``."""
    rest = tuple(dev_args[n_param_args:])

    def prog(seeds, *params):
        seeds_arr, params_arrs = _check_param_batch_args(
            seeds, params, seed_batch, n_param_args, param_kinds
        )
        return dispatch(seeds_arr, params_arrs, rest)

    return prog


def _check_param_batch_args(
    seeds, params, r: int, n_param_args: int = 1, param_kinds=()
):
    """Validate and device-stage the (seeds, params...) args of a
    param-batched program: (R,) uint32 seeds plus ``n_param_args``
    (R, 2) float32 family parameter arrays (see pack_param_batch).
    ``param_kinds``: the families the program was compiled for — a
    ``ParamBatch`` array packed for a different family is rejected
    (its rows would silently be reinterpreted, e.g. (min, max) read
    as (mean, std)); plain arrays skip the family check.  The sentinel
    kinds ``"rw"`` / ``"rw_adapt"`` mark a RandomWalk-proposal slot,
    whose rows are (R, 4) ``(step, init_lo, init_hi, target_accept)``
    packs (:func:`pack_random_walk_batch`) rather than (R, 2) family
    words; the adapt variant additionally pins the pack to a program
    compiled with burn-in step adaptation (a compile-time kernel phase
    every row shares)."""
    seeds_arr = jnp.asarray(np.asarray(seeds, np.uint32))
    if seeds_arr.shape != (r,):
        raise ValueError(
            f"expected {r} seeds, got shape {seeds_arr.shape}"
        )
    if len(params) != n_param_args:
        raise ValueError(
            f"expected {n_param_args} params array(s), got {len(params)}"
        )
    params_arrs = []
    for i, p in enumerate(params):
        kind = param_kinds[i] if i < len(param_kinds) else None
        width = 4 if kind in ("rw", "rw_adapt") else 2
        fam = getattr(p, "family", None)
        if fam is not None and kind is not None and fam != kind:
            raise ValueError(
                f"params array {i} was packed for "
                f"{_param_kind_name(fam)} but this program "
                f"was compiled for {_param_kind_name(kind)}"
            )
        p_arr = jnp.asarray(np.asarray(p, np.float32))
        if p_arr.shape != (r, width):
            raise ValueError(
                f"expected a ({r}, {width}) params array, got shape "
                f"{p_arr.shape}"
            )
        params_arrs.append(p_arr)
    return seeds_arr, tuple(params_arrs)


def _param_kind_name(kind) -> str:
    """Human name of a param-batch slot kind: a DistKind family or the
    ``"rw"`` / ``"rw_adapt"`` RandomWalk sentinels."""
    if kind == "rw":
        return "fixed-step RandomWalk proposals"
    if kind == "rw_adapt":
        return "adaptive RandomWalk proposals"
    return f"{DistKind(kind).name} distributions"


def _nd_param_map_adapter(run, d: int):
    """Batch an unbatched XLA nd program over (seeds, (R, d, 2) params)
    via a traced lax.map (the nd form of _param_batched_prog's sweep);
    cached on the run so repeat handles reuse the trace."""
    wrappers = getattr(run, "__batched_wrappers__", None)
    if wrappers is None:
        wrappers = {}
        try:
            run.__batched_wrappers__ = wrappers
        except (AttributeError, TypeError):
            pass
    key = ("nd_param", d)
    adapted = wrappers.get(key)
    if adapted is None:

        @jax.jit
        def adapted(seeds, params, xt_t, ct_t):
            return jax.lax.map(
                lambda sp: run(
                    sp[0],
                    tuple(sp[1][j] for j in range(d)),
                    xt_t,
                    ct_t,
                ),
                (seeds, params),
            )

        wrappers[key] = adapted
    return adapted


def _nd_param_prog(run, dev_args, seed_batch: int, d: int, kinds):
    """The nd param-batched handle: ``prog(seeds, params)`` with params
    an (R, d, 2) float32 array of per-dimension family parameter rows
    (build with :func:`pack_param_batch_nd`); validates shapes and the
    per-dimension families a tagged pack carries."""
    _, xt_t, ct_t = dev_args

    def prog(seeds, params):
        seeds_arr = np.asarray(seeds, np.uint32)
        if seeds_arr.shape != (seed_batch,):
            raise ValueError(
                f"expected {seed_batch} seeds, got shape {seeds_arr.shape}"
            )
        fams = getattr(params, "families", None)
        if fams is not None and tuple(fams) != tuple(kinds):
            raise ValueError(
                "params were packed for dimensions "
                f"{tuple(DistKind(f).name for f in fams)} but this "
                "program was compiled for "
                f"{tuple(DistKind(k).name for k in kinds)}"
            )
        p_arr = np.asarray(params, np.float32)
        if p_arr.shape != (seed_batch, d, 2):
            raise ValueError(
                f"expected a ({seed_batch}, {d}, 2) params array "
                f"(pack_param_batch_nd), got shape {p_arr.shape}"
            )
        return run(
            jnp.asarray(seeds_arr), jnp.asarray(p_arr), xt_t, ct_t
        )

    return prog


def _nd_mcmc_param_map_adapter(run, d: int, tables):
    """Batch the unbatched XLA nd MH program over (seeds, (R, d, 2)
    proposal and target rows) via a traced lax.map; the analytic-only
    dummy tables close over."""

    @jax.jit
    def adapted(seeds, prop_params, targ_params):
        return jax.lax.map(
            lambda sp: run(
                sp[0],
                tuple(sp[1][j] for j in range(d)),
                tuple(sp[2][j] for j in range(d)),
                *tables,
            ),
            (seeds, prop_params, targ_params),
        )

    return adapted


def _nd_mcmc_param_prog(run, seed_batch: int, d: int, targ_kinds,
                        prop_kinds, random_walk: bool = False,
                        rw_adapt: bool = False):
    """The nd MCMC param-batched handle: ``prog(seeds, target_params,
    proposal_params)`` (1-D compile_mcmc's arg order) with each params
    arg an (R, d, 2) array; validates shapes and tagged families.  With
    a RandomWalk proposal the proposal slot instead takes the (R, d, 4)
    rows of :func:`pack_random_walk_batch_nd`."""

    def _check(params, kinds, role, width=2):
        fams = getattr(params, "families", None)
        if fams is not None and tuple(fams) != tuple(kinds):
            raise ValueError(
                f"{role} params were packed for dimensions "
                f"{tuple(DistKind(f).name for f in fams)} but this "
                "program was compiled for "
                f"{tuple(DistKind(k).name for k in kinds)}"
            )
        p_arr = np.asarray(params, np.float32)
        if p_arr.shape != (seed_batch, d, width):
            raise ValueError(
                f"expected a ({seed_batch}, {d}, {width}) {role} params "
                f"array, got shape {p_arr.shape}"
            )
        return jnp.asarray(p_arr)

    def _check_rw(params):
        want = "rw_adapt" if rw_adapt else "rw"
        fam = getattr(params, "family", None)
        if fam is not None and fam != want:
            raise ValueError(
                "this program was compiled for "
                f"{_param_kind_name(want)}; pack matching (R, d, 4) "
                "rows with pack_random_walk_batch_nd, got a pack for "
                f"{_param_kind_name(fam)}"
            )
        p_arr = np.asarray(params, np.float32)
        if p_arr.shape != (seed_batch, d, 4):
            raise ValueError(
                f"expected a ({seed_batch}, {d}, 4) RandomWalk params "
                f"array (pack_random_walk_batch_nd), got shape "
                f"{p_arr.shape}"
            )
        return jnp.asarray(p_arr)

    def prog(seeds, target_params, proposal_params):
        seeds_arr = np.asarray(seeds, np.uint32)
        if seeds_arr.shape != (seed_batch,):
            raise ValueError(
                f"expected {seed_batch} seeds, got shape {seeds_arr.shape}"
            )
        targ = _check(target_params, targ_kinds, "target")
        prop = (
            _check_rw(proposal_params)
            if random_walk
            else _check(proposal_params, prop_kinds, "proposal")
        )
        return run(jnp.asarray(seeds_arr), prop, targ)

    return prog


class NdParamBatch(np.ndarray):
    """(R, d, 2) float32 per-dimension family-parameter rows tagged
    with the per-dimension ``families`` tuple, so a mismatched nd
    param-batched handle rejects the pack at dispatch time."""

    def __new__(cls, arr, families):
        obj = np.asarray(arr, np.float32).view(cls)
        obj.families = tuple(DistKind(f) for f in families)
        return obj

    def __array_finalize__(self, obj):
        if obj is not None and not hasattr(self, "families"):
            self.families = getattr(obj, "families", None)


def pack_param_batch_nd(rows) -> NdParamBatch:
    """Stack per-REPLICATION lists of per-DIMENSION analytic
    distributions into the (R, d, 2) array an nd ``param_batch`` handle
    takes: ``rows[r][j]`` parameterizes dimension j of batch element r.
    Every replication must use the same family per dimension."""
    rows = [list(r) for r in rows]
    if not rows or not rows[0]:
        raise ValueError("param batch needs at least one replication row")
    d = len(rows[0])
    specs = []
    for r in rows:
        if len(r) != d:
            raise ValueError(
                "every replication must list the same number of "
                f"dimensions (got {len(r)} vs {d})"
            )
        specs.append([dist_spec_of(dd) for dd in r])
    families = tuple(s.kind for s in specs[0])
    for row in specs:
        for j, s in enumerate(row):
            if s.kind != families[j]:
                raise ValueError(
                    f"dimension {j} mixes families "
                    f"{families[j].name} and {s.kind.name}"
                )
            ensure_param_batch_family(s.kind)
    arr = np.stack(
        [np.stack([s.params for s in row]) for row in specs]
    )
    return NdParamBatch(arr, families)


class ParamBatch(np.ndarray):
    """(R, 2) float32 family-parameter rows tagged with the ``family``
    (DistKind) they parameterize, so a param-batched handle can reject a
    pack built for a different family at dispatch time."""

    def __new__(cls, arr, family):
        obj = np.asarray(arr, np.float32).view(cls)
        obj.family = DistKind(family)
        return obj

    def __array_finalize__(self, obj):
        if obj is not None and not hasattr(self, "family"):
            self.family = getattr(obj, "family", None)


def pack_param_batch(distributions) -> ParamBatch:
    """Stack the device parameter words of same-family analytic
    distributions into the (R, 2) float32 array a ``param_batch``
    program takes: uniform -> (min, max), normal -> (mean, std),
    exponential -> (lambda, 0) — the packing of
    ``sampling.dist_spec_of`` (reference parse_dist_params,
    src/lib.rs:436-502).  The result carries its family so a
    mismatched program rejects it at dispatch."""
    specs = [dist_spec_of(d) for d in distributions]
    if not specs:
        raise ValueError("param batch needs at least one distribution")
    kinds = {s.kind for s in specs}
    if len(kinds) != 1:
        raise ValueError(
            "param batch must share one family, got "
            f"{sorted(k.name for k in kinds)}"
        )
    ensure_param_batch_family(specs[0].kind)
    return ParamBatch(np.stack([s.params for s in specs]), specs[0].kind)


class RwParamBatch(np.ndarray):
    """(R, 4) (1-D) or (R, d, 4) (nd) float32 RandomWalk parameter rows
    — ``(step, init_lo, init_hi, target_accept)`` — tagged with the
    ``"rw"`` / ``"rw_adapt"`` sentinel family, so a handle compiled for
    density-backed proposals rejects the pack at dispatch time (and vice
    versa).  Step adaptation is a compile-time kernel phase, not a row
    word, so adaptive and fixed-step packs carry distinct tags and a
    program compiled for one rejects the other (every row of an adaptive
    program adapts; silently adapting a fixed-step row would break the
    element-bit-equal-to-its-unbatched-call guarantee)."""

    def __new__(cls, arr, adapt: bool = False):
        obj = np.asarray(arr, np.float32).view(cls)
        obj.family = "rw_adapt" if adapt else "rw"
        return obj

    def __array_finalize__(self, obj):
        if obj is not None and not hasattr(self, "family"):
            self.family = getattr(obj, "family", "rw")


def _walks_targets_of(walks, target, what: str):
    """Validate a (walks, per-row targets) pairing for the RandomWalk
    pack builders.  ``target``: one shared value, a length-R sequence,
    or None (every walk then needs an explicit init_range)."""
    walks = list(walks)
    if not walks:
        raise ValueError("param batch needs at least one RandomWalk")
    for w in walks:
        if not isinstance(w, RandomWalk):
            raise TypeError(
                f"pack_random_walk_batch{what} takes RandomWalk "
                f"proposals, got {type(w)}"
            )
    if len({w.adapt for w in walks}) > 1:
        raise ValueError(
            "all walks in a param batch must share adapt= — step "
            "adaptation is a compile-time kernel phase (every row of "
            "an adaptive program adapts); run adaptive and fixed-step "
            "sweeps as separate programs"
        )
    if target is None or isinstance(target, Distribution):
        targets = [target] * len(walks)
    else:
        targets = list(target)
        if len(targets) != len(walks):
            raise ValueError(
                f"{len(walks)} walks but {len(targets)} targets; pass "
                "one shared target or one per replication row"
            )
    return walks, targets


def pack_random_walk_batch(walks, target=None) -> RwParamBatch:
    """Stack :class:`RandomWalk` proposals into the (R, 4) rows a 1-D
    ``param_batch`` MCMC handle takes in its proposal-params slot —
    one step-size/init-range/target-acceptance row per replication, so
    a single compiled program serves a whole step-size (or adaptation)
    sweep per dispatch.  ``target``: the Distribution whose central 98%
    interval seeds default init ranges — one shared, a length-R list
    (matched to the swept target rows), or None when every walk carries
    an explicit ``init_range``."""
    walks, targets = _walks_targets_of(walks, target, "")
    rows = []
    for w, t in zip(walks, targets):
        rows.append(
            w.pack_params_nd([t] if t is not None else None, 1)[0]
        )
    return RwParamBatch(np.stack(rows), walks[0].adapt)


def pack_random_walk_batch_nd(walks, targets=None, d=None) -> RwParamBatch:
    """nd form of :func:`pack_random_walk_batch`: (R, d, 4) rows.
    ``targets``: the per-dimension Distribution list (shared across
    rows), a length-R list of such lists, or None for joint log-density
    targets (explicit ``init_range`` on every walk; ``d`` required
    then)."""
    shared = None
    if targets is not None:
        targets = list(targets)
        if targets and isinstance(targets[0], Distribution):
            shared = targets  # one per-dimension list for every row
            targets = None
    walks, per_row = _walks_targets_of(walks, targets, "_nd")
    if shared is not None:
        per_row = [shared] * len(walks)
    dims = {len(r) for r in per_row if r is not None}
    if len(dims) > 1:
        raise ValueError(
            f"rows mix dimension counts {sorted(dims)}"
        )
    if d is None:
        if not dims:
            raise ValueError(
                "pass d= when packing for a joint log-density target "
                "(no per-dimension target lists to read it from)"
            )
        d = dims.pop()
    elif dims and dims != {d}:
        raise ValueError(
            f"d={d} but the target lists have {dims.pop()} dimensions"
        )
    return RwParamBatch(
        np.stack([w.pack_params_nd(t, d) for w, t in zip(walks, per_row)]),
        walks[0].adapt,
    )


def _block_traceable(fns, n_args: int = 1) -> bool:
    """True when every function evaluates on (8, 128) float32 lane blocks
    (one per argument) with a block-broadcastable result — the shape the
    Pallas kernels feed integrands.  A scalar trace alone does not
    guarantee this: a sample-dependent ``while`` becomes a
    ``lax.while_loop`` whose cond is a bool block, which cannot lower
    inside a kernel (the XLA backend vmaps such functions instead, keeping
    the reference's run-anything-on-device guarantee,
    src/shader_gen.rs:272-282).  Cached on the function object."""
    probe = [jax.ShapeDtypeStruct((8, 128), jnp.float32)] * n_args
    attr = (
        "__tpu_mc_block_ok__"
        if n_args == 1
        else f"__tpu_mc_block_ok_{n_args}__"
    )
    for f in fns:
        ok = getattr(f, attr, None)
        if ok is None:
            try:
                out = jax.eval_shape(f, *probe)
                shape = getattr(out, "shape", ())
                ok = np.broadcast_shapes(shape, (8, 128)) == (8, 128)
            except Exception:
                ok = False
            try:
                setattr(f, attr, ok)
            except Exception:
                pass
        if not ok:
            return False
    return True


def _fn_key(f):
    return getattr(f, "__tpu_mc_key__", ("id", id(f)))


def _fns_key(fns):
    return tuple(_fn_key(f) for f in fns)


_DEVICE_DUMMY = None


def _tbl(arr):
    # Device transfers through a tunnelled backend cost a full round-trip;
    # the shared dummy is uploaded exactly once per process.
    global _DEVICE_DUMMY
    if arr is None:
        if _DEVICE_DUMMY is None:
            _DEVICE_DUMMY = jnp.asarray(_DUMMY_TABLE)
        return _DEVICE_DUMMY
    return jnp.asarray(arr, jnp.float32)


def _device_args_of(distribution, spec):
    """Per-Distribution cache of the device-resident (params, x_table,
    cdf_table) triple so repeat calls skip host->device uploads."""
    cached = getattr(distribution, "_device_args", None)
    if cached is None:
        cached = (
            jnp.asarray(spec.params),
            _tbl(spec.x_table),
            _tbl(spec.cdf_table),
        )
        distribution._device_args = cached
    return cached


def _device_gapped_tables(
    distribution, spec, stratified: bool, segments: Optional[int] = None
):
    """Device-resident gap-respecting inverse tables for zero-density-span
    (exact_inverse) custom distributions, cached per Distribution.

    ``stratified=True``: (segments, 128) (value, slope) tables for the
    stratified integrate sampler (``segments`` matches the kernel's
    block_rows // 8); ``False``: flat m-knot tables for the MCMC
    proposal's i.i.d. segment lane-gather lookup.  Both jump each gap
    exactly at a knot so the device never emits a sample inside a gap
    (the semantics of the reference's knot-exact binary search,
    src/distribution.rs:128-158)."""
    key = ("strat", segments) if stratified else ("inv",)
    cache = getattr(distribution, "_device_gapped_cache", None)
    if cache is None:
        cache = {}
        distribution._device_gapped_cache = cache
    cached = cache.get(key)
    if cached is None:
        from .tables import (
            find_zero_density_gaps,
            gapped_inverse_tables,
            gapped_stratified_tables,
        )

        _, pdf_vals = distribution.get_or_compute_pdf_table()
        gaps = find_zero_density_gaps(
            spec.x_table, spec.cdf_table, pdf_vals
        )
        if stratified:
            kwargs = {} if segments is None else {"segments": segments}
            t, dt = gapped_stratified_tables(
                spec.x_table, spec.cdf_table, gaps, **kwargs
            )
        else:
            t, dt = gapped_inverse_tables(spec.x_table, spec.cdf_table, gaps)
        cached = (jnp.asarray(t), jnp.asarray(dt))
        cache[key] = cached
    return cached


def _device_log_tables_of(distribution, role: str = "target"):
    """Per-Distribution cache of the device-resident log-pdf tables (XLA
    backend).  Proposal tables get the floor-edge guard
    (tables.guard_proposal_log_floor): the reference interpolates its log
    tables straight into the -100 floor, which makes boundary-trapezoid
    states absorbing for the independence sampler — a correctness fix
    beyond reference behavior, applied to the q-table only (the target
    table defines the distribution being sampled and stays verbatim)."""
    attr = (
        "_device_log_tables" if role == "target" else "_device_log_tables_q"
    )
    cached = getattr(distribution, attr, None)
    if cached is None:
        lx, lp = distribution.get_log_pdf_table()
        if role != "target":
            from .tables import guard_proposal_log_floor

            lp = guard_proposal_log_floor(lp)
        cached = (jnp.asarray(lx, jnp.float32), jnp.asarray(lp, jnp.float32))
        setattr(distribution, attr, cached)
    return cached


def _uniform_log_tables(distribution):
    """(x, log_pdf) tables on a uniform grid for in-kernel MCMC lookups.

    Host-built grids are already uniform; irregular from_pdf_table grids
    resample the PDF (error-bounded in density space — a log-space bound is
    unattainable near the -100 floor cliffs, and density-space errors of
    ~1e-3 of the peak are statistically invisible to MH) and take logs
    after, exactly how host-built log tables are made.  Returns None when
    the bound cannot be met — MCMC then routes to the XLA backend.  Cached
    per Distribution."""
    lx, lp = distribution.get_log_pdf_table()
    if is_uniform_grid(lx):
        return lx, lp
    cached = getattr(distribution, "_uniform_log_tables", False)
    if cached is False:
        mode = _uniform_table_mode(
            distribution,
            ("table",) + tuple(distribution.get_or_compute_pdf_table()),
        )
        if mode is None:
            cached = None
        else:
            from .tables import log_pdf_from_pdf

            cached = (mode[1], log_pdf_from_pdf(mode[2]))
        distribution._uniform_log_tables = cached
    return cached


def _proposal_kernel_log_tables(distribution):
    """Uniform-grid log tables fit to serve as the Pallas MCMC PROPOSAL's
    q-table, or None when no uniform grid can represent the sampling
    density faithfully (the workload then routes to the XLA backend).

    Pipeline: resample irregular grids (density-space, error-bounded),
    then STRICT-validate the resampled log values against the ORIGINAL
    log table at every original non-floor knot (an absolute density bound
    alone can hide multi-nat log errors in low-density regions — the
    absorbing-trap shape), then guard the floor edges
    (tables.guard_proposal_log_floor), then strict-downsample.  Cached per
    Distribution."""
    cached = getattr(distribution, "_prop_kernel_log_tables", False)
    if cached is not False:
        return cached
    from .tables import downsample_log_table, guard_proposal_log_floor

    lx, lp = distribution.get_log_pdf_table()
    result = None
    uniform = _uniform_log_tables(distribution)
    if uniform is not None:
        ulx, ulp = uniform
        ok = True
        if ulx is not lx:
            # Validate the resample AFTER guarding both tables, probing
            # the union of the two knot sets — checking only at original
            # knots is blind to resampled knots planted between them
            # (observed: log(tiny-interpolated-pdf) knots just inside a
            # gap edge, reading ~10 nats below the guarded edge value).
            gorig = guard_proposal_log_floor(lp)
            gulp = guard_proposal_log_floor(ulp)
            probe = np.union1d(np.asarray(lx), np.asarray(ulx))
            a = np.interp(probe, lx, gorig)
            b = np.interp(probe, ulx, gulp)
            mask = a > -90.0
            ok = not np.any(np.abs(b - a)[mask] > 0.01)
            ulp = gulp
        else:
            ulp = guard_proposal_log_floor(ulp)
        if ok:
            result = downsample_log_table(ulx, ulp, strict=True)
    distribution._prop_kernel_log_tables = result
    return result


def _device_uniform_log_tables(distribution, role: str = "target"):
    """Device-resident uniform-grid log tables for the Pallas MCMC kernel
    (resampled to a uniform grid if needed, then error-bounded DOWNSAMPLED:
    the in-kernel lookup scans one lane-gather per 128-knot segment, so a
    512-knot table is 4x cheaper per log-pdf eval than 2048).  Proposal
    tables go through the fidelity pipeline of
    ``_proposal_kernel_log_tables`` — their values must match the
    sampling density everywhere the sampler emits."""
    attr = (
        "_device_log_tables_u"
        if role == "target"
        else "_device_log_tables_uq"
    )
    cached = getattr(distribution, attr, None)
    if cached is None:
        from .tables import downsample_log_table

        if role == "target":
            lx, lp = _uniform_log_tables(distribution)
            lx, lp = downsample_log_table(lx, lp)
        else:
            lx, lp = _proposal_kernel_log_tables(distribution)
        cached = (jnp.asarray(lx, jnp.float32), jnp.asarray(lp, jnp.float32))
        setattr(distribution, attr, cached)
    return cached


def _uniform_table_mode(distribution, mode, role: str = "target"):
    """Give a table pdf-mode a uniform x-grid for in-kernel lookup.

    Already-uniform grids pass through; irregular user grids (from_pdf_table)
    are resampled host-side with an error bound, cached per Distribution.
    ``role="proposal"`` (IS denominator tables) additionally RELATIVE-
    validates the resampled values against the original at every original
    positive-density knot — an absolute density bound alone can hide
    large relative errors in low-density regions, and a q-table reading r
    times too low inflates every weight there by 1/r.  Returns the
    (possibly resampled) mode, or None when the bound cannot be met —
    callers then take the XLA closure path.  Traced modes pass through
    untouched."""
    if mode is None or mode[0] != "table":
        return mode
    if is_uniform_grid(mode[1]):
        return mode
    # The resample itself is role-independent; cache it once and apply the
    # per-role validation on top (also cached).
    resampled = getattr(distribution, "_uniform_pdf_tables", False)
    if resampled is False:
        from .tables import resample_uniform_table

        resampled = resample_uniform_table(mode[1], mode[2])
        distribution._uniform_pdf_tables = resampled
    if role == "target":
        cached = resampled
    else:
        cached = getattr(distribution, "_uniform_pdf_tables_q", False)
        if cached is False:
            cached = resampled
            if cached is not None:
                x0 = np.asarray(mode[1], np.float64)
                v0 = np.asarray(mode[2], np.float64)
                back = np.interp(x0, cached[0], cached[1])
                pos = v0 > 0
                if np.any(np.abs(back - v0)[pos] > 1e-3 * v0[pos]):
                    cached = None
            distribution._uniform_pdf_tables_q = cached
    if cached is None:
        return None
    return ("table", cached[0], cached[1])


def _device_mode_tables(distribution, mode, role: str = "target"):
    """Device-resident (x_grid, pdf_values) for an in-kernel IS weight
    table, cached per Distribution.  Error-bounded DOWNSAMPLED first: the
    kernel's lookup scans one lane-gather per 128-knot segment, so weight
    evals get cheaper linearly in table size (the XLA closure path keeps
    the full-resolution tables).  Proposal (denominator) tables use the
    relative bound — see tables.downsample_pdf_table."""
    attr = (
        "_device_pdf_tables_u"
        if role == "target"
        else "_device_pdf_tables_uq"
    )
    cached = getattr(distribution, attr, None)
    if cached is None:
        from .tables import downsample_pdf_table

        xt, pt = downsample_pdf_table(
            mode[1], mode[2], relative=role != "target"
        )
        cached = (jnp.asarray(xt, jnp.float32), jnp.asarray(pt, jnp.float32))
        setattr(distribution, attr, cached)
    return cached


def _table_shapes(spec):
    return (
        None if spec.x_table is None else spec.x_table.shape,
        None if spec.cdf_table is None else spec.cdf_table.shape,
        spec.exact_inverse,
    )


# ---------------------------------------------------------------------------
# Convenience functions (defaults per reference __init__.py:1138-1266)
# ---------------------------------------------------------------------------


def integrate(
    functions: List[Union[Callable, str]],
    distribution: Distribution,
    n_samples: int = 1_000_000,
    seed: int = 42,
    target_threads: Optional[int] = None,
    backend: str = "auto",
    mesh=None,
    method: str = "mc",
    return_stderr: bool = False,
    qmc_rotations: int = 8,
    control_variates=None,
) -> IntegrationResult:
    """One-shot Monte Carlo integration (fresh integrator; compiled programs
    are still cached process-wide)."""
    integrator = MonteCarloIntegrator(
        target_threads=target_threads, backend=backend, mesh=mesh
    )
    return integrator.integrate(
        functions, distribution, n_samples, seed, method=method,
        return_stderr=return_stderr, qmc_rotations=qmc_rotations,
        control_variates=control_variates,
    )


def expectation_fn(
    functions: List[Union[Callable, str]],
    distribution: Distribution,
    n_samples: int = 1_000_000,
    method: str = "mc",
    target_threads: Optional[int] = None,
    mesh=None,
) -> Callable:
    """Module-level shorthand for
    :meth:`MonteCarloIntegrator.expectation_fn` (fresh integrator;
    compiled programs are still cached process-wide)."""
    integrator = MonteCarloIntegrator(
        target_threads=target_threads, mesh=mesh
    )
    return integrator.expectation_fn(
        functions, distribution, n_samples, method=method
    )


def integrate_importance_sampling(
    functions: List[Union[Callable, str]],
    target_distribution: Distribution,
    proposal_distribution: Distribution,
    n_samples: int = 1_000_000,
    seed: int = 42,
    target_threads: Optional[int] = None,
    backend: str = "auto",
    mesh=None,
    method: str = "mc",
    return_stderr: bool = False,
    qmc_rotations: int = 8,
    return_diagnostics: bool = False,
) -> IntegrationResult:
    """One-shot importance-sampling integration."""
    integrator = MonteCarloIntegrator(
        target_threads=target_threads, backend=backend, mesh=mesh
    )
    return integrator.integrate_importance_sampling(
        functions, target_distribution, proposal_distribution, n_samples,
        seed, method=method, return_stderr=return_stderr,
        qmc_rotations=qmc_rotations, return_diagnostics=return_diagnostics,
    )


def integrate_mcmc(
    functions: List[Union[Callable, str]],
    target_distribution: Distribution,
    proposal_distribution: Union[Distribution, RandomWalk],
    n_steps: int = 10_000,
    n_chains: int = 1024,
    n_burnin: int = 1_000,
    seed: int = 42,
    target_threads: Optional[int] = None,
    backend: str = "auto",
    mesh=None,
    initial_state: Optional[McmcState] = None,
    return_state: bool = False,
    return_stderr: bool = False,
    return_diagnostics: bool = False,
    return_samples: Optional[int] = None,
    temperatures: Optional[List[float]] = None,
) -> IntegrationResult:
    """One-shot MCMC integration."""
    integrator = MonteCarloIntegrator(
        target_threads=target_threads, backend=backend, mesh=mesh
    )
    return integrator.integrate_mcmc(
        functions,
        target_distribution,
        proposal_distribution,
        n_steps,
        n_chains,
        n_burnin,
        seed,
        initial_state=initial_state,
        return_state=return_state,
        return_stderr=return_stderr,
        return_diagnostics=return_diagnostics,
        return_samples=return_samples,
        temperatures=temperatures,
    )
