"""Shared integrator plumbing: user-function tracing and the
Pallas-kernel eligibility gates every workload consults."""

from __future__ import annotations

import hashlib
import warnings
from typing import Callable, List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..distributions import Distribution, HMC, RandomWalk
from ..ops.integrate_xla import build_integrate_fn
from ..ops.mcmc_xla import build_mcmc_fn, plan_chains
from ..sampling import (
    DistKind,
    dist_spec_of,
    ensure_param_batch_family,
    pdf_from_table,
)
from ..tables import is_uniform_grid
from ..tracing import TraceError, trace_function
from ..utils.dispatch import make_integrate_plan
from ..wgsl_frontend import trace_wgsl_function

from .batching import (
    _check_param_batch_args,
    _check_random_walk_args,
    _checked_batch_prog,
    _nd_mcmc_param_map_adapter,
    _nd_mcmc_param_prog,
    _nd_param_map_adapter,
    _nd_param_prog,
    _target_arity,
)
from .cache import (
    _GLOBAL_CACHE,
    _ProgramCache,
    _block_traceable,
    _fn_key,
    _fns_key,
    _mesh_key,
    _resolve_mesh,
    _tag_native_batch,
)
from .device import (
    _device_args_of,
    _device_gapped_tables,
    _device_log_tables_of,
    _device_mode_tables,
    _device_uniform_log_tables,
    _mcmc_table_bytes,
    _proposal_kernel_log_tables,
    _table_shapes,
    _tbl,
    _uniform_log_tables,
    _uniform_table_mode,
)
from .results import (
    IntegrationResult,
    McmcState,
    _unit_integrand,
    _weight_diagnostics,
)


class _BaseMixin:
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
            from ..ops import integrate_pallas  # noqa: F401
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
        from ..ops.integrate_pallas import pallas_supports, pick_block_rows

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
