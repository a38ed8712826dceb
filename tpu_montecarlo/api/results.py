"""Result/value types of the public API: IntegrationResult, McmcState,
and the small diagnostics helpers they are assembled from."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


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
