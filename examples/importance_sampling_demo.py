#!/usr/bin/env python3
"""Importance sampling: a rare-event probability that plain MC cannot see.

P(X > 4.6) under N(0, 1) is ~2.1e-6 — at 2e6 plain-MC samples you expect
four hits.  Shifting the sampling distribution onto the event region and
reweighting by p/q (both PDFs trace, so the weight is folded straight
into the fused kernel) turns every sample into signal; the error bars
from ``return_stderr=True`` quantify the ~100x variance reduction.
"""

import math

from tpu_montecarlo import Distribution, integrate, integrate_importance_sampling

THRESHOLD = 4.6
N = 2_000_000

truth = 0.5 * math.erfc(THRESHOLD / math.sqrt(2.0))

target = Distribution.normal(0.0, 1.0)
proposal = Distribution.normal(THRESHOLD, 1.0)  # mass where the event lives

event = lambda x: x > THRESHOLD  # noqa: E731

plain = integrate([event], target, n_samples=N, return_stderr=True)
shifted = integrate_importance_sampling(
    [event], target, proposal, n_samples=N, return_stderr=True
)

print(f"P(X > {THRESHOLD}) under N(0,1), {N:,} samples each way")
print(f"  exact             {truth:.3e}")
print(f"  plain MC          {plain.values[0]:.3e} +/- {plain.stderr[0]:.1e}")
print(f"  importance (IS)   {shifted.values[0]:.3e} +/- {shifted.stderr[0]:.1e}")
if shifted.stderr[0] > 0:
    print(f"  stderr reduction  {plain.stderr[0] / shifted.stderr[0]:.0f}x")
assert abs(shifted.values[0] - truth) < 4 * shifted.stderr[0]

# --- Don't know a good proposal?  Learn one. -------------------------
# adapt_proposal runs VEGAS grid refinement against the target and
# returns an ordinary Distribution: adaptation costs ~1e6 samples, then
# the production run rides the in-kernel table-IS path at full speed.
from tpu_montecarlo import adapt_proposal  # noqa: E402

learned = adapt_proposal(event, target, n_iterations=8,
                         support=(-8.0, 8.0), seed=3)
auto = integrate_importance_sampling(
    [event], target, learned, n_samples=N, return_stderr=True
)
print(f"  learned proposal  {auto.values[0]:.3e} +/- {auto.stderr[0]:.1e}"
      "   (no domain knowledge needed)")
assert abs(auto.values[0] - truth) < 6 * auto.stderr[0]
assert auto.stderr[0] < 0.02 * plain.stderr[0]
