"""utils.profiling: the observability tier (SURVEY.md §5 — the reference
has no tracing/profiling subsystem at all)."""

import glob
import os

import numpy as np

from tpu_montecarlo.utils.profiling import measure_throughput, timed, trace


class TestTimed:
    def test_records_seconds(self):
        with timed("work") as t:
            sum(range(1000))
        assert t["label"] == "work"
        assert t["seconds"] >= 0.0


class TestMeasureThroughput:
    def test_counts_work_units(self):
        import jax.numpy as jnp

        def fn(rep):
            return jnp.arange(1000.0) * rep

        rate = measure_throughput(fn, work_per_call=1000, repeats=3)
        assert rate > 0


class TestTrace:
    def test_writes_profile(self, tmp_path):
        import jax
        import jax.numpy as jnp

        with trace(str(tmp_path)):
            np.asarray(jax.jit(lambda x: x * 2)(jnp.arange(8.0)))
        produced = glob.glob(
            os.path.join(str(tmp_path), "**", "*"), recursive=True
        )
        assert any(os.path.isfile(p) for p in produced)
