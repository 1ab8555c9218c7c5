"""Profiling and metrics helpers.

The reference has only commented-out timing probes (SURVEY.md §5:
balance_controller.cpp:204, test_node.cpp:185-218). Here profiling is a
first-class utility: wall-clock benchmarking with compile/steady-state
separation, per-stage timing, QPs/s + iterations/s counters, and
``jax.profiler`` trace capture for in-depth kernel analysis.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict

import jax


@dataclass
class BenchResult:
    name: str
    compile_seconds: float
    steady_seconds: float
    reps: int
    items: int = 0

    @property
    def items_per_second(self) -> float:
        return self.items / self.steady_seconds if self.steady_seconds else 0.0

    def __str__(self):
        s = (f"{self.name}: compile {self.compile_seconds:.2f}s, "
             f"steady {self.steady_seconds * 1e3:.2f} ms/rep")
        if self.items:
            s += f", {self.items_per_second:,.0f} items/s"
        return s


def benchmark(fn: Callable, *args, name: str = "fn", reps: int = 10,
              items: int = 0, **kwargs) -> BenchResult:
    """Time a jitted function: first call (compile) vs steady state.

    Dispatches all reps asynchronously and blocks once at the end — the
    standard JAX timing discipline.
    """
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    steady = (time.perf_counter() - t0) / reps
    return BenchResult(name=name, compile_seconds=compile_s,
                       steady_seconds=steady, reps=reps, items=items)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageTimer:
    """Accumulates named host-side stage timings (assembly, solve, ...)."""

    stages: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = [f"total {total * 1e3:.2f} ms"]
        for k, v in sorted(self.stages.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k}: {v * 1e3:.2f} ms ({100 * v / total:.0f}%)")
        return "\n".join(lines)
