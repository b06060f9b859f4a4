"""Observability: phase spans, kernel roofline accounting, jax traces.

TPU-native equivalent of the reference's tracing/benchmark subsystem
(SURVEY.md §5): the client's `benchmark{bottleneck=disk|cpu|network}` spans
(networking/client.rs:61-81) become `phase(...)` context managers with
wall-clock attribution; the criterion/pprof flamegraphs become
`jax.profiler` traces; and each hot kernel gets a speed-of-light model so
measured time can be reported as a fraction of the hardware bound.

Env: LCPC_TRACE_DIR=<dir> enables jax profiler traces around `trace()`.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from dataclasses import dataclass, field


# -- phase spans ------------------------------------------------------------

class PhaseRecorder:
    """Accumulates wall time per (actor, bottleneck) phase."""

    def __init__(self):
        self.totals: dict[tuple[str, str], float] = defaultdict(float)
        self.counts: dict[tuple[str, str], int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, bottleneck: str, actor: str = "client"):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[(actor, bottleneck)] += dt
            self.counts[(actor, bottleneck)] += 1

    def report(self) -> dict:
        return {
            f"{actor}/{bottleneck}": {
                "seconds": round(t, 4),
                "count": self.counts[(actor, bottleneck)],
            }
            for (actor, bottleneck), t in sorted(self.totals.items())
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


GLOBAL_PHASES = PhaseRecorder()
phase = GLOBAL_PHASES.phase


# -- jax profiler traces ----------------------------------------------------

@contextlib.contextmanager
def trace(name: str = "trace"):
    """jax profiler trace if LCPC_TRACE_DIR is set, else no-op."""
    trace_dir = os.environ.get("LCPC_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield


# -- speed-of-light models --------------------------------------------------

@dataclass
class ChipModel:
    """Rough per-chip hardware bounds (v5e defaults)."""
    name: str = "v5e"
    hbm_gbps: float = 819.0          # HBM bandwidth GB/s
    vpu_iops: float = 3.9e12         # int32 ops/s (8x128 lanes x 4 ALUs x 940MHz)


V5E = ChipModel()


@dataclass
class KernelCost:
    """Analytic cost of one kernel invocation."""
    name: str
    int_ops: float                   # uint32 ALU ops
    bytes_moved: float               # HBM traffic (read + write)

    def speed_of_light_s(self, chip: ChipModel = V5E) -> float:
        return max(self.int_ops / chip.vpu_iops,
                   self.bytes_moved / (chip.hbm_gbps * 1e9))

    def report(self, measured_s: float, chip: ChipModel = V5E) -> dict:
        sol = self.speed_of_light_s(chip)
        return {
            "kernel": self.name,
            "measured_ms": round(measured_s * 1e3, 3),
            "speed_of_light_ms": round(sol * 1e3, 3),
            "fraction_of_sol": round(sol / measured_s, 3) if measured_s else None,
            "bound": ("compute" if self.int_ops / chip.vpu_iops
                      > self.bytes_moved / (chip.hbm_gbps * 1e9) else "memory"),
        }


def ntt_cost(batch: int, n: int, L: int, fused: bool = True) -> KernelCost:
    """Cost model for the radix-2 limb NTT.

    Per stage per element: schoolbook conv ~5*L^2 ops + Barrett ~10*L^2
    + carries/select ~40*L.  Fused (Pallas) traffic = 3 arrays per stage;
    unfused XLA traffic ~ 100x element size per stage.
    """
    log_n = n.bit_length() - 1
    elems = batch * n
    ops_per_elem_stage = 15 * L * L + 40 * L
    int_ops = elems * log_n * ops_per_elem_stage
    elem_bytes = L * 4
    passes = 3 if fused else 100
    bytes_moved = elems * elem_bytes * log_n * passes
    return KernelCost(f"ntt_b{batch}_n{n}_L{L}", int_ops, bytes_moved)


def hash_columns_cost(n_rows: int, n_cols: int, repr_bytes: int) -> KernelCost:
    total_bytes = n_cols * (32 + n_rows * repr_bytes)
    blocks = total_bytes / 64
    int_ops = blocks * 7 * 8 * 14        # rounds x G x ops
    return KernelCost(f"hash_{n_rows}x{n_cols}", int_ops, total_bytes * 2)


def modmul_cost(elems: int, L: int, fused: bool = True) -> KernelCost:
    int_ops = elems * (15 * L * L + 40 * L)
    bytes_moved = elems * L * 4 * (3 if fused else 100)
    return KernelCost(f"modmul_{elems}_L{L}", int_ops, bytes_moved)


def bench_kernel(fn, *args, iters: int = 3) -> float:
    """Best-of wall time with forced device completion (axon-safe sync)."""
    import jax
    import jax.numpy as jnp
    g = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.uint32)) for x in jax.tree.leaves(fn(*a))))
    _ = int(g(*args))
    best = float("inf")
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = int(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best
