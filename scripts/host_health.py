"""Host-state probe for benchmark runs.

This sandbox is a VM whose DRAM bandwidth fluctuates with hypervisor
neighbor load (measured 0.2-5.0 GB/s minutes apart on 2026-08-17 while
cache-resident copies held 54 GB/s and CPU speed was steady) — and the
KG pipeline's JVM shuffle/write stages are exactly the bandwidth-bound
work that such contention crushes, disproportionately at higher
parallelism. Every recorded scaling pair should therefore carry a
bandwidth reading: a pair measured in a <2 GB/s window is not evidence
about the CODE.

Prints one JSON line:
  {"dram_gbps": ..., "cache_gbps": ..., "py_mops": ...}

dram_gbps = sustained 200MB-buffer copy (read+write bytes counted);
cache_gbps = 2MB-buffer copy (L2/L3-resident — should be stable ~50;
if THIS drops, the CPU itself is throttled); py_mops = pure-python
integer loop (interpreter/CPU sanity).
"""

from __future__ import annotations

import json
import time

import numpy as np


def copy_gbps(nbytes: int, iters: int) -> float:
    a = np.zeros(nbytes // 8)
    # materialize the source: calloc'd zeros are shared-zero-page backed,
    # so reads would largely bypass DRAM and the iters*2*nbytes accounting
    # would overstate dram_gbps (ADVICE r5)
    a.fill(1.0)
    b = np.empty_like(a)
    np.copyto(b, a)  # fault pages in before timing
    t0 = time.time()
    for _ in range(iters):
        np.copyto(b, a)
    return iters * 2 * a.nbytes / (time.time() - t0) / 1e9


def py_mops(n: int = 5_000_000) -> float:
    t0 = time.time()
    s = 0
    for i in range(n):
        s += i
    return n / (time.time() - t0) / 1e6


def probe() -> dict:
    return {
        "dram_gbps": round(copy_gbps(200_000_000, 5), 2),
        "cache_gbps": round(copy_gbps(2_000_000, 2000), 1),
        "py_mops": round(py_mops(), 1),
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
