"""Honest measurement of the Pallas DMA row-gather kernel vs XLA's
gather (VERDICT r4 #8 — the closing Pallas shot).  Chained
scalar-dependence methodology; correctness asserted first.

Usage: python scripts/pallas_gather_bench.py [n_rows]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("BENCH_N_QUERY", "8192")
import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from routed_exp import measure, log  # noqa: E402
from close_kmers_tpu.ops.pallas_gather import pallas_row_gather, CHUNK  # noqa: E402


def main():
    cache_dir = os.path.join(bench.CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    N = N // CHUNK * CHUNK
    H, W = 3_200_000, 128
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 100, size=(H, W), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, H, size=N).astype(np.int32))

    # correctness on a slice
    small = idx[:CHUNK]
    got = np.asarray(pallas_row_gather(table, small))
    want = np.asarray(table)[np.asarray(small)]
    assert (got == want).all(), "pallas gather mismatch"
    log("correctness: ok")

    def s_xla(c, idx, table):
        return c + table[idx].sum(dtype=jnp.int32).astype(jnp.float32)

    def s_pallas(c, idx, table):
        out = pallas_row_gather(table, idx)
        return c + out.sum(dtype=jnp.int32).astype(jnp.float32)

    t_x = measure("xla gather", s_xla, idx, table, k_hi=12, k_lo=4)
    t_p = measure("pallas dma gather", s_pallas, idx, table,
                  k_hi=6, k_lo=2)
    log(f"per-row: xla {t_x/N*1e9:.2f} ns, pallas {t_p/N*1e9:.2f} ns "
        f"({t_p/t_x:.1f}x slower)" if t_p > t_x else
        f"per-row: xla {t_x/N*1e9:.2f} ns, pallas {t_p/N*1e9:.2f} ns "
        f"({t_x/t_p:.1f}x FASTER)")
    print(f"PALLAS_GATHER n={N} xla_ns={t_x/N*1e9:.2f} "
          f"pallas_ns={t_p/N*1e9:.2f}")


if __name__ == "__main__":
    main()
