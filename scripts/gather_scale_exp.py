"""Gather-cost vs table-size anatomy: is the probe's per-row gather
cost a function of the TABLE (cache/HBM locality) or purely of the
INDEX STREAM (issue rate)?

Decides whether a presence-prefilter design can pay: if gathering one
int32 from a 400 KB bitmap table costs materially less per row than
the 1.4 GB payload-wide row gather, a sparse workload (genome contigs:
~8% window hit rate) can bitmap-test every window cheaply, compact the
survivors (argsort), and run the expensive row gather on 10x fewer
rows.  If gather cost is issue-bound regardless of table size, the
prefilter cannot pay with stock XLA and the question closes (the
Pallas variant would hit the same DMA-issue wall, PERF.md round-5
Pallas verdict).

Measures (chained scalar-dependence, N = 10M indices):
  bitmap   [100K]  i32 table, 1 col    (VMEM-scale)
  small    [3.2M]  i32 table, 1 col    (L2-scale)
  payload  [3.2M, 112] row gather      (the real probe layout, 1.4 GB)
  compact  argsort-based survivor compaction at 8%% density
  probe8   payload row gather on the 8%% survivors (N*0.08 rows)

Usage: python scripts/gather_scale_exp.py
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


def main():
    cache_dir = os.path.join(bench.CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    N = 10_000_000
    H = 3_200_000
    idx = jnp.asarray(rng.integers(0, H, size=N).astype(np.int32))
    bitmap = jnp.asarray(rng.integers(-2**31, 2**31 - 1, size=H // 32,
                                      dtype=np.int32))
    small = jnp.asarray(rng.integers(0, 100, size=H, dtype=np.int32))
    wide = jnp.asarray(rng.integers(0, 100, size=(H, 112),
                                    dtype=np.int32))
    mask8 = jnp.asarray(rng.random(N) < 0.08)
    n8 = int(N * 0.08)

    def s_bitmap(c, idx, bitmap):
        w = bitmap[idx >> 5]
        return c + (((w >> (idx & 31)) & 1).sum()).astype(jnp.float32)

    def s_small(c, idx, small):
        return c + small[idx].sum().astype(jnp.float32)

    def s_wide(c, idx, wide):
        return c + wide[idx].sum(dtype=jnp.int32).astype(jnp.float32)

    def s_compact(c, idx, mask):
        order = jnp.argsort(~mask)[:n8]
        return c + idx[order].sum().astype(jnp.float32)

    def s_filtered(c, idx, mask, wide):
        order = jnp.argsort(~mask)[:n8]
        surv = idx[order]
        return c + wide[surv].sum(dtype=jnp.int32).astype(jnp.float32)

    t_bm = measure("bitmap 400KB", s_bitmap, idx, bitmap, k_hi=24, k_lo=8)
    t_sm = measure("small 12.8MB 1-col", s_small, idx, small,
                   k_hi=24, k_lo=8)
    t_w = measure("payload 1.4GB 112-col", s_wide, idx, wide,
                  k_hi=12, k_lo=4)
    t_c = measure("compact (argsort 8%)", s_compact, idx, mask8,
                  k_hi=12, k_lo=4)
    t_f = measure("filter+compact+gather8%", s_filtered, idx, mask8, wide,
                  k_hi=12, k_lo=4)
    log("")
    log(f"per-row: bitmap {t_bm/N*1e9:.2f} ns, small {t_sm/N*1e9:.2f} ns, "
        f"payload {t_w/N*1e9:.2f} ns")
    log(f"prefilter pipeline {t_f*1e3:.1f} ms (+bitmap {t_bm*1e3:.1f}) vs "
        f"full gather {t_w*1e3:.1f} ms -> "
        f"{'PAYS' if t_f + t_bm < t_w else 'DOES NOT PAY'} at 8% density")
    print(f"GATHER_SCALE bitmap_ns={t_bm/N*1e9:.2f} small_ns={t_sm/N*1e9:.2f} "
          f"payload_ns={t_w/N*1e9:.2f} compact_ms={t_c*1e3:.2f} "
          f"filtered_ms={t_f*1e3:.2f}")


if __name__ == "__main__":
    main()
