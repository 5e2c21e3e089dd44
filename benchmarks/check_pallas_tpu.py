"""Hardware check + microbenchmark for the Pallas k-mask kernel.

Run on a real TPU (the interpreter stubs the PRNG). Verifies exact counts,
reproducibility, key-dependence, and rough uniformity, then times the kernel
against the argsort-based XLA path at the benchmark shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from masked_diffusion_tpu.ops.degrade import exact_count_masks
from masked_diffusion_tpu.ops.pallas.kmask import exact_count_masks_pallas


def main():
    assert jax.default_backend() != "cpu", "run on TPU hardware"
    # ---- correctness
    counts = jnp.array([0, 1, 17, 2048, 4096])
    m = exact_count_masks_pallas(jax.random.PRNGKey(0), 5, 64, 64, counts)
    black = 64 * 64 - np.asarray(m.sum(axis=(1, 2, 3)))
    assert np.array_equal(black, np.asarray(counts)), (black, counts)

    m2 = exact_count_masks_pallas(jax.random.PRNGKey(0), 5, 64, 64, counts)
    assert np.array_equal(np.asarray(m), np.asarray(m2)), "not reproducible"
    m3 = exact_count_masks_pallas(jax.random.PRNGKey(1), 5, 64, 64, counts)
    assert not np.array_equal(np.asarray(m), np.asarray(m3)), "key ignored"

    # uniformity: selection frequency per position ~ k/HW
    B, k, hw = 256, 2048, 64 * 64
    freq = np.zeros(hw)
    for i in range(8):
        mm = exact_count_masks_pallas(
            jax.random.PRNGKey(100 + i), B, 64, 64, jnp.full((B,), k)
        )
        freq += (1 - np.asarray(mm).reshape(B, hw)).sum(axis=0)
    freq /= 8 * B
    exp = k / hw
    assert abs(freq.mean() - exp) < 1e-3, freq.mean()
    assert freq.min() > exp - 0.1 and freq.max() < exp + 0.1, (freq.min(), freq.max())
    print(f"correctness ok; sel-prob mean={freq.mean():.4f} (expect {exp:.4f})")

    # ---- microbenchmark at the sampler's shape
    B = 64
    counts_b = jnp.full((B,), 2048, jnp.int32)
    key = jax.random.PRNGKey(7)

    def timeit(fn, *args, n=20):
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    t_pallas = timeit(lambda: exact_count_masks_pallas(key, B, 64, 64, counts_b))
    t_xla = timeit(jax.jit(lambda: exact_count_masks(key, B, 64, 64, counts_b)))
    print(
        f"kmask batch={B} 64x64: pallas {t_pallas*1e3:.3f} ms, "
        f"argsort-XLA {t_xla*1e3:.3f} ms, speedup {t_xla/t_pallas:.2f}x"
    )


if __name__ == "__main__":
    main()
