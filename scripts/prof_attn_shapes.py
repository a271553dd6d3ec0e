"""Microbench: XLA vs Pallas attention at production shapes on real TPU.

Production 115M t2i headline: B=16 (CFG doubled 8), H=12, L=384, D=64.
Also the 1.4B config: H=16, L=384, D=128.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.ops.attention import multihead_attention
from unidisc_tpu.ops.pallas_attention import flash_attention

REPS = 64


def bench(fn, *args):
    @jax.jit
    def loop(q, k, v):
        def body(q, _):
            # feed the output back as the next query so the compiler
            # can't hoist the attention out of the scan
            o = fn(q, k, v)
            return o.astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=REPS)
        return q.astype(jnp.float32).mean()  # scalar: tunnel transfer is 4B

    np.asarray(loop(*args))  # compile+warm
    t0 = time.perf_counter()
    np.asarray(loop(*args))
    return (time.perf_counter() - t0) / REPS


def main():
    for (b, h, l, d) in [(16, 12, 384, 64), (8, 12, 384, 64),
                         (16, 16, 384, 128), (8, 12, 1024, 64),
                         (16, 12, 1024, 64)]:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, l, h, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, l, h, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, l, h, d), jnp.bfloat16)

        t_xla = bench(lambda q, k, v: multihead_attention(
            q, k, v, causal=False, backend="xla"), q, k, v)
        t_pal = bench(lambda q, k, v: flash_attention(
            q, k, v, causal=False), q, k, v)
        flops = 4 * b * h * l * l * d
        print(f"B{b} H{h} L{l} D{d}: xla {t_xla*1e6:8.1f}us "
              f"({flops/t_xla/1e12:5.1f} TF/s) | pallas {t_pal*1e6:8.1f}us "
              f"({flops/t_pal/1e12:5.1f} TF/s) | ratio {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
