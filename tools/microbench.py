"""Primitive-op microbenchmarks on the live TPU: XLA sort at the rebuild's
sizes, batched-gather rates, cumsum. Each op repeats k times INSIDE one
jitted program (so the per-dispatch gap amortizes), with the input perturbed
by the iteration index so no iteration can be simplified away.

    cd tools && python microbench.py
"""
import jax
import jax.numpy as jnp

from qtime import qtime


def chain(fn, x, k=8):
    @jax.jit
    def run(v):
        def body(c, i):
            return fn(c ^ i if c.dtype == jnp.int32 else c + 1e-7), None
        out, _ = jax.lax.scan(body, v, jnp.arange(1, k + 1, dtype=x.dtype
                                                  if x.dtype == jnp.int32
                                                  else jnp.int32))
        return out
    return qtime(run, x, reps=10) / k


def main():
    key = jax.random.PRNGKey(0)

    for n in (16_384, 131_072, 1_149_440):
        k = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        t = chain(lambda v: jax.lax.sort_key_val(v, v)[1], k)
        print(f"sort_key_val int32 n={n:>9}: {t:7.3f} ms", flush=True)
        t = chain(lambda v: jnp.argsort(v).astype(jnp.int32) ^ v, k)
        print(f"argsort       int32 n={n:>9}: {t:7.3f} ms", flush=True)

    # row-wise batched sort alternative: (128, 8960) per-row sorts
    kk = jax.random.randint(key, (128, 8960), 0, 1 << 30, dtype=jnp.int32)
    t = chain(lambda v: jax.lax.sort(v, dimension=1), kk)
    print(f"row sort (128, 8960):  {t:7.3f} ms", flush=True)
    kk2 = jax.random.randint(key, (128, 128), 0, 1 << 30, dtype=jnp.int32)
    t = chain(lambda v: jax.lax.sort(v, dimension=1), kk2)
    print(f"row sort (128, 128):   {t:7.3f} ms", flush=True)

    # batched gather: index depends on the carry so it can't hoist
    src = jax.random.normal(key, (4, 16_385), jnp.float32)
    idx = jax.random.randint(key, (1_149_440,), 0, 16_384, dtype=jnp.int32)

    @jax.jit
    def gath(s):
        def body(c, i):
            g = c[:, (idx + i) % 16_384]          # (4, 1.15M)
            return c + g[:, :16_385] * 1e-9, None
        out, _ = jax.lax.scan(body, s, jnp.arange(8, dtype=jnp.int32))
        return out
    t = qtime(gath, src, reps=10) / 8
    print(f"batched gather (4, 1.15M): {t:7.3f} ms", flush=True)

    x = jax.random.normal(key, (1_149_440,), jnp.float32)
    t = chain(lambda v: jnp.cumsum(v), x)
    print(f"cumsum f32 n=1.15M: {t:7.3f} ms", flush=True)

    # int32 div+mod at the pair-compaction size
    kk3 = jax.random.randint(key, (16_384,), 0, 1 << 28, dtype=jnp.int32)
    t = chain(lambda v: (v // 128) ^ (v % 128), kk3)
    print(f"int div+mod n=16k:  {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
