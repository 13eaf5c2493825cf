"""Isolate the device cost of the event-compaction kernel (pack_events).

The shipped mapping of global destination k -> (session, rank) is a [K, S]
compare-reduce (O(S^2 * E)); this times it against a sort-based candidate
that is O(S*N log) to decide whether the quadratic term is a real slice of
the engine-glue budget at serving scale.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from april_asr_tpu.engine.step import pack_events, events_budget  # noqa: E402


def make_events(S, R, I, key, p_emit=0.12):
    ks = jax.random.split(key, 3)
    ops = jnp.where(
        jax.random.uniform(ks[0], (S, R, I)) < p_emit,
        jax.random.randint(ks[1], (S, R, I), 1, 4),
        0,
    ).astype(jnp.int32)
    tok = jax.random.randint(ks[2], (S, R, I), 0, 500).astype(jnp.int32)
    return {
        "ops": ops,
        "flags": jnp.zeros((S, R, I), jnp.int32),
        "final_k": jnp.zeros((S, R, I), jnp.int32),
        "tok": tok,
        "logprob": jnp.zeros((S, R, I), jnp.float32),
        "time_ms": jnp.zeros((S, R, I), jnp.int32),
    }


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    R, I = 25, 3
    for S in (2048, 4096):
        ev = make_events(S, R, I, jax.random.PRNGKey(0))
        bt = jnp.zeros((S,), jnp.int32)
        f = jax.jit(lambda e, b: pack_events(e, b, 200).blob)
        ms = timeit(f, ev, bt)
        E = events_budget(R)
        print(f"S={S} R={R} E={E}: pack_events blob {ms:.3f} ms")


if __name__ == "__main__":
    main()
