"""Shared timing helpers for the on-chip ablation scripts.

Encodes the hard-won environment rules once (.claude/skills/verify):
block_until_ready is unreliable through the axon tunnel, so every timed
run fetches a scalar from the first output leaf; per-op costs are
measured scan-amortized so launch overhead doesn't swamp small kernels.
"""
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=3):
    """Median-free average of `iters` runs of jit(fn)(*args), tunnel-safe:
    each run syncs by fetching the scalar of a warmed jitted reduction over
    the first output leaf. (Indexing the fresh leaf — reshape(-1)[0] — can
    round-trip the WHOLE buffer through the tunnel; constant per variant at
    a fixed output shape, so earlier A/B ablation verdicts stand, but it
    inflated absolute ms on large outputs.) The jit cache makes repeated
    jax.jit(fn) calls hit the same executable."""
    jfn = jax.jit(fn)
    red = jax.jit(lambda x: jnp.sum(x))
    out = jfn(*args)
    _ = float(red(jax.tree_util.tree_leaves(out)[0]))  # warm fn + reduction
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
        _ = float(red(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def scan_amortize(body, n=20):
    """Wrap body(*args, carry) -> carry in a length-n lax.scan so the
    per-call launch overhead is amortized across n executions."""

    def f(*args):
        def step(carry, _):
            return body(*args, carry), ()

        carry, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=n)
        return carry

    return f
