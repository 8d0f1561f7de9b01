"""GradCache, TPU edition: two-pass chunked-remat large-batch contrastive
training.

Counterpart of the reference's GradCache engine (reference: loss.py:135-213,
rand_state.py:6-21), which enables 16k+ global batches by:
  pass 1 - embedding all chunks without grad (RNG states snapshotted);
  loss   - computed on the full (gathered) embedding matrix, backward to get
           d-loss/d-embedding;
  pass 2 - re-forwarding each chunk under the replayed RNG and
           backpropagating the surrogate <embedding, cached-grad> dot.

The JAX version is a single jitted function:
  pass 1 is a lax.map over chunk slices (memory = one chunk's activations);
  the loss gradient wrt embeddings is an ordinary jax.grad;
  pass 2 is a lax.scan accumulating per-chunk jax.vjp cotangents into the
  parameter gradient pytree. Explicit PRNG keys (jax.random.fold_in on the
  chunk index) replace the reference's CUDA RandContext capture/replay —
  the same key is passed in both passes, so dropout replays exactly.

Gradient equivalence with the naive full-batch loss is exact (up to float
reassociation) and unit-tested on an 8-device CPU mesh
(tests/test_grad_cache.py) — the check the reference could only do with a
2-GPU torchrun script (reference test_grad_cache.py:15).

DDP's no_sync trick (sync only on the last chunk) is unnecessary: under
pjit/shard_map the gradient psum happens once, at the jit boundary, after
all chunks have accumulated.
"""

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _split_chunks(batch: Any, chunk_size: int) -> Any:
    """[B, ...] -> [n_chunks, chunk_size, ...] on every leaf."""

    def r(x):
        b = x.shape[0]
        assert b % chunk_size == 0, f"batch {b} not divisible by chunk {chunk_size}"
        return x.reshape(b // chunk_size, chunk_size, *x.shape[1:])

    return jax.tree_util.tree_map(r, batch)


def grad_cache_loss_and_grads(
    params: Any,
    q_batch: Any,
    d_batch: Any,
    encode_q: Callable[[Any, Any, jax.Array], Dict[str, Any]],
    encode_d: Callable[[Any, Any, jax.Array], Dict[str, Any]],
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    chunk_size: int,
    rng: Optional[jax.Array] = None,
    router_aux_coef: float = 0.0,
    d_trainable: bool = True,
    extra_params: Any = None,
    chunk_size_d: Optional[int] = None,
) -> Tuple[jnp.ndarray, Any]:
    """Returns (loss, param_grads) — or (loss, param_grads, extra_grads)
    when extra_params is given (loss-stage parameters such as a trainable
    logit scale: loss_fn is then called as loss_fn(q, d, extra_params)).

    encode_*(params, chunk_batch, chunk_rng) -> {"embedding": [c, D],
        optionally "router_aux": scalar} — router_aux is the per-chunk
    load-balance loss, added to the surrogate exactly like the reference
    couples it per chunk (loss.py:158-160).
    loss_fn(q_embs, d_embs) -> scalar on the FULL local embeddings (it may
    all_gather internally under shard_map, or operate on global arrays
    under pjit).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng_q, rng_d = jax.random.split(rng)

    # the towers may chunk at different granularities (e.g. packed document
    # rows vs padded queries)
    q_chunks = _split_chunks(q_batch, chunk_size)
    d_chunks = _split_chunks(d_batch, chunk_size_d or chunk_size)
    n_q = jax.tree_util.tree_leaves(q_chunks)[0].shape[0]
    n_d = jax.tree_util.tree_leaves(d_chunks)[0].shape[0]

    # ---- pass 1: chunked no-grad embeddings --------------------------------
    def embed(encode, base_rng):
        def one(i_and_chunk):
            i, chunk = i_and_chunk
            out = encode(params, chunk, jax.random.fold_in(base_rng, i))
            return out["embedding"]

        def run(chunks, n):
            idx = jnp.arange(n)
            return jax.lax.map(one, (idx, chunks))

        return run

    q_embs = embed(encode_q, rng_q)(q_chunks, n_q)  # [n_q, c, D]
    q_embs = jax.lax.stop_gradient(q_embs).reshape(-1, q_embs.shape[-1])
    d_embs = embed(encode_d, rng_d)(d_chunks, n_d)
    d_embs = jax.lax.stop_gradient(d_embs).reshape(-1, d_embs.shape[-1])

    # ---- loss on full embeddings, grads wrt embeddings ---------------------
    extra_grads = None
    if extra_params is not None:
        loss, (gq, gd, extra_grads) = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            q_embs, d_embs, extra_params
        )
    else:
        loss, (gq, gd) = jax.value_and_grad(loss_fn, argnums=(0, 1))(q_embs, d_embs)
    # per-chunk embedding count can differ from chunk_size (packed batches:
    # chunk rows each yield max_segments slot embeddings) — infer it
    gq = gq.reshape(n_q, -1, gq.shape[-1])
    gd = gd.reshape(n_d, -1, gd.shape[-1])

    # ---- pass 2: replay chunks, accumulate parameter grads -----------------
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    def accumulate(encode, base_rng, chunks, cotangents, acc):
        def body(acc, xs):
            i, chunk, cot = xs

            def surrogate(p):
                out = encode(p, chunk, jax.random.fold_in(base_rng, i))
                s = jnp.vdot(out["embedding"].astype(jnp.float32), cot.astype(jnp.float32))
                aux = out.get("router_aux")
                if aux is not None and router_aux_coef:
                    s = s + router_aux_coef * aux
                return s

            g = jax.grad(surrogate)(params)
            acc = jax.tree_util.tree_map(jnp.add, acc, g)
            return acc, None

        n = jax.tree_util.tree_leaves(chunks)[0].shape[0]
        acc, _ = jax.lax.scan(body, acc, (jnp.arange(n), chunks, cotangents))
        return acc

    grads = accumulate(encode_q, rng_q, q_chunks, gq, zero_grads)
    if d_trainable:
        grads = accumulate(encode_d, rng_d, d_chunks, gd, grads)

    if extra_params is not None:
        return loss, grads, extra_grads
    return loss, grads
