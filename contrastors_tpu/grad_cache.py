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
    direct_chunks: int = 0,
    direct_chunks_d: Optional[int] = None,
    embed_parallel: int = 1,
    embed_parallel_d: Optional[int] = None,
    return_metrics: bool = False,
    loss_has_aux: bool = False,
) -> Tuple[jnp.ndarray, Any]:
    """Returns (loss, param_grads) — or (loss, param_grads, extra_grads)
    when extra_params is given (loss-stage parameters such as a trainable
    logit scale: loss_fn is then called as loss_fn(q, d, extra_params)).
    With return_metrics=True a metrics dict is appended (currently
    {"router_aux": total}, merged with the loss-stage aux dict when
    loss_has_aux is set). With loss_has_aux=True, loss_fn returns
    (scalar, metrics_dict) — metrics (e.g. in-batch accuracy, the quantity
    the reference logs per dataset at loss.py:127-130) are computed once on
    the cached logits during the loss stage at negligible cost and do not
    enter the gradient. The returned loss INCLUDES
    router_aux_coef * total_router_aux — the same objective whose gradient
    is returned, so loss curves are comparable with the non-cache path.

    encode_*(params, chunk_batch, chunk_rng) -> {"embedding": [c, D],
        optionally "router_aux": scalar} — router_aux is the per-chunk
    load-balance loss, added to the surrogate exactly like the reference
    couples it per chunk (loss.py:158-160).
    loss_fn(q_embs, d_embs) -> scalar on the FULL local embeddings (it may
    all_gather internally under shard_map, or operate on global arrays
    under pjit).

    direct_chunks / direct_chunks_d: hybrid mode — the LEADING k chunks of
    each tower are encoded once with live activations (jax.vjp residuals
    held in HBM) and receive their loss cotangent directly, skipping the
    pass-2 re-forward; the remaining chunks use the two-pass cache. This
    trades memory for the structural recompute: the direct fraction costs
    6*P*T instead of 8*P*T per pair. Gradients stay exact for any split
    (unit-tested). With router_aux_coef != 0 the direct forward runs as a
    per-chunk vmap instead of one flat batch, so the aux keeps the
    reference's per-chunk accounting (sum of per-chunk load-balance
    means, loss.py:158-160) and the SAME fold_in(rng, i) keys as the
    cached path — direct-vs-cached equality holds chunk-for-chunk.

    embed_parallel / embed_parallel_d: pass-1 super-chunking — embed m
    pass-2-sized chunks per lax.map step by vmapping the encoder over the
    chunk dim, with each sub-chunk keeping ITS OWN fold_in(rng, i) key.
    Pass 1 holds no vjp residuals, so its launches can be much larger than
    pass 2's memory-bound replay chunks; this collapses the many small
    kernel launches that dominate short-sequence towers (the vision-step
    wall in ROADMAP's round-4 decomposition). Exact for any m, including
    stochastic encoders: the per-sub-chunk keys mean pass 2 replays
    identical dropout. m is clamped to the largest divisor of the tower's
    chunk count.
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
    # negative k means "all chunks direct" (the bench's --direct_q -1
    # convention); without this, x[:k] slicing would silently misbehave
    def norm_k(k, n):
        k = int(k)
        return n if k < 0 else min(k, n)

    k_q = norm_k(direct_chunks, n_q)
    k_d = norm_k(direct_chunks if direct_chunks_d is None else direct_chunks_d, n_d)

    def lead_flat(chunks, k):
        # leading k chunks flattened to one batch (bigger matmuls, one vjp)
        return jax.tree_util.tree_map(
            lambda x: x[:k].reshape(k * x.shape[1], *x.shape[2:]), chunks
        )

    def rest(chunks, k):
        return jax.tree_util.tree_map(lambda x: x[k:], chunks)

    # ---- direct part: one forward with live activations --------------------
    def direct_embed(encode, base_rng, chunks, k, n_total):
        """Returns (embeddings, vjp_fn, aux_sum). vjp_fn's cotangent is the
        (d_embeddings, d_aux) pair — pass router_aux_coef as d_aux so the
        aux gradient rides the same held vjp."""
        if k == 0:
            return None, None, jnp.zeros(())

        if router_aux_coef:
            # per-chunk vmap: keeps the reference's per-chunk aux accounting
            # and the cached path's fold_in(rng, i) keys, while the vmapped
            # tower still batches its matmuls across the k chunks
            lead = jax.tree_util.tree_map(lambda x: x[:k], chunks)
            idx = jnp.arange(k)

            def f(p):
                keys = jax.vmap(lambda i: jax.random.fold_in(base_rng, i))(idx)
                outs = jax.vmap(
                    lambda ch, kk: encode(p, ch, kk), in_axes=(0, 0)
                )(lead, keys)
                e = outs["embedding"]
                embs = e.reshape(e.shape[0] * e.shape[1], e.shape[-1])
                aux = outs.get("router_aux")
                aux_sum = (
                    jnp.zeros(()) if aux is None else jnp.sum(aux.astype(jnp.float32))
                )
                return embs, aux_sum

        else:

            def f(p):
                # a distinct key one past the cached chunk index range
                out = encode(p, lead_flat(chunks, k), jax.random.fold_in(base_rng, n_total))
                return out["embedding"], jnp.zeros(())

        (embs, aux_sum), vjp_fn = jax.vjp(f, params)
        return embs, vjp_fn, aux_sum

    q_direct, q_vjp, q_direct_aux = direct_embed(encode_q, rng_q, q_chunks, k_q, n_q)
    d_direct, d_vjp, d_direct_aux = direct_embed(encode_d, rng_d, d_chunks, k_d, n_d)
    q_cached_chunks = rest(q_chunks, k_q)
    d_cached_chunks = rest(d_chunks, k_d)

    # ---- pass 1: chunked no-grad embeddings (cached part) ------------------
    def embed(encode, base_rng, offset, m):
        def one(i_and_chunk):
            i, chunk = i_and_chunk
            out = encode(params, chunk, jax.random.fold_in(base_rng, i))
            return out["embedding"]

        def one_super(idx_and_group):
            # [m] chunk indices + [m, c, ...] leaves -> [m, c', D] embeddings;
            # vmap batches the tower's matmuls across the m sub-chunks while
            # each sub-chunk keeps its own pass-2-replayable key
            idx, group = idx_and_group
            keys = jax.vmap(lambda i: jax.random.fold_in(base_rng, i))(idx)
            return jax.vmap(
                lambda ch, k: encode(params, ch, k)["embedding"], in_axes=(0, 0)
            )(group, keys)

        def run(chunks, n):
            mm = max(1, min(int(m), n))
            while n % mm:
                mm -= 1
            idx = jnp.arange(n) + offset
            if mm == 1:
                return jax.lax.map(one, (idx, chunks))
            grouped = jax.tree_util.tree_map(
                lambda x: x.reshape(n // mm, mm, *x.shape[1:]), chunks
            )
            e = jax.lax.map(one_super, (idx.reshape(n // mm, mm), grouped))
            return e.reshape(n, *e.shape[2:])  # [n, c', D]

        return run

    def tower_embs(encode, base_rng, cached_chunks, k, n, direct, m):
        parts = []
        if direct is not None:
            parts.append(jax.lax.stop_gradient(direct))
        if n - k > 0:
            e = embed(encode, base_rng, k, m)(cached_chunks, n - k)  # [n-k, c, D]
            parts.append(jax.lax.stop_gradient(e).reshape(-1, e.shape[-1]))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    m_q = embed_parallel
    m_d = embed_parallel if embed_parallel_d is None else embed_parallel_d
    q_embs = tower_embs(encode_q, rng_q, q_cached_chunks, k_q, n_q, q_direct, m_q)
    d_embs = tower_embs(encode_d, rng_d, d_cached_chunks, k_d, n_d, d_direct, m_d)

    # ---- loss on full embeddings, grads wrt embeddings ---------------------
    extra_grads = None
    loss_aux: Dict[str, Any] = {}
    if extra_params is not None:
        loss, (gq, gd, extra_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=loss_has_aux
        )(q_embs, d_embs, extra_params)
    else:
        loss, (gq, gd) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=loss_has_aux
        )(q_embs, d_embs)
    if loss_has_aux:
        loss, loss_aux = loss
    # split cotangents into the direct part (applied straight through the
    # held vjp) and the cached part; per-chunk embedding count can differ
    # from chunk_size (packed batches: chunk rows each yield max_segments
    # slot embeddings) — infer it from the shapes
    nq_direct = 0 if q_direct is None else q_direct.shape[0]
    nd_direct = 0 if d_direct is None else d_direct.shape[0]
    gq_direct, gq = gq[:nq_direct], gq[nq_direct:]
    gd_direct, gd = gd[:nd_direct], gd[nd_direct:]
    if n_q - k_q > 0:
        gq = gq.reshape(n_q - k_q, -1, gq.shape[-1])
    if n_d - k_d > 0:
        gd = gd.reshape(n_d - k_d, -1, gd.shape[-1])

    # ---- pass 2: replay cached chunks, accumulate parameter grads ----------
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    def accumulate(encode, base_rng, chunks, cotangents, acc, offset):
        def body(carry, xs):
            acc, aux_sum = carry
            i, chunk, cot = xs

            def surrogate(p):
                out = encode(p, chunk, jax.random.fold_in(base_rng, i))
                s = jnp.vdot(out["embedding"].astype(jnp.float32), cot.astype(jnp.float32))
                aux = out.get("router_aux")
                if aux is not None and router_aux_coef:
                    s = s + router_aux_coef * aux
                return s, (jnp.zeros(()) if aux is None else aux.astype(jnp.float32))

            g, aux = jax.grad(surrogate, has_aux=True)(params)
            acc = jax.tree_util.tree_map(jnp.add, acc, g)
            return (acc, aux_sum + aux), None

        n = jax.tree_util.tree_leaves(chunks)[0].shape[0]
        if n == 0:
            return acc, jnp.zeros(())
        (acc, aux_sum), _ = jax.lax.scan(
            body, (acc, jnp.zeros(())), (jnp.arange(n) + offset, chunks, cotangents)
        )
        return acc, aux_sum

    aux_cot = jnp.asarray(router_aux_coef, jnp.float32)
    grads = zero_grads
    total_aux = jnp.zeros(())
    if q_vjp is not None:
        (g_direct,) = q_vjp((gq_direct.astype(q_direct.dtype), aux_cot))
        grads = jax.tree_util.tree_map(jnp.add, grads, g_direct)
        total_aux = total_aux + q_direct_aux
    grads, aux = accumulate(encode_q, rng_q, q_cached_chunks, gq, grads, k_q)
    total_aux = total_aux + aux
    if d_trainable:
        if d_vjp is not None:
            (g_direct,) = d_vjp((gd_direct.astype(d_direct.dtype), aux_cot))
            grads = jax.tree_util.tree_map(jnp.add, grads, g_direct)
            total_aux = total_aux + d_direct_aux
        grads, aux = accumulate(encode_d, rng_d, d_cached_chunks, gd, grads, k_d)
        total_aux = total_aux + aux

    # report the objective whose gradient was just accumulated
    if router_aux_coef:
        loss = loss + router_aux_coef * total_aux
    out: Tuple[Any, ...] = (loss, grads)
    if extra_params is not None:
        out = out + (extra_grads,)
    if return_metrics:
        out = out + (dict(loss_aux, router_aux=total_aux),)
    return out


def grad_cache_data_axis(mesh) -> Optional[str]:
    """The shard_map axis for a grad-cache train step, or None to run it
    unsharded. Shared by the text and image-text trainers so the
    eligibility rule cannot silently diverge between the two flagship
    large-batch paths.

    Eligible when the mesh has a data axis > 1 and no expert/tensor
    partitioning (param sharding cannot compose with the per-device chunk
    loop inside shard_map). Packed batches are eligible too: the host packs
    each data-axis device's pairs into its OWN row group with device-local
    pair indices (text_text.transform_host_batch), so both the row matrix
    and the pair-index arrays shard contiguously over "data" and each
    device's chunk loop sees only its local rows — the loss all-gathers
    only embeddings, mirroring the reference's DDP contract
    (reference loss.py:135-213)."""
    if mesh is None:
        return None
    shape = mesh.shape
    if (
        shape.get("data", 1) > 1
        and shape.get("expert", 1) == 1
        and shape.get("tensor", 1) == 1
    ):
        return "data"
    return None


def shard_map_grad_cache(gc_compute: Callable, mesh, n_outputs: int) -> Callable:
    """Wrap gc_compute(params, q_batch, d_batch, rng) in shard_map over the
    "data" axis: params and rng replicated, both token batches row-sharded,
    every output replicated (gc_compute psums/pmeans internally — SURVEY §7
    hard part 8; the sharded-logits HLO contract is asserted in
    tests/test_sharded_loss_scale.py)."""
    from jax.sharding import PartitionSpec as P

    from contrastors_tpu.parallel import shard_map

    return shard_map(
        gc_compute,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=tuple(P() for _ in range(n_outputs)),
    )
