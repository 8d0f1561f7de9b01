"""Attribute the e2e-vs-synthetic gap stage by stage (round-4 VERDICT #1).

The e2e bench (bench.py e2e_input_pipeline) runs the REAL train path:
StreamingShardDataset -> host batch -> shard_batch -> jitted trainer step.
Round 4 reported e2e_pretok_vs_synthetic = 0.894 against the BARE headline
step, but that comparison was not config-matched and the ~125 ms residual
was unattributed. This script times every stage of the chain in isolation
on the real chip and prints an ms-level attribution table:

  bare_step          the headline grad-cache step (no trainer wrapper)
  trainer_synth      the SAME trainer step on one fixed pre-sharded batch
                     -> trainer wrapper cost = trainer_synth - bare_step
  host_batch_pretok  one streaming-loader batch, token-array shards
  host_batch_fly     one streaming-loader batch, on-the-fly tokenization
  shard_transfer     shard_batch(device_put) of one host batch (RTT-corrected)
  e2e_pretok/e2e_fly the full prefetch-overlapped pipeline
                     -> exposed pipeline stall = e2e - trainer_synth

All knobs (chunk, direct_q/d, batch) match the headline. Timing per the
verify-skill rules: scalar fetch per step (block_until_ready is a no-op
through the tunnel), median of --iters individually-timed steps.

Usage (on the TPU host):
  python -m contrastors_tpu.scripts.ablate_e2e [--iters 5] [--skip_fly]
"""

import argparse
import gc
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def median_ms(fn, iters):
    """Median of `iters` individually timed calls (each must sync itself)."""
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000.0, [round(t * 1000, 1) for t in ts]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--per_chip_batch", type=int, default=512)
    ap.add_argument("--direct_q", type=int, default=-1)
    ap.add_argument("--direct_d", type=int, default=0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--prefetch_depth", type=int, default=None,
                    help="override the config prefetch depth in the e2e runs")
    ap.add_argument("--skip_fly", action="store_true")
    args = ap.parse_args()

    import bench  # repo-root module (sys.path above)

    from contrastors_tpu.parallel import shard_batch
    from contrastors_tpu.trainers import TRAINER_REGISTRY
    from contrastors_tpu.utils.compile_cache import enable as enable_compile_cache
    from contrastors_tpu.utils.prefetch import PrefetchIterator

    enable_compile_cache()
    n_chips = len(jax.devices())
    B = args.per_chip_batch * n_chips
    results = {"B": B, "chunk": args.chunk, "direct_q": args.direct_q,
               "host_cores": os.cpu_count(), "iters": args.iters}

    # -- tunnel RTT (scalar fetch of a resident array) -----------------------
    tiny = jax.device_put(jnp.zeros(()))
    _ = float(tiny)
    rtt_ms, _ = median_ms(lambda: float(tiny), 10)
    results["rtt_ms"] = round(rtt_ms, 1)

    # -- corpus + config (shared with the bench) -----------------------------
    cfg, spec, make_pretok = bench.build_e2e_setup(
        args.chunk, args.per_chip_batch, n_chips,
        args.direct_q, args.direct_d, args.iters,
    )
    pretok_spec = make_pretok()

    def build(spec_path):
        c = cfg.model_copy(deep=True)
        c.data_args.input_shards = spec_path
        return TRAINER_REGISTRY["encoder"](c, "bf16")

    # -- host batch build, no prefetch (the raw loader cost) -----------------
    specs = [("pretok", pretok_spec)] + ([] if args.skip_fly else [("fly", spec)])
    arrays = None
    for name, sp in specs:
        tr = build(sp)
        it = iter(tr.dataloader)
        hb = next(it)  # warm: open/mmap the shard
        ms, all_ms = median_ms(lambda: next(it), args.iters)
        results[f"host_batch_ms_{name}"] = round(ms, 1)
        results[f"host_batch_ms_{name}_all"] = all_ms
        if name == "pretok":
            arrays = {k: v for k, v in hb.items() if isinstance(v, np.ndarray)}
        del tr, it
        gc.collect()

    # -- shard/transfer of one host batch (RTT-corrected per fetched leaf) ---
    tr = build(pretok_spec)
    with tr.mesh:
        # sync each leaf via a warmed jitted scalar reduction: indexing a
        # fresh device array (`v.reshape(-1)[0]`) can round-trip the WHOLE
        # buffer back through a remote-device link, double-counting the
        # upload being measured (see .claude/skills/verify/SKILL.md)
        reduce = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

        def put_and_sync():
            b = shard_batch(arrays, tr.mesh)
            for v in b.values():  # one scalar per leaf proves arrival
                _ = float(reduce(v))
            return b

        put_and_sync()  # warm: compiles `reduce` for every leaf shape
        n_leaves = len(arrays)
        ms, all_ms = median_ms(put_and_sync, args.iters)
        results["shard_transfer_ms"] = round(max(ms - n_leaves * rtt_ms, 0.0), 1)
        results["shard_transfer_raw_all"] = all_ms
        host_mb = sum(v.nbytes for v in arrays.values()) / 1e6
        results["host_batch_mb"] = round(host_mb, 2)

        # -- trainer step on a fixed pre-sharded batch (device-only cost) ----
        step = tr.make_train_step()
        params, opt_state = tr.params, tr.opt_state
        fixed = shard_batch(arrays, tr.mesh)
        rng_key = jax.random.PRNGKey(0)

        def one_step():
            nonlocal params, opt_state, rng_key
            rng_key, sk = jax.random.split(rng_key)
            params, opt_state, m = step(params, opt_state, fixed, sk)
            _ = float(m["loss"])

        one_step()  # compile
        one_step()  # second warm: the donated-params layout recompile settles
        ms, all_ms = median_ms(one_step, args.iters)
        results["trainer_synth_step_ms"] = round(ms, 1)
        results["trainer_synth_step_ms_all"] = all_ms
    del tr, step, params, opt_state, fixed
    gc.collect()

    # -- full pipeline (prefetch-overlapped), pretok then fly -----------------
    for name, sp in specs:
        tr = build(sp)
        tr_step = tr.make_train_step()
        depth = (
            tr.config.parallel_args.prefetch
            if args.prefetch_depth is None
            else args.prefetch_depth
        )

        def prepare(hb, _tr=tr):
            # device_put in the worker, as the shipping loop does
            a = {k: v for k, v in hb.items() if isinstance(v, np.ndarray)}
            return shard_batch(a, _tr.mesh)

        if depth > 0:
            it = PrefetchIterator(iter(tr.dataloader), transform=prepare, depth=depth)
        else:
            # --prefetch_depth 0: the no-overlap ablation — build + upload
            # serially in front of every step (PrefetchIterator with depth 0
            # would be an UNBOUNDED queue, not "no prefetch")
            it = map(prepare, iter(tr.dataloader))
        params, opt_state = tr.params, tr.opt_state
        rng_key = jax.random.PRNGKey(0)
        with tr.mesh:
            def pipeline_step():
                nonlocal params, opt_state, rng_key
                rng_key, sk = jax.random.split(rng_key)
                params, opt_state, m = tr_step(params, opt_state, next(it), sk)
                _ = float(m["loss"])

            pipeline_step()  # compile + fill the queue
            pipeline_step()  # second warm: donated-layout recompile settles
            ms, all_ms = median_ms(pipeline_step, args.iters)
        results[f"e2e_step_ms_{name}"] = round(ms, 1)
        results[f"e2e_step_ms_{name}_all"] = all_ms
        results["prefetch_depth"] = depth
        del tr, tr_step, it, params, opt_state
        gc.collect()

    # -- bare headline step (no trainer wrapper), same knobs ------------------
    # the EXACT step main() times: shared builder so the baseline the whole
    # attribution table is computed from cannot drift from the headline
    hl = bench.build_headline_step(args.chunk, B, args.direct_q, args.direct_d)
    bare, params, opt_state = hl["step"], hl["params"], hl["opt_state"]
    qb = {"ids": jnp.asarray(arrays["query_input_ids"]),
          "mask": jnp.asarray(arrays["query_attention_mask"])}
    db = {"ids": jnp.asarray(arrays["document_input_ids"]),
          "mask": jnp.asarray(arrays["document_attention_mask"])}

    rng_key = jax.random.PRNGKey(0)

    def bare_step():
        nonlocal params, opt_state, rng_key
        rng_key, sk = jax.random.split(rng_key)
        params, opt_state, loss = bare(params, opt_state, qb, db, sk)
        _ = float(loss)

    bare_step()
    ms, all_ms = median_ms(bare_step, args.iters)
    results["bare_step_ms"] = round(ms, 1)
    results["bare_step_ms_all"] = all_ms

    # -- attribution ----------------------------------------------------------
    results["trainer_wrapper_ms"] = round(
        results["trainer_synth_step_ms"] - results["bare_step_ms"], 1
    )
    results["pipeline_exposed_ms_pretok"] = round(
        results["e2e_step_ms_pretok"] - results["trainer_synth_step_ms"], 1
    )
    results["pipeline_serial_ms_pretok"] = round(
        results["host_batch_ms_pretok"] + results["shard_transfer_ms"], 1
    )
    if not args.skip_fly:
        results["pipeline_exposed_ms_fly"] = round(
            results["e2e_step_ms_fly"] - results["trainer_synth_step_ms"], 1
        )
    results["e2e_pretok_vs_trainer_synth"] = round(
        results["trainer_synth_step_ms"] / results["e2e_step_ms_pretok"], 3
    )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
