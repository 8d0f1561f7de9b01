"""Vision-step ablation (r3 VERDICT next #5): where do the 887 ms go?

BENCH_r03's vision section (LiT grad-cache step, eva02 ViT-B/16 @224,
B=512/chip, MAP pooling, frozen text @77) measured 0.491 hw-basis MFU vs
0.751 for the text headline, with no decomposition. This script times, in
isolation (scan-amortized, grads consumed against DCE):

  1. the full ViT-B/16 forward and forward+backward at the chunk size;
  2. its pieces: patchify conv, one transformer block (x12), 2-D rope
     application (per layer), MAP pooling head;
  3. S=197 attention: SDPA (shipping choice — below the 512 flash gate)
     vs the Pallas flash kernel at this exact shape, fwd and fwd+bwd;
  4. the frozen text tower's share (fwd-only, 77 tokens).

Run: python -m contrastors_tpu.scripts.ablate_vision [--chunk 32]
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from contrastors_tpu.models.hf_interop_timm import timm_name_to_trunk_config

from contrastors_tpu.scripts.ablate_common import scan_amortize, timed

ITERS = 20  # scan_amortize default n matches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    cfg = timm_name_to_trunk_config("vit_eva02_base_patch16_224")
    Bc = args.chunk  # grad-cache chunk: the shape the step actually runs
    img = 224
    S = (img // cfg.patch_size) ** 2 + 1  # 197

    from contrastors_tpu.models.biencoder import BiEncoder

    vmodel = BiEncoder(config=cfg, trunk_type="vision", pooling="map", dtype=jnp.bfloat16)
    px = jnp.asarray(rng.normal(size=(Bc, 3, img, img)), jnp.bfloat16)
    params = vmodel.init(jax.random.PRNGKey(0), pixel_values=px[:1])
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"eva02-base: {n_params/1e6:.1f}M params, chunk {Bc}, S={S}")

    # 1. full tower
    def fwd(p, px, carry):
        e = vmodel.apply(p, pixel_values=px + carry.astype(px.dtype) * 0)["embedding"]
        return carry + e.astype(jnp.float32).sum() * 0 + 1

    def fb(p, px, carry):
        def loss(p):
            return vmodel.apply(p, pixel_values=px + carry.astype(px.dtype) * 0)[
                "embedding"
            ].astype(jnp.float32).sum()

        g = jax.grad(loss)(p)
        return carry + jax.tree_util.tree_leaves(g)[0].astype(jnp.float32).sum() * 0 + 1

    t_fwd = timed(scan_amortize(fwd), params, px) / ITERS
    t_fb = timed(scan_amortize(fb), params, px) / ITERS
    flops_f = 2 * n_params * Bc * S
    print(f"tower fwd     : {t_fwd*1e3:8.2f} ms  {flops_f/t_fwd/1e12:6.1f} TF/s (2PT basis)")
    print(f"tower fwd+bwd : {t_fb*1e3:8.2f} ms  {3*flops_f/t_fb/1e12:6.1f} TF/s (6PT basis)")

    # 2. pieces
    from contrastors_tpu.layers.embeddings import PatchEmbedding

    pe = PatchEmbedding(config=cfg, dtype=jnp.bfloat16)
    pe_params = pe.init(jax.random.PRNGKey(0), px[:1])

    def patchify(p, px, carry):
        h, _ = pe.apply(p, px + carry.astype(px.dtype) * 0)
        return carry + h.astype(jnp.float32).sum() * 0 + 1

    t_pe = timed(scan_amortize(patchify), pe_params, px) / ITERS
    print(f"patchify conv : {t_pe*1e3:8.2f} ms")

    from contrastors_tpu.layers.block import Block

    blk = Block(config=cfg, dtype=jnp.bfloat16)
    h0 = jnp.asarray(rng.normal(size=(Bc, S, cfg.n_embd)), jnp.bfloat16)
    _, rope = pe.apply(pe_params, px[:1])
    blk_params = blk.init(jax.random.PRNGKey(0), h0[:1], None, None, None, None, rope, True)

    def one_block(p, h, carry):
        out, res, _ = blk.apply(p, h + carry.astype(h.dtype) * 0, None, None, None, None, rope, True)
        return carry + out.astype(jnp.float32).sum() * 0 + 1

    t_blk = timed(scan_amortize(one_block), blk_params, h0) / ITERS
    print(f"one block fwd : {t_blk*1e3:8.2f} ms  (x{cfg.n_layer} = {t_blk*cfg.n_layer*1e3:.2f} ms)")

    from contrastors_tpu.layers.rotary import apply_rope_cat_prefixed

    qh = jnp.asarray(rng.normal(size=(Bc, S, cfg.n_head, cfg.n_embd // cfg.n_head)), jnp.bfloat16)

    def rope_apply(x, carry):
        o = apply_rope_cat_prefixed(x + carry.astype(x.dtype) * 0, rope, 1)
        return carry + o.astype(jnp.float32).sum() * 0 + 1

    t_rope = timed(scan_amortize(rope_apply), qh) / ITERS
    print(f"2-D rope (1x) : {t_rope*1e3:8.2f} ms  (q+k x{cfg.n_layer} = {2*t_rope*cfg.n_layer*1e3:.2f} ms)")

    from contrastors_tpu.layers.attention import MultiHeadAttentionPooling

    mapp = MultiHeadAttentionPooling(config=cfg, dtype=jnp.bfloat16)
    map_params = mapp.init(jax.random.PRNGKey(0), h0[:1])

    def map_pool(p, h, carry):
        o = mapp.apply(p, h + carry.astype(h.dtype) * 0)
        return carry + o.astype(jnp.float32).sum() * 0 + 1

    t_map = timed(scan_amortize(map_pool), map_params, h0) / ITERS
    print(f"MAP pooling   : {t_map*1e3:8.2f} ms")

    # 3. S=197 attention: SDPA vs flash at this exact shape
    from contrastors_tpu.ops.flash_attention import flash_attention
    from contrastors_tpu.ops.sdpa import sdpa

    Dh = cfg.n_embd // cfg.n_head
    q = jnp.asarray(rng.normal(size=(Bc, S, cfg.n_head, Dh)), jnp.bfloat16)

    def att(fn, q, carry):
        o = fn(q + carry.astype(q.dtype) * 0, q, q)
        return carry + o.astype(jnp.float32).sum() * 0 + 1

    def att_fb(fn, q, carry):
        g = jax.grad(lambda q: fn(q, q, q).astype(jnp.float32).sum())(
            q + carry.astype(q.dtype) * 0
        )
        return carry + g.astype(jnp.float32).sum() * 0 + 1

    for name, fn in (("sdpa", sdpa), ("flash", flash_attention)):
        tf_ = timed(scan_amortize(lambda q, c, fn=fn: att(fn, q, c)), q) / ITERS
        tb_ = timed(scan_amortize(lambda q, c, fn=fn: att_fb(fn, q, c)), q) / ITERS
        print(f"attn S={S} {name:5s}: fwd {tf_*1e3:7.2f} ms   fwd+bwd {tb_*1e3:7.2f} ms")

    print("done — paste into ROADMAP's vision ablation section")


if __name__ == "__main__":
    main()
