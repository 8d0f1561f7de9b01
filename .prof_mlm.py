"""MLM step decomposition, async-dispatch timing (enqueue N, fetch once)."""
import gc
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

from contrastors_tpu.models.model_config import TrunkConfig
from contrastors_tpu.models.nomic_bert import NomicBertForPreTraining
from contrastors_tpu.trainers.mlm import dense_budget, masked_positions_static
from contrastors_tpu.utils.optim import make_optimizer

rng = np.random.default_rng(0)
cfg = TrunkConfig(
    n_embd=768, n_layer=12, n_head=12, n_inner=3072, vocab_size=30528,
    pad_token_id=0, n_positions=0, rotary_emb_fraction=1.0,
    activation_function="swiglu", attn_impl="auto",
)
model = NomicBertForPreTraining(config=cfg, dtype=jnp.bfloat16, remat=False)
Bm, Sm, p_ = 8, 2048, 0.30
ids = jnp.asarray(rng.integers(5, 30000, size=(Bm, Sm)), jnp.int32)
mask = jnp.ones_like(ids)
labels = np.full((Bm, Sm), -100, np.int32)
mp = rng.random((Bm, Sm)) < p_
labels[mp] = np.asarray(rng.integers(5, 30000, size=int(mp.sum())))
pos, lab = masked_positions_static(labels, dense_budget(Sm, p_))
pos, lab = jnp.asarray(pos), jnp.asarray(lab)
params = model.init(jax.random.PRNGKey(0), ids[:1], attention_mask=mask[:1])
n_p = sum(x.size for x in jax.tree_util.tree_leaves(params))
N = 20


def lf(p):
    return model.apply(p, ids, attention_mask=mask, labels=lab, masked_positions=pos)["loss"]


def bench_async(name, fn, *args):
    r = fn(*args)
    _ = float(r)
    t0 = time.perf_counter()
    for _i in range(N):
        r = fn(*args)
    _ = float(r)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:14s}: {dt*1e3:7.1f} ms")
    return dt


fwd = jax.jit(lf)
t_f = bench_async("fwd", fwd, params)
del fwd
gc.collect()


@jax.jit
def fb(p):
    l, g = jax.value_and_grad(lf)(p)
    gn = jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(jnp.square(x)), g, 0.0)
    return l + 0.0 * gn  # consume every grad leaf


t_fb = bench_async("fwd+bwd", fb, params)
del fb
gc.collect()

tx = make_optimizer(params, 5e-4, weight_decay=0.01, max_grad_norm=1.0)
opt = tx.init(params)


@jax.jit
def step(p, o):
    l, g = jax.value_and_grad(lf)(p)
    u, o = tx.update(g, o, p)
    return optax.apply_updates(p, u), o, l


params, opt, l = step(params, opt)
_ = float(l)
t0 = time.perf_counter()
for _i in range(N):
    params, opt, l = step(params, opt)
t_s = (time.perf_counter() - t0 + 0 * float(l)) / N
_ = float(l)
t_s = None
# redo with fetch-at-end properly
t0 = time.perf_counter()
for _i in range(N):
    params, opt, l = step(params, opt)
_ = float(l)
t_s = (time.perf_counter() - t0) / N
print(f"{'full step':14s}: {t_s*1e3:7.1f} ms")
print(f"bwd-only ~ {1e3*(t_fb-t_f):.1f} ms; opt+clip ~ {1e3*(t_s-t_fb):.1f} ms")
print(f"fwd MFU(2PT): {2*n_p*Bm*Sm/t_f/1e12/197:.3f}   fwd+bwd(6PT): {6*n_p*Bm*Sm/t_fb/1e12/197:.3f}")
print(f"tokens/s at step: {Bm*Sm/t_s:,.0f}")
