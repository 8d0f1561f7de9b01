"""Mixture-of-experts MLP, TPU-native.

The reference consumes megablocks' dropless-MoE CUDA/Triton kernels
(reference: layers/block.py:16-17,192-216) plus a naive torch.where loop
fallback (layers/moe.py:26-96). Neither maps to TPU: block-sparse grouped
matmuls on GPU become, on TPU, a fixed-capacity dispatch expressed as
einsums that tile directly onto the MXU (the Switch/Mesh-TF formulation).

Semantics preserved from the reference:
  - router = linear, no bias (moe.py:11-23), logits in fp32;
  - top-k over softmax(router_logits) WITHOUT renormalizing unless
    moe_normalize_expert_weights (megablocks Arguments, block.py:203);
  - fine-grained segmentation: expert hidden = n_inner // ffn_div;
  - optional shared experts applied to every token (block.py:210-212);
  - returns (output, router_logits) so the trainer can apply the
    Switch-style load-balance loss (reference loss.py:13-73).

Two dispatch implementations (config.moe_impl):
  - "dropless" (default): assignments sorted by expert with block-aligned
    group starts feed the first-party Pallas grouped matmul
    (ops/grouped_matmul.py; jax.lax.ragged_dot off-TPU) — the megablocks
    equivalent. No token is ever dropped, matching megablocks dMoE
    semantics exactly; compute is O(N*k) rows regardless of balance.
  - "capacity": fixed-capacity scatter/gather dispatch (Switch/Mesh-TF
    formulation). Can drop tokens when routing is extremely unbalanced;
    capacity_factor=2.0 makes this rare and the aux loss drives routing
    towards balance. Static [E, C] shapes shard cleanly over the "expert"
    mesh axis, so this remains the expert-parallel path of choice.

Both read the same [E, ...] expert parameters, so checkpoints are
interchangeable between impls.

expert_choice_router=True switches to expert-choice routing (Zhou et al.
2022; the reference exposes the knob at config.py:152-203 but megablocks
only implements token-choice): each expert takes its top-capacity tokens,
so load is balanced by construction and no token-side top-k or aux loss
pressure is needed.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastors_tpu.layers.activations import ACT2FN, is_gated


class MoEMLP(nn.Module):
    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32

    @property
    def capacity_factor(self) -> float:
        return getattr(self.config, "moe_capacity_factor", 2.0)

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        B, S, D = hidden_states.shape
        N = B * S
        num_shared = cfg.num_shared_experts
        E = cfg.num_experts - num_shared
        top_k = cfg.moe_top_k - num_shared
        F_hid = cfg.n_inner // cfg.ffn_div
        gated = is_gated(cfg.activation_function)
        act = ACT2FN[cfg.activation_function]

        x = hidden_states.reshape(N, D)

        router_kernel = self.param(
            "router", nn.initializers.normal(stddev=cfg.initializer_range), (D, E), jnp.float32
        )
        router_logits = (x.astype(jnp.float32) @ router_kernel).astype(jnp.float32)  # [N, E]
        if attention_mask is not None:
            valid = attention_mask.reshape(N, 1).astype(jnp.bool_)
            # force padding tokens onto expert 0 with zero weight downstream
            router_logits_masked = jnp.where(valid, router_logits, -1e9)
        else:
            valid = jnp.ones((N, 1), dtype=jnp.bool_)
            router_logits_masked = router_logits

        probs = jax.nn.softmax(router_logits, axis=-1)

        if cfg.expert_choice_router:
            # Expert choice (Zhou et al. 2022; reference exposes the knob at
            # config.py:152-203): each expert picks its top-C tokens from the
            # [N, E] score matrix — perfectly balanced by construction, no
            # token-side top-k. C matches the token-choice capacity budget.
            capacity = int(max(self.capacity_factor * N * top_k / max(E, 1), 1))
            capacity = min(capacity, N)
            scores = jnp.where(valid, probs, 0.0)  # pads score 0
            g, idx = jax.lax.top_k(scores.T, capacity)  # [E, C] weights / token ids
            g = g * jnp.take(valid[:, 0].astype(g.dtype), idx)  # drop picked pads
            expert_in = jnp.take(x, idx.reshape(-1), axis=0).reshape(E, capacity, D)
            expert_out = self._expert_mlps(expert_in, E, D, F_hid, gated, act)
            contrib = (expert_out * g[:, :, None].astype(expert_out.dtype)).reshape(-1, D)
            out = jnp.zeros((N, D), contrib.dtype).at[idx.reshape(-1)].add(contrib)
            out = self._shared_and_bias(out, x, D, F_hid, num_shared, act, cfg)
            return out.reshape(B, S, D).astype(hidden_states.dtype), router_logits_masked

        top_w, top_e = jax.lax.top_k(probs, top_k)  # [N, k]
        if cfg.moe_normalize_expert_weights:
            top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        top_w = top_w * valid.astype(top_w.dtype)

        impl = getattr(cfg, "moe_impl", "dropless")
        if impl not in ("dropless", "capacity"):
            # "auto" (or a typo) reaching the layer means some construction
            # path skipped resolution — failing loudly beats silently
            # running the token-dropping capacity dispatch on a
            # dropless-trained checkpoint
            raise ValueError(
                f"moe_impl={impl!r} reached MoEMLP unresolved; expected "
                "'dropless' or 'capacity' (trainers resolve 'auto' per mesh)"
            )
        if impl == "dropless":
            # megablocks-dMoE semantics: the N*k (token, expert) assignments
            # are laid out expert-sorted with block-aligned group starts and
            # fed to the Pallas grouped matmul (ops/grouped_matmul.py;
            # jax.lax.ragged_dot off-TPU). Nothing is ever dropped;
            # zero-weight (pad) rows still flow through but contribute 0.
            from contrastors_tpu.ops.grouped_matmul import aligned_group_layout

            block_m = int(getattr(cfg, "moe_block_m", 128))
            flat_e = top_e.reshape(-1)  # [N*k]
            token_of = jnp.repeat(jnp.arange(N, dtype=jnp.int32), top_k)
            # gather dispatch: a [P] int scatter builds row->token, then one
            # row gather places the tokens — replaces the [P, D] float
            # scatter (TPU scatters serialize; round-3 dropless-gap work).
            # Sentinel N hits the appended zero row; its cotangent lands on
            # x_pad[N] and is discarded by the concat VJP.
            dest, group_sizes, P, src = aligned_group_layout(
                flat_e, E, block_m, src_of=token_of, sentinel=N
            )
            x_pad = jnp.concatenate([x.astype(self.dtype), jnp.zeros((1, D), self.dtype)], axis=0)
            xs = jnp.take(x_pad, src, axis=0)
            y = self._expert_mlps_grouped(xs, group_sizes, E, D, F_hid, gated, act, block_m)
            # gather each assignment's output row back and combine by weight
            y_assign = jnp.take(y, dest, axis=0).reshape(N, top_k, D)
            out = jnp.sum(y_assign * top_w[..., None].astype(y_assign.dtype), axis=1)
            out = self._shared_and_bias(out, x, D, F_hid, num_shared, act, cfg)
            return out.reshape(B, S, D).astype(hidden_states.dtype), router_logits_masked

        capacity = int(max(self.capacity_factor * N * top_k / max(E, 1), top_k))
        capacity = min(capacity, N)

        # position of each (token, k) assignment within its expert's queue
        onehot = jax.nn.one_hot(top_e, E, dtype=jnp.int32)  # [N, k, E]
        flat = onehot.reshape(N * top_k, E)
        pos = jnp.cumsum(flat, axis=0) - flat  # rank within expert
        pos = jnp.sum(pos * flat, axis=-1).reshape(N, top_k)
        in_cap = (pos < capacity) & valid

        # scatter/gather dispatch: an [E, C] token-index table replaces the
        # [N, E, C] one-hot dispatch einsums (measured 2.4x dense-MLP time;
        # this form is 2 gathers + 1 scatter-add of size E*C = O(N*k))
        flat_e = top_e.reshape(-1)
        flat_w = top_w.reshape(-1)
        flat_ok = in_cap.reshape(-1)
        token_of = jnp.repeat(jnp.arange(N, dtype=jnp.int32), top_k)
        safe_pos = jnp.where(flat_ok, pos.reshape(-1), capacity)  # OOB -> dropped
        idx = jnp.full((E, capacity), N, jnp.int32)  # sentinel = zero row of x_pad
        idx = idx.at[flat_e, safe_pos].set(
            jnp.where(flat_ok, token_of, N), mode="drop"
        )
        w_table = jnp.zeros((E, capacity), jnp.float32).at[flat_e, safe_pos].set(
            jnp.where(flat_ok, flat_w, 0.0).astype(jnp.float32), mode="drop"
        )

        x_pad = jnp.concatenate([x, jnp.zeros((1, D), x.dtype)], axis=0)
        expert_in = jnp.take(x_pad, idx.reshape(-1), axis=0).reshape(E, capacity, D)
        expert_out = self._expert_mlps(expert_in, E, D, F_hid, gated, act)
        contrib = (expert_out * w_table[:, :, None].astype(expert_out.dtype)).reshape(-1, D)
        out = (
            jnp.zeros((N + 1, D), contrib.dtype).at[idx.reshape(-1)].add(contrib)[:N]
        )
        out = self._shared_and_bias(out, x, D, F_hid, num_shared, act, cfg)
        return out.reshape(B, S, D).astype(hidden_states.dtype), router_logits_masked

    def _expert_weights(self, E, D, F_hid, gated):
        """Create the [E, ...] expert tensors once; both dispatch impls
        consume the same parameters, so checkpoints are interchangeable."""
        cfg = self.config

        def expert_param(name, shape):
            return self.param(
                name, nn.initializers.normal(stddev=cfg.initializer_range), shape, jnp.float32
            ).astype(self.dtype)

        if gated:
            return (
                expert_param("w_up", (E, D, F_hid)),
                expert_param("w_gate", (E, D, F_hid)),
                expert_param("w_down", (E, F_hid, D)),
            )
        return (
            expert_param("w_in", (E, D, F_hid)),
            None,
            expert_param("w_down", (E, F_hid, D)),
        )

    def _expert_mlps(self, expert_in, E, D, F_hid, gated, act):
        w_in, w_gate, w_down = self._expert_weights(E, D, F_hid, gated)
        if gated:
            h = jnp.einsum("ecd,edf->ecf", expert_in, w_in) * act(
                jnp.einsum("ecd,edf->ecf", expert_in, w_gate)
            )
        else:
            h = act(jnp.einsum("ecd,edf->ecf", expert_in, w_in))
        return jnp.einsum("ecf,efd->ecd", h, w_down)

    def _expert_mlps_grouped(self, xs, group_sizes, E, D, F_hid, gated, act, block_m):
        """Dropless expert MLPs over block-aligned expert-sorted rows
        ([P, D]) via grouped matmuls — the TPU-native form of megablocks'
        block-sparse expert compute (reference layers/block.py:192-216)."""
        from contrastors_tpu.ops.grouped_matmul import gmm

        w_in, w_gate, w_down = self._expert_weights(E, D, F_hid, gated)
        h = gmm(xs, w_in, group_sizes, block_m=block_m)
        if gated:
            h = h * act(gmm(xs, w_gate, group_sizes, block_m=block_m))
        else:
            h = act(h)
        return gmm(h, w_down, group_sizes, block_m=block_m)

    def _shared_and_bias(self, out, x, D, F_hid, num_shared, act, cfg):
        if num_shared > 0:
            shared_hid = F_hid * num_shared
            y = nn.Dense(shared_hid, use_bias=False, dtype=self.dtype, name="shared_up")(x)
            g = nn.Dense(shared_hid, use_bias=False, dtype=self.dtype, name="shared_gate")(x)
            shared = nn.Dense(D, use_bias=False, dtype=self.dtype, name="shared_down")(y * act(g))
            # megablocks shared_expert_weighted_sum: blend by assignment counts
            frac_shared = num_shared / cfg.moe_top_k
            out = shared * frac_shared + out * (1.0 - frac_shared)

        bias = self.param("bias", nn.initializers.zeros, (D,), jnp.float32)
        return out + bias.astype(out.dtype)
