"""Distillation losses and student-initialization utilities.

Counterpart of the reference DistillTrainer's four loss modes and
teacher->student weight transfer (reference: trainers/distill.py:20-93,
284-430; mode validation config.py:79-84):

  mse    - MSE between normalized student/teacher embeddings, both towers;
  kd     - KL(student softmax sim || teacher softmax sim) * world * 1000
           + InfoNCE(student) at temperature 0.02;
  towers - mean of 4 InfoNCE terms: s_q->s_d, s_q->t_q, s_d->t_d, s_q->t_d;
  stella - 10*(1-cos) per tower + 200*MSE of intra-tower similarity
           matrices + 20*hinge on pairwise score-difference signs.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from contrastors_tpu.losses import clip_loss


def _norm(x):
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _infonce(q, d, temperature, axis_name=None):
    loss, _ = clip_loss(q, d, lambda x: x / temperature, axis_name=axis_name)
    return loss


def score_diff(vectors: jnp.ndarray) -> jnp.ndarray:
    """Differences between all upper-triangular pairwise similarity scores
    (reference distill.py:302-307)."""
    n = vectors.shape[0]
    scores = vectors @ vectors.T
    iu = jnp.triu_indices(n, k=1)
    s = scores[iu]
    m = s.shape[0]
    diff = s[None, :] - s[:, None]
    iu2 = jnp.triu_indices(m, k=1)
    return diff[iu2]


def distill_loss(
    loss_fn: str,
    student_q: jnp.ndarray,
    student_d: jnp.ndarray,
    teacher_q: jnp.ndarray,
    teacher_d: jnp.ndarray,
    temperature: float = 1.0,
    axis_name=None,
) -> Dict[str, jnp.ndarray]:
    sq, sd = _norm(student_q), _norm(student_d)
    tq, td = _norm(teacher_q), _norm(teacher_d)

    if loss_fn == "mse":
        q_mse = jnp.mean((sq - tq) ** 2)
        d_mse = jnp.mean((sd - td) ** 2)
        return {"loss": q_mse + d_mse, "query_mse": q_mse, "document_mse": d_mse}

    if loss_fn == "kd":
        t_sim = (tq @ td.T) / temperature
        s_sim = (sq @ sd.T) / temperature
        s_logp = jax.nn.log_softmax(s_sim, axis=-1)
        t_p = jax.nn.softmax(t_sim, axis=-1)
        kd = jnp.sum(t_p * (jnp.log(jnp.maximum(t_p, 1e-12)) - s_logp)) / s_sim.shape[0]
        infonce = _infonce(sq, sd, 0.02, axis_name)
        return {"loss": 1000.0 * kd + infonce, "kd_loss": kd, "infonce_loss": infonce}

    if loss_fn == "towers":
        l1 = _infonce(sq, sd, temperature, axis_name)
        l2 = _infonce(sq, tq, temperature, axis_name)
        l3 = _infonce(sd, td, temperature, axis_name)
        l4 = _infonce(sq, td, temperature, axis_name)
        return {
            "loss": (l1 + l2 + l3 + l4) / 4,
            "loss_infonce_student": l1,
            "loss_teacher_query": l2,
            "loss_teacher_document": l3,
            "loss_infonce_teacher": l4,
        }

    if loss_fn == "stella":
        cos_q = (1 - jnp.mean(jnp.sum(sq * tq, axis=1))) * 10
        cos_d = (1 - jnp.mean(jnp.sum(sd * td, axis=1))) * 10
        sim_q = jnp.mean((sq @ sq.T - tq @ tq.T) ** 2) * 200
        sim_d = jnp.mean((sd @ sd.T - td @ td.T) ** 2) * 200
        lbl_q = jnp.where(score_diff(tq) < 0, 1.0, -1.0)
        trip_q = jnp.mean(jax.nn.relu(score_diff(sq) * lbl_q + 0.015)) * 20
        lbl_d = jnp.where(score_diff(td) < 0, 1.0, -1.0)
        trip_d = jnp.mean(jax.nn.relu(score_diff(sd) * lbl_d + 0.015)) * 20
        return {
            "loss": cos_q + cos_d + sim_q + sim_d + trip_q + trip_d,
            "cos_loss_query": cos_q,
            "cos_loss_document": cos_d,
            "sim_loss_query": sim_q,
            "sim_loss_document": sim_d,
            "triplet_loss": trip_q + trip_d,
        }

    raise ValueError(f"unknown distill loss {loss_fn!r}")


# ---------------------------------------------------------------------------
# student initialization from a teacher
# ---------------------------------------------------------------------------


def uniform_element_selection(wt: np.ndarray, s_shape: Tuple[int, ...]) -> np.ndarray:
    """Evenly subsample teacher weights along every dimension
    (reference distill.py:20-33)."""
    assert wt.ndim == len(s_shape)
    ws = wt
    for dim in range(wt.ndim):
        assert wt.shape[dim] >= s_shape[dim], "student dim exceeds teacher dim"
        if wt.shape[dim] % s_shape[dim] == 0:
            step = wt.shape[dim] // s_shape[dim]
            idx = np.arange(s_shape[dim]) * step
        else:
            idx = np.round(np.linspace(0, wt.shape[dim] - 1, s_shape[dim])).astype(np.int64)
        ws = np.take(ws, idx, axis=dim)
    assert ws.shape == tuple(s_shape)
    return ws


def init_student_from_teacher(student_params, teacher_params, layer_stride: int = 2):
    """Overlay teacher weights onto a smaller student pytree: layers_{i}
    maps to teacher layers_{i*stride}; mismatched shapes use uniform element
    selection (reference distill.py:35-93 transfer_weights)."""
    import re

    def walk(s_node, t_root, path):
        out = {}
        for k, v in s_node.items():
            m = re.fullmatch(r"layers_(\d+)", k)
            t_key = f"layers_{int(m.group(1)) * layer_stride}" if m else k
            t_node = t_root.get(t_key) if isinstance(t_root, dict) else None
            if isinstance(v, dict):
                out[k] = walk(v, t_node or {}, path + "/" + k)
            else:
                if t_node is None:
                    out[k] = v
                else:
                    t_arr = np.asarray(t_node)
                    if t_arr.shape == v.shape:
                        out[k] = jnp.asarray(t_arr, dtype=v.dtype)
                    else:
                        out[k] = jnp.asarray(
                            uniform_element_selection(t_arr, v.shape), dtype=v.dtype
                        )
        return out

    s = student_params["params"] if "params" in student_params else student_params
    t = teacher_params["params"] if "params" in teacher_params else teacher_params
    return {"params": walk(s, t, "")}
