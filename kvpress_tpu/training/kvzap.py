"""KVzap training subsystem (reference kvzap/data.py + kvzap/train.py).

TPU-native redesign:
- score extraction is a *collector press* run inside the jitted prefill (the
  reference registers forward hooks, kvzap/data.py:173-222): it computes
  KVzip+ scores = attn ÷ ‖h‖ × ‖Wo·V‖, amax over repeat-span queries and GQA
  groups, log-scaled, and returns (hidden, scores) through the press state.
- the surrogate trains with optax (AdamW + cosine LR + grad-norm clip, MSE),
  *vmapped over layers* — all per-layer MLPs train in one jitted step instead
  of the reference's per-layer skorch loops.
- the linear variant is a closed-form per-layer Ridge solve in jnp.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig
from ..presses.base import BasePress, LayerCtx


# --------------------------------------------------------------------------- #
# Data collection
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class KVzipScoreCollector(BasePress):
    """Collector press: computes KVzip+ targets during a repeat-prompt forward
    (reference KVzapDataCollector._forward_hook, kvzap/data.py:173-222).

    Spans are static (exact-length tracing): [start_prompt, end_prompt) is the
    original context, [start_rep, end_rep) the repeated copy."""

    start_prompt: int = 0
    end_prompt: int = 0
    start_rep: int = 0
    end_rep: int = 0

    needs_attn_probs = True

    def init_state(self, cfg: ModelConfig, batch: int, seq_len: int, dtype=None):
        L = cfg.num_layers
        n = self.end_prompt - self.start_prompt
        return {
            "X": jnp.zeros((L, n, cfg.hidden_size), jnp.float32),
            "y": jnp.zeros((L, n, cfg.num_kv_heads), jnp.float32),
        }

    def layer_compress(self, ctx: LayerCtx, keys, values, length, mask, state=None):
        cfg = ctx.cfg
        B, Hkv, S, D = keys.shape
        Hq = cfg.num_heads
        G = Hq // Hkv
        attn = ctx.attn_probs.astype(jnp.float32)            # (B, Hq, S, S)

        h_norm = jnp.linalg.norm(ctx.hidden.astype(jnp.float32), axis=-1)  # (B,S)
        scores = attn / h_norm[:, None, :, None]

        from ..models.llama import dequant_weight

        Wo = dequant_weight(ctx.layer_params, "wo", jnp.float32).reshape(
            Hq, D, cfg.hidden_size
        )
        v_rep = jnp.broadcast_to(
            values[:, :, None], (B, Hkv, G, S, D)
        ).reshape(B, Hq, S, D).astype(jnp.float32)
        WoV_norm = jnp.linalg.norm(
            jnp.einsum("hij,bhti->bhtj", Wo, v_rep), axis=-1
        )                                                     # (B, Hq, S)
        scores = scores * WoV_norm[:, :, None, :]

        sub = scores[
            :, :, self.start_rep : self.end_rep, self.start_prompt : self.end_prompt
        ].max(axis=2)                                         # (B, Hq, n)
        sub = sub.reshape(B, Hkv, G, -1).max(axis=2)          # (B, Hkv, n)
        y = jnp.log(sub)[0].T                                 # (n, Hkv)
        X = ctx.hidden[0, self.start_prompt : self.end_prompt].astype(jnp.float32)
        state = {"X": X, "y": y}
        return keys, values, length, mask, state


def repeat_prompt_tokenization(tokenizer, prompt: str):
    """Tokenize ``user: prompt + repeat instruction / assistant: prompt`` and
    locate the prompt and repeated-prompt token spans via offset mapping
    (reference kvzap/data.py:90-141)."""
    prompt = prompt.strip()
    messages = [
        {"role": "user", "content": prompt + "\n\nRepeat the previous context exactly."},
        {"role": "assistant", "content": prompt},
    ]
    text = tokenizer.apply_chat_template(messages, tokenize=False)
    enc = tokenizer(text, return_offsets_mapping=True)
    starts = [o[0] for o in enc["offset_mapping"]] + [len(text)]
    prefix, repeat, _ = text.split(prompt)

    def first_at_least(x):
        return next(i for i, s in enumerate(starts) if s >= x)

    start_prompt = first_at_least(len(prefix))
    end_prompt = first_at_least(len(prefix) + len(prompt))
    start_rep = first_at_least(len(prefix) + len(prompt) + len(repeat))
    end_rep = first_at_least(len(prefix) + 2 * len(prompt) + len(repeat))
    return enc["input_ids"], start_prompt, end_prompt, start_rep, end_rep


def collect_scores(runner, params, ids, spans, rng=None, n_tokens: Optional[int] = None):
    """One repeat-prompt forward with the collector press. Returns
    (X (L, n, E), y (L, n, Hkv)) with optional random token subsampling."""
    start_prompt, end_prompt, start_rep, end_rep = spans
    press = KVzipScoreCollector(
        start_prompt=start_prompt, end_prompt=end_prompt,
        start_rep=start_rep, end_rep=end_rep,
    )
    _, _, state = runner.prefill(
        params, ids, press=press, dtype=jnp.float32, compute_logits=False
    )
    X, y = state["X"], state["y"]
    if n_tokens is not None:
        rng = rng or np.random.default_rng(0)
        sel = rng.permutation(X.shape[1])[:n_tokens]
        X, y = X[:, sel], y[:, sel]
    return X, y


# --------------------------------------------------------------------------- #
# Surrogate training
# --------------------------------------------------------------------------- #


def init_mlp_surrogate(key, num_layers, input_dim, hidden_dim, output_dim):
    k1, k2 = jax.random.split(key)
    lim1 = (1.0 / input_dim) ** 0.5
    lim2 = (1.0 / hidden_dim) ** 0.5
    return {
        "w1": jax.random.uniform(
            k1, (num_layers, input_dim, hidden_dim), jnp.float32, -lim1, lim1
        ),
        "b1": jnp.zeros((num_layers, hidden_dim), jnp.float32),
        "w2": jax.random.uniform(
            k2, (num_layers, hidden_dim, output_dim), jnp.float32, -lim2, lim2
        ),
        "b2": jnp.zeros((num_layers, output_dim), jnp.float32),
    }


def train_mlp(
    X: jax.Array,                 # (N, L, E)
    y: jax.Array,                 # (N, L, Hkv)
    hidden_dim: int = 512,
    max_epochs: int = 10,
    lr: float = 1e-3,
    batch_size: int = 512,
    seed: int = 0,
    val_fraction: float = 0.05,
) -> tuple[dict, dict]:
    """AdamW + cosine LR + grad clip 1.0 MSE regression (reference
    train.py:28-84), all layers in one jitted step. Returns (surrogate,
    metrics)."""
    N, L, E = X.shape
    H = y.shape[2]
    key = jax.random.PRNGKey(seed)
    key, init_key, perm_key = jax.random.split(key, 3)
    surrogate = init_mlp_surrogate(init_key, L, E, hidden_dim, H)

    n_val = max(1, int(N * val_fraction))
    perm = jax.random.permutation(perm_key, N)
    Xs, ys = X[perm], y[perm]
    X_val, y_val = Xs[:n_val], ys[:n_val]
    X_tr, y_tr = Xs[n_val:], ys[n_val:]
    steps_per_epoch = max(1, len(X_tr) // batch_size)

    sched = optax.cosine_decay_schedule(lr, max_epochs * steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched),
    )
    opt_state = tx.init(surrogate)

    def predict(surrogate, xb):
        # xb (B, L, E) → (B, L, Hkv)
        z = jnp.einsum("ble,leh->blh", xb, surrogate["w1"]) + surrogate["b1"]
        z = jax.nn.gelu(z, approximate=False)
        return jnp.einsum("blh,lho->blo", z, surrogate["w2"]) + surrogate["b2"]

    def loss_fn(surrogate, xb, yb):
        return jnp.mean((predict(surrogate, xb) - yb) ** 2)

    @jax.jit
    def step(surrogate, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(surrogate, xb, yb)
        updates, opt_state = tx.update(grads, opt_state, surrogate)
        return optax.apply_updates(surrogate, updates), opt_state, loss

    history = []
    for epoch in range(max_epochs):
        key, ek = jax.random.split(key)
        order = jax.random.permutation(ek, len(X_tr))
        epoch_loss = 0.0
        for i in range(steps_per_epoch):
            idx = order[i * batch_size : (i + 1) * batch_size]
            surrogate, opt_state, loss = step(
                surrogate, opt_state, X_tr[idx], y_tr[idx]
            )
            epoch_loss += float(loss)
        val_loss = float(loss_fn(surrogate, X_val, y_val))
        history.append({"epoch": epoch, "train_loss": epoch_loss / steps_per_epoch,
                        "val_loss": val_loss})
    return surrogate, {"history": history}


def train_linear(X: jax.Array, y: jax.Array, alpha: float = 1.0) -> dict:
    """Closed-form per-layer Ridge with intercept (reference train.py:87-119),
    vmapped over layers."""
    Xf = jnp.asarray(X, jnp.float32)
    yf = jnp.asarray(y, jnp.float32)

    def solve(Xl, yl):
        mx = Xl.mean(axis=0)
        my = yl.mean(axis=0)
        Xc, yc = Xl - mx, yl - my
        G = Xc.T @ Xc + alpha * jnp.eye(Xl.shape[1])
        W = jnp.linalg.solve(G, Xc.T @ yc)         # (E, Hkv)
        b = my - mx @ W
        return W, b

    W, b = jax.vmap(solve, in_axes=(1, 1))(Xf, yf)  # (L, E, Hkv), (L, Hkv)
    return {"w": W, "b": b}
