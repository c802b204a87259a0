"""Trust & Safety training recipe: k-fold, LR schedules, class weighting,
and in-training rescoring.

≡ ``trust_and_safety_models/toxicity/train.py:39-355`` — the reference
trainer drives a stratified k-fold loop over the labeled pool, builds an LR
schedule per run (``optim/schedulers.py``), weights the loss by class
imbalance (``optim/losses.py``), periodically **rescores** the training
pool with the in-training model to re-weight hard/mislabeled examples, and
reports per-fold + out-of-fold AUC (``optim/callbacks.py``).

TPU shape: the whole epoch runs as jitted steps over fixed-size batches;
the rescoring pass is one batched forward over the fold's training pool;
fold orchestration is host-side Python around compiled programs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from the_algorithm_tpu.training import metrics as tmetrics


@dataclasses.dataclass(frozen=True)
class RecipeConfig:
    """≡ the argparse surface of ``toxicity/train.py`` (subset that affects
    optimization; data plumbing is the caller's)."""

    folds: int = 5
    epochs: int = 3
    batch_size: int = 64
    learning_rate: float = 1e-3
    schedule: str = "cosine"  # "cosine" | "warmup_linear" | "constant"
    warmup_frac: float = 0.1
    weight_decay: float = 1e-4
    class_weighted: bool = True  # pos-weight BCE by per-head imbalance
    # in-training rescoring: after each epoch, re-weight the pool by the
    # current model's error on it (hard positives get up-weighted)
    rescore: bool = True
    rescore_gamma: float = 2.0
    seed: int = 0


def make_schedule(cfg: RecipeConfig, total_steps: int):
    """≡ ``optim/schedulers.py`` — the per-run LR schedule."""
    warmup = max(int(total_steps * cfg.warmup_frac), 1)
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=warmup, decay_steps=max(total_steps, warmup + 1),
        )
    if cfg.schedule == "warmup_linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, warmup),
                optax.linear_schedule(
                    cfg.learning_rate, 0.0, max(total_steps - warmup, 1)),
            ],
            [warmup],
        )
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def class_pos_weights(labels: np.ndarray) -> np.ndarray:
    """[H] positive-class weights = neg/pos ratio per head, clipped —
    ≡ the class-imbalance weighting of ``optim/losses.py``."""
    labels = np.asarray(labels, np.float32)
    pos = labels.sum(axis=0)
    neg = labels.shape[0] - pos
    return np.clip(neg / np.maximum(pos, 1.0), 1.0, 100.0).astype(np.float32)


def weighted_bce(
    logits: jnp.ndarray,  # [B, H]
    labels: jnp.ndarray,  # [B, H]
    pos_weight: jnp.ndarray,  # [H]
    sample_weight: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Per-head pos-weighted sigmoid cross entropy × per-example weights."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per = -(labels * log_p * pos_weight[None, :] + (1.0 - labels) * log_not_p)
    return jnp.mean(per * sample_weight[:, None])


def kfold_indices(
    n: int, folds: int, seed: int, stratify: Optional[np.ndarray] = None
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Stratified k-fold split (stratify on the first head's label when
    given, like the reference's StratifiedKFold over toxic labels)."""
    rng = np.random.default_rng(seed)
    order = np.arange(n)
    if stratify is not None:
        # shuffle within class then interleave so every fold sees the
        # class ratio
        strat = np.asarray(stratify).astype(np.int32)
        parts = [rng.permutation(order[strat == v]) for v in np.unique(strat)]
        order = np.concatenate([
            np.concatenate([p[i::folds] for p in parts])
            for i in range(folds)
        ])
        bounds = np.cumsum([
            sum(len(p[i::folds]) for p in parts) for i in range(folds)
        ])
        chunks = np.split(order, bounds[:-1])
    else:
        order = rng.permutation(order)
        chunks = np.array_split(order, folds)
    out = []
    for i in range(folds):
        val = chunks[i]
        train = np.concatenate([c for j, c in enumerate(chunks) if j != i])
        out.append((train, val))
    return out


@dataclasses.dataclass
class FoldResult:
    auc_per_head: np.ndarray  # [H]
    params: Dict


@dataclasses.dataclass
class RecipeResult:
    folds: List[FoldResult]
    oof_auc_per_head: np.ndarray  # [H] out-of-fold AUC
    head_names: Sequence[str]

    @property
    def mean_auc(self) -> float:
        return float(np.mean([f.auc_per_head for f in self.folds]))


def _pad_batch(arrs, start, bs):
    """Slice [start:start+bs], wrapping — fixed shapes for one compile."""
    n = arrs[0].shape[0]
    idx = (np.arange(start, start + bs)) % n
    return [a[idx] for a in arrs], idx


def train_kfold(
    model,
    tokens: np.ndarray,  # [N, L] int32
    mask: np.ndarray,  # [N, L] float32
    labels: np.ndarray,  # [N, H]
    cfg: RecipeConfig = RecipeConfig(),
) -> RecipeResult:
    """The full recipe: per fold — schedule, class weights, epochs of jitted
    steps, optional per-epoch rescoring — then out-of-fold AUC.

    ≡ the main loop of ``toxicity/train.py:39-355``.
    """
    tokens = np.asarray(tokens)
    mask = np.asarray(mask, np.float32)
    labels = np.asarray(labels, np.float32)
    n, H = labels.shape
    head_names = getattr(model, "heads", tuple(f"h{i}" for i in range(H)))

    splits = kfold_indices(n, cfg.folds, cfg.seed, stratify=labels[:, 0])
    oof_scores = np.zeros((n, H), np.float32)
    fold_results: List[FoldResult] = []

    @jax.jit
    def forward(params, tok, msk):
        return model.apply(params, tok, msk)

    for fold, (tr, va) in enumerate(splits):
        rng = jax.random.PRNGKey(cfg.seed * 1000 + fold)
        params = model.init(
            rng, jnp.asarray(tokens[:1]), jnp.asarray(mask[:1]))
        steps_per_epoch = max(len(tr) // cfg.batch_size, 1)
        total = steps_per_epoch * cfg.epochs
        sched = make_schedule(cfg, total)
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
        opt_state = tx.init(params)
        pos_w = jnp.asarray(
            class_pos_weights(labels[tr]) if cfg.class_weighted
            else np.ones(H, np.float32))

        @jax.jit
        def step(params, opt_state, tok, msk, y, w):
            loss, grads = jax.value_and_grad(
                lambda p: weighted_bce(
                    model.apply(p, tok, msk), y, pos_w, w)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        sample_w = np.ones(len(tr), np.float32)
        perm = np.random.default_rng(cfg.seed + fold).permutation(len(tr))
        for epoch in range(cfg.epochs):
            for s in range(steps_per_epoch):
                (tok_b, msk_b, y_b, w_b), _ = _pad_batch(
                    [tokens[tr][perm], mask[tr][perm], labels[tr][perm],
                     sample_w[perm]],
                    s * cfg.batch_size, cfg.batch_size,
                )
                params, opt_state, _ = step(
                    params, opt_state, jnp.asarray(tok_b),
                    jnp.asarray(msk_b), jnp.asarray(y_b), jnp.asarray(w_b))
            if cfg.rescore and epoch + 1 < cfg.epochs:
                # in-training rescoring: one forward over the fold's pool;
                # examples the current model gets wrong are up-weighted
                # (the reference refreshes its sample weights from fresh
                # model scores mid-training)
                probs = np.asarray(jax.nn.sigmoid(forward(
                    params, jnp.asarray(tokens[tr]), jnp.asarray(mask[tr]))))
                err = np.abs(labels[tr] - probs).mean(axis=1)
                sample_w = (1.0 + cfg.rescore_gamma * err).astype(np.float32)

        va_probs = np.asarray(jax.nn.sigmoid(forward(
            params, jnp.asarray(tokens[va]), jnp.asarray(mask[va]))))
        oof_scores[va] = va_probs
        aucs = np.asarray([
            float(tmetrics.auc(jnp.asarray(va_probs[:, h]),
                               jnp.asarray(labels[va][:, h])))
            for h in range(H)
        ])
        fold_results.append(FoldResult(auc_per_head=aucs, params=params))

    oof_auc = np.asarray([
        float(tmetrics.auc(jnp.asarray(oof_scores[:, h]),
                           jnp.asarray(labels[:, h])))
        for h in range(H)
    ])
    return RecipeResult(
        folds=fold_results, oof_auc_per_head=oof_auc, head_names=head_names)
