"""Linear probing of frozen BC features.

Mirror of the fork's probing suite (reference: baselines/il/linear_probing.py,
gpudrive/integrations/il/linear_probing/lp_model.py): train linear
classification heads on the frozen context of a trained BC policy to measure
what the representation encodes — future action bins, future-position grid
cells, etc.  Accuracy of a linear readout = probe score.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class ProbeConfig:
    lr: float = 1e-3
    epochs: int = 5
    batch_size: int = 256
    future_step: int = 1  # label horizon (steps ahead)
    pos_grid_cells: int = 9  # 3x3 future-position grid (GRID_CELL_COUNT)
    pos_grid_extent: float = 10.0  # meters covered by the grid


def position_grid_labels(
    rel_future_pos: np.ndarray, cells: int = 9, extent: float = 10.0
) -> np.ndarray:
    """Discretize ego-frame future displacement into a sqrt(cells) x
    sqrt(cells) grid (the reference's position-class labels,
    visualize constants GRID_CELL_COUNT=9)."""
    side = int(np.sqrt(cells))
    half = extent / 2
    ix = np.clip(
        ((rel_future_pos[..., 0] + half) / extent * side).astype(int), 0, side - 1
    )
    iy = np.clip(
        ((rel_future_pos[..., 1] + half) / extent * side).astype(int), 0, side - 1
    )
    return iy * side + ix


class LinearProbe:
    """A single linear classification head trained on frozen features
    (reference: lp_model.py LinearProbAction/LinearProbPosition)."""

    def __init__(self, context_dim: int, num_classes: int, config: ProbeConfig):
        self.config = config
        self.num_classes = num_classes
        key = jax.random.PRNGKey(0)
        scale = 1.0 / np.sqrt(context_dim)
        self.params = {
            "w": jax.random.normal(key, (context_dim, num_classes)) * scale,
            "b": jnp.zeros(num_classes),
        }
        self.tx = optax.adam(config.lr)
        self.opt_state = self.tx.init(self.params)

        def loss_fn(params, ctx, labels):
            logits = ctx @ params["w"] + params["b"]
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, acc

        @jax.jit
        def train_step(params, opt_state, ctx, labels):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, ctx, labels
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        self._train_step = train_step
        self._eval = jax.jit(loss_fn)

    def fit(self, contexts: np.ndarray, labels: np.ndarray,
            rng: np.random.Generator) -> Dict[str, float]:
        n = len(contexts)
        bs = self.config.batch_size
        for _ in range(self.config.epochs):
            order = rng.permutation(n)
            for i in range(0, n - bs + 1, bs):
                ids = order[i : i + bs]
                self.params, self.opt_state, loss, acc = self._train_step(
                    self.params, self.opt_state,
                    jnp.asarray(contexts[ids]), jnp.asarray(labels[ids]),
                )
        return self.evaluate(contexts, labels)

    def evaluate(self, contexts, labels) -> Dict[str, float]:
        loss, acc = self._eval(
            self.params, jnp.asarray(contexts), jnp.asarray(labels)
        )
        return {"loss": float(np.asarray(loss)), "accuracy": float(np.asarray(acc))}


def extract_contexts(model, variables, dataset, batch_size: int = 256):
    """Frozen-feature extraction over an ExpertDataset (the analogue of the
    reference's forward hooks, linear_probing.py:77-96)."""
    apply = jax.jit(
        lambda obs, pm, rm: model.apply(variables, obs, pm, rm)[0]
    )
    out = []
    ids_all = np.arange(len(dataset))
    for i in range(0, len(dataset), batch_size):
        b = dataset.batch(ids_all[i : i + batch_size])
        ctx = apply(
            jnp.asarray(b["obs"]),
            jnp.asarray(b["partner_mask"]),
            jnp.asarray(b["road_mask"]),
        )
        out.append(np.asarray(ctx))
    return np.concatenate(out, axis=0)


def probe_action_and_position(
    model, variables, dataset, action_idx: np.ndarray,
    config: ProbeConfig | None = None,
) -> Dict[str, Dict[str, float]]:
    """Run the two standard probes (future action class + future position
    cell) on frozen features; returns per-probe metrics."""
    config = config or ProbeConfig()
    rng = np.random.default_rng(0)
    contexts = extract_contexts(model, variables, dataset)

    t, w, a = dataset.index.T
    fs = config.future_step
    T = dataset.data["obs"].shape[0]
    t_fut = np.clip(t + fs, 0, T - 1)
    results = {}

    act_labels = dataset.data["action_idx"][t_fut, w, a]
    probe = LinearProbe(contexts.shape[1], int(act_labels.max()) + 1, config)
    results["future_action"] = probe.fit(contexts, act_labels, rng)

    # ego-frame future displacement -> grid cell
    # (uses logged positions from the generation data)
    obs = dataset.data["obs"]
    pos_now = dataset.data.get("positions")
    if pos_now is None:
        # derive displacement from actions when positions unavailable
        rel = dataset.data["actions"][t_fut, w, a][:, :2]
    else:
        rel = pos_now[t_fut, w, a] - pos_now[t, w, a]
    pos_labels = position_grid_labels(
        rel, config.pos_grid_cells, config.pos_grid_extent
    )
    probe_p = LinearProbe(contexts.shape[1], config.pos_grid_cells, config)
    results["future_position"] = probe_p.fit(contexts, pos_labels, rng)
    return results
