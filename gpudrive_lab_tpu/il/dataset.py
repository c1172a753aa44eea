"""Expert dataset with frame stacking.

Mirror of the reference's ExpertDataset
(reference: gpudrive/integrations/il/dataloader.py:5-230): samples are
(stacked obs over ``rollout_len`` past frames, action at the last frame,
optional ``pred_len`` future actions), restricted to controlled agents that
are alive at the sample time; partner/road masks accompany each sample.
"""

from __future__ import annotations

import numpy as np


class ExpertDataset:
    def __init__(
        self,
        data: dict,
        rollout_len: int = 5,
        pred_len: int = 1,
        use_action_indices: bool = False,
    ):
        self.rollout_len = rollout_len
        self.pred_len = pred_len
        self.use_action_indices = use_action_indices

        obs = data["obs"]  # [T, W, A, D]
        T, W, A, D = obs.shape
        dead = data["dead_mask"]
        controlled = data["controlled_mask"]  # [W, A]

        # valid sample times: t in [rollout_len-1, T - pred_len], agent
        # controlled and alive at t (reference: dataloader.py:60-120);
        # inclusive upper bound: labels t..t+pred_len-1 must stay <= T-1
        samples = []
        for t in range(rollout_len - 1, T - pred_len + 1):
            alive = ~dead[t]
            m = alive & controlled
            ws, asq = np.nonzero(m)
            samples.extend((t, w, a) for w, a in zip(ws, asq))
        self.index = np.array(samples, np.int64)
        self.data = data
        self.frame_dim = D

    def __len__(self):
        return len(self.index)

    def batch(self, ids: np.ndarray):
        """Gather a batch: returns dict(obs [B, rollout_len*D],
        actions [B, pred_len, 3] or action_idx [B, pred_len],
        partner_mask [B, A-1], road_mask [B, K])."""
        t, w, a = self.index[ids].T
        rl, pl = self.rollout_len, self.pred_len
        offs = np.arange(-rl + 1, 1)
        obs = self.data["obs"][t[:, None] + offs, w[:, None], a[:, None]]
        obs = obs.reshape(len(ids), -1)
        fut = np.arange(pl)
        out = {
            "obs": obs,
            # partner mask semantics: nonzero = not a live partner
            "partner_mask": self.data["partner_mask"][t, w, a] != 0,
            "road_mask": self.data["road_mask"][t, w, a],
        }
        if self.use_action_indices and "action_idx" in self.data:
            out["action_idx"] = self.data["action_idx"][
                t[:, None] + fut, w[:, None], a[:, None]
            ]
        out["actions"] = self.data["actions"][
            t[:, None] + fut, w[:, None], a[:, None]
        ]
        return out

    def iter_batches(self, batch_size: int, rng: np.random.Generator,
                     shuffle: bool = True):
        order = (
            rng.permutation(len(self.index))
            if shuffle
            else np.arange(len(self.index))
        )
        for i in range(0, len(order) - batch_size + 1, batch_size):
            yield self.batch(order[i : i + batch_size])
