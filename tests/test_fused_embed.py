"""Fused embed+pool Pallas kernel contracts (networks/fused_embed.py).

The kernel replaces the flax Linear->LayerNorm->act->Linear->max stack of
the late-fusion policy's partner/road branches (reference:
gpudrive/networks/late_fusion.py:117-144) with a VMEM-resident pipeline.
CPU CI runs it in pallas interpret mode — same program, same contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpudrive_lab_tpu.networks.fused_embed import (
    fused_embed_pool,
    reference_embed_pool,
)
from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy,
    PolicyConfig,
)


def _params(key, F, H):
    ks = jax.random.split(key, 6)
    return (
        jax.random.normal(ks[0], (F, H)) * 0.3,
        jax.random.normal(ks[1], (H,)) * 0.1,
        1.0 + 0.1 * jax.random.normal(ks[2], (H,)),
        0.1 * jax.random.normal(ks[3], (H,)),
        jax.random.normal(ks[4], (H,  H)) * 0.2,
        jax.random.normal(ks[5], (H,)) * 0.1,
    )


@pytest.mark.parametrize("B,E,F", [
    (48, 37, 13),    # unaligned B, remainder entity chunk
    (128, 127, 6),   # the partner shape
    (256, 200, 13),  # the road shape
])
@pytest.mark.parametrize("act", ["tanh", "gelu"])
def test_fwd_matches_oracle(B, E, F, act):
    H = 64
    p = _params(jax.random.PRNGKey(1), F, H)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, E, F))
    out = fused_embed_pool(x, *p, (act, "float32"))
    ref = reference_embed_pool(x, *p, act=act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act", ["tanh", "gelu"])
def test_param_grads_match_oracle(act):
    B, E, F, H = 40, 23, 13, 64
    p = _params(jax.random.PRNGKey(3), F, H)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, E, F))
    co = jax.random.normal(jax.random.PRNGKey(5), (B, H))

    gf = jax.grad(
        lambda *a: (fused_embed_pool(x, *a, (act, "float32")) * co).sum(),
        argnums=tuple(range(6)))(*p)
    gr = jax.grad(
        lambda *a: (reference_embed_pool(x, *a, act=act) * co).sum(),
        argnums=tuple(range(6)))(*p)
    for name, a, b in zip(("w1", "b1", "g", "be", "w2", "b2"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_dx_is_zero_by_design():
    B, E, F = 8, 5, 6
    p = _params(jax.random.PRNGKey(6), F, 64)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, E, F))
    dx = jax.grad(
        lambda x: fused_embed_pool(x, *p, ("tanh", "float32")).sum())(x)
    assert float(jnp.abs(dx).max()) == 0.0


def test_policy_fused_embed_parity():
    """fused_embed=True: same param tree (names + values) and the same
    logits/value/param-grads to f32 rounding as the unfused module."""
    D = PolicyConfig().obs_dim
    x = jax.random.normal(jax.random.PRNGKey(1), (8, D))
    p0 = LateFusionPolicy(PolicyConfig())
    p1 = LateFusionPolicy(PolicyConfig(fused_embed=True))
    v0 = p0.init(jax.random.PRNGKey(0), jnp.zeros((1, D)))
    v1 = p1.init(jax.random.PRNGKey(0), jnp.zeros((1, D)))
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    assert all(np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(v0), jax.tree.leaves(v1)))

    l0, val0 = p0.apply(v0, x)
    l1, val1 = p1.apply(v0, x)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(val0), np.asarray(val1),
                               rtol=1e-5, atol=1e-5)

    def loss(p, v):
        l, val = p.apply(v, x)
        return (l ** 2).sum() + (val ** 2).sum()

    g0 = jax.grad(lambda v: loss(p0, v))(v0)
    g1 = jax.grad(lambda v: loss(p1, v))(v0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_ppo_train_iteration_fused_matches_unfused(example_scene_paths):
    """One full PPO train iteration with fused_embed on/off matches to
    fp-reduction tolerance (split bf16 store, the production pairing)."""
    import os

    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.dataset import SceneDataLoader
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.ppo.ppo import PPOConfig
    from gpudrive_lab_tpu.ppo.train import build_trainer

    cfg = EnvConfig(
        num_worlds=2, reward_type="weighted_combination",
        collision_weight=-0.75, off_road_weight=-0.75,
        dynamics_model="classic", collision_behavior="ignore",
    )
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]), batch_size=2,
        dataset_size=4,
    )
    env = GPUDriveTPUEnv(cfg, data_loader=loader)
    n_ctrl = int(np.asarray(env.scene.agents.controlled).sum())
    cap = ((n_ctrl + 1) // 2) * 2
    outs = {}
    for fused in (False, True):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env,
            PPOConfig(rollout_len=8, num_minibatches=2, update_epochs=2,
                      remat_obs=False, obs_store="split", compact=cap,
                      compact_mode="flat", fused_embed=fused),
            seed=13,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh,
            env.reward_weights,
        )
        outs[fused] = (
            jax.tree.map(np.asarray, variables),
            {k: float(np.asarray(v)) for k, v in metrics.items()},
        )
    for k, v in outs[True][1].items():
        assert np.isclose(v, outs[False][1][k], rtol=5e-4, atol=1e-5), (
            k, v, outs[False][1][k]
        )
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))),
        outs[True][0], outs[False][0],
    )
    assert max(jax.tree.leaves(deltas)) < 5e-5, deltas
