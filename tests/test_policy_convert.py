"""Pretrained-policy weight conversion: activation parity of the flax
LateFusionPolicy against the reference's own ``NeuralNet`` forward code
(loaded directly from the read-only reference checkout as the oracle, with
its heavyweight deps stubbed), plus file round-trips through the converter.

reference: gpudrive/networks/late_fusion.py:69-248.
"""

import os
import shutil
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from gpudrive_lab_tpu.networks.convert import (
    config_from_state_dict,
    convert_state_dict,
    load_policy_state_dict,
    load_pretrained,
)

REF = "/root/reference/gpudrive/networks/late_fusion.py"


@pytest.fixture(scope="module")
def ref_neuralnet(tmp_path_factory):
    """Import the reference NeuralNet as the parity oracle.  Its module
    pulls in pufferlib / madrona_gpudrive / gpudrive.env.constants / box —
    none of which are importable here — so those are stubbed with the exact
    constants the reference binds (src/consts.hpp, env/constants.py)."""
    if not os.path.exists(REF):
        pytest.skip("reference checkout not mounted")

    stubs = {}

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        stubs[name] = mod

    stub("madrona_gpudrive", kMaxAgentMapObservationsCount=200)
    puffer = types.ModuleType("pufferlib")
    puffer_pt = types.ModuleType("pufferlib.pytorch")
    puffer_pt.layer_init = lambda layer, std=np.sqrt(2), bias_const=0.0: layer
    puffer_models = types.ModuleType("pufferlib.models")
    puffer.pytorch = puffer_pt
    puffer.models = puffer_models
    stubs["pufferlib"] = puffer
    stubs["pufferlib.pytorch"] = puffer_pt
    stubs["pufferlib.models"] = puffer_models

    class _Box(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:  # pragma: no cover
                raise AttributeError(k) from e

    stub("box", Box=_Box)
    gpudrive_pkg = types.ModuleType("gpudrive")
    gpudrive_env = types.ModuleType("gpudrive.env")
    gpudrive_consts = types.ModuleType("gpudrive.env.constants")
    gpudrive_consts.EGO_FEAT_DIM = 6
    gpudrive_consts.PARTNER_FEAT_DIM = 6
    gpudrive_consts.ROAD_GRAPH_FEAT_DIM = 13
    gpudrive_pkg.env = gpudrive_env
    gpudrive_env.constants = gpudrive_consts
    stubs["gpudrive"] = gpudrive_pkg
    stubs["gpudrive.env"] = gpudrive_env
    stubs["gpudrive.env.constants"] = gpudrive_consts

    pkg = tmp_path_factory.mktemp("shim") / "ref_nets"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    shutil.copyfile(REF, pkg / "late_fusion.py")

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, str(pkg.parent))
    try:
        from ref_nets import late_fusion as ref_mod
    finally:
        sys.path.pop(0)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ref_mod


def _make_ref_model(ref_neuralnet, seed=0, action_dim=91):
    torch.manual_seed(seed)
    model = ref_neuralnet.NeuralNet(
        action_dim=action_dim, config={"vbd_in_obs": False}
    )
    model.eval()
    return model


def test_activation_parity(ref_neuralnet):
    model = _make_ref_model(ref_neuralnet)
    sd = {k: v for k, v in model.state_dict().items()}
    variables = convert_state_dict(sd)
    config = config_from_state_dict(sd)
    assert config.action_dim == 91 and config.obs_dim == 3368

    from gpudrive_lab_tpu.networks.late_fusion import LateFusionPolicy

    policy = LateFusionPolicy(config)
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(17, config.obs_dim)).astype(np.float32)

    with torch.no_grad():
        t_obs = torch.from_numpy(obs)
        hidden = model.encode_observations(t_obs)
        t_logits = model.actor(hidden).numpy()
        t_value = model.critic(hidden).numpy()[:, 0]

    j_logits, j_value = policy.apply(variables, obs)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_value), t_value, atol=2e-5)


def test_deterministic_action_parity(ref_neuralnet):
    """End-to-end: the converted policy picks the same argmax actions."""
    model = _make_ref_model(ref_neuralnet, seed=1)
    variables = convert_state_dict(model.state_dict())
    config = config_from_state_dict(model.state_dict())

    from gpudrive_lab_tpu.networks.late_fusion import (
        LateFusionPolicy,
        sample_logits,
    )

    policy = LateFusionPolicy(config)
    rng = np.random.default_rng(1)
    obs = rng.normal(size=(31, config.obs_dim)).astype(np.float32)
    with torch.no_grad():
        t_action, _, _, _ = model(torch.from_numpy(obs), deterministic=True)
    logits, _ = policy.apply(variables, obs)
    j_action, _, _ = sample_logits(
        jax.random.PRNGKey(0), logits, deterministic=True
    )
    np.testing.assert_array_equal(np.asarray(j_action), t_action.numpy())


def test_file_roundtrip(ref_neuralnet, tmp_path):
    """load_pretrained reads both torch blobs and safetensors files."""
    model = _make_ref_model(ref_neuralnet, seed=2)
    pt = tmp_path / "model.pt"
    torch.save(model.state_dict(), pt)
    policy, variables, config = load_pretrained(str(pt))
    assert config.action_dim == 91

    from safetensors.numpy import save_file

    st_dir = tmp_path / "hub_layout"
    st_dir.mkdir()
    save_file(
        {k: v.numpy() for k, v in model.state_dict().items()},
        st_dir / "model.safetensors",
    )
    policy2, variables2, config2 = load_pretrained(str(st_dir))
    a = jax.tree.leaves(variables)
    b = jax.tree.leaves(variables2)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_rejects_vbd_policies(ref_neuralnet):
    sd = _make_ref_model(ref_neuralnet, seed=3).state_dict()
    sd = dict(sd)
    sd["vbd_embed.0.weight"] = torch.zeros(64, 455)
    with pytest.raises(NotImplementedError):
        convert_state_dict(sd)


def test_loader_reads_state_dict_wrapper(ref_neuralnet, tmp_path):
    model = _make_ref_model(ref_neuralnet, seed=4)
    path = tmp_path / "ckpt.pt"
    torch.save({"state_dict": model.state_dict()}, path)
    sd = load_policy_state_dict(str(path))
    assert "actor.weight" in sd
