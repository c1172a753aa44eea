"""Official-VBD weight conversion: activation parity vs the reference torch
modules (loaded directly from the read-only reference checkout as the
oracle), plus checkpoint-file round-trip through the converter."""

import os
import shutil
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu.vbd.convert import (
    assert_tree_matches,
    convert_state_dict,
    load_vbd_checkpoint,
)
from gpudrive_lab_tpu.vbd.model_official import OfficialVBD, OfficialVBDConfig

REF = "/root/reference/gpudrive/integrations/vbd/model"

CFG = OfficialVBDConfig(
    future_len=20, agents_len=4, action_len=5, diffusion_steps=8,
    encoder_layers=2,
)


@pytest.fixture(scope="module")
def ref_modules(tmp_path_factory):
    """Import the reference torch modules as the parity oracle, without
    triggering the gpudrive package __init__ (which loads the C++ sim)."""
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not mounted")
    pkg = tmp_path_factory.mktemp("shim") / "vbd_ref"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    for f in ("modules.py", "model_utils.py"):
        shutil.copyfile(os.path.join(REF, f), pkg / f)
    sys.path.insert(0, str(pkg.parent))
    try:
        from vbd_ref import modules
    finally:
        sys.path.pop(0)
    return modules


def _inputs(rng):
    B, N, H = 2, CFG.agents_len, 11
    P, K, TL = 6, 10, 3
    hist = rng.normal(size=(B, N, H, 8)).astype(np.float32)
    hist[..., 2] *= 0.5  # heading-ish
    hist[0, -1] = 0.0  # padded agent: all-zero history
    interested = np.ones((B, N), np.int32)
    interested[0, -1] = 0
    poly = rng.normal(size=(B, P, K, 5)).astype(np.float32)
    poly[..., 3] = np.clip(poly[..., 3] * 2, 0, 7).astype(np.int32)
    poly[..., 4] = np.clip(np.abs(poly[..., 4]) * 8, 0, 20).astype(np.int32)
    poly[1, -1] = 0.0
    poly_valid = np.ones((B, P), bool)
    poly_valid[1, -1] = False
    tl = np.zeros((B, TL, 3), np.float32)
    tl[:, 0, :2] = rng.normal(size=(B, 2))
    tl[:, 0, 2] = 3
    S = N + P + TL
    relations = rng.normal(size=(B, S, S, 3)).astype(np.float32)
    anchors = rng.normal(size=(B, N, 5, 2)).astype(np.float32)
    return {
        "agents_history": hist,
        "agents_type": np.array([[1, 1, 2, 3]] * B, np.int64),
        "agents_interested": interested,
        "polylines": poly,
        "polylines_valid": poly_valid,
        "traffic_light_points": tl,
        "relations": relations,
        "anchors": anchors,
    }


@pytest.fixture(scope="module")
def parity(ref_modules):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    inputs = _inputs(rng)

    t_enc = ref_modules.Encoder(layers=CFG.encoder_layers).eval()
    t_den = ref_modules.Denoiser(
        future_len=CFG.future_len, action_len=CFG.action_len,
        agents_len=CFG.agents_len, steps=CFG.diffusion_steps,
    ).eval()
    t_pred = ref_modules.GoalPredictor(
        future_len=CFG.future_len, agents_len=CFG.agents_len,
        action_len=CFG.action_len,
    ).eval()

    sd = {}
    for prefix, mod in (
        ("encoder", t_enc), ("denoiser", t_den), ("predictor", t_pred)
    ):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v

    variables = convert_state_dict(sd, CFG)
    model = OfficialVBD(CFG, with_predictor=True)
    return model, variables, inputs, (t_enc, t_den, t_pred)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_param_tree_shapes_match(parity):
    model, variables, inputs, _ = parity
    noisy = jnp.zeros((2, CFG.agents_len, CFG.seq_len, 2))
    t = jnp.zeros((2, CFG.agents_len), jnp.int32)
    init = model.init(
        jax.random.PRNGKey(0),
        jax.tree.map(jnp.asarray, inputs), noisy, t,
    )
    assert_tree_matches(variables["params"], init["params"])


def test_encoder_activation_parity(parity):
    model, variables, inputs, (t_enc, _, _) = parity
    with torch.no_grad():
        want = t_enc({k: _t(v) for k, v in inputs.items()})["encodings"]
    got = model.apply(
        variables, jax.tree.map(jnp.asarray, inputs), method="encode"
    )["encodings"]
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3
    )


def test_denoiser_activation_parity(parity, monkeypatch):
    model, variables, inputs, (t_enc, t_den, _) = parity
    rng = np.random.default_rng(1)
    noisy = rng.normal(size=(2, CFG.agents_len, CFG.seq_len, 2)).astype(
        np.float32
    )
    step = np.array([[3] * CFG.agents_len] * 2, np.int64)
    # the reference roll_out jitters with randn_like at every call — zero it
    # on the torch side so both sides are deterministic
    monkeypatch.setattr(
        torch, "randn_like", lambda x, **kw: torch.zeros_like(x)
    )
    with torch.no_grad():
        enc_out = t_enc({k: _t(v) for k, v in inputs.items()})
        want = t_den(enc_out, _t(noisy), _t(step))
    enc_j = model.apply(
        variables, jax.tree.map(jnp.asarray, inputs), method="encode"
    )
    got = model.apply(
        variables, enc_j, jnp.asarray(noisy), jnp.asarray(step),
        method="denoise_raw",
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=5e-4, rtol=1e-3
    )


def test_predictor_activation_parity(parity):
    model, variables, inputs, (t_enc, _, t_pred) = parity
    with torch.no_grad():
        enc_out = t_enc({k: _t(v) for k, v in inputs.items()})
        want_actions, want_scores = t_pred(enc_out)
    enc_j = model.apply(
        variables, jax.tree.map(jnp.asarray, inputs), method="encode"
    )
    got_actions, got_scores = model.apply(
        variables, enc_j, method="predict_goal"
    )
    np.testing.assert_allclose(
        np.asarray(got_actions), want_actions.numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_scores), want_scores.numpy(), atol=5e-4, rtol=1e-3
    )


def test_checkpoint_file_roundtrip(parity, tmp_path):
    """A Lightning-style .ckpt written to disk loads through the one-call
    loader with config recovery."""
    _, variables, _, (t_enc, t_den, t_pred) = parity
    sd = {}
    for prefix, mod in (
        ("encoder", t_enc), ("denoiser", t_den), ("predictor", t_pred)
    ):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    ckpt = {
        "state_dict": sd,
        "hyper_parameters": {
            "cfg": {
                "future_len": CFG.future_len,
                "agents_len": CFG.agents_len,
                "action_len": CFG.action_len,
                "diffusion_steps": CFG.diffusion_steps,
                "encoder_layers": CFG.encoder_layers,
                "action_mean": [0.0, 0.0],
                "action_std": [1.0, 0.15],
            }
        },
    }
    path = tmp_path / "vbd.ckpt"
    torch.save(ckpt, path)
    model, loaded, cfg = load_vbd_checkpoint(str(path))
    assert cfg == CFG
    a = jax.tree_util.tree_leaves(loaded)
    b = jax.tree_util.tree_leaves(variables)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_batched_relations_match_reference():
    """batched_relations reproduces the reference's calculate_relations
    per world (oracle extracted from the read-only reference source)."""
    import ast

    src_path = "/root/reference/gpudrive/integrations/vbd/data_utils.py"
    if not os.path.exists(src_path):
        pytest.skip("reference checkout not mounted")
    tree = ast.parse(open(src_path).read())
    wanted = {"wrap_to_pi", "calculate_relations"}
    module = ast.Module(
        body=[n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name in wanted],
        type_ignores=[],
    )
    ns = {"np": np, "torch": torch}
    exec(compile(module, src_path, "exec"), ns)

    from gpudrive_lab_tpu.vbd.data_utils import batched_relations

    rng = np.random.default_rng(3)
    W, N, H, P, K, TL = 2, 3, 4, 5, 6, 2
    hist = rng.normal(size=(W, N, H, 8)).astype(np.float32)
    hist[0, -1] = 0.0  # padded agent
    poly = rng.normal(size=(W, P, K, 5)).astype(np.float32)
    poly[1, -1] = 0.0
    tl = np.zeros((W, TL, 3), np.float32)
    tl[:, 0, :2] = rng.normal(size=(W, 2))

    got = batched_relations(hist, poly, tl)
    for w in range(W):
        want = ns["calculate_relations"](hist[w], poly[w], tl[w])
        np.testing.assert_allclose(got[w], np.asarray(want), atol=1e-5)


def test_official_sampler_and_source(example_scene_paths):
    """Random-weight OfficialVBD drives the TrajectorySource protocol end to
    end: scene -> official inputs -> reverse diffusion -> [W, A, T, 5]
    global trajectories wired into env.set_vbd_trajectories."""
    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.dataset import SceneDataLoader
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.vbd.integration import OfficialVBDSource
    from gpudrive_lab_tpu.vbd.model import DDPMScheduler
    from gpudrive_lab_tpu.vbd.model_official import OfficialVBD

    cfg = OfficialVBDConfig(
        future_len=10, agents_len=4, action_len=5, diffusion_steps=3,
        encoder_layers=1,
    )
    model = OfficialVBD(cfg, with_predictor=False)

    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]), batch_size=1,
        dataset_size=1,
    )
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, collision_behavior="ignore"),
        data_loader=loader,
    )
    env.reset()

    from gpudrive_lab_tpu.vbd.data_utils import (
        VBDSampleConfig,
        official_inputs,
        process_scenario_data,
    )

    batch = process_scenario_data(
        env.scene, env.state, 0, VBDSampleConfig(max_agents=cfg.agents_len)
    )
    inputs = {k: jnp.asarray(v) for k, v in official_inputs(batch).items()}
    variables = model.init(
        jax.random.PRNGKey(0), inputs,
        jnp.zeros((1, cfg.agents_len, cfg.seq_len, 2)),
        jnp.zeros((1, cfg.agents_len), jnp.int32),
    )

    source = OfficialVBDSource(
        model, variables, cfg, scheduler=DDPMScheduler(cfg.diffusion_steps)
    )
    trajs = source(env.scene, env.state)
    W, A = np.asarray(env.state.pos).shape[:2]
    assert trajs.shape == (W, A, 91, 5)
    assert np.isfinite(np.asarray(trajs)).all()
    env.set_vbd_trajectories(source)
    assert env.vbd_trajectories.shape == (W, A, 91, 5)
