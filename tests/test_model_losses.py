"""Decoder and loss parity tests (torch-CPU golden where available)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shine_mapping_tpu.models import decoder
from shine_mapping_tpu.train import losses, optimizer


def test_decoder_forward_matches_manual_mlp():
    key = jax.random.PRNGKey(0)
    params = decoder.init_decoder_params(key, feature_dim=8, hidden_dim=32, mlp_level=2)
    x = np.random.default_rng(0).standard_normal((16, 8)).astype(np.float32)
    out = np.asarray(decoder.sdf(params, jnp.asarray(x)))
    # manual numpy MLP
    h = x
    for i in range(2):
        h = np.maximum(h @ np.asarray(params[f"w{i}"]) + np.asarray(params[f"b{i}"]), 0)
    ref = (h @ np.asarray(params["w_out"]) + np.asarray(params["b_out"]))[:, 0]
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert out.shape == (16,)


def test_decoder_matches_torch_reference_mlp():
    """Reproduce the reference Decoder (model/decoder.py:49-63) in torch and
    check our jax forward gives identical outputs with identical weights."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    lin0 = torch.nn.Linear(8, 32)
    lin1 = torch.nn.Linear(32, 32)
    lout = torch.nn.Linear(32, 1)
    nclass = torch.nn.Linear(32, 21)
    state = {
        "layers.0.weight": lin0.weight,
        "layers.0.bias": lin0.bias,
        "layers.1.weight": lin1.weight,
        "layers.1.bias": lin1.bias,
        "lout.weight": lout.weight,
        "lout.bias": lout.bias,
        "nclass_out.weight": nclass.weight,
        "nclass_out.bias": nclass.bias,
    }
    state = {k: v.detach().numpy() for k, v in state.items()}
    params = decoder.params_from_torch_state_dict(state)
    x = torch.randn(64, 8)
    with torch.no_grad():
        h = torch.relu(lin1(torch.relu(lin0(x))))
        ref_sdf = lout(h).squeeze(1).numpy()
        ref_sem = torch.log_softmax(nclass(h), dim=1).numpy()
    ours_sdf = np.asarray(decoder.sdf(params, jnp.asarray(x.numpy())))
    ours_sem = np.asarray(decoder.sem_label_prob(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(ours_sdf, ref_sdf, atol=1e-5)
    np.testing.assert_allclose(ours_sem, ref_sem, atol=1e-5)


def test_time_conditioned_sdf_shape():
    key = jax.random.PRNGKey(1)
    params = decoder.init_decoder_params(
        key, feature_dim=8, time_conditioned=True
    )
    f = jnp.ones((4, 8))
    ts = jnp.arange(4.0)
    out = decoder.time_conditioned_sdf(params, f, ts)
    assert out.shape == (4,)


def test_sdf_bce_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    pred = rng.standard_normal(128).astype(np.float32)
    label = rng.standard_normal(128).astype(np.float32) * 0.1
    weight = np.abs(rng.standard_normal(128).astype(np.float32))
    sigma = 0.05
    for weighted in (False, True):
        for red in ("mean", "sum"):
            tl = torch.nn.BCEWithLogitsLoss(
                reduction=red,
                weight=torch.tensor(weight) if weighted else None,
            )(torch.tensor(pred), torch.sigmoid(torch.tensor(label) / sigma))
            ours = losses.sdf_bce_loss(
                jnp.asarray(pred), jnp.asarray(label), sigma,
                jnp.asarray(weight), weighted, red,
            )
            np.testing.assert_allclose(float(ours), float(tl), rtol=2e-5)


def test_sdf_diff_loss_matches_reference_formula():
    rng = np.random.default_rng(4)
    pred = rng.standard_normal(64)
    label = rng.standard_normal(64)
    weight = np.abs(rng.standard_normal(64))
    scale = 0.02
    l2 = float(losses.sdf_diff_loss(jnp.asarray(pred), jnp.asarray(label), jnp.asarray(weight), scale, True))
    ref = (weight * ((pred - label) / scale) ** 2).sum() / 64
    np.testing.assert_allclose(l2, ref, rtol=1e-5)
    l1 = float(losses.sdf_diff_loss(jnp.asarray(pred), jnp.asarray(label), jnp.asarray(weight), scale, False))
    ref1 = (weight * np.abs((pred - label) / scale)).sum() / 64
    np.testing.assert_allclose(l1, ref1, rtol=1e-5)


def test_batch_ray_rendering_loss_matches_torch_transcription():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    R, S = 8, 7
    x = rng.uniform(1, 10, (R, S)).astype(np.float32)
    y = rng.uniform(0, 1, (R, S)).astype(np.float32)
    d = rng.uniform(1, 10, R).astype(np.float32)

    def torch_ref(x, y, d_meas, neus_on):
        # transcription of utils/loss.py:82-118
        x, y, d_meas = torch.tensor(x), torch.tensor(y), torch.tensor(d_meas)
        sort_x, idx = torch.sort(x, 1)
        sort_y = torch.gather(y, 1, idx)
        if neus_on:
            neus_alpha = (sort_y[:, 1:] - sort_y[:, :-1]) / (1.0 - sort_y[:, :-1] + 1e-10)
            alpha = torch.clamp(neus_alpha, 0.0, 1.0)
        else:
            alpha = sort_y
        oma = torch.ones_like(alpha) - alpha + 1e-10
        cum = torch.cumprod(oma, 1)
        w = cum / oma * alpha
        d_render = (w * sort_x[:, : alpha.shape[1]]).sum(1)
        return torch.abs(d_render - d_meas).mean().item()

    for neus in (False, True):
        ours = float(losses.batch_ray_rendering_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(d), neus))
        np.testing.assert_allclose(ours, torch_ref(x, y, d, neus), rtol=1e-4)

    # and against the reference's ACTUAL function (utils/loss.py:82-118),
    # not just the transcription above
    import sys

    sys.path.insert(0, "/root/reference")
    import importlib

    ref_loss = importlib.import_module("utils.loss")
    for neus in (False, True):
        ref = float(ref_loss.batch_ray_rendering_loss(
            torch.tensor(x), torch.tensor(y), torch.tensor(d), neus_on=neus
        ))
        ours = float(losses.batch_ray_rendering_loss(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(d), neus))
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_eikonal_and_normal_losses():
    g = jnp.asarray([[1.0, 0, 0], [0, 2.0, 0], [0, 0, 1.0]])
    mask = jnp.asarray([True, True, False])
    e = float(losses.eikonal_loss(g, mask))
    np.testing.assert_allclose(e, ((1 - 1) ** 2 + (1 - 2) ** 2) / 2, atol=1e-6)
    n = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    nl = float(losses.normal_loss(g, n, mask))
    np.testing.assert_allclose(nl, 0.0, atol=1e-6)


def test_sem_nll_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    logits = rng.standard_normal((32, 21)).astype(np.float32)
    labels = rng.integers(0, 21, 32)
    lp = torch.log_softmax(torch.tensor(logits), dim=1)
    ref = torch.nn.NLLLoss(reduction="mean")(lp, torch.tensor(labels)).item()
    ours = float(losses.sem_nll_loss(jnp.asarray(np.asarray(lp)), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_adam_matches_torch_adam():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    g_seq = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]

    # torch
    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([tw], lr=0.01, betas=(0.9, 0.99), eps=1e-15)
    for g in g_seq:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    # ours
    params = {"w": jnp.asarray(w0)}
    state = optimizer.init_opt_state(params)
    scale = {"w": 1.0}
    wd = {"w": 0.0}
    for g in g_seq:
        params, state = optimizer.adam_update(
            params, {"w": jnp.asarray(g)}, state, jnp.float32(0.01), scale, wd
        )
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), atol=1e-5
    )


def test_adam_weight_decay_matches_torch():
    torch = pytest.importorskip("torch")
    w0 = np.ones((3,), np.float32)
    g = np.full((3,), 0.5, np.float32)
    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([tw], lr=0.1, betas=(0.9, 0.99), eps=1e-15, weight_decay=0.2)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
    params = {"w": jnp.asarray(w0)}
    state = optimizer.init_opt_state(params)
    for _ in range(3):
        params, state = optimizer.adam_update(
            params, {"w": jnp.asarray(g)}, state, jnp.float32(0.1), {"w": 1.0}, {"w": 0.2}
        )
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6)


def test_lr_step_decay():
    lr = optimizer.lr_at_step(1.0, jnp.int32(5), [10, 50], 0.1)
    np.testing.assert_allclose(float(lr), 1.0)
    lr = optimizer.lr_at_step(1.0, jnp.int32(10), [10, 50], 0.1)
    np.testing.assert_allclose(float(lr), 0.1, rtol=1e-6)
    lr = optimizer.lr_at_step(1.0, jnp.int32(60), [10, 50], 0.1)
    np.testing.assert_allclose(float(lr), 0.01, rtol=1e-6)


def test_group_trees_structure():
    params = {
        "geo": {"w0": jnp.zeros((2, 2))},
        "sem": {"w0": jnp.zeros((2, 2))},
        "features": (jnp.zeros((4, 8)), jnp.zeros((4, 8))),
        "sigma": jnp.ones(()),
    }
    scale, wd = optimizer.make_group_trees(params, level_lr_ratio=0.5, weight_decay=0.1)
    assert scale["features"][0]["w0"] if isinstance(scale["features"][0], dict) else scale["features"][0] == 1.0
    assert scale["features"][1] == 0.5
    assert wd["geo"]["w0"] == 0.1
    assert wd["features"][0] == 0.0


def test_gradient_losses_zero_grad_no_nan():
    """A sample whose point gradient is EXACTLY zero (all levels missed ->
    constant trashbin feature) must not NaN the backward of the gradient
    losses — torch's norm defines the subgradient at 0 as 0; safe_norm
    reproduces that (a masked sample's 0 * NaN would still poison the
    batch)."""
    import jax
    import jax.numpy as jnp
    from shine_mapping_tpu.train import losses

    g = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, 0.5, 0.0]])
    mask = jnp.array([False, True, True])

    val, grad = jax.value_and_grad(
        lambda g_: losses.eikonal_loss(g_, mask))(g)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))

    n_lbl = jnp.array([[0.0, 0.0, 1.0]] * 3)
    val, grad = jax.value_and_grad(
        lambda g_: losses.normal_loss(g_, n_lbl, mask))(g)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))

    val, grad = jax.value_and_grad(
        lambda g_: losses.consistency_loss(g_, g_ + 0.1))(g)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))

    # and the masked-out zero row contributes exactly nothing
    val2 = losses.eikonal_loss(g.at[0].set(9.0), mask)
    np.testing.assert_allclose(
        float(losses.eikonal_loss(g, mask)), float(val2), rtol=1e-6)
