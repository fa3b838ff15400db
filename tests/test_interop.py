"""Interop with the reference's artifacts: pretrained torch decoder."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from shine_mapping_tpu.models import decoder

REF_CKPT = "/root/reference/pretrained/geo_decoder_8dim.pth"


@pytest.mark.skipif(not os.path.exists(REF_CKPT), reason="reference ckpt absent")
def test_load_reference_pretrained_decoder():
    """Load the reference's shipped geo decoder and check shapes + a
    deterministic forward (shapes per SURVEY.md §2.1: 32x8, 32x32, 1x32,
    21x32)."""
    params = decoder.load_torch_decoder(REF_CKPT, "geo_decoder")
    assert params["w0"].shape == (8, 32)
    assert params["w1"].shape == (32, 32)
    assert params["w_out"].shape == (32, 1)
    assert params["w_sem"].shape == (32, 21)

    x = jnp.asarray(np.linspace(-1, 1, 8 * 4).reshape(4, 8).astype(np.float32))
    out = np.asarray(decoder.sdf(params, x))
    assert out.shape == (4,)
    assert np.all(np.isfinite(out))

    # cross-check against torch's own forward with the same weights
    torch = pytest.importorskip("torch")
    state = torch.load(REF_CKPT, map_location="cpu", weights_only=False)["geo_decoder"]
    xt = torch.tensor(np.asarray(x))
    h = torch.relu(xt @ state["layers.0.weight"].T + state["layers.0.bias"])
    h = torch.relu(h @ state["layers.1.weight"].T + state["layers.1.bias"])
    ref = (h @ state["lout.weight"].T + state["lout.bias"]).squeeze(1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_CKPT), reason="reference ckpt absent")
def test_load_decoders_via_checkpoint_module(tmp_path):
    from shine_mapping_tpu.utils import checkpoint as ckpt
    import jax

    params = {
        "geo": decoder.init_decoder_params(jax.random.PRNGKey(0), 8),
        "sem": decoder.init_decoder_params(jax.random.PRNGKey(1), 8),
    }
    new = ckpt.load_decoders(REF_CKPT, params)
    assert new["geo"]["w0"].shape == (8, 32)
    # original sem untouched (ref ckpt has no sem_decoder key)
    np.testing.assert_array_equal(
        np.asarray(new["sem"]["w0"]), np.asarray(params["sem"]["w0"])
    )


def test_checkpoint_roundtrip_bf16_moments(tmp_path):
    """npz has no bfloat16 — the checkpoint stores the bit pattern and the
    loader restores dtype + values exactly (tpu.moments_bf16 runs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shine_mapping_tpu.config import SHINEConfig
    from shine_mapping_tpu.ops.hashgrid import HashGridHost
    from shine_mapping_tpu.train import trainer
    from shine_mapping_tpu.train.optimizer import init_opt_state
    from shine_mapping_tpu.utils import checkpoint as ckpt

    cfg = SHINEConfig()
    cfg.tree_level_world = 6
    cfg.tree_level_feat = 2
    cfg.derive()
    grid = HashGridHost(
        max_level=cfg.tree_level_world,
        featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim,
        feature_std=cfg.feature_std,
        seed=0,
        init_node_capacity=1 << 10,
        init_corner_capacity=1 << 10,
    )
    rng = np.random.default_rng(0)
    grid.update(rng.uniform(-0.5, 0.5, (500, 3)))
    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
    opt = init_opt_state(params, moments_bf16=True)
    # non-trivial moments so values (not just dtypes) round-trip
    opt = opt._replace(m=dict(
        opt.m, features=tuple(
            (jnp.arange(f.size, dtype=jnp.float32) / 777.0)
            .reshape(f.shape).astype(jnp.bfloat16)
            for f in params["features"])))
    path = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(path, grid, params, opt, iters=5)
    _, params2, opt2, iters = ckpt.load_checkpoint(path, params, opt)
    assert iters == 5
    for i in range(len(params["features"])):
        assert opt2.m["features"][i].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(opt2.m["features"][i]).view(np.uint16),
            np.asarray(opt.m["features"][i]).view(np.uint16))
