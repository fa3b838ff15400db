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
