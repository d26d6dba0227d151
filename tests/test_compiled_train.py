"""--use_compiler path: the model executed THROUGH the compiled DSL
pipeline must match the hand-written flax RGAT numerically (same params)
under every flag combination, and must train end-to-end in the driver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from het_tpu.graph import random_heterograph
from het_tpu.models import RGATModel
from het_tpu.train.compiled import CompiledRGATModel


@pytest.mark.parametrize(
    "compact,multiply_first",
    [(False, False), (True, False), (False, True), (True, True)],
)
def test_compiled_matches_handwritten(compact, multiply_first):
    g = random_heterograph(
        num_nodes=80, num_edges=400, num_rels=3, seed=3, tile=8,
        build_compact=True,
    )
    F, HID, C = 6, 8, 4
    cm = CompiledRGATModel(
        in_feat=F, hidden=HID, num_classes=C, num_rels=3, num_layers=2,
        compact=compact, multiply_first=multiply_first, dropout=0.0,
    )
    params = cm.init(jax.random.PRNGKey(0), g, None)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((g.num_nodes, F),
                                                 dtype=np.float32)
    )
    out_c = cm.apply(params, g, x)

    # hand-written flax model with the SAME weights (H=1, raw softmax —
    # the DSL program computes the reference's raw exp)
    hw = RGATModel(
        in_feat=F, hidden=HID, num_classes=C, num_rels=3, num_heads=1,
        num_layers=2, compact=compact, multiply_first=multiply_first,
        dropout=0.0, stable_softmax="raw",
    )
    hw_params = {
        "params": {
            f"RGATLayer_{i}": {
                "conv_weights": params[f"layer_{i}"]["W"][:, None],
                "attn_l": params[f"layer_{i}"]["attn_l"][:, None],
                "attn_r": params[f"layer_{i}"]["attn_r"][:, None],
                "h_bias": params[f"layer_{i}"]["bias"],
            }
            for i in range(2)
        }
    }
    out_h = hw.apply(hw_params, g, x)
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(out_h), rtol=2e-4, atol=1e-5
    )

    # gradients agree too (compiled closure under jax.grad)
    gc = jax.grad(lambda p: jnp.sum(cm.apply(p, g, x) ** 2))(params)
    gh = jax.grad(
        lambda p: jnp.sum(hw.apply(p, g, x) ** 2)
    )(hw_params)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(gc[f"layer_{i}"]["W"]),
            np.asarray(gh["params"][f"RGATLayer_{i}"]["conv_weights"][:, 0]),
            rtol=2e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(gc[f"layer_{i}"]["attn_l"]),
            np.asarray(gh["params"][f"RGATLayer_{i}"]["attn_l"][:, 0]),
            rtol=2e-3, atol=1e-4,
        )


def test_compiled_driver_trains():
    from het_tpu.train.config import TrainConfig
    from het_tpu.train.driver import train

    cfg = TrainConfig(
        model="RGAT", dataset="aifb", dataset_scale=0.05, n_infeat=16,
        hidden=16, num_layers=2, num_epochs=4, warmup_epochs=1,
        dropout=0.1, tile=8, use_compiler=True, compact=True,
        multiply_first=True, logfile_enabled=False,
    )
    metrics = train(cfg)
    losses = metrics["loss_list"]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert metrics["train_acc"] >= 0.0
