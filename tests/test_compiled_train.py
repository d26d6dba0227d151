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


@pytest.mark.parametrize("compact", [False, True])
def test_compiled_hgt_matches_handwritten(compact):
    """The compiled hgt.inter-op program matches the hand-written flax HGT
    (same weights, H=1, raw softmax) in outputs AND grads."""
    from het_tpu.models import HGTModel
    from het_tpu.train.compiled import CompiledHGTModel

    g = random_heterograph(
        num_nodes=80, num_edges=400, num_rels=3, seed=3, tile=8,
        build_compact=True,
    )
    F, C = 6, 4
    cm = CompiledHGTModel(
        in_dim=F, hidden=8, num_classes=C, num_ntypes=1, num_rels=3,
        num_layers=1, dropout=0.0, compact=compact,
    )
    params = cm.init(jax.random.PRNGKey(1), g, None)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((g.num_nodes, F),
                                                 dtype=np.float32)
    )
    out_c = cm.apply(params, g, x)

    hw = HGTModel(
        in_dim=F, hidden=8, num_classes=C, num_ntypes=1, num_rels=3,
        num_heads=1, num_layers=1, dropout=0.0, stable_softmax="raw",
        compact=compact,
    )
    L = params["layer_0"]
    hw_params = {"params": {"HGTLayer_0": {
        "k_linears": L["k_w"][:, None],
        "q_linears": L["q_w"][:, None],
        "v_linears": L["v_w"][:, None],
        "a_linears": L["a_w"][:, None],
        "relation_pri": L["rel_pri"][:, None],
        "relation_att": L["rel_att"][:, None],
        "relation_msg": L["rel_msg"][:, None],
        "skip": L["skip"][:, None, None, None],
    }}}
    out_h = hw.apply(hw_params, g, x)
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(out_h), rtol=2e-4, atol=1e-5
    )

    gc = jax.grad(lambda p: jnp.sum(cm.apply(p, g, x) ** 2))(params)
    gh = jax.grad(
        lambda p: jnp.sum(hw.apply(p, g, x) ** 2)
    )(hw_params)["params"]["HGTLayer_0"]
    np.testing.assert_allclose(
        np.asarray(gc["layer_0"]["k_w"]),
        np.asarray(gh["k_linears"][:, 0]),
        rtol=2e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gc["layer_0"]["rel_msg"]),
        np.asarray(gh["relation_msg"][:, 0]),
        rtol=2e-3, atol=1e-5,
    )


@pytest.mark.parametrize("compact", [False, True])
def test_compiled_rgcn_matches_handwritten(compact):
    """The compiled rgcn.inter-op edge-conv core matches the hand-written
    flax RGCN (same weights) in outputs AND grads."""
    from het_tpu.models import RGCNModel
    from het_tpu.train.compiled import CompiledRGCNModel

    g = random_heterograph(
        num_nodes=80, num_edges=400, num_rels=3, seed=3, tile=8,
        build_compact=True,
    )
    F, C = 6, 4
    cm = CompiledRGCNModel(
        in_feat=F, hidden=8, num_classes=C, num_rels=3, dropout=0.0,
        compact=compact,
    )
    params = cm.init(jax.random.PRNGKey(0), g, None)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((g.num_nodes, F),
                                                 dtype=np.float32)
    )
    out_c = cm.apply(params, g, x)

    hw = RGCNModel(
        num_nodes=g.num_nodes, hidden=8, num_classes=C, num_rels=3,
        featureless=False, in_feat=F, dropout=0.0, compact=compact,
    )
    hw_params = {"params": {
        "RGCNLayer_0": {"weight": params["layer_0"]["W"],
                        "bias": params["layer_0"]["bias"]},
        "RGCNLayer_1": {"weight": params["layer_1"]["W"],
                        "bias": params["layer_1"]["bias"]},
    }}
    out_h = hw.apply(hw_params, g, x)
    np.testing.assert_allclose(
        np.asarray(out_c), np.asarray(out_h), rtol=2e-4, atol=1e-5
    )

    gc = jax.grad(lambda p: jnp.sum(cm.apply(p, g, x) ** 2))(params)
    gh = jax.grad(
        lambda p: jnp.sum(hw.apply(p, g, x) ** 2)
    )(hw_params)["params"]
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(gc[f"layer_{i}"]["W"]),
            np.asarray(gh[f"RGCNLayer_{i}"]["weight"]),
            rtol=2e-3, atol=1e-5,
        )


@pytest.mark.parametrize("model", ["HGT", "RGCN"])
def test_compiled_driver_trains_families(model):
    """--use_compiler drives HGT and RGCN end-to-end in the driver."""
    from het_tpu.train import TrainConfig, train

    cfg = TrainConfig(
        model=model,
        dataset="aifb",
        dataset_scale=0.02,
        n_infeat=12,
        hidden=12,
        num_classes=4,
        num_heads=1,
        num_layers=1 if model == "HGT" else 2,
        num_epochs=12,
        warmup_epochs=1,
        dropout=0.0,
        lr=5e-2,
        tile=8,
        use_compiler=True,
    )
    m = train(cfg)
    assert np.isfinite(m["loss_list"]).all()
    assert m["loss_list"][-1] < m["loss_list"][0]
