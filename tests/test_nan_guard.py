"""NaN/inf-loss guard: a bad step must leave params AND optimizer state
untouched (reference skips backprop on invalid loss,
gcpnet_ar_module.py:217-219; Adam moments must not move either)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.nms import NMSDataModule
from gcpnet_tpu.models import GCPNetNMS, nms_loss
from gcpnet_tpu.parallel import make_mesh
from gcpnet_tpu.train import Trainer

pytestmark = pytest.mark.heavy  # compile-heavy integration tier


SMALL_CFG = dict(
    model_cfg=ModelCfg(
        h_input_dim=1, chi_input_dim=3, e_input_dim=17, xi_input_dim=1,
        h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=4,
        num_encoder_layers=1, dropout=0.0,
    ),
    module_cfg=ModuleCfg(),
    layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
)


def test_nan_loss_freezes_params_and_opt_state(tmp_path):
    dm = NMSDataModule(
        data_root=str(tmp_path), data_mode="small", batch_size=8,
        num_train=8, num_valid=8, num_test=8, num_shards=1,
    )
    dm.prepare_data()
    dm.setup()
    batch = next(iter(dm.train_batches()))

    model = GCPNetNMS(**SMALL_CFG)
    tr = Trainer(
        model, nms_loss, optimizer_cfg={"_target_": "Adam", "lr": 1e-3},
        mesh=make_mesh(jax.devices()[:1]), early_stopping_patience=None,
    )
    dev_batch = tr._put(batch)
    tr.init_state(dev_batch)
    step = tr._build_train_step()
    key = jax.random.key(0)
    one = jnp.float32(1.0)

    # one good step so Adam moments are non-trivial
    state1, loss1, _ = step(tr.state, dev_batch, key, one)
    assert np.isfinite(float(loss1))
    # state is donated into the jitted step: snapshot to host first
    params1 = jax.tree_util.tree_map(np.asarray, state1.params)
    opt1 = jax.tree_util.tree_map(np.asarray, state1.opt_state)

    # poison the batch: NaN positions make the loss NaN
    bad = dev_batch.replace(x=dev_batch.x * jnp.nan)
    state2, loss2, _ = step(state1, bad, key, one)
    assert not np.isfinite(float(loss2))
    params2 = jax.tree_util.tree_map(np.asarray, state2.params)
    opt2 = jax.tree_util.tree_map(np.asarray, state2.opt_state)

    for new, old in zip(
        jax.tree_util.tree_leaves(params2), jax.tree_util.tree_leaves(params1)
    ):
        np.testing.assert_array_equal(new, old)
    for new, old in zip(
        jax.tree_util.tree_leaves(opt2), jax.tree_util.tree_leaves(opt1)
    ):
        np.testing.assert_array_equal(new, old)

    # and the guard releases: a good batch after a bad one still trains
    state3, loss3, _ = step(state2, dev_batch, key, one)
    assert np.isfinite(float(loss3))
    changed = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(
            jax.tree_util.tree_leaves(state3.params),
            jax.tree_util.tree_leaves(params2),
        )
    )
    assert changed
