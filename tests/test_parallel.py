"""Data-parallel DACS step on the virtual 8-device CPU mesh."""
import numpy as np

import jax

from cmda_tpu.config import tiny_test_config
from cmda_tpu.parallel.mesh import make_mesh, make_parallel_train_step, shard_batch
from cmda_tpu.uda.dacs import DACSTrainer
from tests.test_dacs import synth_batch


def test_dp_step_on_8_device_mesh():
    assert len(jax.devices()) == 8
    cfg = tiny_test_config()
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8)
    step = make_parallel_train_step(trainer, mesh, donate=False)
    batch = shard_batch(synth_batch(0, b=8), mesh)
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    assert int(new_state.step) == 1
    # state stays replicated
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated
