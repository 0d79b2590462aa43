"""Task-aware Orbax checkpointing: save/restore, None-template fill,
find_latest, save_teacher."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from dskd_tpu.train.checkpoint import (find_latest_checkpoint,
                                       restore_checkpoint, save_checkpoint)
from dskd_tpu.train.state import TrainState


def _state(seed):
    params = {"w": jnp.asarray(np.random.RandomState(seed).randn(3, 4)
                               .astype(np.float32))}
    tx = optax.adam(1e-3)
    return TrainState.create(params, {"bn": jnp.ones((4,))}, tx,
                             jax.random.PRNGKey(seed))


def test_save_restore_roundtrip_and_none_template(tmp_path):
    state = _state(0)
    save_checkpoint(str(tmp_path), 2, 3, state,
                    teacher_params={"w": state.params["w"] * 2},
                    save_teacher=True)
    assert find_latest_checkpoint(str(tmp_path)) [:2] == (2, 3)
    assert find_latest_checkpoint(str(tmp_path), task=1) is None

    # full-template restore (the resume path)
    full = restore_checkpoint(
        str(tmp_path), 2, 3,
        template={"params": state.params, "batch_stats": state.batch_stats,
                  "opt_state": state.opt_state, "step": state.step})
    np.testing.assert_allclose(np.asarray(full["params"]["w"]),
                               np.asarray(state.params["w"]))

    # eval-time restore: opt_state=None template must not crash (newer
    # Orbax rejects None-vs-saved mismatches) and still return weights
    partial = restore_checkpoint(
        str(tmp_path), 2, 3,
        template={"params": state.params, "batch_stats": state.batch_stats,
                  "opt_state": None, "step": 0})
    np.testing.assert_allclose(np.asarray(partial["params"]["w"]),
                               np.asarray(state.params["w"]))
    np.testing.assert_allclose(np.asarray(partial["batch_stats"]["bn"]),
                               1.0)

    # teacher payload saved when asked
    raw = restore_checkpoint(str(tmp_path), 2, 3)
    np.testing.assert_allclose(np.asarray(raw["teacher_params"]["w"]),
                               np.asarray(state.params["w"]) * 2)
