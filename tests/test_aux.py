"""Auxiliary subsystems: checkpointing, timing/observability, distributed."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from spleeterrt_tpu.core import checkpoint, model, train, weights
from spleeterrt_tpu.parallel import distributed
from spleeterrt_tpu.utils import timing


def _state():
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[model.init_params(jax.random.PRNGKey(i)) for i in range(2)],
    )
    opt = optax.adam(1e-3)
    return train.init_train_state(stacked, opt), opt


def test_checkpoint_round_trip(tmp_path):
    state, opt = _state()
    step = train.make_train_step(opt, compute_dtype=jnp.float32)
    mix = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (2, 64, 512, 2)))
    tgt = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, 2, 64, 512, 2)))
    state, _ = jax.jit(step)(state, mix, tgt)

    path = tmp_path / "ckpt" / "step_1"
    checkpoint.save(path, state)
    template = jax.tree.map(jnp.zeros_like, state)
    restored = checkpoint.restore(path, template)
    assert int(restored.step) == 1
    np.testing.assert_array_equal(
        np.asarray(restored.params["down1"]["w"]),
        np.asarray(state.params["down1"]["w"]),
    )
    assert checkpoint.latest_step_dir(tmp_path / "ckpt").endswith("step_1")


def test_stage_timer(capsys):
    t = timing.StageTimer()
    with t.stage("load"):
        x = jnp.ones((8, 8))
    with t.stage("compute", sync=x * 2):
        pass
    rep = t.report()
    assert set(rep) == {"load", "compute"}
    assert "load takes" in capsys.readouterr().out


def test_png_spectrogram_dump(tmp_path, rng):
    mag = np.abs(rng.standard_normal((2, 64, 128)))
    paths = timing.dump_spectrogram_pngs(mag, str(tmp_path / "spec"))
    assert len(paths) == 2
    for p in paths:
        data = open(p, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_distributed_single_process_noop():
    distributed.initialize()  # no-op at 1 process
    mesh = distributed.global_mesh(stem_parallel=2)
    assert mesh.shape == {"stem": 2, "data": 4}
    assert distributed.is_coordinator()


def test_blob_export_after_training(tmp_path):
    """Trained params round-trip into the reference's .dat blob format."""
    state, opt = _state()
    p0 = jax.tree.map(lambda a: a[0], state.params)
    path = tmp_path / "vocal4stems.dat"
    weights.save_coeff_file(p0, path)
    assert path.stat().st_size == weights.COEFF_BLOB_BYTES
    back = weights.load_coeff_file(path)
    np.testing.assert_array_equal(
        np.asarray(back["up3"]["w"]), np.asarray(p0["up3"]["w"])
    )
