"""Checkpointer (orbax) save/restore round trips."""

import jax
import jax.numpy as jnp
import numpy as np

from ttdg_mgm_tpu.checkpoint.save import Checkpointer


class TestCheckpointer:
    def test_roundtrip(self, tmp_path):
        ckpt = Checkpointer(str(tmp_path / "ck"))
        tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                           "b": jnp.ones(3)},
                "step": jnp.int32(7)}
        ckpt.save(7, tree, wait=True)
        assert ckpt.latest_step() == 7

        target = jax.tree.map(jnp.zeros_like, tree)
        restored = ckpt.restore(target)
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.arange(6.0).reshape(2, 3))
        assert int(restored["step"]) == 7

    def test_resume_or_load_fresh(self, tmp_path):
        ckpt = Checkpointer(str(tmp_path / "ck2"))
        tree = {"x": jnp.ones(2)}
        out, resumed = ckpt.resume_or_load(tree)
        assert not resumed
        assert out is tree

    def test_max_to_keep(self, tmp_path):
        ckpt = Checkpointer(str(tmp_path / "ck3"), max_to_keep=2)
        for s in (1, 2, 3):
            ckpt.save(s, {"x": jnp.full(2, float(s))}, wait=True)
        assert ckpt.latest_step() == 3
        restored = ckpt.restore({"x": jnp.zeros(2)}, step=3)
        np.testing.assert_array_equal(np.asarray(restored["x"]), [3.0, 3.0])
