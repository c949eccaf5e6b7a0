"""Vocabulary-layer unit tests (reference types.jl surface, SURVEY §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np

import automationlabsmodelpredictivecontrol_jl_tpu as mpc


def test_design_references_shapes():
    # parity: _design_reference_mpc broadcasts setpoints (main_mpc.jl:105-117)
    refs = mpc.design_references(np.full(4, 0.65), np.full(2, 1.2), horizon=15)
    assert refs.x.shape == (4, 16)
    assert refs.u.shape == (2, 15)
    assert refs.horizon == 15
    np.testing.assert_allclose(np.asarray(refs.x), 0.65)
    np.testing.assert_allclose(np.asarray(refs.u), 1.2)


def test_box_contains_clip():
    box = mpc.Box(lo=jnp.asarray([0.0, -1.0]), hi=jnp.asarray([1.0, 1.0]))
    assert bool(box.contains(jnp.asarray([0.5, 0.0])))
    assert not bool(box.contains(jnp.asarray([1.5, 0.0])))
    np.testing.assert_allclose(
        np.asarray(box.clip(jnp.asarray([2.0, -3.0]))), [1.0, -1.0]
    )


def test_types_are_pytrees():
    refs = mpc.design_references(np.zeros(2), np.zeros(1), 3)
    leaves = jax.tree_util.tree_leaves(refs)
    assert len(leaves) == 2
    # tree_map roundtrip keeps structure
    refs2 = jax.tree_util.tree_map(lambda a: a + 1.0, refs)
    assert refs2.x.shape == refs.x.shape


def test_status_names_cover_codes():
    assert mpc.STATUS_NAMES[mpc.STATUS_CONVERGED] == "converged"
    assert set(mpc.STATUS_NAMES) == {0, 1, 2, 3, 4}
