import jax
import jax.numpy as jnp
import numpy as np

from fastlivo_tpu import state as st
from fastlivo_tpu.ops import so3

rng = np.random.default_rng(1)


def test_identity_state():
    s = st.identity_state()
    np.testing.assert_allclose(s.rot, np.eye(3))
    np.testing.assert_allclose(np.diag(s.cov), st.INIT_COV)


def test_boxplus_boxminus_inverse():
    s = st.identity_state()
    delta = jnp.asarray(rng.normal(size=18).astype(np.float32) * 0.3)
    s2 = st.boxplus(s, delta)
    back = st.boxminus(s2, s)
    np.testing.assert_allclose(np.asarray(back), np.asarray(delta), atol=1e-5)


def test_boxminus_zero():
    s = st.boxplus(st.identity_state(), jnp.asarray(rng.normal(size=18).astype(np.float32)))
    np.testing.assert_allclose(np.asarray(st.boxminus(s, s)), np.zeros(18), atol=1e-6)


def test_state_is_pytree():
    s = st.identity_state()
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 7
    s2 = jax.tree_util.tree_map(lambda x: x * 2, s)
    np.testing.assert_allclose(s2.cov, 2 * np.asarray(s.cov))


def test_boxplus_rotation_right_multiplicative():
    # matches StatesGroup::operator+= (common_lib.h:345): R * Exp(d)
    s = st.identity_state()._replace(rot=so3.exp(jnp.asarray([0.1, 0.2, 0.3])))
    d = jnp.zeros(18).at[0:3].set(jnp.asarray([0.01, -0.02, 0.03]))
    s2 = st.boxplus(s, d)
    expected = np.asarray(s.rot) @ np.asarray(so3.exp(d[0:3]))
    np.testing.assert_allclose(np.asarray(s2.rot), expected, atol=1e-6)


def test_reset_pose_keeps_bias():
    s = st.identity_state()._replace(
        bg=jnp.ones(3), pos=jnp.ones(3), vel=jnp.ones(3), grav=jnp.ones(3)
    )
    r = st.reset_pose(s)
    np.testing.assert_allclose(r.pos, 0.0)
    np.testing.assert_allclose(r.vel, 0.0)
    np.testing.assert_allclose(r.bg, 1.0)
    np.testing.assert_allclose(r.grav, 1.0)
