import jax
import jax.numpy as jnp
import numpy as np

from gcdlss_tpu.ops.conv import gather_conv


def test_gather_conv_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(0)
    N, K, Ci, Co = 40, 7, 5, 6
    feats = jnp.asarray(rng.normal(size=(N, Ci)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(-1, N, (N, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K, Ci, Co)).astype(np.float32))

    def f_custom(feats, w):
        return jnp.sum(jnp.sin(gather_conv(feats, nbr, w, precision="highest")))

    def f_ref(feats, w):
        def step(acc, inp):
            nbr_k, w_k = inp
            safe = jnp.where(nbr_k >= 0, nbr_k, 0)
            g = feats[safe] * (nbr_k >= 0)[:, None]
            return acc + jnp.dot(g, w_k, precision="highest"), None

        acc, _ = jax.lax.scan(step, jnp.zeros((N, Co)), (nbr.T, w))
        return jnp.sum(jnp.sin(acc))

    g1 = jax.grad(f_custom, argnums=(0, 1))(feats, w)
    g2 = jax.grad(f_ref, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-4, atol=1e-5)


def test_symmetric_adjoint_on_true_submanifold_map():
    """On a genuine symmetric rulebook the reversed-map adjoint must equal
    the scatter-add adjoint."""
    from gcdlss_tpu.ops.plan import build_unet_plan

    rng = np.random.default_rng(1)
    coords = np.unique(
        np.concatenate(
            [np.zeros((80, 1), np.int32),
             rng.integers(-4, 4, (80, 3)).astype(np.int32)], axis=1
        ), axis=0,
    )
    cap = 96
    pad = np.zeros((cap, 4), np.int32)
    pad[: len(coords)] = coords
    valid = np.zeros(cap, bool)
    valid[: len(coords)] = True
    plan = build_unet_plan(jnp.asarray(pad), jnp.asarray(valid), (cap,), num_levels=1)
    nbr = plan.levels[0].nbr3
    feats = jnp.asarray(rng.normal(size=(cap, 5)).astype(np.float32))
    feats = feats * jnp.asarray(valid)[:, None]
    w = jnp.asarray(rng.normal(size=(27, 5, 6)).astype(np.float32))

    def f(sym):
        def loss(feats, w):
            out = gather_conv(feats, nbr, w, precision="highest",
                              symmetric_adjoint=sym)
            return jnp.sum(jnp.tanh(out) * jnp.asarray(valid)[:, None])
        return jax.grad(loss, argnums=(0, 1))(feats, w)

    g_sym = f(True)
    g_gen = f(False)
    np.testing.assert_allclose(np.asarray(g_sym[0]), np.asarray(g_gen[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_sym[1]), np.asarray(g_gen[1]),
                               rtol=1e-4, atol=1e-5)
