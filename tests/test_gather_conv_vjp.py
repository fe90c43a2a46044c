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
