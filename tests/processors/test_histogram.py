

def test_scatter_hist_matmul_route_matches_scatter(rng):
    """The accelerator route (coarse x fine one-hot MXU contraction) must
    produce exactly the scatter-add's integer counts, including invalid
    samples and non-square bin counts."""
    import jax.numpy as jnp
    import numpy as np

    from dspeed_tpu.processors.histogram import _scatter_hist

    for m in (7, 16, 100, 101):
        k = rng.integers(-3, m + 3, (5, 64)).astype("int32")
        valid = (k >= 0) & (k < m) & (rng.random((5, 64)) > 0.2)
        w = jnp.zeros((5, 64), jnp.float32)
        a = _scatter_hist(w, jnp.asarray(k), m, jnp.asarray(valid),
                          route="matmul")
        b = _scatter_hist(w, jnp.asarray(k), m, jnp.asarray(valid),
                          route="scatter")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"m={m}")
