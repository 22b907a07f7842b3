"""Monotonic alignment search vs the numpy DP oracle."""
import numpy as np
import jax.numpy as jnp

from mockingbird_tpu.ops.monotonic_align import (
    maximum_path, maximum_path_numpy, maximum_path_with_lengths,
)


def _rand_case(rng, b, t_y, t_x):
    neg_cent = rng.randn(b, t_y, t_x).astype(np.float32)
    t_ys = rng.randint(t_x, t_y + 1, size=b)  # mel at least as long as text
    t_xs = rng.randint(2, t_x + 1, size=b)
    t_ys = np.maximum(t_ys, t_xs)             # feasibility
    return neg_cent, t_ys, t_xs


def test_matches_oracle_random():
    rng = np.random.RandomState(0)
    for trial in range(5):
        neg_cent, t_ys, t_xs = _rand_case(rng, 4, 24, 12)
        ours = np.asarray(maximum_path_with_lengths(jnp.asarray(neg_cent), t_ys, t_xs))
        oracle = maximum_path_numpy(neg_cent, t_ys, t_xs)
        np.testing.assert_array_equal(ours, oracle)


def test_path_properties():
    rng = np.random.RandomState(1)
    neg_cent, t_ys, t_xs = _rand_case(rng, 3, 40, 15)
    path = np.asarray(maximum_path_with_lengths(jnp.asarray(neg_cent), t_ys, t_xs))
    for i in range(3):
        p = path[i, : t_ys[i], : t_xs[i]]
        # exactly one text position per mel frame
        np.testing.assert_array_equal(p.sum(axis=1), 1.0)
        # monotonic, non-skipping
        idx = p.argmax(axis=1)
        d = np.diff(idx)
        assert ((d == 0) | (d == 1)).all()
        assert idx[0] == 0 and idx[-1] == t_xs[i] - 1
        # rows beyond length untouched
        assert path[i, t_ys[i]:, :].sum() == 0


def test_mask_interface():
    rng = np.random.RandomState(2)
    b, t_y, t_x = 2, 20, 8
    neg_cent = rng.randn(b, t_y, t_x).astype(np.float32)
    t_ys, t_xs = np.array([20, 15]), np.array([8, 5])
    mask = np.zeros((b, t_y, t_x), np.float32)
    for i in range(b):
        mask[i, : t_ys[i], : t_xs[i]] = 1
    path = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask)))
    oracle = maximum_path_numpy(neg_cent * mask, t_ys, t_xs)
    np.testing.assert_array_equal(path, oracle)


def test_prefers_high_scores():
    """A diagonal of high scores should be recovered exactly."""
    t = 10
    neg_cent = np.full((1, t, t), -5.0, np.float32)
    for k in range(t):
        neg_cent[0, k, k] = 5.0
    path = np.asarray(maximum_path_with_lengths(jnp.asarray(neg_cent), [t], [t]))
    np.testing.assert_array_equal(path[0], np.eye(t, dtype=np.float32))


def test_pallas_matches_scan_on_tpu():
    """Real-chip parity at VITS training shapes (run with
    MB_TEST_PLATFORM=axon; skipped on the CPU backend where the Pallas
    kernel cannot execute un-interpreted)."""
    import jax
    import pytest
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a real TPU backend")
    from mockingbird_tpu.ops.monotonic_align import _maximum_path_impl
    from mockingbird_tpu.ops.monotonic_align_pallas import maximum_path_pallas

    rng = np.random.RandomState(0)
    for (b, t_y, t_x) in [(16, 400, 96), (4, 1000, 160)]:
        neg_cent = rng.randn(b, t_y, t_x).astype(np.float32)
        t_ys = np.maximum(rng.randint(t_x, t_y + 1, size=b), t_x)
        t_xs = rng.randint(8, t_x + 1, size=b)
        p = np.asarray(maximum_path_pallas(jnp.asarray(neg_cent),
                                           jnp.asarray(t_ys), jnp.asarray(t_xs)))
        s = np.asarray(_maximum_path_impl(jnp.asarray(neg_cent),
                                          jnp.asarray(t_ys, jnp.int32),
                                          jnp.asarray(t_xs, jnp.int32)))
        np.testing.assert_array_equal(p, s)
