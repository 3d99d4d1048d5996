"""Native C++ runtime tests: parity vs the pure-python/scipy equivalents."""

import numpy as np
import pytest

from nerfsafetyvalidation_tpu.native import lib as native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


def test_astar_matches_python():
    from nerfsafetyvalidation_tpu.nav.astar import astar as py_astar
    occ = np.zeros((10, 10, 10), dtype=bool)
    occ[5, :, :] = True
    occ[5, 3, 3] = False
    path_c = native.astar(occ, (0, 0, 0), (9, 9, 9))
    assert path_c is not None
    assert tuple(path_c[0]) == (0, 0, 0)
    assert tuple(path_c[-1]) == (9, 9, 9)
    # same optimal length as the python implementation
    path_py = py_astar(occ, (0, 0, 0), (9, 9, 9))
    assert len(path_c) == len(path_py)
    # adjacency + wall hole traversal
    for a, b in zip(path_c[:-1], path_c[1:]):
        assert np.abs(a - b).sum() == 1
    assert not occ[tuple(path_c.T)].any()


def test_astar_unreachable():
    occ = np.zeros((4, 4, 4), dtype=bool)
    occ[2, :, :] = True
    assert native.astar(occ, (0, 0, 0), (3, 0, 0)) is None


def test_edt_matches_scipy():
    import scipy.ndimage
    rng = np.random.default_rng(0)
    free = rng.uniform(size=(24, 20, 16)) > 0.1
    ours = native.distance_transform(free)
    ref = scipy.ndimage.distance_transform_edt(free)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_morton_matches_jnp():
    import jax.numpy as jnp
    from nerfsafetyvalidation_tpu.ops.ray_ops import morton3d as jmorton
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 128, size=(1000, 3)).astype(np.int32)
    ours = native.morton3d(coords)
    ref = np.asarray(jmorton(jnp.asarray(coords)))
    np.testing.assert_array_equal(ours, ref)
