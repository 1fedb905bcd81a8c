"""Device-side slot allocation + async image prefetcher."""
import numpy as np
import jax.numpy as jnp
import pytest

from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.system.prefetch import ImagePrefetcher


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [1, 7, 64])
def test_free_slots_device_matches_host(seed, n):
    rng = np.random.default_rng(seed)
    valid = rng.random(128) < 0.7
    host = ms.alloc_slots(valid, n)
    dev = np.asarray(ms.free_slots_device(jnp.asarray(valid), n))
    np.testing.assert_array_equal(host, dev)


def test_free_slots_device_full():
    valid = np.ones(16, bool)
    dev = np.asarray(ms.free_slots_device(jnp.asarray(valid), 4))
    assert (dev == -1).all()


def test_free_slots_device_oversized_request():
    valid = np.zeros(4, bool)
    dev = np.asarray(ms.free_slots_device(jnp.asarray(valid), 8))
    np.testing.assert_array_equal(dev, [0, 1, 2, 3, -1, -1, -1, -1])


def test_prefetcher_order_and_dtype():
    frames = [(np.full((4, 4), i, np.uint8), np.full((4, 4), i + 100,
                                                     np.uint8))
              for i in range(5)]
    got = list(ImagePrefetcher(iter(frames), depth=2))
    assert len(got) == 5
    for i, (a, b) in enumerate(got):
        assert a.dtype == jnp.uint8  # uint8 stays uint8 in flight
        assert int(np.asarray(a)[0, 0]) == i
        assert int(np.asarray(b)[0, 0]) == i + 100


def test_prefetcher_passthrough_and_errors():
    def source():
        yield (np.zeros(2, np.float32), "meta", 7)
        raise RuntimeError("disk went away")

    it = iter(ImagePrefetcher(source(), depth=1))
    a, m, k = next(it)
    assert m == "meta" and k == 7
    with pytest.raises(RuntimeError, match="disk went away"):
        next(it)
