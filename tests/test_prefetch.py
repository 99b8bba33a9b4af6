"""Prefetch pipeline tests."""

import time

import numpy as np
import pytest

from skix.io.prefetch import PrefetchIterator, device_prefetch


class TestPrefetchIterator:
    def test_order_preserved(self):
        out = list(PrefetchIterator(range(20), depth=3))
        assert out == list(range(20))

    def test_exception_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("decode failed")

        it = PrefetchIterator(gen())
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="decode failed"):
            for _ in it:
                pass

    def test_overlaps_production_with_consumption(self):
        def slow_gen():
            for i in range(4):
                time.sleep(0.05)
                yield i

        t0 = time.perf_counter()
        for _ in PrefetchIterator(slow_gen(), depth=2):
            time.sleep(0.05)  # consumer work
        dt = time.perf_counter() - t0
        # serial would be ~0.4 s; overlapped ≤ ~0.3 s
        assert dt < 0.36, f"no overlap: {dt:.3f}s"

    def test_close_early(self):
        it = PrefetchIterator(range(1000000), depth=2)
        assert next(it) == 0
        it.close()  # must not hang


class TestDevicePrefetch:
    def test_values_on_device(self):
        import jax

        chunks = [np.full((4, 4), i, np.float32) for i in range(5)]
        out = list(device_prefetch(chunks))
        assert len(out) == 5
        for i, x in enumerate(out):
            assert isinstance(x, jax.Array)
            np.testing.assert_allclose(np.asarray(x), i)

    def test_transform(self):
        chunks = [np.ones((2,), np.float32)] * 3
        out = list(device_prefetch(chunks, transform=lambda x: x * 2))
        np.testing.assert_allclose(np.asarray(out[0]), 2.0)
