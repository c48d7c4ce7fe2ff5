"""Prefetch thread: ordering, exception propagation, bounded buffering."""

import time

import pytest

from speecht5_tpu.data.prefetch import prefetch


class TestPrefetch:
    def test_preserves_order(self):
        assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))

    def test_propagates_exceptions(self):
        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)

    def test_overlaps_producer_and_consumer(self):
        """With prefetching, producer sleeps overlap consumer sleeps."""
        def slow_gen():
            for i in range(5):
                time.sleep(0.02)
                yield i

        t0 = time.perf_counter()
        for _ in prefetch(slow_gen(), depth=2):
            time.sleep(0.02)
        overlapped = time.perf_counter() - t0
        # serial would be ~0.2s; overlapped should be well under
        assert overlapped < 0.17
