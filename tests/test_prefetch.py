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

    def test_producer_runs_ahead(self):
        """The worker thread keeps producing while the consumer is busy:
        by the time the slow consumer takes item i, the producer must have
        already emitted more than i+1 items (deterministic under load,
        unlike wall-clock overlap assertions)."""
        produced = []

        def gen():
            for i in range(8):
                produced.append(i)
                yield i

        ahead = False
        for i in d_iter(gen()):
            time.sleep(0.01)  # slow consumer lets the producer fill the queue
            if len(produced) > i + 1:
                ahead = True
        assert ahead


def d_iter(gen):
    return prefetch(gen, depth=2)
