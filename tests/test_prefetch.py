"""Host prefetch pipeline tests (SURVEY §7(a), VERDICT r1 #10)."""
import time

import pytest

from cut3r_slam_tpu.utils.image import prefetch_stream


def test_order_and_completeness():
    items = list(range(50))
    assert list(prefetch_stream(iter(items), depth=4)) == items


def test_overlaps_producer_and_consumer():
    """Decode (sleep in producer) overlaps consumer work: total runtime
    ~max(producer, consumer), not their sum."""
    N, d = 10, 0.02

    def slow_gen():
        for i in range(N):
            time.sleep(d)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch_stream(slow_gen(), depth=4):
        time.sleep(d)  # consumer "device step"
    elapsed = time.perf_counter() - t0
    assert elapsed < 1.6 * N * d, elapsed  # serial would be ~2*N*d


def test_exception_propagates():
    def bad_gen():
        yield 1
        raise ValueError("decode failed")

    it = prefetch_stream(bad_gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        list(it)
