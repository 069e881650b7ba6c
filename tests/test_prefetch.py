"""device_prefetch: ordering, error propagation, prompt shutdown."""

import threading
import time

import pytest

from stcat_tpu.core.prefetch import device_prefetch


def test_order_and_placement():
    out = list(device_prefetch(range(20), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(20)]


def test_place_error_propagates():
    def place(x):
        if x == 3:
            raise ValueError("boom")
        return x

    it = device_prefetch(range(10), place, depth=2)
    got = []
    with pytest.raises(ValueError, match="boom"):
        for v in it:
            got.append(v)
    assert got == [0, 1, 2]


def test_iterator_error_propagates():
    def src():
        yield 1
        raise RuntimeError("src died")

    with pytest.raises(RuntimeError, match="src died"):
        list(device_prefetch(src(), lambda x: x))


def test_close_stops_worker():
    started = threading.Event()
    n_placed = [0]

    def place(x):
        started.set()
        n_placed[0] += 1
        return x

    gen = device_prefetch(iter(range(10_000)), place, depth=1)
    assert next(gen) == 0
    started.wait(5)
    gen.close()  # must not hang on a full queue
    time.sleep(0.3)
    placed_after_close = n_placed[0]
    time.sleep(0.3)
    # worker stopped: no further placements happen
    assert n_placed[0] <= placed_after_close + 1


def test_overlap_actually_happens():
    """With depth 2, placement of item i+1 runs while the consumer holds i."""
    concurrent = []
    in_place = threading.Event()

    def place(x):
        in_place.set()
        time.sleep(0.05)
        in_place.clear()
        return x

    gen = device_prefetch(range(6), place, depth=2)
    first = next(gen)
    time.sleep(0.02)  # worker should be placing the next item NOW
    concurrent.append(in_place.is_set())
    list(gen)
    assert any(concurrent)
