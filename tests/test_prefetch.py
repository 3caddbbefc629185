"""Device-prefetch iterator unit tests."""

from aicity_action_tpu.parallel.prefetch import prefetch_to_device


def test_prefetch_order_and_edges():
    items = list(range(7))
    seen = []
    out = list(prefetch_to_device(items, lambda x: x * 10, lookahead=3))
    assert [h for h, d in out] == items
    assert [d for h, d in out] == [x * 10 for x in items]
    out = list(prefetch_to_device([], lambda x: x, lookahead=2))
    assert out == []
    out = list(prefetch_to_device([1], lambda x: x + 1, lookahead=4))
    assert out == [(1, 2)]

