"""SparkHandler reference-parity tests.

Mirrors reference ``tests/test_distributed_handler.py``: elementwise
``lambda x: x+1`` over 10/100/1000 elements, differential against an
independent plain-Python baseline, order-insensitive (set) comparison;
plus batched/unbatched cross-check and batch-size introspection.
"""

import pytest

from aics_dask_utils_spark.handler import SparkHandler


@pytest.fixture(scope="module")
def handler(spark):
    # wrap the shared test session; handler must NOT stop it on close
    return SparkHandler(spark=spark)


@pytest.mark.parametrize("n", [10, 100, 1000])
def test_map_gather_matches_baseline(handler, n):
    data = list(range(n))
    got = handler.gather(handler.map(lambda x: x + 1, data))
    baseline = list(map(lambda x: x + 1, data))
    assert set(got) == set(baseline)


@pytest.mark.parametrize("n", [10, 100, 1000])
def test_batched_map_matches_map(handler, n):
    data = list(range(n))
    unbatched = handler.gather(handler.map(lambda x: x + 1, data))
    batched = handler.batched_map(lambda x: x + 1, data)
    explicit = handler.batched_map(lambda x: x + 1, data, batch_size=64)
    assert set(batched) == set(unbatched) == set(explicit)


def test_multi_iterable_zip(handler):
    a, b = list(range(50)), list(range(100, 150))
    got = handler.batched_map(lambda x, y: x * y, a, b)
    assert set(got) == {x * y for x, y in zip(a, b)}


def test_misaligned_iterables_raise(handler):
    with pytest.raises(ValueError):
        handler.map(lambda x, y: x, [1, 2, 3], [1, 2])


def test_batch_size_defaults_to_parallelism(handler):
    assert handler._get_batch_size() == handler.parallelism > 0


def test_gather_of_materialized_list(handler):
    # thread-backend parity: gather over an already-materialized list
    assert handler.gather([1, 2, 3]) == [1, 2, 3]


def test_close_leaves_external_session_running(spark):
    h = SparkHandler(spark=spark)
    h.close()
    assert spark.range(1).count() == 1  # session still alive


def test_context_manager(spark):
    with SparkHandler(spark=spark) as h:
        assert h.gather(h.map(lambda x: -x, [1, 2])) == [-1, -2]


def test_gather_reraises_worker_exception(handler):
    # fail-fast parity: the first worker exception surfaces at gather,
    # never silently partial (reference distributed_handler.py:146-163)
    def boom(x):
        if x == 3:
            raise ValueError("worker failure on 3")
        return x

    deferred = handler.map(boom, list(range(8)))
    with pytest.raises(Exception) as exc_info:
        handler.gather(deferred)
    assert "worker failure on 3" in str(exc_info.value)


def test_batched_map_explicit_batches_complete_in_order(handler):
    # completed-per-batch semantics: with batch_size=b, results
    # concatenate in batch order (reference distributed_handler.py:142)
    got = handler.batched_map(lambda x: x * 2, list(range(10)), batch_size=3)
    assert got == [x * 2 for x in range(10)]


def test_map_forwards_kwargs(handler):
    # reference pass-through: extra kwargs reach every func call
    # (distributed_handler.py:117-128)
    got = handler.batched_map(
        lambda x, offset=0: x + offset, [1, 2, 3], offset=100
    )
    assert got == [101, 102, 103]
