import numpy as np
import pyarrow as pa

from dstream_ray.common import fnv1a_u64, fnv1a_u64_py, partition_ids, segmented_cumcount


def test_fnv1a_matches_scalar():
    strings = ["", "a", "abc", "conv00042", "☃ unicode ☃", "x" * 100]
    vec = fnv1a_u64(pa.array(strings))
    for s, h in zip(strings, vec):
        assert int(h) == fnv1a_u64_py(s), s


def test_fnv1a_sliced_array():
    arr = pa.array(["aa", "bb", "cc", "dd"]).slice(1, 2)
    assert [int(x) for x in fnv1a_u64(arr)] == [fnv1a_u64_py("bb"), fnv1a_u64_py("cc")]


def test_partition_ids_stable_and_in_range():
    ids = partition_ids(pa.array([f"c{i}" for i in range(1000)]), 16)
    assert ids.min() >= 0 and ids.max() < 16
    # roughly balanced
    counts = np.bincount(ids, minlength=16)
    assert counts.min() > 20


def test_segmented_cumcount():
    codes = np.array([0, 0, 0, 1, 1, 5, 5, 5, 5])
    assert segmented_cumcount(codes).tolist() == [0, 1, 2, 0, 1, 0, 1, 2, 3]
    assert segmented_cumcount(np.array([])).tolist() == []
