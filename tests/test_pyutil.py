"""pythonplusplus-equivalent utilities (reference rlkit/pythonplusplus.py)."""

import pytest

from s2p_tpu.utils.pyutil import (
    dict_of_list__to__list_of_dicts,
    dict_to_safe_json,
    dot_map_dict_to_nested_dict,
    list_of_dicts__to__dict_of_lists,
    merge_recursive_dicts,
    nested_dict_to_dot_map_dict,
    safe_json,
    treemap,
)


def test_dot_map_roundtrip():
    nested = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = nested_dict_to_dot_map_dict(nested)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert dot_map_dict_to_nested_dict(flat) == nested


def test_merge_recursive():
    a = {"x": {"y": 1}}
    merge_recursive_dicts(a, {"x": {"z": 2}, "w": 3})
    assert a == {"x": {"y": 1, "z": 2}, "w": 3}
    with pytest.raises(KeyError):
        merge_recursive_dicts({"k": 1}, {"k": 2})
    merged = merge_recursive_dicts(
        {"k": 1}, {"k": 2}, ignore_duplicate_keys_in_second_dict=True
    )
    assert merged["k"] == 1


def test_dict_list_conversions():
    d = {"a": [1, 2], "b": [3, 4]}
    lst = dict_of_list__to__list_of_dicts(d, 2)
    assert lst == [{"a": 1, "b": 3}, {"a": 2, "b": 4}]
    assert list_of_dicts__to__dict_of_lists(lst) == d


def test_safe_json():
    assert safe_json({"a": [1, 2.5, "x", None]})
    assert not safe_json({"a": object()})
    out = dict_to_safe_json({"a": object(), "b": {"c": 1}})
    assert isinstance(out["a"], str) and out["b"] == {"c": 1}


def test_treemap():
    t = {"a": [1, 2], "b": 3}
    assert treemap(lambda x: x * 2, t) == {"a": [2, 4], "b": 6}
    assert treemap(lambda x, y: x + y, t, t) == {"a": [2, 4], "b": 6}
