"""KeyValueStore / RecoverableState (S9/C12)."""

import pytest

from crawlee_spark.operators.kvstore import KeyValueStore


def test_set_get_delete(tmp_store_dir):
    kv = KeyValueStore(tmp_store_dir)
    kv.set_value("STATS-1", {"requestsFinished": 5, "histogram": [5]})
    assert kv.get_value("STATS-1")["requestsFinished"] == 5
    kv.set_value("blob", b"\x00\x01", content_type="application/octet-stream")
    assert kv.get_value("blob") == b"\x00\x01"
    kv.set_value("STATS-1", None)  # delete
    assert kv.get_value("STATS-1", "gone") == "gone"


def test_invalid_key_rejected(tmp_store_dir):
    kv = KeyValueStore(tmp_store_dir)
    with pytest.raises(ValueError):
        kv.set_value("bad/key", {})


def test_recoverable_state_roundtrip(tmp_store_dir):
    kv = KeyValueStore(tmp_store_dir)
    st = kv.get_auto_saved_value("CRAWL-STATE", {"rounds": 0})
    st.value["rounds"] = 7
    st.save()
    # resume: a fresh store object sees the persisted value
    st2 = KeyValueStore(tmp_store_dir).get_auto_saved_value("CRAWL-STATE")
    assert st2.value == {"rounds": 7}


def test_list_keys_and_for_each(tmp_path):
    from crawlee_spark.operators.kvstore import KeyValueStore

    kv = KeyValueStore(str(tmp_path / "kv"))
    for k in ("b-key", "a-key", "c-key"):
        kv.set_value(k, {"v": k})
    kv.set_value("blob", b"\x00\x01", content_type="application/octet-stream")
    assert kv.list_keys() == ["a-key", "b-key", "blob", "c-key"]
    assert kv.list_keys(exclusive_start_key="b-key") == ["blob", "c-key"]
    assert kv.list_keys(limit=2) == ["a-key", "b-key"]
    seen = []
    n = kv.for_each_key(lambda k, i: seen.append((k, i)))
    assert n == 4 and seen[0] == ("a-key", 0) and seen[-1] == ("c-key", 3)
    kv.drop()
    import os
    assert not os.path.exists(str(tmp_path / "kv"))


def test_record_exists(tmp_path):
    from crawlee_spark.operators.kvstore import KeyValueStore

    kv = KeyValueStore(str(tmp_path / "kv"))
    assert not kv.record_exists("a")
    kv.set_value("a", {"x": 1})
    kv.set_value("b", b"\x00\x01", content_type="application/octet-stream")
    assert kv.record_exists("a") and kv.record_exists("b")
    assert not kv.record_exists("c")
