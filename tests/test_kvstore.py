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
