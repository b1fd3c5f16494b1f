"""WAL unit tests: record round-trip, torn tails, corrupt records."""

import numpy as np

from comet_tpu.storage import wal


def test_record_roundtrip(tmp_path):
    path = str(tmp_path / "w.log")
    w = wal.WalWriter(path)
    vec = np.arange(4, dtype=np.float32)
    w.append_add(7, vec, "hello world", {"a": 1, "b": "x"})
    w.append_add(8, None, "", None)
    w.append_remove(7)
    w.close()

    records = list(wal.replay(path))
    assert len(records) == 3
    op, doc, v, text, meta = records[0]
    assert op == wal.OP_ADD and doc == 7
    np.testing.assert_array_equal(v, vec)
    assert text == "hello world" and meta == {"a": 1, "b": "x"}
    op, doc, v, text, meta = records[1]
    assert op == wal.OP_ADD and doc == 8 and v is None and meta is None
    assert records[2][0] == wal.OP_REMOVE and records[2][1] == 7


def test_torn_tail_dropped(tmp_path):
    path = str(tmp_path / "w.log")
    w = wal.WalWriter(path)
    w.append_add(1, np.ones(3, dtype=np.float32), "a", None)
    w.append_add(2, np.ones(3, dtype=np.float32), "b", None)
    w.close()
    raw = open(path, "rb").read()
    # truncate inside the second record
    open(path, "wb").write(raw[: len(raw) - 5])
    records = list(wal.replay(path))
    assert len(records) == 1
    assert records[0][1] == 1


def test_corrupt_record_stops_at_last_good(tmp_path):
    path = str(tmp_path / "w.log")
    w = wal.WalWriter(path)
    w.append_add(1, None, "ok", None)
    w.close()
    with open(path, "ab") as f:
        f.write(b"\x08\x00\x00\x00GARBAGE!")  # valid length, junk body
    records = list(wal.replay(path))
    assert [r[1] for r in records] == [1]


def test_replay_missing_file():
    assert list(wal.replay("/nonexistent/path.log")) == []
