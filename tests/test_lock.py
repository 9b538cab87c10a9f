"""Single-writer directory lock (Lucene write.lock analog).

Contract: at most one live writer process per index directory; writer
composition (update = delete + build) reenters freely inside one
process; a dead or heartbeat-silent holder is broken by the next
contender; releasing never unlinks a lock someone else validly took.
"""

import json
import os
import subprocess
import sys
import threading
import time

import pytest

from ostrich_spark.lock import (
    LOCK_NAME,
    LockHeldError,
    lock_info,
    write_lock,
)


def _plant(d, **over):
    """Write a foreign lock file."""
    payload = {
        "lock_id": "foreign", "owner": "other-job", "pid": os.getpid(),
        "host": "another-host", "acquired_at": time.time(),
        "heartbeat_at": time.time(),
    }
    payload.update(over)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, LOCK_NAME), "w") as f:
        json.dump(payload, f)


def _dead_pid() -> int:
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    return p.pid


def test_lifecycle(tmp_path):
    d = str(tmp_path / "idx")
    with write_lock(d, owner="test"):
        info = lock_info(d)
        assert info["owner"] == "test" and info["pid"] == os.getpid()
    assert lock_info(d) is None


def test_live_foreign_holder_blocks(tmp_path):
    d = str(tmp_path / "idx")
    _plant(d)  # alive pid, fresh heartbeat, other host
    with pytest.raises(LockHeldError, match="other-job"):
        with write_lock(d):
            pass
    assert lock_info(d)["owner"] == "other-job"  # untouched


def test_dead_pid_same_host_broken(tmp_path):
    d = str(tmp_path / "idx")
    import socket

    _plant(d, host=socket.gethostname(), pid=_dead_pid())
    with write_lock(d, owner="taker"):
        assert lock_info(d)["owner"] == "taker"
    assert lock_info(d) is None


def test_stale_heartbeat_broken(tmp_path):
    d = str(tmp_path / "idx")
    _plant(d, heartbeat_at=time.time() - 9999)
    with write_lock(d, owner="taker", stale_after=600):
        assert lock_info(d)["owner"] == "taker"


def test_reentrant_within_process(tmp_path):
    d = str(tmp_path / "idx")
    with write_lock(d, owner="outer"):
        with write_lock(d, owner="inner"):
            assert lock_info(d)["owner"] == "outer"
        assert lock_info(d) is not None  # inner exit keeps it held
    assert lock_info(d) is None


def test_heartbeat_refreshes(tmp_path):
    d = str(tmp_path / "idx")
    with write_lock(d, heartbeat=0.1):
        first = lock_info(d)["heartbeat_at"]
        deadline = time.time() + 5
        while lock_info(d)["heartbeat_at"] == first:
            assert time.time() < deadline, "heartbeat never refreshed"
            time.sleep(0.05)


def test_release_does_not_unlink_foreign_lock(tmp_path):
    """A holder whose lock was (validly) broken and re-acquired must not
    unlink the new holder's lock on exit."""
    d = str(tmp_path / "idx")
    with write_lock(d, heartbeat=3600):
        _plant(d)  # simulate: our lock was broken, someone else owns it
    assert lock_info(d)["owner"] == "other-job"


def test_one_winner_when_breaking_stale(tmp_path):
    """Many threads racing to break one stale lock: exactly one acquires,
    the rest see a live holder."""
    d = str(tmp_path / "idx")
    _plant(d, heartbeat_at=time.time() - 9999)
    wins, errs = [], []
    bar = threading.Barrier(8)

    def contend(i):
        bar.wait()
        try:
            with write_lock(d, owner=f"t{i}"):
                wins.append(i)
                time.sleep(0.5)  # hold long enough for losers to observe
        except LockHeldError:
            errs.append(i)

    ts = [threading.Thread(target=contend, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert lock_info(d) is None
    assert len(wins) + len(errs) == 8 and wins


def test_other_thread_is_a_distinct_writer(tmp_path):
    """Reentrancy is per-THREAD (RLock semantics): a second thread of the
    same process is refused while the first holds the lock."""
    d = str(tmp_path / "idx")
    acquired = threading.Event()
    release = threading.Event()
    outcome = []

    def holder():
        with write_lock(d, owner="t-a"):
            acquired.set()
            release.wait(10)

    t = threading.Thread(target=holder)
    t.start()
    assert acquired.wait(10)
    try:
        with write_lock(d, owner="t-b"):
            outcome.append("acquired")
    except LockHeldError:
        outcome.append("held")
    release.set()
    t.join()
    assert outcome == ["held"]
    assert lock_info(d) is None


def test_build_rejected_under_foreign_lock(spark, tmp_path):
    from ostrich_spark.build import build_index
    from ostrich_spark.schema import Schema

    d = str(tmp_path / "idx")
    _plant(d)
    s = Schema()
    s.add_text_field("text", "default")
    docs = spark.createDataFrame([{"doc_key": 0, "text": "spark"}])
    with pytest.raises(LockHeldError):
        build_index(spark, docs, s, d, num_partitions=1,
                    order_col="doc_key", id_cols=["doc_key"])


def test_update_composes_under_one_lock(spark, tmp_path):
    """update_docs = delete + build; reentrancy means the nested calls
    share the outer lock instead of deadlocking, and it is released."""
    from ostrich_spark.build import build_index
    from ostrich_spark.deletes import update_docs
    from ostrich_spark.schema import Schema

    d = str(tmp_path / "idx")
    s = Schema()
    s.add_text_field("text", "default")
    docs = spark.createDataFrame(
        [{"doc_key": 0, "text": "spark"}, {"doc_key": 1, "text": "stream"}]
    )
    build_index(spark, docs, s, d, num_partitions=1,
                order_col="doc_key", id_cols=["doc_key"])
    upd = spark.createDataFrame([{"doc_key": 0, "text": "rewritten"}])
    update_docs(spark, d, upd, ["doc_key"], build_id="u1", num_partitions=1)
    assert lock_info(d) is None
