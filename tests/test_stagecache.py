"""StageCache: the persistence behind stage-level protocol resume."""

import json
import os

from prdisagg_tpu.utils.stagecache import StageCache


def test_mark_get_done_roundtrip(tmp_path):
    p = str(tmp_path / "state.json")
    c = StageCache(p)
    assert not c.done("crps")
    payload = c.mark("crps", summary={"gan": 0.44, "random": 0.12})
    assert payload == {"summary": {"gan": 0.44, "random": 0.12}}
    assert c.done("crps")
    # a fresh instance reads the persisted state (the relaunch path)
    c2 = StageCache(p)
    assert c2.get("crps")["summary"]["gan"] == 0.44


def test_clear_selective_and_all(tmp_path):
    p = str(tmp_path / "state.json")
    c = StageCache(p)
    c.mark("eval", corr=0.9)
    c.mark("crps", gan=0.4)
    c.mark("lsd", medians={})
    c.clear("crps", "lsd")
    assert c.done("eval") and not c.done("crps") and not c.done("lsd")
    c.clear()
    assert not c.done("eval")
    assert StageCache(p).get("eval") is None


def test_corrupt_state_file_reads_as_empty(tmp_path):
    p = str(tmp_path / "state.json")
    with open(p, "w") as f:
        f.write('{"crps": {tru')  # a pre-atomic-write kill artifact
    c = StageCache(p)
    assert not c.done("crps")
    c.mark("eval", corr=1.0)  # and it recovers to a valid file
    assert json.load(open(p)) == {"eval": {"corr": 1.0}}


def test_writes_are_atomic_no_tmp_left(tmp_path):
    p = str(tmp_path / "sub" / "state.json")  # creates parent dirs
    c = StageCache(p)
    c.mark("a", x=1)
    assert os.path.exists(p)
    assert not os.path.exists(p + ".tmp")


def test_concurrent_writers_no_shared_tmp(tmp_path):
    """Two cache instances flushing the same state file must not steal each
    other's tmp (pid-unique names); last-writer-wins, never a crash, and no
    tmp litter survives."""
    p = str(tmp_path / "state.json")
    a, b = StageCache(p), StageCache(p)
    a.mark("one", x=1)
    b.mark("two", y=2)
    a.mark("three", z=3)
    assert json.load(open(p)) == {"one": {"x": 1}, "three": {"z": 3}}
    assert [f for f in os.listdir(tmp_path) if ".tmp" in f] == []
