"""Lifecycle tests for operators._util.cached_store — the keyed
atomic-publish mechanism under the shingle / PQ / cluster stores. These
run without Spark: the contract is pure filesystem."""

from __future__ import annotations

import os

from time_series_data_pipeline_spark.operators._util import cached_store


def _unique(prefix: str) -> str:
    import uuid

    return f"{prefix}_{uuid.uuid4().hex[:8]}"


def test_build_runs_once_per_key():
    calls = []

    def build(scratch: str) -> None:
        calls.append(scratch)
        os.makedirs(scratch, exist_ok=True)
        with open(os.path.join(scratch, "data"), "w") as f:
            f.write("v1")

    prefix = _unique("tsdp_test_store")
    p1 = cached_store(build, prefix, "keyA")
    p2 = cached_store(build, prefix, "keyA")
    assert p1 == p2
    assert len(calls) == 1, "second lookup must hit the published store"
    with open(os.path.join(p1, "data")) as f:
        assert f.read() == "v1"


def test_key_material_isolates_stores():
    def build_v(tag):
        def build(scratch: str) -> None:
            os.makedirs(scratch, exist_ok=True)
            with open(os.path.join(scratch, "data"), "w") as f:
                f.write(tag)

        return build

    prefix = _unique("tsdp_test_store")
    pa = cached_store(build_v("A"), prefix, "param=1")
    pb = cached_store(build_v("B"), prefix, "param=2")
    assert pa != pb, "a parameter change must never reuse a stale store"
    assert open(os.path.join(pa, "data")).read() == "A"
    assert open(os.path.join(pb, "data")).read() == "B"


def test_failed_build_publishes_nothing():
    prefix = _unique("tsdp_test_store")

    def bad(scratch: str) -> None:
        os.makedirs(scratch, exist_ok=True)
        with open(os.path.join(scratch, "partial"), "w") as f:
            f.write("torn")
        raise RuntimeError("build died mid-write")

    try:
        cached_store(bad, prefix, "keyX")
        raised = False
    except RuntimeError:
        raised = True
    assert raised
    # the failure must not have published a half-built store: a retry
    # with a GOOD builder must run it (and see no stale partial data)
    def good(scratch: str) -> None:
        os.makedirs(scratch, exist_ok=True)
        with open(os.path.join(scratch, "data"), "w") as f:
            f.write("ok")

    p = cached_store(good, prefix, "keyX")
    assert open(os.path.join(p, "data")).read() == "ok"
    assert not os.path.exists(os.path.join(p, "partial"))
