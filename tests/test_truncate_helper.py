"""The one-place lineage-truncation helper (ADVICE r14): every
localCheckpoint site routes through functions/plan.py so a cluster
deployment can flip to reliable checkpoint() without auditing 60+
call sites.  Pure-python via a stub DataFrame."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semantic_query_engine_spark.functions.plan import (  # noqa: E402
    truncate_eager,
    truncate_plan,
)


class _StubDF:
    def __init__(self):
        self.calls = []

    def localCheckpoint(self, eager):
        self.calls.append(("local", eager))
        return self

    def checkpoint(self, eager):
        self.calls.append(("reliable", eager))
        return self


def test_default_is_lazy_local(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_TRUNCATE", raising=False)
    df = _StubDF()
    assert truncate_plan(df) is df
    assert df.calls == [("local", False)]


def test_eager_variant(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_TRUNCATE", raising=False)
    df = _StubDF()
    truncate_eager(df)
    assert df.calls == [("local", True)]


def test_reliable_mode_routes_to_checkpoint(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TRUNCATE", "reliable")
    df = _StubDF()
    truncate_plan(df)
    truncate_eager(df)
    assert df.calls == [("reliable", False), ("reliable", True)]


def test_no_raw_localcheckpoint_call_sites_remain():
    # the whole point: ONE switch; a new raw call site silently escapes it
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "semantic_query_engine_spark",
    )
    offenders = []
    for root, _, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py") or fn == "plan.py":
                continue
            p = os.path.join(root, fn)
            with open(p) as f:
                for i, line in enumerate(f, 1):
                    if "localCheckpoint(" in line and not line.lstrip().startswith("#"):
                        offenders.append(f"{p}:{i}")
    assert not offenders, offenders
