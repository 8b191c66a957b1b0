"""Per-process scratch directories under `<repo>/.scratch` (ADVICE r9).

`tempfile.mkdtemp` under /tmp leaked one directory per bench/gate
process per sf_dir (the IVF/IVF-PQ layout caches in queries/dedup_q.py,
the streaming checkpoint dirs in queries/streaming_q.py, and
tools/scale_ann_probe.py) — repeated invocations accumulated orphaned
parquet trees nothing ever removed.  This helper replaces those with a
fixed, gitignored per-repo location:

    .scratch/<pid>/<name>

* **pid subdir** — concurrent processes (a gate run next to a bench
  run) can never overwrite each other's layouts mid-read.
* **atexit rmtree** of the pid subdir — a clean exit leaves nothing
  behind, so repeated invocations cannot accumulate.
* **fixed base under the repo** — a SIGKILLed process's leftovers land
  in one known place that `tools/verify_round.sh` clears at the start
  of every round, instead of scattering across /tmp.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH_BASE = os.path.join(_REPO, ".scratch")
_PID_BASE = os.path.join(SCRATCH_BASE, str(os.getpid()))
_registered = False


def scratch_path(name: str) -> str:
    """Create (if needed) and return `.scratch/<pid>/<name>`.

    `name` is sanitized to a single path component; callers that key a
    per-process cache by sf_dir should fold the key into the name
    (e.g. ``scratch_path(f"ivf_layout_{key}")``).  The whole pid subtree
    is removed at interpreter exit.
    """
    global _registered
    if not _registered:
        atexit.register(shutil.rmtree, _PID_BASE, ignore_errors=True)
        _registered = True
    safe = re.sub(r"[^A-Za-z0-9._-]+", "_", name).strip("_") or "scratch"
    path = os.path.join(_PID_BASE, safe)
    os.makedirs(path, exist_ok=True)
    return path
