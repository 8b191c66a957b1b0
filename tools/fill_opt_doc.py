"""Fill OPTIMIZATION_r14.md's AFTER_<query> placeholders from
BENCH_local_r14.json (one-shot round-evidence helper)."""

import json
import re
import sys

doc_path = "OPTIMIZATION_r14.md"
bench = json.load(open("BENCH_local_r14.json"))["queries"]
text = open(doc_path).read()

missing = []


def repl(m):
    name = m.group(1)
    v = bench.get(name)
    if v is None:
        missing.append(name)
        return m.group(0)
    return f"{v:.2f}"


text = re.sub(r"AFTER_([A-Za-z0-9_]+)", repl, text)
# Only write when every placeholder resolved: a failed run must not
# leave the doc partially substituted on disk (ADVICE r14).
if missing:
    sys.stderr.write(f"missing bench rows: {missing}\n")
    sys.exit(1)
open(doc_path, "w").write(text)
print("filled")
